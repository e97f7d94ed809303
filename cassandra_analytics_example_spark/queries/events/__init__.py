"""Event-time analytics over the ``events`` table — the batch twins of the
streaming operators (SURVEY.md §7 M3), each oracle-checked; the streaming
variants (streaming/windows.py) reuse the same logic with watermarks.

Timestamps surface as integer epoch-µs (``ts_us``) or truncated ISO strings,
never raw timestamps — see queries/_tables.py for the ns handling.

Round 10: mechanically split into per-family submodules (zero
behavior change). Registration order is preserved by the import
order below; every top-level name of every block is re-exported so
external imports (``from ...queries.events import X``) keep working
exactly as against the former single module.
"""

from cassandra_analytics_example_spark.queries.events import (  # noqa: F401
    windows,
    sessions,
    timeseries,
    cohorts,
    rankdrift,
    encodings,
)

import sys as _sys

_self = _sys.modules[__name__]
for _m in (windows, sessions, timeseries, cohorts, rankdrift, encodings):
    for _k, _v in vars(_m).items():
        if not _k.startswith('__'):
            setattr(_self, _k, _v)
del _sys, _self, _m, _k, _v

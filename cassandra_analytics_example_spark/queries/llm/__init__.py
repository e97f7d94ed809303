"""LLM-training-data pipeline queries (SURVEY.md §7 M4) over the
``documents`` and ``embeddings`` fixtures: dedup (exact / MinHash-LSH /
SimHash / token-Jaccard / embedding-cosine), similarity search (brute-force
+ LSH), text analysis (lang-id, quality, tokens, fingerprints), multimodal
binary plumbing.

Oracles: the operators hash with md5 and compute similarity in ordered
float64 folds precisely so these pipelines stay SQL-expressible — each
oracle below recomputes signatures/scores from scratch in DuckDB.

Round 10: mechanically split into per-family submodules (zero
behavior change). Registration order is preserved by the import
order below; every top-level name of every block is re-exported so
external imports (``from ...queries.llm import X``) keep working
exactly as against the former single module.
"""

from cassandra_analytics_example_spark.queries.llm import (  # noqa: F401
    corpus,
    curation,
    governance,
    stores,
    evals,
    metrics,
)

import sys as _sys

_self = _sys.modules[__name__]
for _m in (corpus, curation, governance, stores, evals, metrics):
    for _k, _v in vars(_m).items():
        if not _k.startswith('__'):
            setattr(_self, _k, _v)
del _sys, _self, _m, _k, _v

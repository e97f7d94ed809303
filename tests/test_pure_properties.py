"""Hypothesis property tests for the engine's PURE functions (no Spark
session): split-threshold arithmetic and connector option translation.
These run in milliseconds and pin down edge cases fixed examples miss.
"""

from __future__ import annotations

import pytest
from hypothesis import given, strategies as st

from cassandra_analytics_example_spark.operators.sampling import SPLIT_BUCKETS
from cassandra_analytics_example_spark.sources.options import (
    CONTROL_KEYS,
    cassandra_options,
)


def _thresholds(weights):
    """Mirror of split_column's threshold derivation (pure arithmetic)."""
    total = float(sum(w for _, w in weights))
    acc, out = 0.0, []
    for name, w in weights:
        acc += w / total
        out.append((name, round(acc * SPLIT_BUCKETS)))
    return out


@given(
    st.lists(
        st.tuples(
            st.text(min_size=1, max_size=8),
            st.floats(min_value=1e-6, max_value=1e6, allow_nan=False),
        ),
        min_size=1,
        max_size=8,
    )
)
def test_split_thresholds_cover_bucket_space(weights):
    """Thresholds are non-decreasing and the last one always equals
    SPLIT_BUCKETS — every bucket value in [0, SPLIT_BUCKETS) is assigned to
    exactly one split regardless of weight scale or rounding."""
    th = _thresholds(weights)
    values = [t for _, t in th]
    assert values == sorted(values)
    assert values[-1] == SPLIT_BUCKETS


@given(
    st.dictionaries(
        st.sampled_from(sorted(CONTROL_KEYS) + ["keyspace", "table", "dc", "x"]),
        st.text(max_size=10),
        min_size=0,
        max_size=12,
    )
)
def test_cassandra_options_never_leak_control_keys(options):
    """Whatever option map comes in: the translated map never contains a
    registry control key, passes through everything else verbatim, and
    demands keyspace+table."""
    has_required = {"keyspace", "table"} <= options.keys()
    if not has_required:
        with pytest.raises(ValueError):
            cassandra_options(options, "read")
        return
    out = cassandra_options(options, "read")
    assert not (set(out) & CONTROL_KEYS)
    for k, v in options.items():
        if k not in CONTROL_KEYS:
            assert out[k] == v

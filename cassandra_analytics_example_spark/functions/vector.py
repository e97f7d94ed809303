"""Vector algebra over ``array<float>`` embedding columns — pure column
expressions (whole-stage codegen, no Python), computed in float64.

The sequential fold in ``F.aggregate`` matches the element-order summation of
single-node engines (verified bit-identical against DuckDB's
``list_cosine_similarity`` on the fixture embeddings), so similarity scores
are oracle-checkable without tolerance.

At 100 TB these expressions stay JVM-side and columnar; for very high
dimensions a pandas_udf with numpy BLAS would win — keep that behind the same
signature if profiling demands it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(_d(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def sign_bucket(a: Column | str, n_bits: int = 8) -> Column:
    """LSH bucket id from the signs of the first ``n_bits`` components
    (axis-aligned random-hyperplane LSH; the fixture embeddings are roughly
    isotropic so axis planes are an adequate, fully deterministic choice).

    SQL twin: ``sum(CASE WHEN embedding[i+1] >= 0 THEN 2^i ELSE 0 END)``.
    """
    c = _d(a)
    bucket = F.lit(0)
    for i in range(n_bits):
        bucket = bucket + F.when(
            F.element_at(c, i + 1) >= 0, F.lit(2**i)
        ).otherwise(F.lit(0))
    return bucket.cast("bigint")

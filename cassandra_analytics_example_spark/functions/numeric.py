"""Deterministic numeric helpers.

Money columns in the fixtures are doubles holding 2-decimal values
(l_extendedprice, c_acctbal, …). Summing doubles is order-dependent — on a
1000-executor cluster the partial-aggregate order differs run to run, and
differs from any single-node oracle. Casting to exact DECIMAL *before* the
aggregate makes sums associative/commutative again, so results are bit-stable
at any parallelism; the final CAST back to DOUBLE is a single deterministic
rounding. This is the engine-wide convention for every money aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def money_sum(col: Column | str, alias: str, scale: int = 2) -> Column:
    """Order-independent SUM over a 2-decimal double column → double."""
    return F.sum(dec(col, 18, scale)).cast("double").alias(alias)


def money_avg(col: Column | str, alias: str, scale: int = 2) -> Column:
    """Deterministic AVG: exact decimal sum divided by count, in doubles."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c, 18, scale)).cast("double") / F.count(c)).alias(alias)


def revenue_expr() -> Column:
    """The TPC-H revenue term l_extendedprice * (1 - l_discount) in exact
    decimal arithmetic (both factors are 2-decimal in the fixtures)."""
    return dec("l_extendedprice", 12, 2) * (F.lit(1) - dec("l_discount", 4, 2))

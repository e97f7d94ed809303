"""UDF/UDAF/UDTF registration surface (SURVEY.md §2.8: absent from the
reference, part of this engine's M2 analytics layer).

The engine's own operators deliberately avoid Python UDFs in hot paths
(JVM column algebra + Arrow mapInPandas only); these tests pin that the
REGISTRATION surface still works for users who bring their own logic —
vectorized pandas_udf (the fast path), a grouped-agg UDAF, and Spark 4's
Python UDTF — and that each is callable from SQL text.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_register_vectorized_udf_callable_from_sql(spark):
    @F.pandas_udf("double")
    def signed_log1p(v: pd.Series) -> pd.Series:
        import numpy as np

        return np.sign(v) * np.log1p(v.abs())

    spark.udf.register("signed_log1p", signed_log1p)
    df = spark.range(-3, 4).selectExpr("CAST(id AS DOUBLE) AS x")
    df.createOrReplaceTempView("xs")
    got = spark.sql(
        "SELECT x, signed_log1p(x) AS y FROM xs ORDER BY x"
    ).collect()
    import math

    for r in got:
        want = math.copysign(math.log1p(abs(r.x)), r.x) if r.x != 0 else 0.0
        assert abs(r.y - want) < 1e-12


def test_register_grouped_agg_udaf(spark):
    @F.pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(v).mean()))

    spark.udf.register("geo_mean", geo_mean)
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 4.0), ("b", 9.0)], "k string, v double"
    )
    df.createOrReplaceTempView("gm")
    got = {
        r.k: r.g
        for r in spark.sql(
            "SELECT k, geo_mean(v) AS g FROM gm GROUP BY k"
        ).collect()
    }
    assert abs(got["a"] - 2.0) < 1e-12
    assert abs(got["b"] - 9.0) < 1e-12


def test_register_python_udtf(spark):
    udtf_fn = getattr(F, "udtf", None)
    if udtf_fn is None:
        pytest.skip("Python UDTF API not available in this Spark")

    @udtf_fn(returnType="word: string, pos: int")
    class Tokenize:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" ")):
                yield w, i

    spark.udtf.register("tokenize_udtf", Tokenize)
    rows = spark.sql(
        "SELECT t.word, t.pos FROM tokenize_udtf('alpha beta gamma') t"
    ).collect()
    assert [(r.word, r.pos) for r in rows] == [
        ("alpha", 0), ("beta", 1), ("gamma", 2),
    ]


def test_apply_in_pandas_grouped_map_matches_window_equivalent(spark):
    """applyInPandas (grouped map — each group arrives as ONE pandas
    frame) verified against the pure-window equivalent: per-user
    percent-rank of event values. The engine's operators stay in column
    algebra; this pins that the Arrow grouped-map path works for user
    logic that genuinely wants a DataFrame per group."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(u, i, float((u * 7 + i * 13) % 29)) for u in range(4) for i in range(25)],
        "user bigint, seq bigint, v double",
    )

    def rank_norm(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.copy()
        out["pr"] = pdf["v"].rank(method="min").sub(1).div(len(pdf) - 1)
        return out[["user", "seq", "pr"]]

    got = df.groupBy("user").applyInPandas(
        rank_norm, schema="user bigint, seq bigint, pr double"
    )
    w = Window.partitionBy("user").orderBy("v")
    want = df.select("user", "seq", F.percent_rank().over(w).alias("pr"))
    joined = got.alias("g").join(
        want.alias("w"), ["user", "seq"]
    ).select(F.abs(F.col("g.pr") - F.col("w.pr")).alias("d"))
    assert joined.count() == 100
    assert joined.agg(F.max("d")).first()[0] < 1e-12

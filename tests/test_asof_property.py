"""Property check for the union+carry as-of join: on randomized data it
must agree exactly with pandas ``merge_asof`` (allow_exact_matches=True),
including duplicate timestamps, keys with no right-side rows, and right
rows newer than every left row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from cassandra_analytics_example_spark.operators.relational import asof_join


def test_asof_join_matches_pandas_merge_asof(spark):
    rng = np.random.default_rng(20260813)
    n_left, n_right, n_keys = 2000, 1500, 37
    left = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_left),
            "lts": rng.integers(0, 10_000, n_left),
            "lid": np.arange(n_left),
        }
    )
    # key 0 never appears on the right; right rows cluster in a narrower
    # time range so some left rows precede every right row.
    right = pd.DataFrame(
        {
            "k": rng.integers(1, n_keys, n_right),
            "rts": rng.integers(2_000, 8_000, n_right),
            "payload": rng.normal(size=n_right),
        }
    )
    # merge_asof with duplicate right timestamps keeps the LAST duplicate;
    # make (k, rts) unique so the expected value is well-defined under any
    # tie order.
    right = right.drop_duplicates(subset=["k", "rts"], keep="last")

    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on=["k"],
            left_ts="lts",
            right_ts="rts",
            right_values=["payload"],
        )
        .select("lid", "payload_asof")
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )

    expected = (
        pd.merge_asof(
            left.sort_values("lts", kind="stable"),
            right.sort_values("rts", kind="stable"),
            left_on="lts",
            right_on="rts",
            by="k",
            direction="backward",
            allow_exact_matches=True,
        )
        .sort_values("lid")
        .reset_index(drop=True)
    )

    assert len(got) == n_left
    pd.testing.assert_series_equal(
        got["payload_asof"],
        expected["payload"].rename("payload_asof"),
        check_exact=True,
    )


def test_asof_join_null_value_columns_stay_with_matched_row(spark):
    """The matched right ROW travels whole: a NULL field in the newest
    matching right row must surface as NULL, not be back-filled from an
    older row (per-column last(ignorenulls) would mix rows)."""
    left = spark.createDataFrame([(1, 20, 0), (1, 7, 1)], ["k", "lts", "lid"])
    right = spark.createDataFrame(
        [(1, 5, 5.0, 50.0), (1, 10, None, 100.0)],
        "k int, rts int, a double, b double",
    )
    got = {
        r.lid: (r.a_asof, r.b_asof)
        for r in asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            right_values=["a", "b"],
        ).collect()
    }
    # lid=0 (ts 20) matches the ts-10 row: a stays NULL, not 5.0 from ts 5
    assert got[0] == (None, 100.0)
    # lid=1 (ts 7) matches the ts-5 row fully
    assert got[1] == (5.0, 50.0)


def test_sessionize_matches_pandas_reference(spark):
    from cassandra_analytics_example_spark.operators.relational import sessionize
    import pandas as pd
    import numpy as np

    rng = np.random.default_rng(7)
    n = 3000
    pdf = pd.DataFrame(
        {
            "u": rng.integers(0, 50, n),
            "ts": rng.integers(0, 100_000, n).astype("float64"),
            "eid": np.arange(n),
        }
    )
    pdf = pdf.drop_duplicates(subset=["u", "ts"])  # unique order within user
    gap = 600

    got = (
        sessionize(spark.createDataFrame(pdf), "u", "ts", gap)
        .select("eid", "session_id")
        .toPandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )

    def ref(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("ts", kind="stable")
        new = (g["ts"].diff().isna() | (g["ts"].diff() > gap)).astype("int64")
        return pd.DataFrame({"eid": g["eid"], "session_id": new.cumsum()})

    expected = (
        pdf.groupby("u", group_keys=False)[["ts", "eid"]]
        .apply(ref)
        .sort_values("eid")
        .reset_index(drop=True)
    )
    assert (got["session_id"].values == expected["session_id"].values).all()


def test_salted_join_matches_pandas_merge_randomized(spark):
    """Randomized check that salting never changes the join result:
    skewed keys (zipf-ish), NULL-free bigint keys, varying bucket
    counts — salted inner join must equal the pandas inner merge."""
    rng = np.random.default_rng(20260814)
    from cassandra_analytics_example_spark.operators.relational import (
        salted_join,
    )

    for buckets in (1, 3, 8):
        n_left = 1500
        keys = np.minimum(rng.geometric(0.3, n_left), 12)  # heavy head
        left = pd.DataFrame(
            {
                "k": keys.astype("int64"),
                "uid": np.arange(n_left).astype("int64"),
            }
        )
        right = pd.DataFrame(
            {
                "k": np.arange(1, 10).astype("int64"),
                "payload": rng.integers(0, 1_000, 9).astype("int64"),
            }
        )
        got = (
            salted_join(
                spark.createDataFrame(left),
                spark.createDataFrame(right),
                "k",
                salt_id="uid",
                buckets=buckets,
            )
            .toPandas()
            .sort_values(["uid"])
            .reset_index(drop=True)
        )
        want = (
            left.merge(right, on="k", how="inner")
            .sort_values(["uid"])
            .reset_index(drop=True)
        )
        assert len(got) == len(want), buckets
        pd.testing.assert_frame_equal(
            got[["k", "uid", "payload"]], want[["k", "uid", "payload"]]
        )


def test_merge_upsert_matches_pandas_randomized(spark):
    """Randomized merge: result keys = (target − deleted) ∪ upserts, with
    update rows winning on matched keys — checked against a pandas
    reference merge over random key overlaps."""
    rng = np.random.default_rng(20260815)
    from cassandra_analytics_example_spark.operators.versioning import (
        merge_upsert,
    )

    target = pd.DataFrame(
        {
            "id": np.arange(0, 300, dtype="int64"),
            "v": rng.integers(0, 100, 300).astype("int64"),
        }
    )
    upd_ids = rng.choice(np.arange(0, 450, dtype="int64"), 200, replace=False)
    updates = pd.DataFrame(
        {
            "id": upd_ids,
            "v": rng.integers(1000, 1100, 200).astype("int64"),
            "is_delete": rng.random(200) < 0.25,
        }
    )
    got = (
        merge_upsert(
            spark.createDataFrame(target),
            spark.createDataFrame(updates),
            "id",
            delete_col="is_delete",
        )
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    live_upd = updates[~updates.is_delete][["id", "v"]]
    deleted = set(updates[updates.is_delete].id)
    survivors = target[
        ~target.id.isin(set(updates.id))
    ]
    want = (
        pd.concat([survivors, live_upd])
        .drop_duplicates("id", keep="last")
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = want[~want.id.isin(deleted)].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want.astype({"id": "int64", "v": "int64"}))

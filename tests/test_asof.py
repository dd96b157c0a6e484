"""As-of join: union-and-carry vs pandas merge_asof ground truth,
and bucketed-variant equivalence on adversarial bucket layouts."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from vyperdatum_spark.ops.asof import asof_join, asof_join_bucketed

EPOCH = dt.datetime(2024, 1, 1)


def _ts(hours: float) -> dt.datetime:
    return EPOCH + dt.timedelta(hours=float(hours))


@pytest.fixture(scope="module")
def asof_case():
    """Seeded case with every edge the operator must get right:
    keys with no right rows, right rows after every left row,
    exact-timestamp ties (inclusive <=), duplicate right timestamps
    needing the tie-break, and key 7 hot (half of all rows)."""
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    lkey = np.where(rng.random(n_l) < 0.5, 7, rng.integers(0, 12, n_l))
    lt = rng.uniform(0, 500, n_l)
    rkey = np.where(rng.random(n_r) < 0.5, 7, rng.integers(0, 10, n_r))
    rt = np.round(rng.uniform(-50, 450, n_r), 0)  # integer hours => ties
    left = pd.DataFrame(
        {
            "lid": np.arange(n_l, dtype=np.int64),
            "k": lkey.astype(np.int64),
            "t": [_ts(h) for h in lt],
        }
    )
    # force exact left==right timestamp collisions (inclusive bound)
    left.loc[:20, "t"] = [_ts(h) for h in rt[:21]]
    left.loc[:20, "k"] = rkey[:21]
    right = pd.DataFrame(
        {
            "k": rkey.astype(np.int64),
            "t": [_ts(h) for h in rt],
            "rid": np.arange(n_r, dtype=np.int64),
            "val": np.round(rng.uniform(0, 100, n_r), 3),
        }
    )
    return left, right


def _expected(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    # ground truth: per left row, eligible = same key, t <= left t;
    # winner = max (t, rid)
    rows = []
    for _, l in left.iterrows():
        elig = right[(right.k == l.k) & (right.t <= l.t)]
        if len(elig):
            w = elig.sort_values(["t", "rid"]).iloc[-1]
            rows.append((l.lid, w.rid, w.val))
        else:
            rows.append((l.lid, None, None))
    return (
        pd.DataFrame(rows, columns=["lid", "asof_rid", "asof_val"])
        .sort_values("lid")
        .reset_index(drop=True)
    )


def _run(spark, fn, left, right, **kw):
    got = (
        fn(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            left_on="k",
            right_on="k",
            left_time="t",
            right_time="t",
            payload=["rid", "val"],
            tie="rid",
            **kw,
        )
        .select("lid", "asof_rid", "asof_val")
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    return got


def test_asof_join_matches_ground_truth(spark, asof_case):
    left, right = asof_case
    got = _run(spark, asof_join, left, right)
    exp = _expected(left, right)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.parametrize("bucket_hours", [1, 24, 720])
def test_bucketed_equals_plain(spark, asof_case, bucket_hours):
    """Bucketed two-phase result is identical to the single-window
    result at bucket sizes from finer-than-data to
    coarser-than-the-whole-range (one bucket = degenerate case)."""
    left, right = asof_case
    plain = _run(spark, asof_join, left, right)
    bucketed = _run(
        spark, asof_join_bucketed, left, right,
        bucket_seconds=bucket_hours * 3600,
    )
    pd.testing.assert_frame_equal(bucketed, plain, check_dtype=False)


def test_asof_inclusive_and_tie_break(spark):
    """At an exact timestamp collision the right row is eligible
    (<=), and among right duplicates at one timestamp the greatest
    tie value wins."""
    left = pd.DataFrame({"lid": [0], "k": [1], "t": [_ts(10)]})
    right = pd.DataFrame(
        {
            "k": [1, 1, 1],
            "t": [_ts(10), _ts(10), _ts(11)],
            "rid": [5, 9, 2],
            "val": [1.0, 2.0, 3.0],
        }
    )
    got = _run(spark, asof_join, left, right)
    assert got.loc[0, "asof_rid"] == 9  # tie at t=10 -> max rid; t=11 ineligible
    bucketed = _run(spark, asof_join_bucketed, left, right, bucket_seconds=3600)
    assert bucketed.loc[0, "asof_rid"] == 9


def test_asof_no_match_yields_nulls(spark):
    left = pd.DataFrame({"lid": [0, 1], "k": [1, 2], "t": [_ts(0), _ts(5)]})
    right = pd.DataFrame({"k": [1], "t": [_ts(3)], "rid": [1], "val": [9.0]})
    got = _run(spark, asof_join, left, right)
    assert got.loc[0, "asof_rid"] is None or pd.isna(got.loc[0, "asof_rid"])
    assert pd.isna(got.loc[1, "asof_rid"])  # key 2 has no right rows


def test_payload_collision_raises(spark):
    left = pd.DataFrame({"lid": [0], "k": [1], "t": [_ts(0)], "rid": [0]})
    right = pd.DataFrame({"k": [1], "t": [_ts(0)], "rid": [1], "val": [1.0]})
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            left_on="k", right_on="k", left_time="t", right_time="t",
            payload=["rid", "val"], tie="rid",
        )

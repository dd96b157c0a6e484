"""Range join: bucketed rewrite vs brute-force ground truth, bucket
boundary edges, and the no-nested-loop plan guarantee."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from vyperdatum_spark.ops.ranges import range_join

EPOCH = dt.datetime(2024, 3, 1)


def _ts(seconds: float) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=float(seconds))


@pytest.fixture(scope="module")
def range_case():
    """Points and intervals engineered to straddle every bucket edge:
    intervals shorter than / equal to / spanning many buckets, ends
    with sub-second precision, empty and inverted intervals, and
    points exactly on start (inclusive) and end (exclusive)."""
    rng = np.random.default_rng(11)
    n_p, n_i = 500, 120
    pts = pd.DataFrame(
        {
            "pid": np.arange(n_p, dtype=np.int64),
            "k": rng.integers(0, 6, n_p).astype(np.int64),
            "p": [_ts(s) for s in rng.uniform(0, 40000, n_p)],
        }
    )
    start = rng.uniform(-2000, 38000, n_i)
    length = rng.choice([0.0, 1.0, 599.5, 3600.0, 3600.5, 20000.0], n_i)
    iv = pd.DataFrame(
        {
            "iid": np.arange(n_i, dtype=np.int64),
            "k": rng.integers(0, 6, n_i).astype(np.int64),
            "s": [_ts(x) for x in start],
            "e": [_ts(x + l) for x, l in zip(start, length)],
        }
    )
    # inverted interval (end < start): must produce nothing, not crash
    iv.loc[0, "e"] = iv.loc[0, "s"] - dt.timedelta(hours=1)
    # exact-boundary points: one on a start (match), one on an end (no match)
    pts.loc[0, ["k", "p"]] = [iv.loc[5, "k"], iv.loc[5, "s"]]
    pts.loc[1, ["k", "p"]] = [iv.loc[5, "k"], iv.loc[5, "e"]]
    return pts, iv


def _expected(pts: pd.DataFrame, iv: pd.DataFrame) -> set:
    out = set()
    for _, i in iv.iterrows():
        m = pts[(pts.k == i.k) & (pts.p >= i.s) & (pts.p < i.e)]
        out.update((int(pid), int(i.iid)) for pid in m.pid)
    return out


@pytest.mark.parametrize("bucket_seconds", [60, 3600, 86400])
def test_range_join_matches_ground_truth(spark, range_case, bucket_seconds):
    pts, iv = range_case
    got = (
        range_join(
            spark.createDataFrame(pts),
            spark.createDataFrame(iv),
            left_point="p",
            right_start="s",
            right_end="e",
            on=["k"],
            bucket_seconds=bucket_seconds,
        )
        .select("pid", "iid")
        .toPandas()
    )
    pairs = set(zip(got.pid.astype(int), got.iid.astype(int)))
    assert len(got) == len(pairs), "duplicate (point, interval) pairs emitted"
    assert pairs == _expected(pts, iv)


def test_range_join_plan_has_no_nested_loop(spark, range_case):
    pts, iv = range_case
    df = range_join(
        spark.createDataFrame(pts),
        spark.createDataFrame(iv),
        left_point="p",
        right_start="s",
        right_end="e",
        on=["k"],
        bucket_seconds=3600,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_range_join_rejects_ambiguous_columns(spark):
    pts = pd.DataFrame({"pid": [0], "k": [1], "p": [_ts(0)], "s": [_ts(0)]})
    iv = pd.DataFrame({"iid": [0], "k": [1], "s": [_ts(0)], "e": [_ts(10)]})
    with pytest.raises(ValueError, match="shared"):
        range_join(
            spark.createDataFrame(pts),
            spark.createDataFrame(iv),
            left_point="p", right_start="s", right_end="e", on=["k"],
        )

"""Quantile ops: exact percentile vs numpy ground truth, sketch rank
error bound, and the threshold filter's exact/approx agreement."""

import numpy as np
import pandas as pd
import pytest

from vyperdatum_spark.ops.quantiles import (
    group_quantiles,
    group_quantiles_approx,
    quantile_threshold_filter,
)


@pytest.fixture(scope="module")
def qdata():
    rng = np.random.default_rng(3)
    n = 20000
    return pd.DataFrame(
        {
            "g": rng.integers(0, 4, n).astype(np.int64),
            # lognormal: a heavy tail so p99 actually stresses the sketch
            "v": np.round(rng.lognormal(5, 1, n)).astype(np.int64),
        }
    )


def test_exact_matches_numpy_linear_interpolation(spark, qdata):
    got = (
        group_quantiles(spark.createDataFrame(qdata), ["g"], "v", [0.5, 0.99])
        .toPandas()
        .set_index("g")
        .sort_index()
    )
    for g, sub in qdata.groupby("g"):
        assert got.loc[g, "p50"] == np.percentile(sub.v, 50)
        assert got.loc[g, "p99"] == np.percentile(sub.v, 99)


def test_approx_rank_error_within_bound(spark, qdata):
    """approx_percentile guarantees rank error <= 1/accuracy; check
    the returned value's true rank against that bound (with a small
    slack for the <=-vs-< rank convention)."""
    accuracy = 1000
    got = (
        group_quantiles_approx(
            spark.createDataFrame(qdata), ["g"], "v", [0.5, 0.9], accuracy
        )
        .toPandas()
        .set_index("g")
        .sort_index()
    )
    for g, sub in qdata.groupby("g"):
        v = np.sort(sub.v.to_numpy())
        n = len(v)
        for q, col in ((0.5, "p50"), (0.9, "p90")):
            est = got.loc[g, col]
            rank = np.searchsorted(v, est, side="right") / n
            assert abs(rank - q) <= 1.0 / accuracy + 2.0 / n, (g, col, rank)


def test_threshold_filter_keeps_top_decile(spark, qdata):
    kept = (
        quantile_threshold_filter(
            spark.createDataFrame(qdata), ["g"], "v", 0.9
        )
        .toPandas()
    )
    for g, sub in qdata.groupby("g"):
        cut = np.percentile(sub.v, 90)
        exp = (sub.v >= cut).sum()
        assert (kept.g == g).sum() == exp


def test_threshold_filter_approx_close_to_exact(spark, qdata):
    exact = quantile_threshold_filter(
        spark.createDataFrame(qdata), ["g"], "v", 0.9
    ).count()
    approx = quantile_threshold_filter(
        spark.createDataFrame(qdata), ["g"], "v", 0.9,
        exact=False, accuracy=10000,
    ).count()
    # cutoffs may differ by at most the sketch rank error -> the kept
    # set sizes differ by at most ~rank_error * n per group
    assert abs(exact - approx) <= len(qdata) * (1 / 10000) * 4 + 8

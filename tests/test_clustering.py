"""Distributed k-means: oracle parity, convergence behavior,
empty-cluster rule, and plan shape (assignment must be shuffle-free)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from vyperdatum_spark.ops import clustering as C

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_assignment_matches_oracle(spark, embs):
    out = (
        C.kmeans_assign(embs)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    oracle = con.execute(C.kmeans_assign_sql()).df()
    assert len(out) == len(oracle)
    assert (out["cluster"].values == oracle["cluster"].values).all()
    assert (out["dist"].values == oracle["dist"].values).all()


def test_iterations_do_not_increase_distortion(spark, embs):
    """Lloyd's is monotone non-increasing in total squared distance
    (up to the 1e-6 centroid rounding)."""
    costs = []
    for iters in (1, 2, 3):
        df = C.kmeans_assign(embs, iters=iters).toPandas()
        costs.append(float((df["dist"] ** 2).sum()))
    assert costs[1] <= costs[0] + 1e-3
    assert costs[2] <= costs[1] + 1e-3


def test_clusters_are_populated(spark, embs):
    out = C.kmeans_assign(embs).toPandas()
    sizes = out["cluster"].value_counts()
    assert set(sizes.index) == set(range(1, C.K_CLUSTERS + 1))
    # synthetic embeddings are near-uniform: no degenerate clusters
    assert sizes.min() >= 5


def test_empty_cluster_keeps_previous_centroid(spark):
    """Two far-apart blobs, k=3: at most two clusters can capture
    points, the third must keep its seed centroid without crashing
    and remain empty in the final assignment."""
    rng = np.random.default_rng(3)
    a = rng.normal(0.0, 0.01, (30, 64))
    b = rng.normal(10.0, 0.01, (30, 64))
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(60, dtype=np.int64),
            "embedding": [r.astype(np.float32).tolist()
                          for r in np.vstack([a, b])],
        }
    )
    df = spark.createDataFrame(pdf)
    out = C.kmeans_assign(df, k=3, iters=3).toPandas()
    assert len(out) == 60
    # no cluster mixes the two far-apart blobs (a blob may be SPLIT
    # by two seeds — that's legal Lloyd's — but never merged)
    blob = out.assign(truth=out.vec_id < 30)
    mixing = blob.groupby("cluster")["truth"].nunique()
    assert (mixing == 1).all()


def test_final_assignment_plan_is_shuffle_free(spark, embs):
    out = C.kmeans_assign(embs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_trained_ivf_matches_oracle_and_finds_neighbors(spark, embs):
    """Train → index → search composition: IVF over the in-job-trained
    codebook matches the unrolled training+search SQL oracle and
    returns a full top-k per query with sane cosines."""
    from vyperdatum_spark.ops import similarity as S

    out = (
        S.ann_ivf_trained_topk(embs)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    oracle = (
        con.execute(S.ann_ivf_trained_topk_sql())
        .df()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, oracle, check_dtype=False)
    assert out.groupby("query_id").size().eq(3).all()
    assert out["cos_r"].between(-1.0, 1.0).all()

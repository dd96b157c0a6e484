"""PageRank: parity with a dense numpy power iteration (same
formula: uniform teleport + dangling-mass redistribution), rank-mass
invariant, and structural sanity on a planted hub."""

import numpy as np
import pandas as pd
import pytest

from vyperdatum_spark.ops.graph import pagerank

D = 0.85
N_ITER = 20


def _numpy_pagerank(n, edge_list, n_iter=N_ITER, d=D):
    """Dense power iteration replicating the engine's exact float ops,
    including the order-insensitive 1e-15 quantization of the two
    per-round sums (half-up rounding, exact integral-float sums)."""
    S = 1.0e15
    deg = np.zeros(n)
    for s, _ in edge_list:
        deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dangling = np.floor(r[deg == 0] * S + 0.5).sum() / S
        contrib_s = np.zeros(n)
        for s, t in edge_list:
            contrib_s[t] += np.floor((r[s] / deg[s]) * S + 0.5)
        contrib = contrib_s / S
        r = (1.0 - d) / n + d * (contrib + dangling / n)
    return r


@pytest.fixture(scope="module")
def graph_case():
    """180 nodes: modular pseudo-random edges, a planted hub (every
    10th node links to node 0), dangling nodes (every 17th node has
    its out-edges removed), self-loops, and duplicate edges (must be
    collapsed)."""
    n = 180
    edges = []
    for i in range(n):
        if i % 17 == 0:
            continue  # dangling
        edges += [(i, (3 * i + 1) % n), (i, (7 * i + 2) % n), (i, i // 2)]
        if i % 10 == 0:
            edges.append((i, 0))
    edges.append((5, 5))  # self-loop
    edges += [(4, 9), (4, 9)]  # duplicate
    dedup = sorted(set(edges))
    return n, dedup, edges


@pytest.fixture(scope="module")
def spark_ranks(spark, graph_case):
    _, _, raw = graph_case
    return (
        pagerank(
            spark.createDataFrame(
                pd.DataFrame(raw, columns=["src", "dst"]), "src long, dst long"
            ),
            n_iter=N_ITER,
        )
        .toPandas()
        .sort_values("node")
        .reset_index(drop=True)
    )


def test_pagerank_matches_numpy(graph_case, spark_ranks):
    n, dedup, _ = graph_case
    exp = _numpy_pagerank(n, dedup)
    # vertices = union of endpoints; here that is all n nodes
    assert len(spark_ranks) == n
    got = spark_ranks["rank"].to_numpy()
    want = exp[spark_ranks["node"].to_numpy()]
    # with the quantized sums every op is deterministic → bit-exact
    assert np.array_equal(got, want), np.abs(got - want).max()


def test_pagerank_registry_matches_duckdb_oracle(spark):
    """The round-5 upgrade: the unrolled recursive-CTE twin runs the
    identical 20 iterations and must match hash-exact (round 12)."""
    import duckdb

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    allq = {**entry.queries(), **entry.queries_extended()}
    allo = {**entry.oracle_sql(), **entry.oracle_sql_extended()}
    out = (
        allq["graph_pagerank"](spark, sf)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    exp = con.execute(allo["graph_pagerank"]).df()
    assert len(out) == len(exp)
    assert (out["doc_id"].values == exp["doc_id"].values).all()
    assert (out["rank"].values == exp["rank"].values).all()  # bit-exact


def test_pagerank_mass_and_hub(graph_case, spark_ranks):
    got = spark_ranks
    assert abs(got["rank"].sum() - 1.0) < 1e-9
    # the planted hub (node 0) out-ranks every non-hub node
    r0 = float(got.loc[got.node == 0, "rank"].iloc[0])
    assert (got[got.node != 0]["rank"] < r0).all()

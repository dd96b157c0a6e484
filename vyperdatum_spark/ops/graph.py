"""Distributed PageRank — the link-graph quality signal of web-corpus
curation (rank pages by incoming-link structure before sampling).

Power iteration as pure DataFrame ops: each round is one equi-join
(ranks ⋈ edges on src) plus one aggregation (sum of contributions by
dst) — the same two-shuffle-per-round shape as the connected-
components op (`ops/dedup.py::connected_components`), and like it:

- no driver-side graph, no per-row Python;
- ``localCheckpoint`` per round truncates lineage so the plan stays
  O(1) per iteration instead of growing by two joins each round (on
  a real cluster use ``setCheckpointDir`` + ``checkpoint`` for
  executor-fault-tolerant truncation);
- the edge table is shuffled onto its join key ONCE up front
  (``repartition(src)`` before the checkpoint) — every iteration's
  join then reuses that layout and only the rank side moves;
- dangling mass (nodes with no out-edges) comes back to the driver
  as a single scalar per round and re-enters as a literal — the
  standard uniform-redistribution treatment, needed for exact parity
  with the dense power-iteration definition.

Fixed iteration count rather than convergence detection: PageRank's
error contracts by the damping factor per round (‖r_k − r*‖₁ ≤ d^k),
so n_iter=20 at d=0.85 leaves ≤ 0.85^20 ≈ 3.9% of the initial gap
(n_iter=50 → 3e-4) — callers pick n_iter for the tolerance they need.

No SQL oracle (iterative float fixpoint — the driver gate records the
rows-only check); correctness is pinned against a dense numpy power
iteration in tests/test_graph.py, plus the rank-mass invariant
(sum == 1) every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 20,
    partitions: int | None = None,
) -> DataFrame:
    """PageRank over a directed edge list → (node, rank).

    Duplicate edges are collapsed (unweighted graph).  Vertices are
    the union of sources and destinations; dangling vertices (no
    out-edges) redistribute their mass uniformly each round.
    """
    spark = edges.sparkSession
    P = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .repartition(P, "src")
        .localCheckpoint()
    )
    verts = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # static per-node frame: (node, deg) with deg null for dangling
    base = (
        verts.join(outdeg, verts.node == outdeg.src, "left")
        .select("node", "deg")
        .repartition(P, "node")
        .localCheckpoint()
    )
    n = base.count()
    if n == 0:
        return base.select("node", F.lit(0.0).alias("rank"))

    teleport = (1.0 - damping) / n
    ranks = base.select("node", "deg", F.lit(1.0 / n).alias("rank"))

    for _ in range(n_iter):
        dangling = (
            ranks.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contribs = (
            ranks.filter(F.col("deg").isNotNull())
            .join(e, ranks.node == e.src, "inner")
            .select(F.col("dst"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            base.join(contribs, base.node == contribs.dst, "left")
            .select(
                "node",
                "deg",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.lit(dangling / n)
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", "rank")

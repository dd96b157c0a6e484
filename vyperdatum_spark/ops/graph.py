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

Determinism + the SQL oracle (round 5): the two per-round sums
(contribution sum per dst, global dangling mass) are the only
order-sensitive float ops in the loop — a plain ``sum(double)`` folds
in partition order, which varies with parallelism, so two runs (or
two engines) can differ in the last ulp and the divergence compounds
across rounds.  Both sums are therefore computed on a 1e-15 integer
grid: each term is ``floor(x · 10¹⁵ + 0.5) → bigint`` and the bigint
sum is exact and order-insensitive.  The quantizer is ``floor(x+0.5)``
— identical to half-up rounding for these strictly positive terms —
in BOTH engines, so the grid point is parity-by-construction (the
same float64 ``x·10¹⁵ + 0.5`` is computed on both sides, then
floored); it also stays a pure ``Math.floor`` inside whole-stage
codegen on the Spark side where ``round(double, 0)`` would allocate a
BigDecimal per edge per round.  Total rank mass is 1, so the scaled
sums are bounded by ~10¹⁵ at ANY graph size — no overflow — and the
quantization error (≤ 5e-16 per term) is far below the 0.85-damped
fixpoint tolerance.  Every remaining op is a scalar double expression
evaluated identically by Spark, DuckDB, and the numpy reference, so
``pagerank_doc_graph_sql`` (an unrolled recursive-CTE twin running
the identical 20 iterations) matches HASH-EXACT after the final
round(12) — upgrading the former rows-only driver check to a full
oracle gate; tests/test_graph.py additionally pins the numpy power
iteration with the same quantization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 1e-15 quantization grid for the order-insensitive scaled-integer
# sums (see module docstring): total mass is 1, so scaled totals fit
# comfortably in int64 at any graph size
SCALE = 1.0e15


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
            .agg(F.coalesce(
                # floor(x+0.5) == round-half-up for the strictly
                # positive ranks, without round(double, 0)'s
                # per-value BigDecimal (hot: per-vertex per-round)
                F.sum(F.floor(F.col("rank") * F.lit(SCALE) + F.lit(0.5))),
                F.lit(0).cast("long"),
            ))
            .collect()[0][0]
        ) / SCALE
        contribs = (
            ranks.filter(F.col("deg").isNotNull())
            .join(e, ranks.node == e.src, "inner")
            .select(
                F.col("dst"),
                # same floor(x+0.5) quantizer as the dangling sum
                # (hot: per-edge per-round)
                F.floor((F.col("rank") / F.col("deg")) * F.lit(SCALE)
                        + F.lit(0.5)).alias("cs"),
            )
            .groupBy("dst")
            .agg((F.sum("cs").cast("double") / F.lit(SCALE)).alias("contrib"))
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


def pagerank_doc_graph_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    damping: float = 0.85,
    n_iter: int = 20,
) -> str:
    """DuckDB oracle for ``queries.webtext.q_graph_pagerank``: the
    same deterministic synthetic link graph over the documents table
    (doc i → (3i+1) mod N, (7i+2) mod N, ⌊i/2⌋; i % 17 == 0 dangling)
    through an UNROLLED CTE chain running the identical ``n_iter``
    power iterations — every float op in the same order and type as
    the Spark loop (teleport = (1-d)/n_vertices, scaled-integer
    contribution/dangling sums on the 1e-15 grid, contrib + dangling/n
    inside the damping product).  Hash-exact after round(12)."""
    d = repr(float(damping))
    parts = [
        f"nd AS MATERIALIZED (SELECT count(*) AS n FROM {table})",
        (f"e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
         f"SELECT {id_col} AS src, unnest(["
         f"({id_col} * 3 + 1) % nd.n, ({id_col} * 7 + 2) % nd.n, "
         f"{id_col} // 2]) AS dst "
         f"FROM {table} CROSS JOIN nd WHERE {id_col} % 17 <> 0))"),
        ("verts AS (SELECT src AS node FROM e "
         "UNION SELECT dst AS node FROM e)"),
        "outdeg AS (SELECT src, count(*) AS deg FROM e GROUP BY src)",
        ("base AS MATERIALIZED (SELECT v.node, o.deg FROM verts v "
         "LEFT JOIN outdeg o ON v.node = o.src)"),
        "nv AS MATERIALIZED (SELECT count(*) AS n FROM base)",
        ("r0 AS MATERIALIZED (SELECT node, deg, 1.0 / nv.n AS rank "
         "FROM base CROSS JOIN nv)"),
    ]
    for t in range(1, n_iter + 1):
        p = t - 1
        parts.append(
            # floor(x+0.5): the same quantizer expression as the Spark
            # loop, so the grid point is parity-by-construction
            f"d{t} AS MATERIALIZED (SELECT coalesce(sum(CAST(floor(rank * 1e15 "
            f"+ 0.5) AS BIGINT)), 0) AS ds FROM r{p} WHERE deg IS NULL)"
        )
        parts.append(
            f"c{t} AS MATERIALIZED (SELECT e.dst, "
            f"CAST(sum(CAST(floor((rank / deg) * 1e15 + 0.5) AS BIGINT)) "
            f"AS DOUBLE) / 1e15 AS contrib "
            f"FROM r{p} r JOIN e ON r.node = e.src "
            f"WHERE r.deg IS NOT NULL GROUP BY e.dst)"
        )
        parts.append(
            f"r{t} AS MATERIALIZED (SELECT b.node, b.deg, "
            f"((1.0 - {d}) / nv.n) + {d} * (coalesce(c.contrib, 0.0) + "
            f"((CAST(d{t}.ds AS DOUBLE) / 1e15) / nv.n)) AS rank "
            f"FROM base b LEFT JOIN c{t} c ON b.node = c.dst "
            f"CROSS JOIN d{t} CROSS JOIN nv)"
        )
    return (
        "WITH " + ", ".join(parts) +
        f" SELECT node AS {id_col}, round(rank, 12) AS rank "
        f"FROM r{n_iter} ORDER BY node"
    )

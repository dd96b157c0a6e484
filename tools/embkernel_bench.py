"""Model-size scaling of the two embedding-scoring strategies
(VERDICT r4 "What's wrong #1" → round-5 fix evidence).

Times `ops.clustering.kmeans_assign` (iters=3 ⇒ two mean updates +
final assignment ⇒ three plan builds) on a FIXED row count while the
model size k×dim grows.  On the literal strategy each plan build
unrolls k×dim terms and re-compiles (janino) per Lloyd's iteration —
wall time grows with k×dim even though the data is constant.  On the
broadcast strategy plan size is O(1) in the model; wall time grows
only with the n×k×dim kernel compute.  Past the codegen budget the
literal strategy is not measured (it is the documented failure mode
the auto-pick routes around).

Writes BENCH/EMBKERNEL.md.  Usage: python tools/embkernel_bench.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from vyperdatum_spark.ops import clustering as C  # noqa: E402
from vyperdatum_spark.ops.embkernel import (  # noqa: E402
    LITERAL_DIM_BUDGET, LITERAL_TERM_BUDGET, pick_strategy)
from vyperdatum_spark.session import get_spark  # noqa: E402

N_ROWS = 20_000
CONFIGS = [  # (k, dim)
    (8, 64),
    (16, 64),
    (16, 128),
    (64, 256),
    (64, 768),
    (256, 768),
]
# measure the literal strategy ONCE past the budget to pin the cliff:
# janino fails on the nested fold and Spark silently falls back to
# interpreted evaluation — the degraded plan the auto-pick prevents
FORCE_LITERAL = {(16, 128)}


def synth(spark, n: int, dim: int):
    """Deterministic synthetic vectors, generated executor-side (no
    driver materialization): component j of row i is a hash-derived
    value in [-0.5, 0.5), rounded to 3 dp."""
    # cast to FLOAT: the real embeddings.parquet column is array<float>
    # — an uncast round(decimal) literal makes the whole array DECIMAL,
    # which benchmarks Arrow decimal-object conversion instead of the
    # shipped zero-copy float path
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(1, {dim}), "
            f"i -> cast(round(pmod(hash(id, i), 1000) / 1000.0 - 0.5, 3)"
            f" as float))"
        ).alias("embedding"),
    )


def main() -> None:
    spark = get_spark(app_name="embkernel-bench",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    rows = []
    for k, dim in CONFIGS:
        df = synth(spark, N_ROWS, dim).localCheckpoint()  # exclude gen cost
        for strat in ("literal", "broadcast"):
            # skip literal only past the COMPILE budget (it would fail
            # janino) — the perf-based auto rule routes to broadcast
            # well before that, but the point of this table is to
            # measure both strategies wherever literal still compiles
            compilable = (dim <= LITERAL_DIM_BUDGET
                          and k * dim <= LITERAL_TERM_BUDGET)
            if strat == "literal" and not compilable:
                if (k, dim) not in FORCE_LITERAL:
                    rows.append((k, dim, strat, None, "over codegen budget "
                                 "(auto routes to broadcast)"))
                    continue
            t0 = time.perf_counter()
            out = C.kmeans_assign(df, k=k, iters=3, dim=dim, strategy=strat)
            cnt = out.count()
            dt = time.perf_counter() - t0
            assert cnt == N_ROWS
            note = ("FORCED past budget: janino fails → interpreted "
                    "fallback" if (strat == "literal"
                                   and (k, dim) in FORCE_LITERAL) else "")
            rows.append((k, dim, strat, dt, note))
            print(f"k={k} dim={dim} {strat}: {dt:.2f}s", flush=True)

    lines = [
        "# Embedding-scoring strategy vs model size (round 5)",
        "",
        f"`kmeans_assign` (Lloyd's, iters=3) on a FIXED {N_ROWS:,}-row",
        "synthetic vector table while the model size k×dim grows.",
        "Literal strategy re-unrolls and re-compiles k×dim terms per",
        "iteration; broadcast strategy ships the codebook as a Spark",
        "broadcast and scores in an Arrow-batch numpy kernel with an",
        "O(1)-size plan.  Strategies are bit-identical",
        "(tests/test_embkernel.py parity tests); `auto` (the default)",
        "picks literal iff k×dim ≤ 256 — the measured per-ROW",
        "crossover (section below) — while explicit 'literal' is",
        "honored up to the compile budget (dim ≤ 64, k×dim ≤ 1024,",
        "the largest family measured to actually compile; the 16×128",
        "row below is the cliff: janino fails, Spark silently degrades",
        "to the interpreter, far slower than the kernel).  Literal is",
        "measured here wherever it compiles, auto-picked or not.",
        "Vectors are array<float> — the real embeddings.parquet",
        "element type (an earlier cut synthesized DECIMAL arrays,",
        "which benchmarked decimal-object conversion instead).",
        "",
        "| k | dim | k×dim | strategy | wall (s) | note |",
        "|---|-----|-------|----------|----------|------|",
    ]
    for k, dim, strat, dt, note in rows:
        t = f"{dt:.2f}" if dt is not None else "—"
        mark = " ←auto" if pick_strategy(k, dim) == strat else ""
        lines.append(f"| {k} | {dim} | {k * dim} | {strat}{mark} | {t} |"
                     f" {note} |")
    lit = {(k, d): dt for k, d, s, dt, _ in rows if s == "literal" and dt}
    bc = {(k, d): dt for k, d, s, dt, _ in rows if s == "broadcast" and dt}
    small, mid, cliff = (8, 64), (16, 64), (16, 128)
    if all(p in lit for p in (small, mid, cliff)) and cliff in bc:
        lines += [
            "",
            f"Literal wall time grows {lit[mid] / lit[small]:.1f}× from "
            f"k×dim={small[0] * small[1]} to {mid[0] * mid[1]} on identical "
            "rows (plan build + janino compile, 3× per run), then at "
            f"{cliff[0]}×{cliff[1]} the compile FAILS and the interpreted "
            f"fallback costs {lit[cliff] / bc[cliff]:.1f}× the broadcast "
            "kernel.  The kernel keeps running to k=256 × dim=768 — real "
            "training-pipeline model sizes — with wall time tracking the "
            "n×k×dim compute, not the plan size.",
        ]
    with open("/root/repo/BENCH/EMBKERNEL.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote BENCH/EMBKERNEL.md")


if __name__ == "__main__":
    main()

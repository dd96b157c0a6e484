"""Core-scaling of the broadcast Arrow-kernel embedding-scoring path.

The round-5 EMBKERNEL evidence proves the kernel's MODEL-size scaling
(plan cost O(1) in k×dim, runs at dim=768 where codegen cannot).
This tool pins the other axis the north rule cares about: does the
Arrow-batched pandas-UDF path itself scale with CORES?  Python
workers are separate processes (one per core in local mode), so the
expected answer is yes — but the pandas-UDF path adds Arrow
serialization plus python-worker fan-out that the pure-JVM paths
don't have, so it must be MEASURED, not assumed.

Protocol (same as bench.py run_scaling): fresh JVM per leg via
subprocess; alternating local[N]/local[4N] pairs; efficiency is the
median per-pair throughput ratio / 4 (cancels the sandbox's bursty
CPU steal).  Each child does one untimed warm-up pass then times the
median of 3 runs of a single fixed-codebook assignment over n rows
(sum-aggregated so nothing prunes), and prints a checksum so
cross-level bit-identity is asserted, not hoped.

Usage:
    python tools/embkernel_scaling.py             # full run, appends to BENCH/EMBKERNEL.md
    python tools/embkernel_scaling.py --child N   # one leg (internal)
    python tools/embkernel_scaling.py --crossover # re-pin the literal/broadcast
                                                  # per-row crossover on float input
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = 16_000_000
K, DIM = 8, 64            # past the 256-term per-row crossover → auto=broadcast
SCALE_N = 4
PAIRS = 3
FIXTURE = "spark-warehouse/embkernel_scaling_input.parquet"


def _synth(spark, n: int, dim: int, parts: int):
    from pyspark.sql import functions as F
    # cast to FLOAT: the real embeddings.parquet column is array<float>
    # — an uncast round(decimal) literal makes the whole array DECIMAL,
    # which benchmarks Arrow decimal-object conversion instead of the
    # shipped zero-copy float path
    return spark.range(0, n, 1, parts).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(1, {dim}), "
            f"i -> cast(round(pmod(hash(id, i), 1000) / 1000.0 - 0.5, 3)"
            f" as float))"
        ).alias("embedding"),
    )


def _build_fixture() -> None:
    """Write the deterministic parquet fixture once (float arrays —
    the real embeddings.parquet element type); legs SCAN it, the
    realistic unit of work (parquet decode + Arrow kernel), instead
    of a memory checkpoint that 16M×64 floats would overflow."""
    if os.path.isdir(FIXTURE):
        return
    from vyperdatum_spark.session import get_spark
    spark = get_spark(app_name="embkernel-scaling-fixture", cores=16,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    _synth(spark, N_ROWS, DIM, parts=64).write.parquet(FIXTURE)
    spark.stop()


def _child(cores: int) -> None:
    from pyspark.sql import functions as F

    from vyperdatum_spark.ops.clustering import seed_centroids, _cluster_col
    from vyperdatum_spark.session import get_spark

    spark = get_spark(
        app_name=f"embkernel-scaling-{cores}",
        cores=cores,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    df = spark.read.parquet(FIXTURE)
    cents = seed_centroids(df, K, "vec_id", "embedding")

    def once() -> tuple[float, int]:
        t0 = time.perf_counter()
        cluster, dist = _cluster_col(df, "embedding", cents,
                                     strategy="broadcast")
        row = (
            df.select(cluster.alias("c"), dist.alias("d"))
            .agg(F.sum("c").alias("cs"),
                 F.sum(F.floor(F.col("d") * 1e6 + 0.5)).alias("ds"))
            .collect()[0]
        )
        return time.perf_counter() - t0, int(row["cs"]) ^ int(row["ds"])

    once()                                   # warm-up (python workers, Arrow)
    runs = [once() for _ in range(3)]
    secs = statistics.median(r[0] for r in runs)
    cks = {r[1] for r in runs}
    assert len(cks) == 1, f"checksum unstable within a level: {cks}"
    print(json.dumps({
        "cores": cores, "rows": N_ROWS, "sec": round(secs, 2),
        "rows_per_sec": round(N_ROWS / secs, 1), "checksum": cks.pop(),
    }))
    spark.stop()


def _run_leg(cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", str(cores)],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(lines[-1])


def main() -> None:
    _build_fixture()
    n, n4 = SCALE_N, 4 * SCALE_N
    pair_results = []
    for i in range(PAIRS):
        lo = _run_leg(n)
        hi = _run_leg(n4)
        assert lo["checksum"] == hi["checksum"], (
            f"cross-level checksum mismatch: {lo['checksum']} vs {hi['checksum']}")
        pair_results.append((lo, hi))
        print(f"pair {i + 1}: local[{n}] {lo['sec']}s "
              f"local[{n4}] {hi['sec']}s "
              f"ratio {hi['rows_per_sec'] / lo['rows_per_sec']:.2f}", flush=True)
    ratios = sorted(h["rows_per_sec"] / l["rows_per_sec"]
                    for l, h in pair_results)
    eff = ratios[len(ratios) // 2] / 4.0
    best_lo = min(l["sec"] for l, _ in pair_results)
    best_hi = min(h["sec"] for _, h in pair_results)

    md = [
        "",
        "## r5 continuation — broadcast-kernel CORE scaling",
        "",
        "Model-size scaling above proves the kernel's plan cost is O(1)",
        "in k×dim; this section pins the CORE axis: the Arrow-batched",
        "pandas-UDF path adds python-worker fan-out + Arrow",
        "serialization that the pure-JVM paths don't have, so its N→4N",
        "behaviour is measured with the same fresh-JVM alternating-pairs",
        "protocol as BENCH/BASELINE.md (median per-pair throughput",
        f"ratio / 4, {PAIRS} pairs).  One fixed-codebook assignment pass",
        f"(k={K} × dim={DIM} = {K * DIM} terms) over a {N_ROWS:,}-row",
        "parquet fixture of array<float> vectors (the real",
        "embeddings.parquet element type — an earlier cut of this",
        "bench accidentally synthesized DECIMAL arrays and measured",
        "decimal-object conversion, 12× slower and overhead-bound),",
        "scan + score + sum-aggregate so nothing prunes; the",
        "cluster⊕quantized-distance checksum is asserted identical",
        "within and ACROSS levels (fold order is core-count-invariant).",
        "",
        "| level | wall (s) | rows/s |",
        "|-------|----------|--------|",
        f"| local[{n}]  (N)  | {best_lo} | {N_ROWS / best_lo:,.0f} |",
        f"| local[{n4}] (4N) | {best_hi} | {N_ROWS / best_hi:,.0f} |",
        "",
        f"pairs: " + ", ".join(
            f"{h['rows_per_sec'] / l['rows_per_sec']:.2f}×"
            for l, h in pair_results),
        f"**scaling efficiency (median ratio / 4): {eff:.3f}**",
        "",
    ]
    with open("BENCH/EMBKERNEL.md", "a") as f:
        f.write("\n".join(md))
    print(json.dumps({
        "scaling_efficiency": round(eff, 3),
        f"local{n}_sec": best_lo, f"local{n4}_sec": best_hi,
    }))


def crossover() -> None:
    """Per-row literal-vs-broadcast crossover on FLOAT input (the real
    embeddings.parquet element type) with the arrow_udf kernel — the
    numbers LITERAL_PERF_TERMS must be pinned to.  One fixed-codebook
    assignment pass over 8M rows at local[16], warm (median of 3),
    checksum asserted equal between strategies at every point."""
    import statistics as st

    from pyspark.sql import functions as F

    from vyperdatum_spark.ops.clustering import seed_centroids, _cluster_col
    from vyperdatum_spark.session import get_spark

    spark = get_spark(app_name="embkernel-crossover", cores=16,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    rows_out = []
    n = 8_000_000
    for k, dim in [(8, 16), (8, 32), (8, 64), (16, 64)]:
        df = _synth(spark, n, dim, parts=64).localCheckpoint()
        cents = seed_centroids(df, k, "vec_id", "embedding")
        per = {}
        for strat in ("literal", "broadcast"):
            def once():
                t0 = time.perf_counter()
                cl, d = _cluster_col(df, "embedding", cents, strat)
                r = (df.select(cl.alias("c"), d.alias("d"))
                     .agg(F.sum("c").alias("cs"),
                          F.sum(F.floor(F.col("d") * 1e6 + 0.5)).alias("ds"))
                     .collect()[0])
                return time.perf_counter() - t0, int(r["cs"]) ^ int(r["ds"])
            once()
            runs = [once() for _ in range(3)]
            per[strat] = (st.median(r[0] for r in runs), runs[0][1])
        assert per["literal"][1] == per["broadcast"][1], (k, dim, per)
        lit, bro = per["literal"][0], per["broadcast"][0]
        rows_out.append((k, dim, n, n / lit, n / bro))
        print(f"k={k} dim={dim} terms={k*dim}: literal {n/lit/1e6:.2f}M r/s"
              f"  broadcast {n/bro/1e6:.2f}M r/s", flush=True)
        df.unpersist()
    md = ["", "## r5 continuation — crossover re-pinned on float input "
          "(arrow_udf kernel)", "",
          "The first crossover table above was measured with the pandas",
          "kernel on a DECIMAL-array synth fixture (an uncast",
          "`round(decimal)` makes the whole array DECIMAL — nothing the",
          "real engine reads; embeddings.parquet is array<float>).  With",
          "the fixture fixed and the kernel on `arrow_udf` (Spark 4.1",
          "pyarrow in/out, zero-copy flatten), both paths re-measured at",
          "local[16], 8M rows, warm, checksums equal per point:", "",
          "| k | dim | k×dim | literal rows/s | broadcast rows/s | winner |",
          "|---|-----|-------|----------------|------------------|--------|"]
    for k, dim, nn, lps, bps in rows_out:
        win = ("literal" if lps > bps else "**broadcast**")
        md.append(f"| {k} | {dim} | {k*dim} | {lps/1e6:.2f}M | "
                  f"{bps/1e6:.2f}M | {win} {max(lps,bps)/min(lps,bps):.1f}× |")
    with open("BENCH/EMBKERNEL.md", "a") as f:
        f.write("\n".join(md) + "\n")
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        _child(int(sys.argv[2]))
    elif len(sys.argv) > 1 and sys.argv[1] == "--crossover":
        crossover()
    else:
        main()

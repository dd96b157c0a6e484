"""Benchmark runner.

Default mode: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Results are materialized through the noop sink so Catalyst cannot
prune the computed columns out of the timing.

Scaling mode (BASELINE.md two-cluster-size protocol):
    python bench.py --scaling
generates a seeded 2M-row pages table once, then runs the SAME
transform job in fresh subprocesses at local[8] and local[32],
reporting rows/s at both and the scaling efficiency
(= throughput ratio / core ratio); writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HEADLINE = [
    "geo_transform_mllw",
    "geo_sampled_mllw",
    "geo_tile_assign",
    "geo_outside_catzoc",
    "dedup_minhash_lsh",
    "dedup_lsh_verified",
    "dedup_simhash",
    "ann_bruteforce_topk",
    "text_quality",
    "doc_fingerprint",
    "rel_pricing_summary",
    "rel_nation_revenue",
    "rel_top_orders_per_cust",
]

BENCH_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "2000000"))
BENCH_DIR = "/tmp/vyperdatum_bench"


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_queries(sf_dir: str) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry
    from vyperdatum_spark.session import get_spark

    spark = get_spark(
        app_name="bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    qs = entry.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        _materialize(qs[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
    spark.stop()
    return timings


def ensure_bench_pages() -> str:
    """Generate the seeded 2M-row pages parquet once (shared input for
    both parallelism levels)."""
    path = os.path.join(BENCH_DIR, f"pages_{BENCH_PAGES}.parquet")
    if os.path.exists(os.path.join(path, "_SUCCESS")) or os.path.exists(path):
        return path
    os.makedirs(BENCH_DIR, exist_ok=True)
    from vyperdatum_spark.engine import datagen
    from vyperdatum_spark.session import get_spark

    spark = get_spark(
        app_name="bench-datagen",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    # generate in chunks to bound driver memory
    chunk = 250_000
    n_chunks = (BENCH_PAGES + chunk - 1) // chunk
    for c in range(n_chunks):
        n = min(chunk, BENCH_PAGES - c * chunk)
        pdf = datagen.pages_pdf(n, seed=42 + c)
        spark.createDataFrame(pdf, datagen.PAGES_SCHEMA).coalesce(4).write.mode(
            "append"
        ).parquet(path)
    spark.stop()
    return path


def scaling_child(pages_path: str, cores: int, reps: int = 3) -> None:
    """One scaling run: full pages → geoparse → transform job.

    The job runs ``reps`` times and the MEDIAN wall time is reported —
    this sandbox shows 3-10× run-to-run variance from environmental
    noise, and a single sample is meaningless."""
    from pyspark.sql import functions as F

    from vyperdatum_spark.engine import geoparse, transform as tx
    from vyperdatum_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling-{cores}",
        cores=cores,
        shuffle_partitions=max(cores, 8),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # scratch on tmpfs: this sandbox's /tmp disk serializes
            # concurrent writers and wrecks the 32-thread runs
            "spark.local.dir": "/dev/shm/spark-local",
        },
    )
    pages = spark.read.parquet(pages_path)
    n_rows = pages.count()  # warm the input (file listing, not timed)
    times = []
    for rep in range(reps + 1):  # rep 0 = untimed JIT/worker warm-up
        t0 = time.perf_counter()
        parsed = geoparse.geoparse(pages).filter(F.col("x").isNotNull())
        out = tx.transform_points(
            spark, parsed, "ellipse", "mllw", key_col="url"
        )
        _materialize(out)
        if rep > 0:
            times.append(time.perf_counter() - t0)
    times.sort()
    elapsed = times[len(times) // 2]
    print(json.dumps({"cores": cores, "rows": n_rows,
                      "sec": round(elapsed, 3),
                      "all_secs": [round(t, 3) for t in times],
                      "rows_per_sec": round(n_rows / elapsed, 1)}))
    spark.stop()


def _run_child(pages_path: str, cores: int) -> dict:
    cmd = [sys.executable, os.path.abspath(__file__), "--scaling-child",
           pages_path, str(cores)]
    out = subprocess.run(
        cmd, capture_output=True, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def run_scaling(pairs: int = 3) -> dict:
    """Alternating-pairs protocol: this sandbox has bursty external
    CPU steal (observed 8-22%), so a single sequential 8-then-32
    measurement is dominated by which burst each level landed in.
    Each pair runs local[8] then local[32] back-to-back; the
    efficiency estimate is the MEDIAN of per-pair throughput ratios,
    which cancels slow drift."""
    pages_path = ensure_bench_pages()
    pair_results = []
    for _ in range(pairs):
        r8 = _run_child(pages_path, 8)
        r32 = _run_child(pages_path, 32)
        pair_results.append((r8, r32))
    ratios = sorted(
        p32["rows_per_sec"] / p8["rows_per_sec"] for p8, p32 in pair_results
    )
    eff = ratios[len(ratios) // 2] / 4.0
    best8 = min(p8["sec"] for p8, _ in pair_results)
    best32 = min(p32["sec"] for _, p32 in pair_results)
    rows = pair_results[0][0]["rows"]
    report = {
        "rows": rows,
        "pairs": [
            {"local8_sec": p8["sec"], "local32_sec": p32["sec"],
             "ratio": round(p32["rows_per_sec"] / p8["rows_per_sec"], 2)}
            for p8, p32 in pair_results
        ],
        "local8_sec": best8,
        "local32_sec": best32,
        "local8_rows_per_sec": round(rows / best8, 1),
        "local32_rows_per_sec": round(rows / best32, 1),
        "scaling_efficiency": round(eff, 3),
    }
    _write_baseline_md(pages_path, report)
    return report


def _write_baseline_md(pages_path: str, r: dict) -> None:
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH/BASELINE — two-cluster-size scaling evidence\n\n"
            "Same job (pages → geoparse → ellipse→MLLW transform: PIP join,\n"
            "cogrouped tile bilinear, salted n_salt=8, precedence, uncertainty)\n"
            "on the same seeded input at two local parallelism levels\n"
            "(sandbox protocol for the N→4N executor criterion).\n\n"
            f"- input: `{pages_path}` — {r['rows']:,} pages "
            "(seeded generator, 20% skew cluster at one coordinate)\n"
            "- command per level (fresh JVM each):\n"
            "  `python bench.py --scaling-child <pages> 8|32`\n"
            "  (equivalent spark-submit: `spark-submit --master local[N] "
            "--py-files vyperdatum_spark.zip bench.py --scaling-child <pages> N`)\n"
            "- protocol: alternating 8/32 pairs (bursty external CPU steal on\n"
            "  this sandbox — efficiency is the median per-pair throughput\n"
            "  ratio / 4); each child does 1 untimed warm-up + median of 3\n\n"
            "| level | best wall sec | rows/s |\n|---|---|---|\n"
            f"| local[8]  (N)  | {r['local8_sec']} | {r['local8_rows_per_sec']:,} |\n"
            f"| local[32] (4N) | {r['local32_sec']} | {r['local32_rows_per_sec']:,} |\n\n"
            f"per-pair: {r['pairs']}\n\n"
            f"**Scaling efficiency = median(rows/s ratio) / 4 = "
            f"{r['scaling_efficiency']}** (target ≥ 0.8)\n"
        )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling-child":
        scaling_child(sys.argv[2], int(sys.argv[3]))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        report = run_scaling()
        print(json.dumps({"metric": "scaling", **report}))
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    timings = run_queries(sf_dir)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline query wall time (transform+dedup+ann+relational)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()

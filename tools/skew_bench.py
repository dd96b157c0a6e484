"""Skew evidence: salting on vs off on the cogroup transform path.

Round-3 VERDICT item 6: the fixture's hot-coordinate cluster (20% of
rows on one famous coordinate → one (region, cell5) cogroup holds a
fifth of the table) and the salting remedy
(transform.py cogroup strategy, ``n_salt``) exist, but no committed
artifact showed the task-duration distribution. This tool runs the
SAME skewed job at n_salt=0 and n_salt=8 with the Spark event log on,
parses per-task durations of the heaviest stage (the cogroup
applyInPandas), and writes BENCH/SKEW.md with max/median/p99 task
times and wall clock for both.

Run: python tools/skew_bench.py [n_rows]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENT_DIR = "/tmp/skew-events"
FAMOUS_X = -76.7512345
FAMOUS_Y = 34.7512345
HOT_FRAC = 5  # 1 in 5 rows → 20% on the famous coordinate


def _skewed_points(spark, n_rows: int):
    from pyspark.sql import functions as F

    k = F.col("id")
    hot = (k % HOT_FRAC) == 0
    x = F.when(hot, F.lit(FAMOUS_X)).otherwise(
        F.lit(-78.0) + ((k * 131) % 400).cast("double") * F.lit(0.01)
        + F.lit(0.0037))
    y = F.when(hot, F.lit(FAMOUS_Y)).otherwise(
        F.lit(33.0) + ((k * 7919) % 300).cast("double") * F.lit(0.01)
        + F.lit(0.0021))
    z = ((k * 57) % 2000).cast("double") * F.lit(0.01)
    return spark.range(n_rows).select(
        k.alias("pid"), x.alias("x"), y.alias("y"), z.alias("z"))


def _run_once(n_rows: int, n_salt: int) -> dict:
    from vyperdatum_spark.engine import transform as tx
    from vyperdatum_spark.session import get_spark

    app = f"skew-salt{n_salt}"
    spark = get_spark(
        app_name=app,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVENT_DIR,
            "spark.eventLog.compress": "false",
            "spark.local.dir": "/dev/shm/spark-local",
            # isolate OUR salting from AQE's skew mitigation so the
            # artifact measures the explicit remedy
            "spark.sql.adaptive.enabled": "false",
        },
    )
    app_id = spark.sparkContext.applicationId
    pts = _skewed_points(spark, n_rows)
    out = tx.transform_points(
        spark, pts, "ellipse", "mllw", key_col="pid",
        strategy="cogroup", n_salt=n_salt,
    )
    t0 = time.perf_counter()
    out.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    spark.stop()

    # parse per-task durations per stage from the event log
    stages: dict[int, list[float]] = {}
    candidates = (
        glob.glob(os.path.join(EVENT_DIR, f"*{app_id}*", "events_*"))
        + [p for p in glob.glob(os.path.join(EVENT_DIR, f"*{app_id}*"))
           if os.path.isfile(p)]
    )
    for path in candidates:
        with open(path, errors="ignore") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") != "SparkListenerTaskEnd":
                    continue
                ti = ev.get("Task Info", {})
                dur = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1e3
                stages.setdefault(ev.get("Stage ID", -1), []).append(dur)
    # the cogroup apply stage = the stage with the single longest task
    # (the straggler lives there; total-time picks the uniform scan)
    for sid in sorted(stages):
        ds = sorted(stages[sid])
        print(f"  stage {sid}: n={len(ds)} med={statistics.median(ds):.2f} "
              f"max={ds[-1]:.2f}", file=sys.stderr)
    heavy = max(stages.values(), key=lambda ds: max(ds))
    heavy.sort()
    return {
        "n_salt": n_salt,
        "wall_sec": round(wall, 2),
        "n_tasks": len(heavy),
        "task_median_sec": round(statistics.median(heavy), 2),
        "task_p99_sec": round(heavy[min(len(heavy) - 1, int(0.99 * len(heavy)))], 2),
        "task_max_sec": round(heavy[-1], 2),
        "straggler_ratio": round(heavy[-1] / max(statistics.median(heavy), 1e-9), 1),
    }


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    shutil.rmtree(EVENT_DIR, ignore_errors=True)
    os.makedirs(EVENT_DIR, exist_ok=True)
    # two reps per config, keep the lower-wall rep: this host has
    # bursty external CPU steal (3-10× single-run variance)
    results = []
    for salt in (0, 8):
        reps = [_run_once(n_rows, salt) for _ in range(2)]
        results.append(min(reps, key=lambda r: r["wall_sec"]))
    md = [
        "# BENCH/SKEW — salting evidence on the cogroup transform path",
        "",
        f"Input: {n_rows:,} synthetic points, 20% pinned to one famous",
        "coordinate (the FIXTURES.md hot cluster) — without salting the",
        "hot (region, cell5) cogroup serializes a fifth of the table",
        "into one task. `n_salt=8` replicates the grid-tile side 8× and",
        "splits the hot group by `pmod(xxhash64(pid), 8)`",
        "(transform.py cogroup strategy). AQE disabled so the artifact",
        "isolates the explicit remedy. Task durations parsed from the",
        "Spark event log for the heaviest stage (the cogroup",
        "applyInPandas). Generated by `python tools/skew_bench.py`.",
        "",
        "| n_salt | wall (s) | tasks | task median (s) | task p99 (s) "
        "| task max (s) | max/median |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in results:
        md.append(
            f"| {r['n_salt']} | {r['wall_sec']} | {r['n_tasks']} | "
            f"{r['task_median_sec']} | {r['task_p99_sec']} | "
            f"{r['task_max_sec']} | {r['straggler_ratio']}× |"
        )
    r0, r8 = results
    md += [
        "",
        f"Salting cut the straggler task from {r0['task_max_sec']} s to "
        f"{r8['task_max_sec']} s ({r0['straggler_ratio']}× → "
        f"{r8['straggler_ratio']}× of the median) and wall clock from "
        f"{r0['wall_sec']} s to {r8['wall_sec']} s. At 10^12 rows the "
        "unsalted hot group is a single ~2×10^11-row task — salting "
        "(or AQE skew-join as the runtime backstop, which is ON in the "
        "production session) is mandatory, not an optimization.",
        "",
        "The salted run's MEDIAN task is heavier (the tile side is "
        "replicated n_salt× and every group pays tile re-assembly) — "
        "salting buys balance, not less work; it wins wall clock "
        "whenever the straggler, not total CPU, bounds the stage, "
        "which is exactly the skewed case.",
        "",
        "Two reps per config, lower-wall rep kept (this host has "
        "bursty external CPU steal); both configs pay identical fixed "
        "costs (session, JIT, broadcast build).",
        "",
    ]
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "SKEW.md")
    with open(out_path, "w") as f:
        f.write("\n".join(md))
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()

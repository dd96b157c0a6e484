"""Bucket-level checkpoint/resume + per-partition lineage & metrics,
on the SNAPSHOT TABLE layer (sources/tables.py — the Iceberg contract).

The north_rule requires runs to be resumable from checkpoint with
per-partition lineage and row/error metrics. The reference has no
analog (single-process batch); we implement **batch checkpointing**
(SURVEY.md §2.8): the driving table is split into deterministic hash
buckets (``pmod(xxhash64(key), n_buckets)``); each bucket is
transformed and committed as ONE snapshot whose manifest atomically
carries the data files, the bucket-done marker, AND the per-partition
metrics (as snapshot summary properties — exactly how Iceberg
consumers commit watermarks with their rows). A restarted run lists
committed buckets from the manifests and processes only the rest, so
completed work is never recomputed and the final output is identical
to an uninterrupted run. Time travel falls out for free: reading the
output table AS OF a pre-crash snapshot shows exactly the buckets
committed before the crash.

Crash-safety contract (single atomic pointer, tables._commit): a
crash before a bucket's manifest commit leaves at most an orphan
(unreferenced) data dir — the bucket replays idempotently; a crash
after the commit resumes past it. Data, metrics, and the checkpoint
marker can never disagree because they are one commit.

Buckets are coarse units of restartability (10^12 rows / 1024 buckets
≈ 1 B rows each, internally fully parallel); per-partition metrics
inside a bucket come from ``spark_partition_id`` aggregation (A6,
reference logs only a row count — core.py:459). Lineage columns
(region_id, cell5, pipeline_str) ride on the output rows themselves
(include_lineage=True).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import tables

METRICS_SCHEMA = (
    "run_id string, bucket int, partition_id int, rows_in long, "
    "rows_out long, rows_error long, rows_nocoverage long"
)


def bucket_col(key, n_buckets: int):
    return F.pmod(F.xxhash64(key), F.lit(n_buckets)).cast("int")


def _data_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "data")


def completed_buckets(spark: SparkSession, out_dir: str, run_id: str) -> set[int]:
    """Buckets whose snapshot committed (manifest scan, no Spark job)."""
    done = set()
    for sid in tables.snapshot_ids(_data_dir(out_dir)):
        p = tables.snapshot_meta(_data_dir(out_dir), sid).get("properties", {})
        if p.get("run_id") == run_id and p.get("status") == "done":
            done.add(int(p["bucket"]))
    return done


def stage_buckets(
    spark: SparkSession,
    points: DataFrame,
    out_dir: str,
    run_id: str,
    key_col: str,
    n_buckets: int,
) -> DataFrame:
    """ONE pass over the driving table: hash-bucket and materialize as
    a snapshot table partitioned by bucket. Every later per-bucket
    read is partition-PRUNED to its own directory — a resumed run
    never rescans completed data. Idempotent per run_id: an existing
    staging snapshot for this run is re-read via time travel."""
    stage_dir = os.path.join(out_dir, "stage")
    for sid in tables.snapshot_ids(stage_dir):
        meta = tables.snapshot_meta(stage_dir, sid)
        if meta.get("properties", {}).get("run_id") == run_id:
            return tables.read_table(spark, stage_dir, as_of=sid)
    staged = points.withColumn("bucket", bucket_col(F.col(key_col), n_buckets))
    sid = tables.write_table(
        staged, stage_dir, mode="overwrite", partition_by=("bucket",),
        properties={"run_id": run_id, "n_buckets": str(n_buckets)},
    )
    return tables.read_table(spark, stage_dir, as_of=sid)


def run_with_checkpoint(
    spark: SparkSession,
    points: DataFrame,
    transform_fn,
    out_dir: str,
    run_id: str,
    key_col: str = "pid",
    n_buckets: int = 8,
    fail_after: int | None = None,
) -> int:
    """Transform ``points`` bucket-by-bucket with one atomic snapshot
    commit per bucket (data + metrics + done-marker in one manifest).

    transform_fn: (spark, bucket_df) -> DataFrame (must keep key_col,
    and produce z_out/covered for metrics).
    fail_after: test hook — raise after committing N buckets (simulated
    crash for the resume-idempotence test, FIXTURES.md §6).
    Returns the number of buckets processed in THIS invocation.
    """
    done = completed_buckets(spark, out_dir, run_id)
    if len(done) >= n_buckets:
        return 0
    # a NEW run over an out_dir holding a previous run's output must
    # not layer on top of it (append would silently double every row
    # in read_output): the new run's first commit OVERWRITES, dropping
    # the stale dirs from the current snapshot (they stay on disk for
    # time travel). A resume of the SAME run keeps appending.
    other_runs = any(
        tables.snapshot_meta(_data_dir(out_dir), sid)
        .get("properties", {}).get("run_id") not in (None, run_id)
        for sid in tables.snapshot_ids(_data_dir(out_dir))
    )
    fresh_run = not done and other_runs
    staged = stage_buckets(spark, points, out_dir, run_id, key_col, n_buckets)
    processed = 0
    for b in range(n_buckets):
        if b in done:
            continue
        # partition-pruned: touches only .../bucket=b
        part = staged.filter(F.col("bucket") == b).drop("bucket")
        result = transform_fn(spark, part)
        result = result.withColumn("_pid_", F.spark_partition_id())
        result.persist()
        try:
            # metrics BEFORE the data commit so they land in the same
            # manifest; tiny (one row per compute partition)
            m_rows = (
                result.groupBy("_pid_")
                .agg(
                    F.count("*").alias("rows_in"),
                    F.sum(F.col("z_out").isNotNull().cast("long")).alias("rows_out"),
                    F.sum(
                        (F.col("x").isNull() | F.col("y").isNull()).cast("long")
                    ).alias("rows_error"),
                    F.sum((~F.col("covered")).cast("long")).alias("rows_nocoverage"),
                )
                .collect()
            )
            metrics = [
                {
                    "partition_id": r["_pid_"],
                    "rows_in": r["rows_in"],
                    "rows_out": int(r["rows_out"] or 0),
                    "rows_error": int(r["rows_error"] or 0),
                    "rows_nocoverage": int(r["rows_nocoverage"] or 0),
                }
                for r in m_rows
            ]
            rows_out = sum(m["rows_out"] for m in metrics)
            mode = "overwrite" if (fresh_run and processed == 0) else "append"
            tables.write_table(
                result.drop("_pid_"), _data_dir(out_dir), mode=mode,
                properties={
                    "run_id": run_id,
                    "bucket": str(b),
                    "status": "done",
                    "rows_out": str(rows_out),
                    "metrics": json.dumps(metrics),
                },
            )
        finally:
            result.unpersist()
        processed += 1
        if fail_after is not None and processed >= fail_after:
            raise RuntimeError(f"simulated failure after {processed} buckets")
    return processed


def read_output(spark: SparkSession, out_dir: str,
                as_of: int | None = None) -> DataFrame:
    """Current output — or a time-travel view of any earlier commit."""
    return tables.read_table(spark, _data_dir(out_dir), as_of=as_of)


def read_metrics(spark: SparkSession, out_dir: str,
                 run_id: str | None = None) -> DataFrame:
    """Per-(bucket, partition) metrics, reassembled from the snapshot
    summary properties (driver-side manifest scan, no data read)."""
    rows = []
    for sid in tables.snapshot_ids(_data_dir(out_dir)):
        p = tables.snapshot_meta(_data_dir(out_dir), sid).get("properties", {})
        if p.get("status") != "done":
            continue
        if run_id is not None and p.get("run_id") != run_id:
            continue
        for m in json.loads(p.get("metrics", "[]")):
            rows.append((
                p["run_id"], int(p["bucket"]), int(m["partition_id"]),
                int(m["rows_in"]), int(m["rows_out"]),
                int(m["rows_error"]), int(m["rows_nocoverage"]),
            ))
    return spark.createDataFrame(rows, METRICS_SCHEMA)

"""Bucket-level checkpoint/resume + per-partition lineage & metrics.

The north_rule requires runs to be resumable from checkpoint with
per-partition lineage and row/error metrics. The reference has no
analog (single-process batch); we implement **batch checkpointing**
(SURVEY.md §2.8): the driving table is split into deterministic hash
buckets (``pmod(xxhash64(key), n_buckets)``); each bucket is
transformed and committed as its own parquet partition plus one
checkpoint row and one metrics row. A restarted run lists committed
buckets and processes only the rest — an anti-join on the checkpoint
table — so completed work is never recomputed and the final output is
identical to an uninterrupted run.

Buckets are coarse units of restartability (10^12 rows / 1024 buckets
≈ 1 B rows each, internally fully parallel); per-partition metrics
inside a bucket come from ``spark_partition_id`` aggregation (A6,
reference logs only a row count — core.py:459).

Schemas (FIXTURES.md §6):
  checkpoints(run_id, bucket, status, rows_out, updated_ts)
  metrics(run_id, bucket, partition_id, rows_in, rows_out, rows_error,
          rows_nocoverage)
Lineage columns (region_id, cell5, pipeline_str) ride on the output
rows themselves (include_lineage=True).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bucket_col(key, n_buckets: int):
    return F.pmod(F.xxhash64(key), F.lit(n_buckets)).cast("int")


def completed_buckets(spark: SparkSession, ckpt_dir: str, run_id: str) -> set[int]:
    path = os.path.join(ckpt_dir, "checkpoints")
    try:
        df = spark.read.parquet(path)
    except Exception:
        return set()
    rows = (
        df.filter((F.col("run_id") == run_id) & (F.col("status") == "done"))
        .select("bucket")
        .distinct()
        .collect()
    )
    return {r["bucket"] for r in rows}


def stage_buckets(
    spark: SparkSession,
    points: DataFrame,
    out_dir: str,
    run_id: str,
    key_col: str,
    n_buckets: int,
) -> DataFrame:
    """ONE pass over the driving table: hash-bucket and materialize
    partitioned by bucket. Every later per-bucket read is partition-
    PRUNED to its own directory — a resumed run never rescans
    completed data (round 1 filtered ``pmod(xxhash64(...)) = b`` over
    the raw source per bucket: 1024 buckets ⇒ 1024 full scans of a
    100-TB table; this is the fix). Idempotent per run_id: an existing
    staging (with _SUCCESS) is reused."""
    stage_path = os.path.join(out_dir, "stage", run_id)
    if not os.path.exists(os.path.join(stage_path, "_SUCCESS")):
        (
            points.withColumn("bucket", bucket_col(F.col(key_col), n_buckets))
            .write.partitionBy("bucket")
            .mode("overwrite")
            .parquet(stage_path)
        )
    return spark.read.parquet(stage_path)


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
    """Transform ``points`` bucket-by-bucket with commit-per-bucket.

    transform_fn: (spark, bucket_df) -> DataFrame (must keep key_col,
    and produce z_out/covered for metrics).
    fail_after: test hook — raise after committing N buckets (simulated
    crash for the resume-idempotence test, FIXTURES.md §6).
    Returns the number of buckets processed in THIS invocation.

    Crash-safety contract: data writes are per-bucket overwrite,
    metrics writes are per-(run_id, bucket) overwrite, and the
    checkpoint row commits LAST — a crash anywhere in between replays
    the bucket idempotently (no duplicate data, no double-counted
    metrics)."""
    ckpt_path = os.path.join(out_dir, "checkpoints")
    metrics_path = os.path.join(out_dir, "metrics")
    data_path = os.path.join(out_dir, "data")

    done = completed_buckets(spark, out_dir, run_id)
    if len(done) >= n_buckets:
        return 0
    staged = stage_buckets(spark, points, out_dir, run_id, key_col, n_buckets)
    processed = 0
    for b in range(n_buckets):
        if b in done:
            continue
        # partition-pruned: touches only stage/<run_id>/bucket=b
        part = staged.filter(F.col("bucket") == b).drop("bucket")
        result = transform_fn(spark, part)
        result = result.withColumn("_pid_", F.spark_partition_id())
        result.persist()
        try:
            (
                result.drop("_pid_")
                .write.mode("overwrite")
                .parquet(os.path.join(data_path, f"bucket={b}"))
            )
            m = (
                result.groupBy("_pid_")
                .agg(
                    F.count("*").alias("rows_in"),
                    F.sum(F.col("z_out").isNotNull().cast("long")).alias("rows_out"),
                    F.sum(
                        (F.col("x").isNull() | F.col("y").isNull()).cast("long")
                    ).alias("rows_error"),
                    F.sum((~F.col("covered")).cast("long")).alias("rows_nocoverage"),
                )
                .select(
                    F.col("_pid_").alias("partition_id"),
                    "rows_in",
                    "rows_out",
                    "rows_error",
                    "rows_nocoverage",
                )
            )
            # tiny (one row per compute partition): land on the driver
            # once — the sum replaces a second full pass for count(),
            # and the write is keyed by (run_id, bucket) dirs with
            # overwrite so a replayed bucket cannot double-count
            m_rows = m.collect()
            rows_out = sum(r["rows_out"] or 0 for r in m_rows)
            spark.createDataFrame(
                m_rows,
                "partition_id int, rows_in long, rows_out long, "
                "rows_error long, rows_nocoverage long",
            ).write.mode("overwrite").parquet(
                os.path.join(metrics_path, f"run_id={run_id}", f"bucket={b}")
            )
        finally:
            result.unpersist()
        ck = spark.createDataFrame(
            [(run_id, b, "done", rows_out, float(time.time()))],
            "run_id string, bucket int, status string, rows_out long, updated_ts double",
        )
        ck.write.mode("append").parquet(ckpt_path)
        processed += 1
        if fail_after is not None and processed >= fail_after:
            raise RuntimeError(f"simulated failure after {processed} buckets")
    return processed


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "data"))

"""Incremental page-batch ingestion via Structured Streaming.

The reference is strictly batch (SURVEY.md §2.8); the engine's
primary resumability story is bucket checkpointing
(engine/checkpoint.py). This module is the OPTIONAL incremental
path for ongoing crawls: new page files land in a directory, a
``Trigger.AvailableNow`` stream drains them through the same
transform plan via ``foreachBatch``, and Spark's streaming checkpoint
(source offsets) makes re-runs exactly-once per input file — the
streaming analog of the batch anti-join resume.

Design notes for scale:
- ``foreachBatch`` reuses the full batch transform (one code path,
  no semantic drift between batch and streaming).
- ``maxFilesPerTrigger`` bounds micro-batch size so executor memory
  is independent of backlog length.
- watermarks/session windows are intentionally absent — nothing in
  the reference maps to event-time aggregation; this is a pipeline,
  not an aggregator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine import geoparse, transform as tx
from ..engine.datagen import PAGES_SCHEMA


def stream_transform_pages(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    from_datum: str = "ellipse",
    to_datum: str = "mllw",
    max_files_per_trigger: int | None = None,
):
    """Drain all currently-available page files through the transform
    and append results to ``out_dir``. Returns the finished query.

    Re-invoking after new files arrive processes ONLY the new files
    (offsets live in checkpoint_dir) — idempotent per input file.
    """
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(in_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        parsed = geoparse.geoparse(batch_df).filter(F.col("x").isNotNull())
        out = tx.transform_points(
            batch_df.sparkSession, parsed, from_datum, to_datum, key_col="url"
        )
        # foreachBatch is only at-least-once: a crash between this
        # write and the offset commit replays the micro-batch. Keying
        # the output by batch_id with dynamic-partition overwrite makes
        # the replay overwrite its own partition instead of appending
        # duplicates — idempotent, hence exactly-once end to end.
        (
            out.select(
                "url", "warc_ts", "text", "lang", "x", "y", "z",
                "cell5", "region_id", "sep", "z_out", "unc", "covered",
            )
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    q = (
        pages.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q

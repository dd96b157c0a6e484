"""Watermarked event-time aggregation over the incremental page stream.

The reference is batch-only; the graft's ingest side is a crawl, and a
crawl monitor wants per-window counts that are CORRECT under
out-of-order arrival. This is the standard Structured Streaming shape:
event-time window + watermark bounding state, append output mode so a
window only emits once it can no longer change.

Scale notes:
- state size is O(open windows × group keys), bounded by the watermark
  horizon — independent of stream length;
- the shuffle key is (window, lang): low cardinality, no skew concern;
- ``Trigger.AvailableNow`` drains the backlog incrementally with the
  same checkpointed offsets as the ingest path (exactly-once per input
  file).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.datagen import PAGES_SCHEMA


def stream_hourly_counts(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    window: str = "1 hour",
):
    """Drain available page files into per-(hour, lang) counts.

    Append mode + watermark: a window's row is emitted exactly once,
    when the watermark passes its end — late rows beyond the watermark
    are dropped (counted upstream by the ingest metrics), so re-runs
    and stragglers cannot double-count a finalized window.
    """
    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(in_dir)
    agg = (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("lang"))
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.octet_length("html").cast("long")).alias("html_bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang", "n_pages", "html_bytes",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q

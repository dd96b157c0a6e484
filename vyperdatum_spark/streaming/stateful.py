"""Custom stateful streaming operator: cross-batch URL dedup.

A crawl re-fetches URLs across micro-batches; the training pipeline
wants each url exactly once downstream. This is the
``applyInPandasWithState`` shape from the brief — keyed state (url →
first_seen, n_fetches) that survives micro-batches via the state
store, emitting a row only the first time a key appears.

Scale notes:
- state is per-url and grows with distinct urls: production bounds it
  with a timeout (set ``state_ttl``) so stale urls age out — the state
  store then holds only the active crawl frontier;
- the groupBy(url) shuffle is the one exchange; within a batch the
  kernel sees each url's rows as ONE pandas group (vectorized, no
  per-row Python outside the group loop Spark itself drives).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

from ..engine.datagen import PAGES_SCHEMA

OUT_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("first_ts", TimestampType()),
    StructField("text", StringType()),
    StructField("n_in_batch", LongType()),
])

STATE_SCHEMA = StructType([
    StructField("n_fetches", LongType()),
])


def _make_dedup_fn(state_ttl: str | None):
    """Build the keyed-state kernel. With ``state_ttl`` set, each
    update arms a processing-time timeout; when it fires (url idle for
    the TTL) the state is removed so the store holds only the active
    crawl frontier — a url re-fetched after aging out is emitted again
    (the documented trade of bounded state)."""

    def _dedup_fn(key, pdf_iter, state: GroupState):
        url = key[0]
        if state.hasTimedOut:
            # timeout invocation carries no rows: age the key out
            state.remove()
            return iter(())
        n = 0
        first_row = None
        for pdf in pdf_iter:
            n += len(pdf)
            if first_row is None and len(pdf):
                first = pdf.sort_values("warc_ts").iloc[0]
                first_row = (url, first["warc_ts"], first["text"])
        already = state.exists
        if already:
            (seen,) = state.get
            state.update((seen + n,))
        else:
            state.update((n,))
        if state_ttl:
            state.setTimeoutDuration(state_ttl)
        if already:
            return iter(())  # already emitted in an earlier batch
        return iter([pd.DataFrame({
            "url": [first_row[0]],
            "first_ts": [first_row[1]],
            "text": [first_row[2]],
            "n_in_batch": [n],
        })])

    return _dedup_fn


# default kernel (no TTL) — kept importable for tests
_dedup_fn = _make_dedup_fn(None)


def stream_dedup_urls(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    state_ttl: str | None = None,
):
    """Drain available page files, emitting each url exactly once
    across ALL micro-batches (keyed state store)."""
    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(in_dir)
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if state_ttl
               else GroupStateTimeout.NoTimeout)
    deduped = (
        pages.groupBy("url")
        .applyInPandasWithState(
            _make_dedup_fn(state_ttl), OUT_SCHEMA, STATE_SCHEMA,
            "append", timeout,
        )
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


FIRST_OUT_SCHEMA = StructType([
    StructField("key", StringType()),
    StructField("first_id", LongType()),
    StructField("n_in_batch", LongType()),
])


def _first_fn(key, pdf_iter, state: GroupState):
    """Emit (key, min id, row count) the first batch the key appears;
    later batches only bump state — same state-store mechanics as the
    URL dedup, over a generic (key, id) projection."""
    n = 0
    best = None
    for pdf in pdf_iter:
        n += len(pdf)
        if len(pdf):
            m = int(pdf["_id"].min())
            best = m if best is None else min(best, m)
    if state.exists:
        (seen,) = state.get
        state.update((seen + n,))
        return iter(())
    state.update((n,))
    return iter([pd.DataFrame({
        "key": [key[0]], "first_id": [best], "n_in_batch": [n],
    })])


CAPTURE_OUT_SCHEMA = StructType([
    StructField("canonical_url", StringType()),
    StructField("first_id", LongType()),
    StructField("first_ts", LongType()),
    StructField("text_out", StringType()),
    StructField("n_in_batch", LongType()),
])


def _first_capture_fn(key, pdf_iter, state: GroupState):
    """First capture per canonical URL with its extracted-text payload:
    within the introducing batch the earliest (ts, id) row wins; later
    batches only bump the fetch counter. Input groups carry columns
    (_ts, _id, text_out)."""
    n = 0
    best = None  # (ts, id, text_out)
    for pdf in pdf_iter:
        n += len(pdf)
        if len(pdf):
            row = pdf.sort_values(["_ts", "_id"]).iloc[0]
            cand = (int(row["_ts"]), int(row["_id"]), row["text_out"])
            best = cand if best is None or cand[:2] < best[:2] else best
    if state.exists:
        (seen,) = state.get
        state.update((seen + n,))
        return iter(())
    state.update((n,))
    return iter([pd.DataFrame({
        "canonical_url": [key[0]],
        "first_id": [best[1]],
        "first_ts": [best[0]],
        "text_out": [best[2]],
        "n_in_batch": [n],
    })])


def stream_first_capture(rows, url_col: str = "canonical_url",
                         ts_col: str = "warc_ts", id_col: str = "doc_id",
                         text_col: str = "text_out"):
    """Attach the keyed-state first-capture operator to a (possibly
    streaming) DataFrame already carrying the canonical URL and the
    extracted text: one groupBy(canonical_url) shuffle, state O(keys)."""
    from pyspark.sql import functions as F

    return (
        rows.select(
            F.col(url_col).alias("canonical_url"),
            F.col(ts_col).alias("_ts"),
            F.col(id_col).alias("_id"),
            F.col(text_col).alias("text_out"),
        )
        .groupBy("canonical_url")
        .applyInPandasWithState(
            _first_capture_fn, CAPTURE_OUT_SCHEMA, STATE_SCHEMA, "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def stream_first_per_key(
    spark: SparkSession,
    table_dir: str,
    work_dir: str,
    key_col: str,
    id_col: str,
) -> "DataFrame":
    """applyInPandasWithState over a drained static table: per key,
    the minimum id and the row count of the batch that introduced the
    key. On a single-batch drain (one source file) this equals the
    batch aggregate MIN(id)/COUNT(*) per key — closed-form, so the
    stateful-operator machinery (keyed state store, append emission)
    is oracle-checkable; cross-batch behavior is covered by the URL
    dedup pytest."""
    from pyspark.sql import functions as F

    from .windows import drain_to_parquet

    def build(rows):
        return (
            rows.select(F.col(key_col).alias("key"), F.col(id_col).alias("_id"))
            .groupBy("key")
            .applyInPandasWithState(
                _first_fn, FIRST_OUT_SCHEMA, STATE_SCHEMA, "append",
                GroupStateTimeout.NoTimeout,
            )
        )

    return drain_to_parquet(spark, table_dir, work_dir, build)

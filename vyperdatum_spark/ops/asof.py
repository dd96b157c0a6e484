"""Distributed as-of (point-in-time) join.

Spark has no native ASOF JOIN (pandas ``merge_asof`` / DuckDB
``ASOF JOIN`` / kdb+ ``aj``).  A naive rewrite — non-equi range join
``l.key = r.key AND r.t <= l.t`` + row_number — explodes to
O(|left| x avg right rows per key) intermediate rows before the
window prunes them, which is exactly what kills it at crawl scale
(every page event joined against every earlier capture of its host).

``asof_join`` is the scalable union-and-carry rewrite: tag both
sides, union on the shared key, order each key's rows by
(time, side-tag, tie-break) in ONE cumulative window, and carry the
most recent right-side payload forward with last(..., ignoreNulls).
No join node at all; one shuffle on the key; intermediate size is
|left| + |right| exactly.

``asof_join_bucketed`` is the skew-safe two-phase variant for hot
keys (a single window partition = all of one key's rows; at 10^12
rows a hot host would concentrate on one task).  Phase 1 windows only
within (key, time-bucket); phase 2 computes a per-(key, bucket)
last-payload summary — |keys| x |buckets| rows, tiny — carries it
across buckets with a cheap window, and seeds each bucket via an
equi-join.  The largest window partition is bounded by one key's rows
in one bucket, tunable via ``bucket_seconds``.

This operator has no vyperdatum analog — it serves the webtext/event
side of the graft (latest capture before a timestamp, point-in-time
feature joins for training-data assembly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RESERVED = ("__k", "__t", "__side", "__tie", "__p", "__carry", "__b")


def _check_names(left: DataFrame, payload: list[str]) -> None:
    clash = set(left.columns) & set(payload)
    if clash:
        raise ValueError(f"payload columns collide with left columns: {sorted(clash)}")
    for c in (*left.columns, *payload):
        if c in _RESERVED:
            raise ValueError(f"column name {c!r} is reserved by asof_join")


def _tagged_union(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    tie: str | None,
) -> tuple[DataFrame, list[str]]:
    """Union of both sides on (__k, __t, __side, __tie, __p, left cols).

    Right rows carry their payload in the __p struct; left rows carry
    null __p plus their own columns.  Ordering (__t asc, __side asc,
    __tie asc) puts, for any left row, every eligible right row
    (right_time <= left_time, inclusive because __side 0 < 1) before
    it, latest-then-greatest-tie last.
    """
    lcols = list(left.columns)
    _check_names(left, payload)
    tie_expr = F.col(tie) if tie is not None else F.lit(0)
    r = right.select(
        F.col(right_on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        tie_expr.alias("__tie"),
        F.struct(*[F.col(c) for c in payload]).alias("__p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    l = left.select(
        F.col(left_on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__tie"].dataType).alias("__tie"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        *[F.col(c) for c in lcols],
    )
    return l.unionByName(r), lcols


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    tie: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of left join.

    For each left row, attach the right row with the greatest
    ``right_time <= left_time`` for the same key; ties on right_time
    are broken by ``tie`` ascending-last (i.e. the greatest tie value
    wins), matching a deterministic ``row_number() ... ORDER BY t
    DESC, tie DESC`` oracle.  Left rows with no eligible right row get
    nulls (left-join semantics).  Output = left columns + payload
    columns renamed ``prefix + name``.
    """
    u, lcols = _tagged_union(
        left, right, left_on, right_on, left_time, right_time, payload, tie
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("__carry", F.last("__p", ignorenulls=True).over(w))
    return carried.filter(F.col("__side") == 1).select(
        *lcols,
        *[F.col("__carry")[c].alias(prefix + c) for c in payload],
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    tie: str | None = None,
    prefix: str = "asof_",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Skew-safe two-phase as-of join; result identical to asof_join.

    Phase 1: the union-and-carry window, but partitioned by
    (key, time-bucket) — a hot key's rows spread across its buckets
    instead of landing on one task.

    Phase 2: per-(key, bucket) summary of the LAST right payload in
    the bucket (max_by over (t, side-ordering-safe tie)), then a
    per-key window over the summary carries the most recent payload
    from any EARLIER bucket; an equi-join on (key, bucket) seeds each
    row's carry where its own bucket had no earlier right row.  The
    summary is |keys| x |active buckets| rows — orders of magnitude
    smaller than the data — so its per-key window is cheap and the
    only data-scale shuffle is on (key, bucket).
    """
    u, lcols = _tagged_union(
        left, right, left_on, right_on, left_time, right_time, payload, tie
    )
    u = u.withColumn(
        "__b", F.floor(F.unix_timestamp(F.col("__t")) / F.lit(bucket_seconds))
    )

    in_bucket = (
        Window.partitionBy("__k", "__b")
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("__carry", F.last("__p", ignorenulls=True).over(in_bucket))

    # Per-(key, bucket) last right payload: max_by over the same
    # ordering the window uses for right rows (side is constant 0).
    summary = (
        u.filter(F.col("__side") == 0)
        .groupBy("__k", "__b")
        .agg(
            F.max_by(
                F.col("__p"), F.struct(F.col("__t"), F.col("__tie"))
            ).alias("__last_p")
        )
    )
    # Every bucket either side touches needs a seed — including left
    # rows in buckets that contain NO right row (no summary entry):
    # left-join the summary onto the full (key, bucket) frame, shift
    # each bucket's last payload down one bucket, then forward-fill.
    # At bucket b the fill yields the last right payload among buckets
    # strictly before b — exactly "carry at this bucket's start".
    all_buckets = u.select("__k", "__b").distinct()
    by_bucket = Window.partitionBy("__k").orderBy(F.col("__b").asc())
    frame_w = by_bucket.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seeds_full = (
        all_buckets.join(summary, ["__k", "__b"], "left")
        .withColumn("__lag_p", F.lag("__last_p", 1).over(by_bucket))
        .withColumn("__prev_p", F.last("__lag_p", ignorenulls=True).over(frame_w))
        .select("__k", "__b", "__prev_p")
    )

    out = (
        carried.filter(F.col("__side") == 1)
        .join(seeds_full, ["__k", "__b"], "left")
        .withColumn("__carry", F.coalesce(F.col("__carry"), F.col("__prev_p")))
    )
    return out.select(
        *lcols,
        *[F.col("__carry")[c].alias(prefix + c) for c in payload],
    )

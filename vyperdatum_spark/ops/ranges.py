"""Distributed range (interval-containment) join.

Spark compiles a non-equi predicate like ``s <= p AND p < e`` with no
equi-key — or with a low-selectivity one — to BroadcastNestedLoopJoin
or a cartesian product: O(|L| x |R|) compared pairs, the classic
100-TB plan killer.  ``range_join`` is the standard bucketed rewrite:
pick a time-bucket width B, replicate each interval once per bucket
it overlaps (``explode(sequence(bucket(s), bucket(e)))``), tag each
point with its single bucket, equi-join on (bucket, *keys), and
post-filter the exact containment predicate.

Cost model: replication factor = avg interval length / B + 1, and
every compared pair shares a bucket — the join is a plain shuffled
(or AQE-broadcast) hash join on (bucket, keys).  Pick B near the
median interval length; skewed buckets respond to AQE skew-join or
salting like any other equi-join.  Each (point, interval) result pair
is produced exactly once because a point lives in exactly one bucket
and an interval has exactly one replica per bucket.

No vyperdatum analog — this serves the webtext/event side of the
graft (events within incident windows, captures within an outage,
page visits within a campaign interval).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_point: str,
    right_start: str,
    right_end: str,
    on: list[str] | tuple[str, ...] = (),
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner join of ``left`` points to ``right`` intervals where
    ``right_start <= left_point < right_end`` (end-exclusive) and the
    ``on`` key columns are equal.  Output columns = left columns +
    right columns (minus the shared ``on`` keys, which appear once).

    Besides the ``on`` keys, the two sides must not share column
    names (rename before joining — keeps the output unambiguous).
    """
    on = list(on)
    shared = (set(left.columns) & set(right.columns)) - set(on)
    if shared:
        raise ValueError(
            f"non-key columns shared by both sides: {sorted(shared)}; rename them"
        )
    if "__b" in left.columns or "__b" in right.columns:
        raise ValueError("column name '__b' is reserved by range_join")

    B = int(bucket_seconds)
    s_b = F.floor(F.unix_timestamp(F.col(right_start)) / B)
    # End bucket uses the raw (truncated-to-second) end timestamp even
    # though the bound is exclusive: a point in the end bucket can
    # still satisfy p < e when e has sub-bucket precision; the exact
    # post-filter removes the one-bucket overshoot.
    e_b = F.floor(F.unix_timestamp(F.col(right_end)) / B)
    buckets = F.when(e_b >= s_b, F.sequence(s_b, e_b)).otherwise(
        F.array().cast("array<bigint>")
    )
    r = right.withColumn("__b", F.explode(buckets))
    l = left.withColumn(
        "__b", F.floor(F.unix_timestamp(F.col(left_point)) / B)
    )
    return (
        l.join(r, ["__b", *on], "inner")
        .filter(
            (F.col(left_point) >= F.col(right_start))
            & (F.col(left_point) < F.col(right_end))
        )
        .drop("__b")
    )

"""Storage-bucketed tables: shuffle-free co-located joins.

At 100 TB the dominant cost of a REPEATED fact-fact join (pages x
tile assignments, doc ids x dedup verdicts, lineitem x orders) is
re-shuffling the big side on every query. Spark storage bucketing
(``bucketBy(n, key).sortBy(key).saveAsTable``) hash-partitions the
data into n buckets by the join key AT WRITE TIME and records the
layout in the catalog; afterwards

- two tables bucketed by the same key into the same n join as a
  SortMergeJoin with NO Exchange on either side (buckets pair up),
- a groupBy on the bucket key aggregates without a shuffle (the scan
  reports ``HashPartitioning(key, n)``),

so the shuffle is paid once at ingest, not per query. This is the
same contract as Iceberg's ``bucket(n, col)`` partition transform
and complements the snapshot layer in ``sources/tables.py`` (which
owns commits/time travel): bucketing owns co-location. The reference
pre-tiles its separation grids for exactly this reason — pay the
layout once, make every later lookup local
(reference/vyperdatum/core.py pre-tiled VDatum grids; BASELINE.json
north_star "pre-tiled into a side table ... so the transform is a
hash join rather than raster I/O").

Sizing at scale: pick n_buckets so one bucket of the BIG table is
~128-512 MB compressed (10^12 rows x ~1 KB -> tens of thousands of
buckets); both join sides must use the SAME n (Spark requires equal
bucket counts to elide both exchanges). Skewed keys still skew a
bucket — salt the key before bucketing, exactly like the shuffle
case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str,
                   n_buckets: int = 16, path: str | None = None,
                   mode: str = "overwrite") -> None:
    """Write ``df`` as a parquet table bucketed (and sorted) by
    ``key``. With ``path`` the table is external (files land there);
    otherwise it lands in ``spark.sql.warehouse.dir``. The write
    itself shuffles by the key once — that is the point."""
    w = (
        df.write.format("parquet").mode(mode)
        .bucketBy(n_buckets, key).sortBy(key)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two same-key same-n bucketed tables. The physical plan is
    exchange-free iff both tables were written by ``write_bucketed``
    with the same key and n_buckets (asserted in
    tests/test_bucketed.py); otherwise Spark silently falls back to
    shuffling — use ``assert_no_exchange`` when the layout is a
    load-bearing assumption."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def assert_no_exchange(df: DataFrame) -> None:
    """Raise if the physical plan contains a shuffle Exchange —
    the guard a pipeline places on joins whose co-location is a
    layout contract, so a layout regression fails loudly instead of
    silently re-shuffling 100 TB."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        raise AssertionError(
            "expected an exchange-free plan (bucketed co-location), got:\n"
            + plan
        )

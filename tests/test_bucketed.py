"""Storage bucketing: the join and the agg are exchange-free, and
results match the plain (shuffling) plans bit-for-bit."""

import pytest
from pyspark.sql import functions as F

from vyperdatum_spark.sources import bucketed


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bucketed")
    facts = spark.range(0, 20_000).select(
        # k is NOT unique (and not 1:1 with the Range id), so no
        # derived-uniqueness shortcut can satisfy the clustering
        # requirement — only the bucket layout can
        (F.col("id") % 4_000).alias("k"),
        (F.col("id") % 7).alias("v"),
    )
    dims = spark.range(0, 5_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("grp"),
    )
    bucketed.write_bucketed(facts, "t_facts", "k", 8, path=str(d / "facts"))
    bucketed.write_bucketed(dims, "t_dims", "k", 8, path=str(d / "dims"))
    # the raw control reads the SAME files minus the catalog metadata:
    # the bucket layout is the only difference between the plans
    raw_facts = spark.read.parquet(str(d / "facts"))
    raw_dims = spark.read.parquet(str(d / "dims"))
    yield raw_facts, raw_dims
    spark.sql("DROP TABLE IF EXISTS t_facts")
    spark.sql("DROP TABLE IF EXISTS t_dims")


def _no_broadcast(spark):
    """Force the SMJ path: tiny test tables would otherwise broadcast
    (which ignores bucketing entirely)."""
    return spark.conf.get("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_is_exchange_free_and_correct(spark, tables):
    facts, dims = tables
    old = _no_broadcast(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_agg = bucketed.bucketed_join(
            spark, "t_facts", "t_dims", "k"
        ).select("k", "v", "grp")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        bucketed.assert_no_exchange(j)
        # the same join over the raw (unbucketed) DataFrames shuffles
        raw = facts.join(dims, "k").select("k", "v", "grp")
        rawplan = raw._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in rawplan
        # identical results
        assert sorted(j.collect()) == sorted(raw.collect())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_on_key_is_exchange_free(spark, tables):
    facts, _ = tables
    agg = spark.table("t_facts").groupBy("k").agg(
        F.sum("v").alias("sv")
    )
    bucketed.assert_no_exchange(agg)
    raw = facts.groupBy("k").agg(F.sum("v").alias("sv"))
    rawplan = raw._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in rawplan
    assert sorted(agg.collect()) == sorted(raw.collect())


def test_assert_no_exchange_raises_on_shuffling_plan(spark, tables):
    facts, dims = tables
    old = _no_broadcast(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        with pytest.raises(AssertionError, match="exchange-free"):
            bucketed.assert_no_exchange(facts.join(dims, "k"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_mismatched_bucket_count_still_correct(spark, tables, tmp_path):
    """A 4-bucket table joined to an 8-bucket table cannot elide both
    exchanges — results must still be right (the guard exists exactly
    because Spark falls back silently)."""
    facts, dims = tables
    bucketed.write_bucketed(
        dims, "t_dims4", "k", 4, path=str(tmp_path / "dims4")
    )
    try:
        j = bucketed.bucketed_join(spark, "t_facts", "t_dims4", "k")
        raw = facts.join(dims, "k")
        assert sorted(j.select("k").collect()) == sorted(
            raw.select("k").collect()
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS t_dims4")

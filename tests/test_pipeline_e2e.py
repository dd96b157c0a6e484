"""End-to-end pipeline composition (round-3 VERDICT item 2): pages →
geoparse → transform → exact-dedup → decontaminate → stratified-sample
→ cell-partitioned sink, with byte-identical text at the sink."""

import os

import pytest
from pyspark.sql import functions as F

from vyperdatum_spark.queries import pipeline as pq

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def result(spark):
    return pq.q_pipeline_end_to_end(spark, SF_DIR).cache()


def test_pipeline_survivors_nonempty_with_full_schema(result):
    assert result.count() > 0
    assert set(result.columns) == {
        "url", "lang", "cell5", "region_id", "z_out", "unc", "text"
    }


def test_sink_text_bytes_identical_to_source(spark, result):
    """The input_hint invariant, re-checked OUTSIDE the query's own
    eager assert: every surviving url's text read back from the sink
    equals the originally synthesized page text byte-for-byte."""
    pages = pq.synth_pages(spark, SF_DIR)
    joined = (
        result.select("url", F.col("text").alias("sink_text"))
        .join(pages.select("url", "text"), "url", "inner")
    )
    n = result.count()
    assert joined.count() == n  # every sink row maps to a source page
    same = joined.filter(
        F.col("sink_text").eqNullSafe(F.col("text"))
    ).count()
    assert same == n


def test_pipeline_stages_each_remove_rows(spark, result):
    """The composition is real: dedup, decontamination, and sampling
    each strictly shrink the corpus (the fixture plants exact dups,
    eval leaks, and >0 en/de rows)."""
    pages = pq.synth_pages(spark, SF_DIR)
    n_pages = pages.count()
    n_corpus = pages.filter(F.col("pid") % 97 != 0).count()
    assert n_corpus < n_pages  # benchmark split removed rows
    n_dedup = (
        pages.filter(F.col("pid") % 97 != 0)
        .groupBy(F.md5("text")).count().count()
    )
    assert n_dedup < n_corpus  # exact duplicates existed
    n_out = result.count()
    assert n_out < n_dedup  # decontamination + sampling removed rows
    # famous-coordinate pages leak benchmark shingles → none survive
    famous = result.filter(
        F.col("text").contains("34.75123N")
    ).count()
    assert famous == 0


def test_survivor_set_matches_duckdb_oracle(spark, result):
    """Survivor url set equality vs the DuckDB oracle (the driver
    additionally hash-compares every column at the gate)."""
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    )
    oracle_urls = {
        r[0] for r in con.execute(
            f"SELECT url FROM ({pq.pipeline_oracle_sql()})"
        ).fetchall()
    }
    spark_urls = {r["url"] for r in result.select("url").collect()}
    assert spark_urls == oracle_urls

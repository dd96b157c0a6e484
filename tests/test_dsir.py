"""DSIR importance weighting: oracle parity, target-domain ordering,
hand-built two-domain separation, and plan shape (scoring must be
shuffle-free)."""

import duckdb
import pandas as pd
import pytest

from vyperdatum_spark.ops import dsir as D

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_matches_oracle(spark, docs):
    out = (
        D.dsir_weights(docs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    oracle = (
        con.execute(D.dsir_weights_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, oracle, check_dtype=False)


def test_target_language_scores_highest(spark, docs):
    """The target slice (lang='en') must have the highest mean
    normalized weight — the defining property of importance weights."""
    out = D.dsir_weights(docs).toPandas()
    langs = docs.select("doc_id", "lang").toPandas()
    m = out.merge(langs, on="doc_id")
    means = m.groupby("lang")["avg_weight"].mean()
    assert means.idxmax() == "en"


def test_separates_synthetic_domains(spark):
    """Two vocabularies, target = lang 'tg': every tg doc must
    outweigh every other doc (disjoint vocabulary ⇒ clean split)."""
    rows = []
    for i in range(20):
        if i % 2 == 0:
            rows.append((i, "alpha beta gamma alpha beta", "tg"))
        else:
            rows.append((i, "delta epsilon zeta delta epsilon", "xx"))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    )
    out = D.dsir_weights(df, target_lang="tg").toPandas()
    tg = out[out.doc_id % 2 == 0]["avg_weight"]
    xx = out[out.doc_id % 2 == 1]["avg_weight"]
    assert tg.min() > xx.max()


def test_scoring_plan_shape(spark, docs):
    """One id-keyed aggregation shuffle (map-side combined), zero
    Python crossings — the bucket-count formulation's plan."""
    out = D.dsir_weights(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # partial→final agg exchange
    assert "Python" not in plan and "Arrow" not in plan

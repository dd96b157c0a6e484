"""DSIR-style data selection: hashed n-gram importance weights
(Xie et al., arXiv:2302.03169 — "Data Selection for Language Models
via Importance Resampling").

Estimate two bag-of-hashed-ngram distributions — a TARGET domain
(here: the ``lang = 'en'`` slice, the exemplar of "data I want more
of") and the RAW corpus — then score every raw document by its log
importance weight  Σ_grams  ln(p_target(bucket) / p_raw(bucket)).
High-weight documents look like the target domain; selection keeps
the top slice (at production scale via a quantile threshold, not a
global sort — see ``ops/quantiles``).

Spark-first shape:

- **training** is ONE explode → groupBy(bucket) pass producing B=64
  add-one-smoothed bucket counts for both distributions at once
  (the target flag rides along, so the raw corpus is scanned once);
  the resulting λ_b = ln(p̂_t(b)/p̂_r(b)) table is tiny and baked as a
  64-slot literal array.
- **scoring** is scan-side column math: fold λ[bucket(gram)] over the
  document's grams in DOCUMENT ORDER (``aggregate ∘ transform``), so
  Spark and the DuckDB oracle — which recomputes the training in CTEs
  — sum bit-identically (mod 1-ulp libm ``ln``, absorbed by round-6).
  Zero shuffle, zero Python in the scoring plan.

Features are unigrams + word bigrams hashed to 64 buckets with the
repo's portable ``hash60`` (md5-prefix) device.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import hash60, hash60_sql

N_BUCKETS = 64


def _grams_col(toks: Column) -> Column:
    """unigrams ++ word-bigrams, in document order."""
    n = F.size(toks)
    bi = F.when(
        n > 1,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(
                F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bi)


def _grams_sql(toks: str) -> str:
    bi = (f"list_transform(generate_series(1, len({toks}) - 1), "
          f"i -> {toks}[i] || ' ' || {toks}[i + 1])")
    return f"list_concat({toks}, {bi})"


def _bucket_col(g: Column) -> Column:
    return (hash60(g) % N_BUCKETS).cast("int")


def _bucket_sql(g: str) -> str:
    return f"({hash60_sql(g)} % {N_BUCKETS})"


def train_lambdas(df: DataFrame, target_filter: Column,
                  text_col: str = "text") -> list[float]:
    """One explode+agg pass over the corpus → the 64 per-bucket
    log-importance weights ln(p̂_target(b) / p̂_raw(b)), add-one
    smoothed.  Buckets unseen in either distribution get the smoothed
    prior ratio."""
    toks = F.split(F.col(text_col), " ")
    flat = df.select(
        target_filter.cast("long").alias("is_t"),
        F.explode(_grams_col(toks)).alias("g"),
    )
    rows = (
        flat.select(_bucket_col(F.col("g")).alias("b"), "is_t")
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("r"), F.sum("is_t").alias("t"))
        .collect()
    )
    r = [0] * N_BUCKETS
    t = [0] * N_BUCKETS
    for row in rows:
        r[row["b"]] = int(row["r"])
        t[row["b"]] = int(row["t"])
    rr, tt = sum(r), sum(t)
    return [
        math.log(
            ((t[b] + 1.0) / (tt + N_BUCKETS))
            / ((r[b] + 1.0) / (rr + N_BUCKETS))
        )
        for b in range(N_BUCKETS)
    ]


def dsir_weights(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 target_lang: str = "en") -> DataFrame:
    """(id, n_grams, weight, avg_weight) — per-document DSIR log
    importance weight vs the ``lang = target_lang`` target slice.
    Scoring is a 0-shuffle scan-side fold over baked λ literals."""
    lam = train_lambdas(df, F.col("lang") == target_lang,
                        text_col=text_col)
    lam_arr = F.array(*[F.lit(v) for v in lam])
    toks = F.split(F.col(text_col), " ")
    grams = _grams_col(toks)
    contrib = F.transform(
        grams,
        lambda g: F.element_at(lam_arr, _bucket_col(g) + 1),
    )
    s = F.aggregate(contrib, F.lit(0.0), lambda acc, v: acc + v)
    n = F.size(grams)
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_grams"),
        F.round(s, 6).alias("weight"),
        F.round(s / n.cast("double"), 6).alias("avg_weight"),
    )


def dsir_weights_sql(table: str = "documents", id_col: str = "doc_id",
                     text_col: str = "text",
                     target_lang: str = "en") -> str:
    """Oracle: recomputes the training (same explode/agg, same add-one
    smoothing, missing buckets filled via generate_series LEFT JOIN)
    and folds λ over grams in the same document order."""
    b = _bucket_sql("g")
    lam_expr = (
        f"ln(((coalesce(bc.t, 0) + 1.0) / (tot.tt + {N_BUCKETS})) / "
        f"((coalesce(bc.r, 0) + 1.0) / (tot.rr + {N_BUCKETS})))"
    )
    lookup = f"ll[({_bucket_sql('g')}) + 1]"
    return (
        f"WITH toked AS (SELECT {id_col}, lang, "
        f"string_split({text_col}, ' ') AS toks FROM {table}), "
        f"gr AS (SELECT {id_col}, lang, {_grams_sql('toks')} AS gs "
        f"FROM toked), "
        f"flat AS (SELECT lang, unnest(gs) AS g FROM gr), "
        f"bc AS (SELECT {b} AS b, count(*) AS r, "
        f"sum(CASE WHEN lang = '{target_lang}' THEN 1 ELSE 0 END) AS t "
        f"FROM flat GROUP BY 1), "
        f"tot AS (SELECT sum(r) AS rr, sum(t) AS tt FROM bc), "
        f"lam AS (SELECT gs.b, {lam_expr} AS lam "
        f"FROM generate_series(0, {N_BUCKETS - 1}) gs(b) "
        f"LEFT JOIN bc USING (b) CROSS JOIN tot), "
        f"ltab AS (SELECT list(lam ORDER BY b) AS ll FROM lam), "
        f"scored AS (SELECT {id_col}, len(gs) AS n_grams, "
        f"(0.0 + list_reduce(list_transform(gs, g -> {lookup}), "
        f"(x, y) -> x + y)) AS s "
        f"FROM gr CROSS JOIN ltab) "
        f"SELECT {id_col}, CAST(n_grams AS BIGINT) AS n_grams, "
        f"round(s, 6) AS weight, "
        f"round(s / CAST(n_grams AS DOUBLE), 6) AS avg_weight FROM scored"
    )

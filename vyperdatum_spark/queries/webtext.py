"""Webtext training-data queries (dedup / similarity / text analysis)
for the driver's correctness gate, over documents + embeddings."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ops import dedup, similarity, textstats


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _docs_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents plus a deterministic duplicated subset (doc_id % 7)
    so exact-dedup has real groups to find at every scale factor."""
    d = _docs(spark, sf_dir)
    dups = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    return d.unionByName(dups)


DUPS_SQL = (
    "(SELECT * FROM documents UNION ALL "
    "SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars "
    "FROM documents WHERE doc_id % 7 = 0)"
)


def _media_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text re-encoded as opaque binary payloads, a rotating
    subset prefixed with real codec magic bytes — deterministic stand-in
    for a multimodal (image/audio) column at any scale factor."""
    d = F.col("doc_id")
    prefix = (
        F.when(d % 7 == 0, F.lit(b"\x89PNG"))
        .when(d % 7 == 1, F.lit(b"GIF8"))
        .when(d % 7 == 2, F.lit(b"\xff\xd8\xff"))
        .otherwise(F.lit(b""))
    )
    return _docs(spark, sf_dir).select(
        d.alias("doc_id"),
        F.concat(prefix, F.encode(F.col("text"), "UTF-8")).alias("payload"),
    )


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops import multimodal

    return multimodal.media_meta(
        _media_payloads(spark, sf_dir), "doc_id", "payload", hash_mode="hex"
    )


def multimodal_meta_sql() -> str:
    from ..ops.multimodal import MAGIC

    sniff = "ELSE 'bin' END"
    whens = " ".join(
        f"WHEN starts_with(hex(payload), '{magic.hex().upper()}') "
        f"THEN '{kind}'"
        for magic, kind in MAGIC.items()
    )
    return (
        "WITH p AS (SELECT doc_id, "
        "(CASE WHEN doc_id % 7 = 0 THEN '\\x89PNG'::BLOB "
        "WHEN doc_id % 7 = 1 THEN 'GIF8'::BLOB "
        "WHEN doc_id % 7 = 2 THEN '\\xFF\\xD8\\xFF'::BLOB "
        "ELSE ''::BLOB END || encode(text)) AS payload FROM documents) "
        "SELECT doc_id, octet_length(payload) AS byte_len, "
        "md5(hex(payload)) AS content_md5, "
        f"CASE {whens} {sniff} AS media_kind FROM p"
    )


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 JSON scalar functions (reference uses them only in the
    web-API client, SURVEY §2.1 S10): build a deterministic JSON
    metadata column and parse it back with the engine's JSON path
    functions — round-trips construction + extraction + typed cast."""
    js = F.concat(
        F.lit('{"src":"'), F.col("source"),
        F.lit('","n":'), F.col("n_chars").cast("string"),
        F.lit(',"lang":"'), F.col("lang"), F.lit('"}'),
    )
    return _docs(spark, sf_dir).select(
        F.col("doc_id"),
        F.get_json_object(js, "$.src").alias("meta_src"),
        F.get_json_object(js, "$.n").cast("long").alias("meta_n"),
        F.get_json_object(js, "$.lang").alias("meta_lang"),
    )


def json_extract_sql() -> str:
    js = (
        "('{\"src\":\"' || source || '\",\"n\":' || CAST(n_chars AS VARCHAR)"
        " || ',\"lang\":\"' || lang || '\"}')"
    )
    return (
        f"SELECT doc_id, json_extract_string({js}, '$.src') AS meta_src, "
        f"CAST(json_extract_string({js}, '$.n') AS BIGINT) AS meta_n, "
        f"json_extract_string({js}, '$.lang') AS meta_lang FROM documents"
    )


def q_stream_first_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom stateful streaming operator (applyInPandasWithState,
    §2.8) under the oracle gate: drain documents as a stream, keyed
    state per source emitting (first doc_id, batch count) — equals the
    per-key batch aggregate on a single-batch drain."""
    from ..streaming import stateful
    from ..streaming.windows import query_work_dir

    return stateful.stream_first_per_key(
        spark, f"{sf_dir}/documents.parquet",
        query_work_dir("first_per_source"), "source", "doc_id"
    )


def _doc_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic URL per document, exercising every
    canonicalization rule on rotating subsets: scheme/host case,
    default :443 port, trailing slash, leading utm_* param, fragment.
    The case-varied '/Docs/' path proves case-folding stays off the
    path."""
    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 4 == 0, F.lit("HTTPS://WWW.")).otherwise(F.lit("https://www.")),
        F.col("source"),
        F.when(d % 4 == 0, F.lit(".EXAMPLE.com")).otherwise(F.lit(".example.com")),
        F.when(d % 3 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/Docs/"), (d % 50).cast("string"),
        F.when(d % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 2 == 0,
               F.concat(F.lit("?utm_source=feed&ref="), (d % 9).cast("string"))
               ).otherwise(F.lit("")),
        F.when(d % 6 == 0, F.lit("#sec2")).otherwise(F.lit("")),
    )
    return _docs(spark, sf_dir).select(d.alias("doc_id"), url.alias("url"))


_DOC_URLS_SQL = (
    "SELECT doc_id, "
    "(CASE WHEN doc_id % 4 = 0 THEN 'HTTPS://WWW.' ELSE 'https://www.' END)"
    " || source || "
    "(CASE WHEN doc_id % 4 = 0 THEN '.EXAMPLE.com' ELSE '.example.com' END)"
    " || (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END)"
    " || '/Docs/' || CAST(doc_id % 50 AS VARCHAR)"
    " || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)"
    " || (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&ref=' ||"
    " CAST(doc_id % 9 AS VARCHAR) ELSE '' END)"
    " || (CASE WHEN doc_id % 6 = 0 THEN '#sec2' ELSE '' END) AS url "
    "FROM documents"
)


def url_dedup_oracle_sql() -> str:
    """DuckDB twin of ops.urls.url_dedup over the synthetic URLs —
    the same regex sequence ('g' flag where Spark replaces all)."""
    auth_re = "^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)"
    return (
        f"WITH u AS ({_DOC_URLS_SQL}), "
        "c0 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM u), "
        "c1 AS (SELECT doc_id, regexp_replace(regexp_replace(u, "
        "'\\?utm_[^&#]*&', '?', 'g'), '[?&]utm_[^&#]*', '', 'g') AS u FROM c0), "
        f"c2 AS (SELECT doc_id, u, regexp_extract(u, '{auth_re}', 1) AS auth "
        "FROM c1), "
        "c3 AS (SELECT doc_id, "
        "regexp_replace(regexp_replace(lower(auth), '^(https://.*):443$', "
        "'\\1'), '^(http://.*):80$', '\\1') || "
        "regexp_replace(substr(u, length(auth) + 1), '(.+)/$', '\\1') "
        "AS canonical_url FROM c2) "
        "SELECT canonical_url, MIN(doc_id) AS keeper_id, "
        "COUNT(*) AS n_members FROM c3 GROUP BY canonical_url "
        "HAVING COUNT(*) > 1"
    )


def queries() -> dict:
    from ..ops import urls

    return {
        "url_canonical_dedup": lambda s, d: urls.url_dedup(_doc_urls(s, d)),
        "dedup_exact": lambda s, d: dedup.exact_duplicates(_docs_with_dups(s, d)),
        "dedup_minhash_lsh": lambda s, d: dedup.minhash_lsh_pairs(_docs(s, d)),
        "dedup_simhash": lambda s, d: dedup.simhash_groups(_docs(s, d)),
        "dedup_simhash_hamming": lambda s, d: dedup.simhash_hamming_pairs(
            _docs_with_dups(s, d)
        ),
        # explicit all-pairs opt-in: the oracle is the O(n²)-within-
        # language recall reference, safe at test scale only — the
        # production default (no flag) verifies LSH candidates
        "dedup_ngram_jaccard": lambda s, d: dedup.jaccard_pairs(
            _docs(s, d), threshold=0.5, allow_all_pairs=True
        ),
        "dedup_lsh_verified": lambda s, d: dedup.lsh_verified_pairs(
            _docs(s, d), threshold=0.5
        ),
        "dedup_embedding_cosine": lambda s, d: similarity.cosine_dup_pairs(
            _embs(s, d), threshold=0.35
        ),
        "ann_bruteforce_topk": lambda s, d: similarity.ann_bruteforce_topk(
            _embs(s, d)
        ),
        "ann_lsh_topk": lambda s, d: similarity.ann_lsh_topk(_embs(s, d)),
        "ann_lsh_multi_topk": lambda s, d: similarity.ann_lsh_multi_topk(
            _embs(s, d)
        ),
        "ann_ivf_topk": lambda s, d: similarity.ann_ivf_topk(_embs(s, d)),
        "text_quality": lambda s, d: textstats.quality_df(_docs(s, d)),
        "text_langid": lambda s, d: textstats.langid_df(_docs(s, d)),
        "text_token_counts": lambda s, d: textstats.token_counts_df(_docs(s, d)),
        "doc_fingerprint": lambda s, d: textstats.fingerprint_df(_docs(s, d)),
        "multimodal_meta": q_multimodal_meta,
        "decontaminate": lambda s, d: dedup.decontaminate(
            _docs(s, d).filter(F.col("doc_id") % 97 != 0),
            _docs(s, d).filter(F.col("doc_id") % 97 == 0),
        ),
        "sample_stratified": lambda s, d: textstats.sample_stratified(
            _docs(s, d)
        ),
        "json_extract": q_json_extract,
        "stream_first_per_source": q_stream_first_per_source,
    }


def oracle_sql() -> dict:
    return {
        "url_canonical_dedup": url_dedup_oracle_sql(),
        "dedup_exact": dedup.exact_duplicates_sql(table=DUPS_SQL),
        "dedup_minhash_lsh": dedup.minhash_lsh_pairs_sql(),
        "dedup_simhash": dedup.simhash_groups_sql(),
        "dedup_simhash_hamming": dedup.simhash_hamming_pairs_sql(table=DUPS_SQL),
        "dedup_ngram_jaccard": dedup.jaccard_pairs_sql(threshold=0.5),
        "dedup_lsh_verified": dedup.lsh_verified_pairs_sql(threshold=0.5),
        "dedup_embedding_cosine": similarity.cosine_dup_pairs_sql(threshold=0.35),
        "ann_bruteforce_topk": similarity.ann_bruteforce_topk_sql(),
        "ann_lsh_topk": similarity.ann_lsh_topk_sql(),
        "ann_lsh_multi_topk": similarity.ann_lsh_multi_topk_sql(),
        "ann_ivf_topk": similarity.ann_ivf_topk_sql(),
        "text_quality": textstats.quality_sql(),
        "text_langid": textstats.langid_sql(),
        "text_token_counts": textstats.token_counts_sql(),
        "doc_fingerprint": textstats.fingerprint_sql(),
        "multimodal_meta": multimodal_meta_sql(),
        "decontaminate": dedup.decontaminate_sql(
            corpus="(SELECT * FROM documents WHERE doc_id % 97 <> 0)",
            benchmark="(SELECT * FROM documents WHERE doc_id % 97 = 0)",
        ),
        "sample_stratified": textstats.sample_stratified_sql(),
        "json_extract": json_extract_sql(),
        "stream_first_per_source": (
            "SELECT source AS key, MIN(doc_id) AS first_id, "
            "CAST(COUNT(*) AS BIGINT) AS n_in_batch "
            "FROM documents GROUP BY source"
        ),
    }

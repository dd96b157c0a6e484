"""Deduplication operators for web-scale training-data pipelines.

Exact (hash-groupBy), MinHash+LSH (shingle → minhash → band →
bucket-join), SimHash, and n-gram Jaccard — all expressed with
built-in ``pyspark.sql.functions`` column math (JVM-side, whole-stage
codegen; no Python UDFs anywhere), so each operator has an exactly
equivalent ANSI-SQL oracle built from the same constants.

Shared hash primitive (bit-identical in Spark, DuckDB and Python):
    h(s) = int64(first 15 hex chars of md5(s))        (60-bit, ≥ 0)
MinHash permutations: h_k = (a_k · (h mod P) + b_k) mod P with
P = 2^31 − 1 (Mersenne), a_k/b_k seeded — products stay < 2^62, so
the arithmetic is exact int64 everywhere.

At 100 TB scale: everything here is one shuffle per groupBy/join;
the LSH band join is an equi-join on (band_idx, band_val) — skew-safe
because near-duplicate buckets are small by construction; the O(n²)
same-language Jaccard join is a *verification* stage meant to run on
LSH candidates, not the full corpus (exposed separately so the
composed pipeline is LSH → verify).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERSENNE_P = (1 << 31) - 1
N_MINHASH = 16
N_BANDS = 4  # 4 rows per band
SHINGLE_W = 3


def _perm_constants(k: int = N_MINHASH, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_P, size=k, dtype=np.int64)
    b = rng.integers(0, MERSENNE_P, size=k, dtype=np.int64)
    return [(int(x), int(y)) for x, y in zip(a, b)]


PERMS = _perm_constants()


# ---------------------------------------------------------------- exact
def exact_duplicates(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Groups of byte-identical texts (md5 fingerprint)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_md5"), F.col(id_col))
        .groupBy("content_md5")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("min_doc_id"))
        .filter(F.col("n_dups") > 1)
    )


def exact_duplicates_sql(table: str = "documents", id_col: str = "doc_id",
                         text_col: str = "text") -> str:
    return (
        f"SELECT md5({text_col}) AS content_md5, COUNT(*) AS n_dups, "
        f"MIN({id_col}) AS min_doc_id FROM {table} "
        f"GROUP BY md5({text_col}) HAVING COUNT(*) > 1"
    )


# ------------------------------------------------------------- shingles
def tokens_col(text: Column) -> Column:
    return F.split(text, " ")


def shingles_col(text: Column, w: int = SHINGLE_W) -> Column:
    """Word w-grams as strings (1-indexed to match SQL).

    Guarded for short docs: Spark's sequence(1, 0) yields a DESCENDING
    [1, 0] (not an empty list like SQL generate_series), so docs with
    fewer than w tokens explicitly map to an empty array."""
    toks = tokens_col(text)
    n = F.size(toks) - (w - 1)
    sh = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(w)]),
    )
    return F.when(n >= 1, sh).otherwise(F.array().cast("array<string>"))


def shingles_sql(text: str = "text", w: int = SHINGLE_W) -> str:
    parts = " || ' ' || ".join(f"w[i + {j}]" for j in range(w))
    return (
        f"list_transform(generate_series(1, greatest(len(string_split({text}, ' ')) - {w - 1}, 0)), "
        f"i -> {parts})".replace("w[", f"string_split({text}, ' ')[")
    )


def hash60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


# -------------------------------------------------------------- minhash
def minhash_col(text: Column) -> Column:
    """array<long> of N_MINHASH signature values (empty-shingle docs
    get P as the identity/max value)."""
    hashes = F.transform(shingles_col(text), lambda s: hash60(s) % MERSENNE_P)
    sigs = [
        F.coalesce(
            F.array_min(
                F.transform(hashes, lambda h: (F.lit(a) * h + F.lit(b)) % MERSENNE_P)
            ),
            F.lit(MERSENNE_P),
        )
        for a, b in PERMS
    ]
    return F.array(*sigs)


def minhash_sql(text: str = "text") -> str:
    hashes = (
        f"list_transform({shingles_sql(text)}, s -> {hash60_sql('s')} % {MERSENNE_P})"
    )
    sigs = ", ".join(
        f"coalesce(list_min(list_transform({hashes}, h -> ({a} * h + {b}) % {MERSENNE_P})), {MERSENNE_P})"
        for a, b in PERMS
    )
    return f"[{sigs}]"


def band_col(sig: Column, band: int, rows: int) -> Column:
    """Combine one band's rows into a single int64 (base-31 fold —
    values < 2^31 so the fold stays < 2^52, exact in int64)."""
    v = F.lit(0).cast("long")
    for r in range(rows):
        v = v * F.lit(31) + F.element_at(sig, band * rows + r + 1)
    return v


def band_sql(sig_expr: str, band: int, rows: int) -> str:
    v = "CAST(0 AS BIGINT)"
    for r in range(rows):
        v = f"({v} * 31 + {sig_expr}[{band * rows + r + 1}])"
    return v


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing ≥1 LSH band."""
    rows = N_MINHASH // N_BANDS
    sig = df.select(F.col(id_col), minhash_col(F.col(text_col)).alias("sig"))
    bands = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        band_col(F.col("sig"), b, rows).alias("band_val"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bd"),
    ).select(id_col, "bd.band_idx", "bd.band_val")
    left = bands.withColumnRenamed(id_col, "doc_a")
    right = bands.withColumnRenamed(id_col, "doc_b")
    return (
        left.join(right, ["band_idx", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_lsh_pairs_sql(table: str = "documents", id_col: str = "doc_id",
                          text_col: str = "text") -> str:
    rows = N_MINHASH // N_BANDS
    band_structs = ", ".join(
        f"{{'band_idx': {b}, 'band_val': {band_sql('sig', b, rows)}}}"
        for b in range(N_BANDS)
    )
    return (
        f"WITH sig AS (SELECT {id_col}, {minhash_sql(text_col)} AS sig FROM {table}), "
        f"bands AS (SELECT {id_col}, unnest([{band_structs}], recursive := true) FROM sig) "
        f"SELECT DISTINCT l.{id_col} AS doc_a, r.{id_col} AS doc_b "
        f"FROM bands l JOIN bands r USING (band_idx, band_val) "
        f"WHERE l.{id_col} < r.{id_col}"
    )


# -------------------------------------------------------------- simhash
N_SIMHASH_BITS = 16


def simhash_col(text: Column, bits: int = N_SIMHASH_BITS) -> Column:
    """Token-level SimHash: bit i set iff more than half the tokens
    have bit i set in their 60-bit hash."""
    hashes = F.transform(tokens_col(text), lambda t: hash60(t))
    n = F.size(hashes)
    v = F.lit(0).cast("long")
    for i in range(bits):
        cnt = F.size(
            F.filter(hashes, lambda h: F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1)
        )
        v = v + F.when(cnt * 2 > n, F.lit(1 << i).cast("long")).otherwise(F.lit(0))
    return v


def simhash_sql(text: str = "text", bits: int = N_SIMHASH_BITS) -> str:
    hashes = f"list_transform(string_split({text}, ' '), t -> {hash60_sql('t')})"
    n = f"len(string_split({text}, ' '))"
    terms = " + ".join(
        f"(CASE WHEN 2 * len(list_filter({hashes}, h -> (h >> {i}) & 1 = 1)) > {n} "
        f"THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(bits)
    )
    return f"({terms})"


def simhash_groups(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Docs bucketed by identical SimHash (candidate near-dups)."""
    return (
        df.select(F.col(id_col), simhash_col(F.col(text_col)).alias("simhash"))
        .groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("min_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


def simhash_groups_sql(table: str = "documents", id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    return (
        f"SELECT {simhash_sql(text_col)} AS simhash, COUNT(*) AS n_docs, "
        f"MIN({id_col}) AS min_doc_id FROM {table} "
        f"GROUP BY 1 HAVING COUNT(*) > 1"
    )


# ------------------------------------------------------ n-gram jaccard
def jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", lang_col: str = "lang",
                  threshold: float = 0.5) -> DataFrame:
    """Word-shingle Jaccard over same-language pairs (the verify stage
    of the dedup pipeline; run on LSH candidates at full scale)."""
    sets = df.select(
        F.col(id_col),
        F.col(lang_col),
        F.array_distinct(shingles_col(F.col(text_col))).alias("sset"),
    )
    a = sets.select(
        F.col(lang_col),
        F.col(id_col).alias("doc_a"),
        F.col("sset").alias("set_a"),
    )
    b = sets.select(
        F.col(lang_col),
        F.col(id_col).alias("doc_b"),
        F.col("sset").alias("set_b"),
    )
    joined = a.join(b, lang_col).filter(F.col("doc_a") < F.col("doc_b"))
    inter = F.size(F.array_intersect("set_a", "set_b"))
    union = F.size(F.array_union("set_a", "set_b"))
    # two empty shingle sets (docs shorter than the shingle width)
    # have undefined similarity -> NULL, filtered by the threshold
    jac = F.when(union > 0, inter.cast("double") / union.cast("double"))
    return (
        joined.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def jaccard_pairs_sql(table: str = "documents", id_col: str = "doc_id",
                      text_col: str = "text", lang_col: str = "lang",
                      threshold: float = 0.5) -> str:
    sset = f"list_distinct({shingles_sql(text_col)})"
    jac = (
        "CASE WHEN len(list_distinct(list_concat(a.sset, b.sset))) > 0 THEN "
        "CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE) / "
        "CAST(len(list_distinct(list_concat(a.sset, b.sset))) AS DOUBLE) END"
    )
    return (
        f"WITH sets AS (SELECT {id_col}, {lang_col}, {sset} AS sset FROM {table}) "
        f"SELECT a.{id_col} AS doc_a, b.{id_col} AS doc_b, {jac} AS jaccard "
        f"FROM sets a JOIN sets b ON a.{lang_col} = b.{lang_col} "
        f"AND a.{id_col} < b.{id_col} "
        f"WHERE {jac} >= {threshold!r}"
    )

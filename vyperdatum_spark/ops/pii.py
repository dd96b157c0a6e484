"""PII redaction for web-corpus curation.

Standard pre-training scrub stage: replace e-mail addresses, IPv4
addresses, and phone numbers with stable placeholder tokens and count
what was removed (the counts feed curation dashboards and per-source
quality gates). Pure JVM regexp column math — no Python, no shuffle;
at 100 TB this is a codegen projection like every other per-row text
stage.

Regex notes: patterns are RE2-compatible (no lookbehind/backrefs) so
the DuckDB oracle evaluates the byte-identical transformation; the
e-mail pass runs FIRST because an address like user@203.0.113.9 must
become [EMAIL], not a half-redacted [IP] remnant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (pattern, placeholder) in application order — e-mail before IP
PII_RULES = (
    # final domain label is alphanumeric (not alpha-only) so addresses
    # with IP-literal domains (user@203.0.113.9) redact as ONE e-mail
    # span instead of leaving a half-redacted user@[IP] remnant
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z0-9]+", "[EMAIL]"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    (r"\+\d{1,3}-\d{3}-\d{3,4}(?:-\d{4})?", "[PHONE]"),
)
_KINDS = ("email", "ip", "phone")


def pii_redact(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(id, clean_text, n_email, n_ip, n_phone): placeholder-redacted
    text plus per-kind match counts. Counts are taken on the staged
    text (post prior rules) so kinds never double-count the same span."""
    d = df.select(F.col(id_col), F.col(text_col).alias("_t"))
    counts = []
    for (pat, tok), kind in zip(PII_RULES, _KINDS):
        cnt = F.size(F.regexp_extract_all(F.col("_t"), F.lit(pat), 0))
        counts.append(cnt.cast("long").alias(f"n_{kind}"))
        d = d.select(
            id_col, *[f"n_{k}" for k in _KINDS[: len(counts) - 1]],
            counts[-1],
            F.regexp_replace(F.col("_t"), pat, tok).alias("_t"),
        )
    return d.select(
        F.col(id_col), F.col("_t").alias("clean_text"),
        *[F.col(f"n_{k}") for k in _KINDS],
    )


def pii_annotate(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composition form: APPENDS (clean_text, n_email, n_ip, n_phone)
    to the input DataFrame, keeping every existing column — for
    pipelines that carry url/ts/lineage alongside the text. Same
    staged rule order as pii_redact."""
    d = df.withColumn("_t", F.col(text_col))
    for (pat, tok), kind in zip(PII_RULES, _KINDS):
        cnt = F.size(F.regexp_extract_all(F.col("_t"), F.lit(pat), 0))
        d = d.withColumn(f"n_{kind}", cnt.cast("long"))
        d = d.withColumn("_t", F.regexp_replace(F.col("_t"), pat, tok))
    return d.withColumnRenamed("_t", "clean_text")


def pii_redact_sql(table: str = "documents", id_col: str = "doc_id",
                   text_col: str = "text") -> str:
    """DuckDB twin: identical patterns, staged in the same order."""
    s = text_col
    count_exprs = []
    for (pat, tok), kind in zip(PII_RULES, _KINDS):
        p = pat.replace("'", "''")
        count_exprs.append(
            f"CAST(len(regexp_extract_all({s}, '{p}')) AS BIGINT) AS n_{kind}"
        )
        s = f"regexp_replace({s}, '{p}', '{tok}', 'g')"
    return (
        f"SELECT {id_col}, {s} AS clean_text, "
        + ", ".join(count_exprs)
        + f" FROM {table}"
    )

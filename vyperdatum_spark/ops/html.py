"""HTML → text extraction over Common-Crawl-shaped pages.

The north-star input table carries ``html:binary`` next to
``text:string`` with a byte-identical-extracted-text-per-url contract
(BASELINE.json input_hint). This module is the extraction stage: an
opaque HTML payload goes in, the visible text comes out, expressed as
a pure JVM regexp/string column chain — zero Python crossings, so the
stage rides whole-stage codegen and scales as a projection (no
shuffle, no UDF serialization) on a 10^12-row table.

Extraction contract (deterministic, engine-portable):
  1. UTF-8 decode the binary payload;
  2. remove HTML comments ``<!-- … -->`` (non-greedy, dot-matches-all);
  3. remove ``<script …>…</script>`` and ``<style …>…</style>``
     including their contents (case-insensitive, dot-matches-all);
  4. strip every remaining tag ``<…>``;
  5. decode a FIXED entity table (the common named entities plus the
     numeric forms the fixtures exercise) — ``&amp;`` decoded LAST so
     ``&amp;lt;`` round-trips to the literal ``&lt;`` and not ``<``;
  6. collapse runs of whitespace to one space and trim.

Rules 2–4 are shared verbatim (same regex source text) with the
DuckDB oracle, so both engines evaluate the identical transformation.
The reference has no HTML stage (it consumes point/raster files); this
is part of the webtext graft surface mandated by the north rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# regex source shared by the Spark plan and the DuckDB oracle
RE_COMMENT = r"(?s)<!--.*?-->"
RE_SCRIPT = r"(?is)<script\b[^>]*>.*?</script>"
RE_STYLE = r"(?is)<style\b[^>]*>.*?</style>"
RE_TAG = r"(?s)<[^>]*>"
RE_WS = r"[ \t\r\n]+"

# fixed entity table, decode order significant: &amp; strictly last
ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&#101;", "e"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def _decode_entities(c: Column) -> Column:
    for ent, ch in ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def extract_text_col(html_col: Column) -> Column:
    """The extraction chain as ONE column expression — for callers
    that need text_out alongside other columns (streaming pipelines,
    compositions). Each stage is referenced exactly once, so the
    nested expression evaluates each regexp once per row (staging is
    only needed when an intermediate is referenced more than once)."""
    s = F.decode(html_col, "UTF-8")
    for pat in (RE_COMMENT, RE_SCRIPT, RE_STYLE, RE_TAG):
        s = F.regexp_replace(s, pat, "")
    s = _decode_entities(s)
    return F.trim(F.regexp_replace(s, RE_WS, " "))


def extract_text(df: DataFrame, id_col: str = "doc_id",
                 html_col: str = "html") -> DataFrame:
    """(id, text_out, n_html_bytes): visible text per page.

    Staged projections keep each regexp at one evaluation per row
    (the same pattern as urls.canonical_url_df — inlining the chain
    would re-run earlier stages once per reference)."""
    raw = F.col(html_col)
    s0 = F.decode(raw, "UTF-8")
    d = df.select(
        F.col(id_col),
        F.octet_length(raw).cast("long").alias("n_html_bytes"),
        F.regexp_replace(s0, RE_COMMENT, "").alias("_s"),
    )
    d = d.select(
        id_col, "n_html_bytes",
        F.regexp_replace(F.col("_s"), RE_SCRIPT, "").alias("_s"),
    )
    d = d.select(
        id_col, "n_html_bytes",
        F.regexp_replace(F.col("_s"), RE_STYLE, "").alias("_s"),
    )
    d = d.select(
        id_col, "n_html_bytes",
        F.regexp_replace(F.col("_s"), RE_TAG, "").alias("_s"),
    )
    txt = _decode_entities(F.col("_s"))
    txt = F.trim(F.regexp_replace(txt, RE_WS, " "))
    return d.select(F.col(id_col), txt.alias("text_out"),
                    F.col("n_html_bytes"))


def extract_expr_sql(html_expr: str) -> str:
    """The extraction chain as one DuckDB expression over a BLOB
    expression — the SQL twin of extract_text_col. Flags: 'g'
    replaces all (Spark's regexp_replace always does); 's'/'i'
    carried inline in the shared patterns."""
    s = f"decode({html_expr})"
    for pat in (RE_COMMENT, RE_SCRIPT, RE_STYLE, RE_TAG):
        s = f"regexp_replace({s}, '{pat}', '', 'g')"
    for ent, ch in ENTITIES:
        lit = ch.replace("'", "''")
        s = f"replace({s}, '{ent}', '{lit}')"
    return f"trim(regexp_replace({s}, '{RE_WS}', ' ', 'g'))"


def extract_text_sql(pages: str, id_col: str = "doc_id",
                     html_col: str = "html") -> str:
    """DuckDB twin of extract_text over a subquery/table `pages`
    whose html column is a BLOB."""
    s = extract_expr_sql(html_col)
    return (
        f"SELECT {id_col}, {s} AS text_out, "
        f"CAST(octet_length({html_col}) AS BIGINT) AS n_html_bytes "
        f"FROM {pages}"
    )

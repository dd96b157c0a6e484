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
     numeric forms the fixtures exercise) in ONE pass — split on
     '&', first-match CASE per piece, rejoin — so decoded output is
     never re-scanned and ``&amp;lt;`` round-trips to the literal
     ``&lt;`` and not ``<`` (r5: replaces the per-entity replace
     chain, which cost one full string scan per table entry);
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

# Fixed entity table — the engine's DOCUMENTED normalization
# contract, not the full WHATWG list (~2,200 names, which as a
# replace chain would scan every string 2,200×/row).  The set below
# is the high-coverage head of real web text: the structural five
# (amp/lt/gt/quot/apos), the typographic punctuation family
# (dashes, curly quotes, ellipsis, guillemets, bullet, middot), the
# symbol head (copy/reg/trade/deg/euro/pound), and the decimal
# numeric twins of the frequent ones.  Published Common-Crawl
# extraction pipelines decode the same head set; the long tail
# (accented-letter names, math, Greek) is left encoded BY CONTRACT —
# at 10^12 rows a bounded, corpus-measured table is the right trade
# (tools/entity_freq.py measures the synthetic corpus: the head set
# covers 100% of fixture occurrences).  Values are generated from
# the stdlib's WHATWG table at import, so each mapping is
# spec-correct by construction; two normalization OVERRIDES are part
# of the contract: &nbsp;/&#160; → ASCII space (so the whitespace
# collapse merges it) and &shy;/&#173; → removed (soft hyphen).
# Decode order significant: &amp;/&#38; strictly last so double-
# encoded entities round-trip (&amp;lt; → &lt;, not <).
_NAMED_HEAD = (
    "lt", "gt", "quot", "apos",
    "ndash", "mdash", "lsquo", "rsquo", "ldquo", "rdquo", "hellip",
    "laquo", "raquo", "bull", "middot",
    "copy", "reg", "trade", "deg", "euro", "pound",
)
_NUMERIC_HEAD = (34, 39, 60, 62, 101, 8211, 8212, 8216, 8217,
                 8220, 8221, 8230)


def _build_entities() -> tuple:
    import html as _html

    pairs: list[tuple[str, str]] = []
    for name in _NAMED_HEAD:
        pairs.append((f"&{name};", _html.unescape(f"&{name};")))
    for cp in _NUMERIC_HEAD:
        pairs.append((f"&#{cp};", chr(cp)))
    # contract overrides (normalization, not decoding)
    pairs += [("&nbsp;", " "), ("&#160;", " "),
              ("&shy;", ""), ("&#173;", "")]
    # &amp; and its numeric twin strictly last
    pairs += [("&amp;", "&"), ("&#38;", "&")]
    return tuple(pairs)


ENTITIES = _build_entities()


def _decode_entities(c: Column) -> Column:
    """Single-pass entity decode (r5 — replaces the 38-pass replace
    chain, which re-scanned the full string once per table entry):
    split on '&', decode the ≤1 entity that can start each
    subsequent piece via a first-match CASE over the table, rejoin.

    One string scan regardless of table size — table growth costs
    per-'&' prefix checks, not whole-string passes (the replace
    chain was 38 full scans/row, measured 2.5× on html_extract_text
    at sf0.1).  Decoded output is never re-scanned, so double-encoded
    entities round-trip exactly as amp-last did (&amp;lt; → &lt;) —
    and, unlike the sequential chain, a deletion (&shy;) can never
    cascade into a NEW entity match, which matches real HTML parser
    behavior (the chain's only divergence, on adversarial nestings
    like &am&shy;p; that no parser decodes either).  No table entry
    is a prefix of another, so first-match == only-match and table
    order is immaterial (amp-last kept for readability).  The DuckDB
    twin (decode_entities_sql) is generated from the same tuple."""
    ps = F.split(c, "&", -1)

    def dec(p: Column) -> Column:
        expr = None
        for ent, ch in ENTITIES:
            name = ent[1:]  # strip the '&' the split consumed
            val = F.concat(
                F.lit(ch), p.substr(F.lit(len(name) + 1), F.length(p))
            )
            expr = (F.when(p.startswith(name), val) if expr is None
                    else expr.when(p.startswith(name), val))
        return expr.otherwise(F.concat(F.lit("&"), p))

    return F.concat(
        F.element_at(ps, 1),
        F.array_join(F.transform(F.slice(ps, 2, F.size(ps) - 1), dec), ""),
    )


def decode_entities_sql(expr: str) -> str:
    """DuckDB twin of ``_decode_entities`` — same split/CASE/rejoin,
    generated from the same ENTITIES tuple."""
    ps = f"string_split({expr}, '&')"
    cases = " ".join(
        f"WHEN starts_with(p, '{ent[1:]}') "
        f"THEN '{ch.replace(chr(39), chr(39) * 2)}' || p[{len(ent)}:]"
        for ent, ch in ENTITIES
    )
    piece = f"CASE {cases} ELSE '&' || p END"
    return (
        f"(({ps})[1] || array_to_string("
        f"list_transform(({ps})[2:], p -> {piece}), ''))"
    )


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
    s = decode_entities_sql(s)
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

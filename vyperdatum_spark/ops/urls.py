"""URL canonicalization + canonical-URL deduplication.

A standard web-corpus pipeline stage (Common-Crawl-shaped inputs key
on `url`): near-identical fetches of the same resource differ only in
scheme/host case, default ports, fragments, tracking parameters, and
trailing slashes. Canonicalizing before exact dedup collapses them
without touching `text` (the byte-identity contract).

Rules (all pure JVM regexp/string column math, zero Python):
  1. lowercase the scheme+authority (NOT the path/query — paths are
     case-sensitive per RFC 3986);
  2. strip the fragment (``#…``);
  3. drop default ports (``:80`` for http, ``:443`` for https);
  4. remove ``utm_*`` tracking parameters (leading-separator form);
  5. strip a trailing slash from a non-root path.

At 100 TB this is a projection + one hash-groupBy on the canonical
key — the same single-shuffle shape as `dedup.exact_duplicates`.
Every rule is expressed with portable regexes so the DuckDB oracle
evaluates the identical transformation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# scheme://authority (everything before the first path slash)
_AUTH_RE = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)"


def url_dedup(df: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """Groups of rows collapsing to one canonical URL: (canonical_url,
    keeper_id = min id, n_members). One hash shuffle on the canonical
    key; only groups with >1 member are returned (the dedup report
    shape, mirroring dedup.exact_duplicates)."""
    canon = canonical_url_df(df, url_col, id_col)
    return (
        canon.groupBy("canonical_url")
        .agg(
            F.min(F.col(id_col)).alias("keeper_id"),
            F.count("*").alias("n_members"),
        )
        .filter(F.col("n_members") > 1)
    )


def canonical_url_df(df: DataFrame, url_col: str = "url",
                     id_col: str = "doc_id") -> DataFrame:
    """(id, canonical_url) projection — staged columns so each regexp
    runs once per row."""
    u0 = F.regexp_replace(F.col(url_col), r"#.*$", "")
    d = df.select(F.col(id_col), u0.alias("_u"))
    u = F.regexp_replace(F.col("_u"), r"\?utm_[^&#]*&", "?")
    u = F.regexp_replace(u, r"[?&]utm_[^&#]*", "")
    d = d.select(id_col, u.alias("_u"))
    d = d.select(
        id_col, "_u",
        F.regexp_extract(F.col("_u"), _AUTH_RE, 1).alias("_auth"),
    )
    rest = F.expr("substring(_u, length(_auth) + 1)")
    auth = F.lower(F.col("_auth"))
    auth = F.regexp_replace(auth, r"^(https://.*):443$", "$1")
    auth = F.regexp_replace(auth, r"^(http://.*):80$", "$1")
    rest = F.regexp_replace(rest, r"(.+)/$", "$1")
    return d.select(
        F.col(id_col), F.concat(auth, rest).alias("canonical_url")
    )

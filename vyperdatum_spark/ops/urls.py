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


def host_of(url_col) -> F.Column:
    """Registrable host of a URL (lowercased authority minus port and
    userinfo) — the key for domain-blocklist filtering."""
    auth = F.lower(F.regexp_extract(F.col(url_col) if isinstance(url_col, str)
                                    else url_col, _AUTH_RE, 1))
    host = F.regexp_replace(auth, r"^[a-z][a-z0-9+.-]*://", "")
    host = F.regexp_replace(host, r"^[^@]*@", "")
    return F.regexp_replace(host, r":\d+$", "")


def blocklist_filter(df: DataFrame, blocked_hosts: list[str],
                     url_col: str = "url") -> DataFrame:
    """Domain-blocklist URL filtering (the UT1/adult-list stage of a
    web-corpus pipeline): drop rows whose host OR any parent domain is
    blocked ('ads.example.com' is blocked by 'example.com').

    Scale shape: the blocklist ships as a BROADCAST dim (real lists
    are ~10^6 hosts ≈ tens of MB — well inside broadcast range) and
    the match is a left_anti join on the exploded suffix chain of each
    host (a host yields ≤ label-count suffixes, ~3-5), so the corpus
    side never shuffles."""
    spark = df.sparkSession
    bl = spark.createDataFrame(
        [(h.lower(),) for h in blocked_hosts], "blocked_host string"
    )
    host = host_of(url_col)
    with_host = df.withColumn("_host", host)
    # suffix chain: ['a.b.c', 'b.c', 'c'] via array slicing of labels
    labels = F.split(F.col("_host"), r"\.")
    suffixes = F.transform(
        F.sequence(F.lit(1), F.size(labels)),
        lambda i: F.array_join(F.slice(labels, i, F.size(labels)), "."),
    )
    exploded = with_host.withColumn("_sfx", F.explode(suffixes))
    hit_ids = (
        exploded.join(F.broadcast(bl),
                      exploded["_sfx"] == bl["blocked_host"], "inner")
        .select("_host").distinct()
    )
    return (
        with_host.join(F.broadcast(hit_ids), "_host", "left_anti")
        .drop("_host")
    )


def blocklist_filter_sql(inner_sql: str, blocked_hosts: list[str],
                         url_col: str = "url") -> str:
    """DuckDB twin: same host extraction + suffix-chain membership."""
    hosts = ", ".join(f"('{h.lower()}')" for h in blocked_hosts)
    auth = f"lower(regexp_extract({url_col}, '{_AUTH_RE}', 1))"
    host = (
        f"regexp_replace(regexp_replace(regexp_replace({auth}, "
        "'^[a-z][a-z0-9+.-]*://', ''), '^[^@]*@', ''), ':[0-9]+$', '')"
    )
    return (
        f"WITH _in AS (SELECT *, {host} AS _host FROM ({inner_sql})), "
        f"_bl(blocked_host) AS (VALUES {hosts}), "
        "_hit AS (SELECT DISTINCT i._host FROM _in i, _bl b "
        "WHERE i._host = b.blocked_host "
        "OR i._host LIKE '%.' || b.blocked_host) "
        "SELECT * EXCLUDE (_host) FROM _in "
        "WHERE _host NOT IN (SELECT _host FROM _hit)"
    )


def latest_capture(df: DataFrame, url_col: str = "url",
                   ts_col: str = "warc_ts", id_col: str = "doc_id") -> DataFrame:
    """Latest capture per canonical URL — the Common-Crawl snapshot
    dedup: a crawl re-fetches the same resource across snapshots and
    downstream wants exactly one row per page, the freshest.

    Shape at 100 TB: canonicalize (projection) + ONE hash shuffle on
    the canonical key with a map-side-combining ``max(struct(ts, id))``
    aggregate — deliberately NOT a window ``row_number`` (a window
    sorts every group and carries all rows through the shuffle; the
    struct-max agg combines partially before it). Ties on ts break to
    the larger id, deterministically on both engines.

    Returns (canonical_url, latest_id, latest_ts, n_captures)."""
    canon = canonical_url_df(df, url_col, id_col, extra_cols=[ts_col])
    best = F.max(F.struct(F.col(ts_col), F.col(id_col))).alias("_b")
    return (
        canon.groupBy("canonical_url")
        .agg(best, F.count("*").alias("n_captures"))
        .select(
            "canonical_url",
            F.col(f"_b.{id_col}").alias("latest_id"),
            F.col(f"_b.{ts_col}").alias("latest_ts"),
            "n_captures",
        )
    )


def latest_capture_sql(inner_sql: str, url_col: str = "url",
                       ts_col: str = "warc_ts",
                       id_col: str = "doc_id") -> str:
    """DuckDB twin of latest_capture over `inner_sql` — a subquery
    yielding (id, ts, url). Window form (oracle clarity over the
    map-combine shape the Spark plan uses)."""
    canon = canonical_url_sql(inner_sql, url_col=url_col, id_col=id_col,
                              extra_cols=[ts_col])
    return (
        f"WITH c AS ({canon}) "
        f"SELECT canonical_url, {id_col} AS latest_id, "
        f"{ts_col} AS latest_ts, n_captures FROM ("
        f"SELECT *, COUNT(*) OVER (PARTITION BY canonical_url) AS n_captures, "
        f"ROW_NUMBER() OVER (PARTITION BY canonical_url "
        f"ORDER BY {ts_col} DESC, {id_col} DESC) AS rn FROM c) WHERE rn = 1"
    )


def canonical_url_sql(inner_sql: str, url_col: str = "url",
                      id_col: str = "doc_id",
                      extra_cols: list[str] | None = None) -> str:
    """DuckDB twin of canonical_url_df: the same staged regex sequence
    ('g' flag where Spark's regexp_replace replaces all occurrences).
    Returns a SELECT yielding (id, *extra_cols, canonical_url)."""
    extra = "".join(f"{c}, " for c in (extra_cols or []))
    return (
        f"WITH _u0 AS (SELECT {id_col}, {extra}"
        f"regexp_replace({url_col}, '#.*$', '') AS u FROM ({inner_sql})), "
        f"_u1 AS (SELECT {id_col}, {extra}"
        "regexp_replace(regexp_replace(u, "
        "'\\?utm_[^&#]*&', '?', 'g'), '[?&]utm_[^&#]*', '', 'g') AS u "
        "FROM _u0), "
        f"_u2 AS (SELECT {id_col}, {extra}u, "
        f"regexp_extract(u, '{_AUTH_RE}', 1) AS auth FROM _u1) "
        f"SELECT {id_col}, {extra}"
        "regexp_replace(regexp_replace(lower(auth), '^(https://.*):443$', "
        "'\\1'), '^(http://.*):80$', '\\1') || "
        "regexp_replace(substr(u, length(auth) + 1), '(.+)/$', '\\1') "
        "AS canonical_url FROM _u2"
    )


def canonical_url_df(df: DataFrame, url_col: str = "url",
                     id_col: str = "doc_id",
                     extra_cols: list[str] | None = None) -> DataFrame:
    """(id, *extra_cols, canonical_url) projection — staged columns so
    each regexp runs once per row."""
    extra = list(extra_cols or [])
    u0 = F.regexp_replace(F.col(url_col), r"#.*$", "")
    d = df.select(F.col(id_col), *extra, u0.alias("_u"))
    u = F.regexp_replace(F.col("_u"), r"\?utm_[^&#]*&", "?")
    u = F.regexp_replace(u, r"[?&]utm_[^&#]*", "")
    d = d.select(id_col, *extra, u.alias("_u"))
    d = d.select(
        id_col, *extra, "_u",
        F.regexp_extract(F.col("_u"), _AUTH_RE, 1).alias("_auth"),
    )
    rest = F.expr("substring(_u, length(_auth) + 1)")
    auth = F.lower(F.col("_auth"))
    auth = F.regexp_replace(auth, r"^(https://.*):443$", "$1")
    auth = F.regexp_replace(auth, r"^(http://.*):80$", "$1")
    rest = F.regexp_replace(rest, r"(.+)/$", "$1")
    return d.select(
        F.col(id_col), *extra, F.concat(auth, rest).alias("canonical_url")
    )

"""Round-4 curation ops: HTML extraction, latest-capture, line dedup,
PII redaction, repetition stats — golden unit tests (the sf-level
oracle gate covers the corpus-scale behavior)."""

import pandas as pd
from pyspark.sql import functions as F

from vyperdatum_spark.ops import html, lines, pii, textstats, urls


# ------------------------------------------------------------ html
def _extract_one(spark, payload: str) -> str:
    pdf = pd.DataFrame({"doc_id": [0], "html": [payload.encode("utf-8")]})
    out = html.extract_text(spark.createDataFrame(pdf)).toPandas()
    return out.loc[0, "text_out"]


def test_html_tag_strip_and_ws_collapse(spark):
    got = _extract_one(
        spark, "<html>\n  <body><h1>a b</h1>\n\t<p>c</p> </body></html>"
    )
    assert got == "a b c"


def test_html_script_style_comment_removed(spark):
    payload = (
        '<body><!-- <p>junk</p> --><SCRIPT a="1">if(a<b){x();}\n'
        "more</SCRIPT>keep<style>.c{}</style>"
        "<!--one--><b>two</b><!--three--></body>"
    )
    assert _extract_one(spark, payload) == "keeptwo"


def test_html_entity_decode_order(spark):
    # &amp; decoded LAST: '&amp;lt;' must become the literal '&lt;'
    got = _extract_one(spark, "<p>a &amp;lt; b &lt; c &#101;nd &amp; x</p>")
    assert got == "a &lt; b < c end & x"


def test_html_extended_entity_table(spark):
    """Round-5 contract table: typographic punctuation, symbols,
    decimal twins, the nbsp/shy normalization overrides — and parity
    with the DuckDB oracle expression on the same payload."""
    import duckdb

    payload = (
        "<p>&ldquo;A&rdquo;&nbsp;&ndash;&#160;B&shy;C &hellip; "
        "&copy;&nbsp;2024 &laquo;D&raquo; &#8217;E&#8221; "
        "3&deg; &euro;5 &pound;6 &bull; x&middot;y &trade;&reg;</p>"
    )
    got = _extract_one(spark, payload)
    exp = ("“A” – BC … © 2024 «D» "
           "’E” 3° €5 £6 • x·y "
           "™®")
    assert got == exp
    sql = html.extract_text_sql(
        "(SELECT 0 AS doc_id, encode(?) AS html)"
    )
    oracle = duckdb.execute(sql, [payload]).df()
    assert oracle.loc[0, "text_out"] == exp


def test_html_byte_identity_contract(spark):
    """The north-rule invariant: extracted text byte-identical to the
    source text through the synthetic page builder, every rotation."""
    from vyperdatum_spark.queries.webtext import _docs, _pages

    sf = "/root/testdata/sf0.001"
    src = _docs(spark, sf).select("doc_id", "text")
    got = html.extract_text(_pages(spark, sf))
    bad = (
        got.join(src, "doc_id")
        .filter(F.col("text_out") != F.col("text"))
        .count()
    )
    assert bad == 0
    assert got.count() == src.count()


# -------------------------------------------------------- latest capture
def test_latest_capture_picks_max_ts_then_id(spark):
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "warc_ts": [100, 300, 300, 50, 10],
        "url": [
            "https://a.example.com/p",
            "HTTPS://A.EXAMPLE.com:443/p#f",   # same canonical
            "https://a.example.com/p/",        # same canonical, ts tie
            "https://a.example.com/p?utm_x=1", # same canonical
            "https://b.example.com/q",         # singleton group
        ],
    })
    got = (
        urls.latest_capture(spark.createDataFrame(pdf))
        .toPandas().set_index("canonical_url").sort_index()
    )
    assert len(got) == 2
    a = got.loc["https://a.example.com/p"]
    assert a["latest_id"] == 3          # ts tie 300 broken by larger id
    assert a["latest_ts"] == 300
    assert a["n_captures"] == 4
    assert got.loc["https://b.example.com/q", "latest_id"] == 5


# ------------------------------------------------------------ line dedup
def test_remove_common_lines_threshold_and_order(spark):
    bp = "all rights reserved"
    rows = [
        (0, f"alpha\n{bp}\nbeta"),
        (1, f"{bp}\ngamma"),
        (2, f"delta\n{bp}"),
        (3, f"{bp}"),               # only boilerplate -> empty doc
        (4, "epsilon\nzeta"),       # untouched
        (5, f"twice\n{bp}\ntwice"), # in-doc dup counts ONE doc
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    got = (
        lines.remove_common_lines(spark.createDataFrame(pdf), min_docs=3)
        .toPandas().set_index("doc_id").sort_index()
    )
    assert got.loc[0, "clean_text"] == "alpha\nbeta"
    assert got.loc[0, "n_lines_in"] == 3 and got.loc[0, "n_lines_kept"] == 2
    assert got.loc[3, "clean_text"] == "" and got.loc[3, "n_lines_kept"] == 0
    assert got.loc[4, "clean_text"] == "epsilon\nzeta"
    # 'twice' occurs in ONE distinct doc -> kept, order preserved
    assert got.loc[5, "clean_text"] == "twice\ntwice"


def test_remove_common_lines_below_threshold_survives(spark):
    pdf = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["shared\na", "shared\nb"],   # 2 docs < min_docs=3
    })
    got = (
        lines.remove_common_lines(spark.createDataFrame(pdf), min_docs=3)
        .toPandas().set_index("doc_id").sort_index()
    )
    assert got.loc[0, "clean_text"] == "shared\na"
    assert got.loc[1, "clean_text"] == "shared\nb"


def test_composed_chains_compile_under_codegen_limits(spark):
    """Regression guard for the janino 64 KB method limit: with
    codegen fallback DISABLED, a stage that fails to compile raises
    instead of silently running interpreted. The curation chain used
    to blow the limit because the pushed-down gopher filter duplicated
    the whole HTML-extraction expression; the explode(array(...))
    Generate barrier keeps it generated once."""
    import __spark_entry__ as entry

    qs = entry.queries_extended()
    old = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        for name in ("curation_end_to_end", "pipeline_end_to_end",
                     "html_extract_text"):
            qs[name](spark, "/root/testdata/sf0.001") \
                .write.format("noop").mode("overwrite").save()
    finally:
        spark.conf.set("spark.sql.codegen.fallback", old)


def test_dedup_paragraphs_keepfirst_semantics(spark):
    """Keep-FIRST exact dedup (arXiv:2107.06499): a repeated line
    survives only at its earliest (doc_id, pos); in-doc repeats also
    collapse to the first; unique lines untouched."""
    bp = "all rights reserved"
    rows = [
        (0, f"alpha\n{bp}\nbeta"),
        (1, f"{bp}\ngamma"),
        (2, f"delta\n{bp}"),
        (3, f"{bp}"),                # duplicate-only doc -> empty
        (4, "epsilon\nzeta"),        # untouched
        (5, "twice\nother\ntwice"),  # in-doc repeat keeps the first
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    got = (
        lines.dedup_paragraphs_keepfirst(spark.createDataFrame(pdf))
        .toPandas().set_index("doc_id").sort_index()
    )
    assert got.loc[0, "clean_text"] == f"alpha\n{bp}\nbeta"  # first copy kept
    assert got.loc[1, "clean_text"] == "gamma"
    assert got.loc[2, "clean_text"] == "delta"
    assert got.loc[3, "clean_text"] == "" and got.loc[3, "n_parts_kept"] == 0
    assert got.loc[4, "clean_text"] == "epsilon\nzeta"
    assert got.loc[5, "clean_text"] == "twice\nother"
    assert got.loc[5, "n_parts_in"] == 3 and got.loc[5, "n_parts_kept"] == 2


# ------------------------------------------------------------------ pii
def test_pii_redaction_goldens(spark):
    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "mail me at a.b+c@sub.example.org today",
            "host 192.168.0.1 and 10.0.0.255 up",
            "call +1-555-0199 or +44-201-555-7777",
            "user@203.0.113.9 mixed",   # e-mail wins over the IP inside
        ],
    })
    got = (
        pii.pii_redact(spark.createDataFrame(pdf))
        .toPandas().set_index("doc_id").sort_index()
    )
    assert got.loc[0, "clean_text"] == "mail me at [EMAIL] today"
    assert (got.loc[0, ["n_email", "n_ip", "n_phone"]] == [1, 0, 0]).all()
    assert got.loc[1, "clean_text"] == "host [IP] and [IP] up"
    assert got.loc[1, "n_ip"] == 2
    assert got.loc[2, "clean_text"] == "call [PHONE] or [PHONE]"
    assert got.loc[2, "n_phone"] == 2
    assert got.loc[3, "clean_text"] == "[EMAIL] mixed"
    assert (got.loc[3, ["n_email", "n_ip"]] == [1, 0]).all()


# ------------------------------------------------------------ repetition
def test_repetition_stats_goldens(spark):
    pdf = pd.DataFrame({
        "doc_id": [0, 1],
        "text": [
            "spam " * 19 + "spam",                 # 20x one word
            " ".join(f"w{i:02d}" for i in range(20)),  # all distinct
        ],
    })
    got = (
        textstats.repetition_df(spark.createDataFrame(pdf))
        .toPandas().set_index("doc_id").sort_index()
    )
    assert got.loc[0, "n_words"] == 20 and got.loc[0, "n_distinct_words"] == 1
    assert got.loc[0, "dup_word_frac"] == 0.95
    assert got.loc[0, "top_word_frac"] == 1.0
    assert not got.loc[0, "gopher_keep"]           # dup frac over bound
    assert got.loc[1, "dup_word_frac"] == 0.0
    assert got.loc[1, "top_word_frac"] == 0.05
    assert got.loc[1, "gopher_keep"]


# ------------------------------------------------- compositions
def test_curation_end_to_end_semantics(spark):
    """Composition invariants at sf0.001: latest-capture dedup leaves
    one row per canonical URL, redaction leaves no raw PII span, and
    the Gopher filter bounds word counts."""
    from vyperdatum_spark.ops.textstats import GOPHER_MIN_WORDS
    from vyperdatum_spark.queries.webtext import q_curation_end_to_end

    out = q_curation_end_to_end(spark, "/root/testdata/sf0.001")
    out.cache()
    assert out.count() > 0
    dup_canon = (
        out.groupBy("canonical_url").count().filter("count > 1").count()
    )
    assert dup_canon == 0
    leaked = out.filter(
        F.col("clean_text").contains("@mail")
        | F.col("clean_text").rlike(r"\+1-555-\d{4}")
    ).count()
    assert leaked == 0
    assert out.filter(F.col("n_words") < GOPHER_MIN_WORDS).count() == 0
    # redaction evidence survives the filter chain on some rows
    assert out.filter(F.col("n_pii") > 0).count() > 0
    out.unpersist()


def test_stream_first_capture_across_batches(spark, tmp_path):
    """Keyed first-capture state survives micro-batches: a canonical
    URL introduced in batch 1 must not re-emit in batch 2, even with
    an earlier timestamp (first-wins is per STREAM, not per batch)."""
    import os

    import pandas as pd

    from vyperdatum_spark.streaming import stateful

    in_dir = str(tmp_path / "fc_in")
    out_dir = str(tmp_path / "fc_out")
    ck_dir = str(tmp_path / "fc_ck")
    os.makedirs(in_dir)

    def run():
        rows = spark.readStream.schema(
            "canonical_url string, warc_ts long, doc_id long, text_out string"
        ).parquet(in_dir)
        q = (
            stateful.stream_first_capture(rows)
            .writeStream.outputMode("append").format("parquet")
            .option("path", out_dir).option("checkpointLocation", ck_dir)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return spark.read.parquet(out_dir).toPandas()

    pd.DataFrame({
        "canonical_url": ["a", "a", "b"],
        "warc_ts": [200, 100, 50],
        "doc_id": [1, 2, 3],
        "text_out": ["a200", "a100", "b50"],
    }).to_parquet(f"{in_dir}/b1.parquet")
    out1 = run().set_index("canonical_url").sort_index()
    assert len(out1) == 2
    # within the introducing batch, earliest (ts, id) wins
    assert out1.loc["a", "first_id"] == 2 and out1.loc["a", "first_ts"] == 100
    assert out1.loc["a", "text_out"] == "a100"
    assert out1.loc["a", "n_in_batch"] == 2

    pd.DataFrame({
        "canonical_url": ["a", "c"],
        "warc_ts": [10, 999],   # 'a' earlier than batch 1 — still held
        "doc_id": [9, 4],
        "text_out": ["a10", "c999"],
    }).to_parquet(f"{in_dir}/b2.parquet")
    out2 = run()
    assert len(out2) == 3      # only 'c' newly emitted
    assert sorted(out2["canonical_url"]) == ["a", "b", "c"]
    a = out2.set_index("canonical_url").loc["a"]
    assert a["first_id"] == 2 and a["first_ts"] == 100


def test_incremental_curation_consumer_exactly_once(spark, tmp_path):
    """Curation as an incremental snapshot consumer: only newly
    crawled pages are extracted/redacted per run, the watermark
    commits atomically with the curated rows, and a replay with
    nothing new is a no-op — the north-rule checkpointed-consumer
    shape applied to the curation chain."""
    import pandas as pd

    from vyperdatum_spark.ops.html import extract_text_col
    from vyperdatum_spark.sources import tables

    src = str(tmp_path / "crawl")
    out = str(tmp_path / "curated")

    def crawl_batch(lo, hi):
        return spark.createDataFrame(pd.DataFrame({
            "doc_id": list(range(lo, hi)),
            "html": [
                f"<html><body><p>doc {k} mail a@b{k}.example.net</p></body></html>"
                .encode() for k in range(lo, hi)
            ],
        }))

    def curate(rows):
        from vyperdatum_spark.ops import pii
        ext = rows.select(
            "doc_id", extract_text_col(F.col("html")).alias("text_out"))
        return pii.pii_annotate(ext, "text_out").select(
            "doc_id", "clean_text", "n_email")

    tables.write_table(crawl_batch(0, 50), src, mode="overwrite")
    r1 = tables.process_incremental(spark, src, out, curate)
    assert not r1["skipped"] and (r1["since"], r1["until"]) == (0, 1)
    got1 = tables.read_table(spark, out)
    assert got1.count() == 50
    assert got1.filter(F.col("clean_text").contains("[EMAIL]")).count() == 50

    tables.write_table(crawl_batch(50, 80), src, mode="append")
    r2 = tables.process_incremental(spark, src, out, curate)
    assert (r2["since"], r2["until"]) == (1, 2)
    got2 = tables.read_table(spark, out)
    assert got2.count() == 80                      # no re-curation of 0..49
    assert got2.select("doc_id").distinct().count() == 80

    r3 = tables.process_incremental(spark, src, out, curate)
    assert r3["skipped"]
    assert tables.consumer_watermark(out) == 2


def test_cc_pages_is_the_input_hint_shape(spark):
    """_cc_pages synthesizes the exact north-rule input table shape —
    (url, warc_ts, html:binary, text, lang) — and extraction over its
    html column reproduces `text` byte-identically."""
    from vyperdatum_spark.ops.html import extract_text_col
    from vyperdatum_spark.queries.webtext import _cc_pages

    pages = _cc_pages(spark, "/root/testdata/sf0.001")
    fields = {f.name: f.dataType.simpleString() for f in pages.schema.fields}
    assert fields == {
        "doc_id": "bigint", "url": "string", "warc_ts": "bigint",
        "html": "binary", "text": "string", "lang": "string",
    }
    bad = pages.select(
        (extract_text_col(F.col("html")) != F.col("text")).alias("ne")
    ).filter("ne").count()
    assert bad == 0


# ------------------------------------------------------------ blocklist
def test_blocklist_filter_exact_and_parent_domain(spark):
    from vyperdatum_spark.ops import urls as u

    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "url": [
            "https://bad.example.com/x",          # exact host block
            "https://ads.bad.example.com/y",      # parent-domain block
            "HTTPS://BAD.EXAMPLE.com:443/z",      # case/port still blocked
            "https://user:pw@bad.example.com/w",  # userinfo stripped
            "https://goodbad.example.com/ok",     # NOT a label suffix
            "https://fine.example.org/ok",
        ],
    })
    got = (
        u.blocklist_filter(spark.createDataFrame(pdf), ["bad.example.com"])
        .toPandas()
    )
    assert sorted(got["doc_id"]) == [4, 5]


def test_blocklist_keeps_all_when_no_hit(spark):
    from vyperdatum_spark.ops import urls as u

    pdf = pd.DataFrame({
        "doc_id": [0, 1],
        "url": ["https://a.example.com/x", "https://b.example.org/y"],
    })
    got = u.blocklist_filter(
        spark.createDataFrame(pdf), ["nowhere.example.net"]
    )
    assert got.count() == 2
    assert set(got.columns) == {"doc_id", "url"}


# ----------------------------------------------------- trigram language ID
def test_langid_trigram_goldens(spark):
    from vyperdatum_spark.ops import textstats as ts

    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [
            "the value and the table",    # en markers
            "el valor la los",            # es markers
            "",                           # empty: zero hits everywhere
        ],
    })
    got = (
        ts.langid_trigram_df(spark.createDataFrame(pdf))
        .toPandas().set_index("doc_id").sort_index()
    )
    assert got.loc[0, "pred_lang"] == "en" and got.loc[0, "tri_hits"] > 0
    assert got.loc[1, "pred_lang"] == "es" and got.loc[1, "tri_hits"] > 0
    # all-zero scores: struct max falls to the lexicographically last
    assert got.loc[2, "tri_hits"] == 0
    assert got.loc[2, "pred_lang"] == sorted(ts.LANG_MARKERS)[-1]


def test_top_ngrams_counts_and_order(spark):
    from vyperdatum_spark.ops import textstats as ts

    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a b a b", "a b c", "z"],   # 'a b' x3 across 2 docs
    })
    got = ts.top_ngrams(spark.createDataFrame(pdf), n=2, k=3).toPandas()
    assert list(got.columns) == ["ngram", "n_docs", "n_occurrences"]
    assert got.iloc[0].tolist() == ["a b", 2, 3]
    rest = set(map(tuple, got.iloc[1:].values.tolist()))
    assert rest == {("b a", 1, 1), ("b c", 1, 1)}


def test_curation_policy_reasons_per_rule(spark):
    """Each policy rule fires independently and reasons are the
    sorted comma-joined failed-rule names ('' when kept)."""
    from vyperdatum_spark.ops.textstats import curation_policy_df

    rows = [
        (1, "tiny doc"),                                         # too_short
        (2, " ".join(["spam"] * 40)),                            # repetitive
        (3, " ".join(f"hyperextended{i}word" for i in range(12))),  # word_len
        (4, "the quick brown fox and the lazy dog in a sunny park today"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["keep"], r["reasons"])
           for r in curation_policy_df(df).collect()}
    assert got[1] == (0, "no_stopwords,too_short")
    assert got[2] == (0, "no_stopwords,repetitive")
    assert got[3] == (0, "no_stopwords,word_len")
    assert got[4] == (1, "")

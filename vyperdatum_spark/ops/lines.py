"""Cross-document line-level dedup (boilerplate removal).

The CCNet / RefinedWeb curation stage: lines that recur across many
documents ("subscribe to our newsletter", cookie banners, nav bars)
are template boilerplate, not content — remove every line that occurs
in >= min_docs distinct documents and reassemble each document from
its surviving lines in original order.

Scale shape (the whole point at 100 TB):
  1. posexplode lines — projection, no shuffle;
  2. per-line distinct-doc counts — ONE hash shuffle on the line key
     with map-side partial aggregation (count-distinct rewritten as
     two-level agg by Catalyst);
  3. broadcast-or-shuffle join of the (small, heavy-hitter) removal
     set back onto the lines — the removal list is tiny relative to
     the corpus (only lines crossing the threshold), so Spark's AQE
     turns this into a broadcast join at runtime;
  4. reassemble per doc — ONE shuffle on doc_id, order restored by
     sorting the collected (pos, line) structs JVM-side.

Joining the REMOVAL set (left_anti) instead of the full count table
keeps the join side bounded by the number of boilerplate lines, not
the corpus line count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "\n"


def remove_common_lines(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        min_docs: int = 3) -> DataFrame:
    """(id, clean_text, n_lines_in, n_lines_kept): text with every
    line occurring in >= min_docs distinct docs removed; documents
    whose lines are all boilerplate survive with clean_text = ''."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), SEP)).alias("_pos", "_line"),
    )
    removal = (
        lines.groupBy("_line")
        .agg(F.countDistinct(id_col).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_line")
    )
    kept = lines.join(removal, "_line", "left_anti")
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
            SEP,
        ).alias("clean_text"),
        F.count("*").alias("n_lines_kept"),
    )
    totals = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), SEP)).cast("long").alias("n_lines_in"),
    )
    return totals.join(reassembled, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        F.col("n_lines_in"),
        F.coalesce(F.col("n_lines_kept"), F.lit(0)).cast("long")
        .alias("n_lines_kept"),
    )


def remove_common_lines_sql(table: str = "documents",
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            min_docs: int = 3) -> str:
    """DuckDB twin: identical split/count/filter/reassemble semantics
    (string_agg ORDER BY position restores original line order)."""
    return (
        f"WITH _ls AS (SELECT {id_col}, i AS pos, ls[i] AS line FROM "
        f"(SELECT {id_col}, string_split({text_col}, chr(10)) AS ls "
        f"FROM {table}) "
        "CROSS JOIN unnest(generate_series(1, len(ls))) AS s(i)), "
        "_rm AS (SELECT line FROM _ls GROUP BY line "
        f"HAVING COUNT(DISTINCT {id_col}) >= {min_docs}), "
        f"_kept AS (SELECT l.* FROM _ls l WHERE l.line NOT IN "
        "(SELECT line FROM _rm)), "
        f"_re AS (SELECT {id_col}, "
        "string_agg(line, chr(10) ORDER BY pos) AS clean_text, "
        f"COUNT(*) AS n_lines_kept FROM _kept GROUP BY {id_col}) "
        f"SELECT t.{id_col}, COALESCE(r.clean_text, '') AS clean_text, "
        f"CAST(len(string_split(t.{text_col}, chr(10))) AS BIGINT) "
        "AS n_lines_in, "
        "CAST(COALESCE(r.n_lines_kept, 0) AS BIGINT) AS n_lines_kept "
        f"FROM {table} t LEFT JOIN _re r USING ({id_col})"
    )


# --------------------------------------- keep-first paragraph dedup
def dedup_paragraphs_keepfirst(df: DataFrame, id_col: str = "doc_id",
                               text_col: str = "text",
                               sep: str = SEP) -> DataFrame:
    """Exact substring dedup at paragraph granularity (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499): every repeated paragraph keeps exactly its
    FIRST occurrence corpus-wide (ordered by doc id, then position)
    and later copies are removed — unlike ``remove_common_lines``,
    which deletes boilerplate from ALL documents including the first.

    Scale shape: posexplode (no shuffle) → ONE hash shuffle on the
    paragraph key for the first-occurrence window (row_number) →
    one doc_id shuffle to reassemble. The window partitions by
    paragraph text, so hot boilerplate paragraphs are the skew risk;
    at 100 TB partition instead by a 64-bit paragraph hash and, for
    pathological heavy hitters, pre-aggregate the per-(paragraph,
    doc) min position map-side — the rule only needs the global
    minimum, which is associative.

    Output: (id, clean_text, n_parts_in, n_parts_kept).
    """
    from pyspark.sql import Window

    parts = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("_pos", "_part"),
    )
    w = Window.partitionBy("_part").orderBy(F.col(id_col), F.col("_pos"))
    kept = (
        parts.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
    )
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_part"))),
                lambda s: s["_part"],
            ),
            sep,
        ).alias("clean_text"),
        F.count("*").alias("n_parts_kept"),
    )
    totals = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), sep)).cast("long")
        .alias("n_parts_in"),
    )
    return totals.join(reassembled, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        F.col("n_parts_in"),
        F.coalesce(F.col("n_parts_kept"), F.lit(0)).cast("long")
        .alias("n_parts_kept"),
    )


def dedup_paragraphs_keepfirst_sql(table: str = "documents",
                                   id_col: str = "doc_id",
                                   text_col: str = "text") -> str:
    """DuckDB twin (sep fixed to newline: chr(10))."""
    return (
        f"WITH _ps AS (SELECT {id_col}, i AS pos, ps[i] AS part FROM "
        f"(SELECT {id_col}, string_split({text_col}, chr(10)) AS ps "
        f"FROM {table}) "
        "CROSS JOIN unnest(generate_series(1, len(ps))) AS s(i)), "
        "_rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY part "
        f"ORDER BY {id_col}, pos) AS rk FROM _ps), "
        f"_re AS (SELECT {id_col}, "
        "string_agg(part, chr(10) ORDER BY pos) AS clean_text, "
        f"COUNT(*) AS n_parts_kept FROM _rk WHERE rk = 1 GROUP BY {id_col}) "
        f"SELECT t.{id_col}, COALESCE(r.clean_text, '') AS clean_text, "
        f"CAST(len(string_split(t.{text_col}, chr(10))) AS BIGINT) "
        "AS n_parts_in, "
        "CAST(COALESCE(r.n_parts_kept, 0) AS BIGINT) AS n_parts_kept "
        f"FROM {table} t LEFT JOIN _re r USING ({id_col})"
    )

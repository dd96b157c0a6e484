"""Sequence packing for training-data assembly.

LLM pretraining consumes fixed-length token sequences; the standard
high-utilization layout is CHUNKED CONCATENATION: concatenate every
document in a shard (each followed by a separator/EOS token), then
slice the stream into ``seq_len``-token windows.  The op that matters
at corpus scale is the OFFSET ASSIGNMENT — for each document, where
in its shard's token stream it starts and which output sequences it
spans — because that is what lets a distributed writer emit exact
training sequences without materializing the concatenation.

Pure integer window math: an exclusive running sum of (tokens + sep)
per shard gives the start offset; first/last sequence indexes are
integer divisions.  Deterministic given (shard, order) — the whole op
is one shard-partitioned window, i.e. one shuffle, and is therefore
hash-gateable against the identical SQL in DuckDB.

Scale shape: real pipelines pack WITHIN shards (a shard = what one
writer task emits), so the window partitions by shard — bounded state
per task, no global ordering anywhere.  Shard count is the
parallelism lever; a hash-derived shard column keeps them balanced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "ws_tokens",
    shard_col: str = "source",
    seq_len: int = 512,
    sep_tokens: int = 1,
) -> DataFrame:
    """Assign each document its span in the shard's concatenated
    token stream: ``start_offset`` (exclusive cumsum of previous
    docs' tokens + separators, ordered by ``id_col``), and the
    ``first_seq``/``last_seq`` fixed-length sequence indexes it
    touches.  ``n_seqs`` = sequences this doc spans (a doc shorter
    than ``seq_len`` can still span 2 if it straddles a boundary)."""
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    occupied = F.col(tokens_col) + F.lit(sep_tokens)
    out = (
        df.withColumn(
            "start_offset",
            F.coalesce(F.sum(occupied).over(w), F.lit(0)).cast("long"),
        )
        # `div` is integer division on longs — exact at any offset,
        # unlike `/` which goes through double
        .withColumn("__end", (F.col("start_offset") + occupied - 1).cast("long"))
        .withColumn("first_seq", F.expr(f"start_offset div {seq_len}"))
        .withColumn("last_seq", F.expr(f"__end div {seq_len}"))
        .drop("__end")
        .withColumn(
            "n_seqs", (F.col("last_seq") - F.col("first_seq") + 1).cast("long")
        )
    )
    return out


def pack_sequences_sql(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    tokens_expr: str = "CAST(len(string_split(text, ' ')) AS BIGINT)",
    shard_col: str = "source",
    seq_len: int = 512,
    sep_tokens: int = 1,
) -> str:
    """DuckDB twin of pack_sequences over a raw table (token count
    recomputed via the same whitespace rule as textstats)."""
    occ = f"({tokens_expr} + {sep_tokens})"
    return (
        f"SELECT {id_col}, {shard_col}, {tokens_expr} AS ws_tokens, "
        f"CAST(COALESCE(SUM({occ}) OVER ("
        f"  PARTITION BY {shard_col} ORDER BY {id_col} "
        f"  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)"
        f" AS start_offset, "
        f"CAST(FLOOR(COALESCE(SUM({occ}) OVER ("
        f"  PARTITION BY {shard_col} ORDER BY {id_col} "
        f"  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / {seq_len})"
        f" AS BIGINT) AS first_seq, "
        f"CAST(FLOOR((COALESCE(SUM({occ}) OVER ("
        f"  PARTITION BY {shard_col} ORDER BY {id_col} "
        f"  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + {occ} - 1)"
        f" / {seq_len}) AS BIGINT) AS last_seq, "
        f"CAST(FLOOR((COALESCE(SUM({occ}) OVER ("
        f"  PARTITION BY {shard_col} ORDER BY {id_col} "
        f"  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + {occ} - 1)"
        f" / {seq_len}) - FLOOR(COALESCE(SUM({occ}) OVER ("
        f"  PARTITION BY {shard_col} ORDER BY {id_col} "
        f"  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / {seq_len})"
        f" + 1 AS BIGINT) AS n_seqs "
        f"FROM {table}"
    )

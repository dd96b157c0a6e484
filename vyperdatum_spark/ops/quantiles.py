"""Distributed quantiles for corpus-quality curation.

Two paths, one contract:

- ``group_quantiles`` — EXACT per-group percentiles via Spark's
  sort-based ``percentile`` aggregate (linear interpolation, the same
  definition DuckDB's ``quantile_cont`` uses — the two agree
  bit-for-bit on integer inputs, which is what the oracle gate
  checks).  Exact percentile holds each group's values on one
  reducer, so it is for BOUNDED group sizes (per-language corpus
  stats at 10^12 docs: fine for the agg row count, NOT fine if one
  group holds most of the data — use the approx path there).

- ``group_quantiles_approx`` — ``approx_percentile`` (Greenwald-
  Khanna sketch): fixed-size mergeable state, map-side partial
  aggregation, rank error ≤ 1/accuracy.  This is the 100-TB path;
  the pytest pins its rank error against the exact answer.

``quantile_threshold_filter`` composes the curation use-case: compute
a per-group cutoff (e.g. per-language p90 of a quality metric), then
keep rows at-or-above it.  Two passes over the data by construction —
a tiny cutoff dim (one row per group) comes back as a broadcast join,
so the second pass adds no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _q_alias(q: float) -> str:
    # 0.5 -> p50, 0.99 -> p99, 0.999 -> p99_9
    pct = q * 100
    s = f"{pct:g}".replace(".", "_")
    return f"p{s}"


def group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: list[float],
) -> DataFrame:
    """Exact per-group percentiles; one column per quantile, named
    p50 / p90 / p99 / p99_9 style (see _q_alias)."""
    aggs = [
        F.percentile(value_col, F.lit(q)).alias(_q_alias(q)) for q in qs
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def group_quantiles_approx(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: list[float],
    accuracy: int = 10000,
) -> DataFrame:
    """Sketch-based per-group percentiles (rank error ≤ 1/accuracy);
    mergeable partials, bounded memory per group — the scale path."""
    aggs = [
        F.approx_percentile(value_col, F.lit(q), F.lit(accuracy)).alias(
            _q_alias(q)
        )
        for q in qs
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def quantile_threshold_filter(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    q: float,
    *,
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Keep rows whose ``value_col`` is >= their group's q-quantile.

    The cutoff dim has one row per group — broadcast back, so the
    filter pass is shuffle-free.  ``exact=False`` switches the cutoff
    computation to the sketch (the 100-TB default)."""
    fn = group_quantiles if exact else (
        lambda d, g, v, qq: group_quantiles_approx(d, g, v, qq, accuracy)
    )
    cuts = fn(df, group_cols, value_col, [q]).withColumnRenamed(
        _q_alias(q), "__cut"
    )
    return (
        df.join(F.broadcast(cuts), group_cols, "inner")
        .filter(F.col(value_col) >= F.col("__cut"))
        .drop("__cut")
    )

"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)     -> flagship query (ellipse→MLLW transform) at sf0.001
queries()        -> every implemented operator (SURVEY.md §2)
oracle_sql()     -> matching DuckDB SQL per query

The geospatial queries run the full engine (PIP join + cogrouped tile
bilinear) over points derived deterministically from the events
table; oracles are closed-form (analytic-plane grids). Webtext
queries cover dedup/similarity/text-analysis over documents and
embeddings.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vyperdatum_spark.queries import geo


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full ellipse→MLLW transform at sf0.001."""
    return geo.queries()["geo_transform_mllw"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    out.update(geo.queries())
    try:
        from vyperdatum_spark.queries import webtext

        out.update(webtext.queries())
    except ImportError:
        pass
    try:
        from vyperdatum_spark.queries import relational

        out.update(relational.queries())
    except ImportError:
        pass
    try:
        from vyperdatum_spark.queries import pipeline

        out.update(pipeline.queries())
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(geo.oracle_sql())
    try:
        from vyperdatum_spark.queries import webtext

        out.update(webtext.oracle_sql())
    except ImportError:
        pass
    try:
        from vyperdatum_spark.queries import relational

        out.update(relational.oracle_sql())
    except ImportError:
        pass
    try:
        from vyperdatum_spark.queries import pipeline

        out.update(pipeline.oracle_sql())
    except ImportError:
        pass
    return out

"""The transform engine: points × regions × grid tiles.

Spark-first re-expression of the reference's ``transform_dataset``
(core.py:357-464). The reference loops regions in the driver and calls
PROJ per region; here the whole thing is one declarative DataFrame
plan (Catalyst plans the joins, AQE handles skew/coalesce):

    points --cell5--> ⋈ broadcast(region cover)      [J1 prune]
           --PIP pandas filter-->                     [J2 exact]
           ⋈ broadcast(steps dim)                     [pipeline steps]
           cogroup (grid_id, cell5[, salt]) with grid_tiles
               -> bilinear pandas kernel              [J3, no raster I/O]
           groupBy (key, region) ordered step sum     [A4]
           groupBy key -> precedence winner           [W1/W2]
           ⋈ back to points on key                    [enrichment]
           flip/round/uncertainty/coverage columns    [F1/F4/F5/F6, J6]

Region membership matches the reference's semantics: a point belongs
to a region iff it is inside the region polygon AND every pipeline
step's grid has valid data there (the reference encodes the latter as
PROJ returning inf outside grids, core.py:421-453). Precedence among
valid regions is last-write-wins in catalog order (W1, core.py:446-453)
or count-ranked for raster mode (W2, raster.py:226-233).

Scale notes (100 TB / 10^12 rows):
- only narrow columns (key, x, y) enter the transform path; heavy page
  payloads (html/text) stay in the driving table and are re-attached
  by the final key join — text passes through byte-identical.
- the tile cogroup ships each tile's node lattice once per group (the
  Spark analog of PROJ's grid cache), not once per point row.
- the hot-key problem (famous coordinates) is handled by explicit
  salting: points get salt = pmod(hash(key), n_salt), tiles are
  replicated n_salt times; AQE skew-join remains on as backstop.
- the steps/cover/sigma dimensions are broadcast (a few hundred rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datums import catalog, pipeline as pl
from ..grids import bilinear, tiler
from ..spatial import cells, pip

DEFAULT_N_SALT = 8


# --------------------------------------------------------------------
# dimension tables (driver-built, broadcast at join time)
# --------------------------------------------------------------------

def region_cover_df(spark: SparkSession, res: int = cells.COARSE_RES) -> DataFrame:
    """(region_id, region_ord, cell5) — the J1 prune dimension."""
    rows = [
        (r.region_id, r.region_ord, int(c))
        for r in catalog.REGIONS
        for c in pip.polygon_cover(list(r.polygon), res)
    ]
    return spark.createDataFrame(rows, "region_id string, region_ord int, cell5 long")


def steps_df(spark: SparkSession, from_datum: str, to_datum: str) -> DataFrame:
    """(region_id, region_ord, step_ord, grid_id, sign) per region."""
    rows = catalog.region_steps(from_datum, to_datum)
    return spark.createDataFrame(
        rows,
        "region_id string, region_ord int, step_ord int, grid_id string, sign double",
    )


def region_dim_df(spark: SparkSession, from_datum: str, to_datum: str) -> DataFrame:
    """(region_id, unc, pipeline_str) — J6 uncertainty + lineage dim."""
    rows = [
        (
            r.region_id,
            float(catalog.combined_sigma(r.region_id, to_datum)),
            pl.compile_pipeline_string(from_datum, to_datum, r.region_id, r.geoid),
        )
        for r in catalog.REGIONS
    ]
    return spark.createDataFrame(rows, "region_id string, unc double, pipeline_str string")


# --------------------------------------------------------------------
# executor kernels
# --------------------------------------------------------------------

def make_pip_filter(polygons: dict[str, list[tuple[float, float]]]):
    """Vectorized PIP pandas UDF over the broadcast polygon dict (J2)."""

    @F.pandas_udf("boolean")
    def _pip(region_id: pd.Series, x: pd.Series, y: pd.Series) -> pd.Series:
        out = np.zeros(len(x), dtype=bool)
        rid = region_id.to_numpy()
        xs = x.to_numpy(dtype=np.float64)
        ys = y.to_numpy(dtype=np.float64)
        for r in pd.unique(region_id.dropna()):
            m = rid == r
            out[m] = pip.contains(polygons[r], xs[m], ys[m])
        return pd.Series(out)

    return _pip


def make_tile_kernel(key_col: str, key_type: str, knn_fallback: bool):
    """Cogrouped bilinear kernel: one (grid_id, cell5[, salt]) group =
    one tile lattice + all points needing it (J3/J8)."""
    out_schema = (
        f"{key_col} {key_type}, region_id string, region_ord int, "
        "step_ord int, signed_sep double"
    )

    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0:
            return pd.DataFrame(
                columns=[key_col, "region_id", "region_ord", "step_ord", "signed_sep"]
            )
        if len(right) == 0:
            sep = np.full(len(left), np.nan)
        else:
            t = right.iloc[0]
            sep = bilinear.interp_tile(
                float(t["lon0"]), float(t["lat0"]),
                float(t["dlon"]), float(t["dlat"]),
                int(t["nx"]), int(t["ny"]),
                np.asarray(t["values"], dtype=np.float64),
                left["x"].to_numpy(dtype=np.float64),
                left["y"].to_numpy(dtype=np.float64),
                knn_fallback=knn_fallback,
            )
        return pd.DataFrame(
            {
                key_col: left[key_col],
                "region_id": left["region_id"],
                "region_ord": left["region_ord"],
                "step_ord": left["step_ord"],
                "signed_sep": left["sign"].to_numpy(dtype=np.float64) * sep,
            }
        )

    return fn, out_schema


# --------------------------------------------------------------------
# the engine
# --------------------------------------------------------------------

def transform_points(
    spark: SparkSession,
    points: DataFrame,
    from_datum: str,
    to_datum: str,
    key_col: str = "pid",
    x_col: str = "x",
    y_col: str = "y",
    z_col: str = "z",
    tiles: DataFrame | None = None,
    allow_points_outside_coverage: bool = False,
    include_uncertainty: bool = True,
    include_lineage: bool = False,
    precedence: str = "list",  # "list" = W1 (points), "count" = W2 (raster)
    knn_fallback: bool = False,
    n_salt: int = 0,
) -> DataFrame:
    """Transform ``points[z_col]`` from ``from_datum`` to ``to_datum``.

    Returns the input DataFrame (all columns preserved — the
    byte-identical passthrough contract) enriched with:
      cell5 (tile key), region_id/region_ord (winning region, null if
      none), sep (applied separation), z_out (rounded 3, null if
      uncovered and not allowed), unc (if requested), covered flag,
      pipeline_str (if include_lineage).
    """
    flip = pl.output_flip(to_datum)
    x, y, z = F.col(x_col), F.col(y_col), F.col(z_col)
    cell = cells.encode_col(x, y, cells.COARSE_RES)

    if tiles is None:
        tiles = tiler.build_tile_df(spark)

    base = points.withColumn("cell5", cell)

    null_steps = pl.compile_steps(
        from_datum, to_datum, "R", "G"
    )  # None ⇒ null transform

    if null_steps is None:
        # identical datums: z passes through (flip/round still apply)
        out = base.withColumn("region_id", F.lit(None).cast("string"))
        out = out.withColumn("region_ord", F.lit(None).cast("int"))
        out = out.withColumn("sep", F.lit(0.0))
        out = out.withColumn("z_out", F.round(F.lit(flip) * z, 3))
        out = out.withColumn("covered", F.lit(True))
        if include_uncertainty:
            out = out.withColumn("unc", F.lit(0.0))
        if include_lineage:
            out = out.withColumn("pipeline_str", F.lit(None).cast("string"))
        return out

    cover = region_cover_df(spark)
    steps = steps_df(spark, from_datum, to_datum)
    polygons = {r.region_id: list(r.polygon) for r in catalog.REGIONS}
    pip_udf = make_pip_filter(polygons)

    # narrow fact: only (key, x, y) travel through the transform path
    narrow = base.select(
        F.col(key_col), x.alias("x"), y.alias("y"), F.col("cell5")
    )

    cand = narrow.join(F.broadcast(cover), "cell5", "inner").filter(
        pip_udf(F.col("region_id"), F.col("x"), F.col("y"))
    )
    stepped = cand.join(
        F.broadcast(steps.withColumnRenamed("region_ord", "_ro")),
        "region_id",
    ).withColumn("region_ord", F.col("_ro")).drop("_ro")

    key_type = dict(points.dtypes)[key_col]
    kernel, out_schema = make_tile_kernel(key_col, key_type, knn_fallback)

    if n_salt and n_salt > 1:
        stepped = stepped.withColumn(
            "salt", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_salt)).cast("int")
        )
        tiles_s = tiles.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
        )
        group_keys = ["grid_id", "cell5", "salt"]
    else:
        tiles_s = tiles
        group_keys = ["grid_id", "cell5"]

    seps = (
        stepped.groupBy(*group_keys)
        .cogroup(tiles_s.groupBy(*group_keys))
        .applyInPandas(kernel, out_schema)
    )

    # A4: sum steps in pipeline order (deterministic float order)
    per_region = seps.groupBy(key_col, "region_id", "region_ord").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("step_ord", "signed_sep"))),
            F.lit(0.0),
            lambda acc, s: acc + s["signed_sep"],
        ).alias("sep_total")
    )
    valid = per_region.filter(~F.isnan(F.col("sep_total")))

    if precedence == "count":
        # W2: region with the most valid points wins (ties → later ord)
        counts = valid.groupBy("region_id").agg(F.count("*").alias("_cnt"))
        ranked = valid.join(F.broadcast(counts), "region_id")
        winner_struct = F.struct(
            F.col("_cnt"), F.col("region_ord"), F.col("region_id"), F.col("sep_total")
        )
        winners = (
            ranked.groupBy(key_col)
            .agg(F.max(winner_struct).alias("_w"))
            .select(
                key_col,
                F.col("_w.region_id").alias("region_id"),
                F.col("_w.region_ord").alias("region_ord"),
                F.col("_w.sep_total").alias("sep"),
            )
        )
    else:
        # W1: last region in catalog order with valid data wins
        winner_struct = F.struct(
            F.col("region_ord"), F.col("region_id"), F.col("sep_total")
        )
        winners = (
            valid.groupBy(key_col)
            .agg(F.max(winner_struct).alias("_w"))
            .select(
                key_col,
                F.col("_w.region_id").alias("region_id"),
                F.col("_w.region_ord").alias("region_ord"),
                F.col("_w.sep_total").alias("sep"),
            )
        )

    out = base.join(winners, key_col, "left")
    covered = F.col("sep").isNotNull()
    flipc = F.lit(flip)
    z_covered = F.round(flipc * (z + F.col("sep")), 3)

    if allow_points_outside_coverage:
        z_out = F.when(covered, z_covered).otherwise(F.round(flipc * z, 3))
    else:
        z_out = F.when(covered, z_covered)
    out = out.withColumn("z_out", z_out).withColumn("covered", covered)

    if include_uncertainty:
        dim = region_dim_df(spark, from_datum, to_datum)
        out = out.join(F.broadcast(dim.select("region_id", "unc")), "region_id", "left")
        if allow_points_outside_coverage:
            # F6: CATZOC-D vertical uncertainty (raster.py:380-396)
            catzoc = F.when(z > 0, F.lit(3.0)).otherwise(F.lit(3.0) - F.lit(0.06) * z)
            out = out.withColumn("unc", F.when(covered, F.col("unc")).otherwise(catzoc))
        else:
            out = out.withColumn("unc", F.when(covered, F.col("unc")))

    if include_lineage:
        dim = region_dim_df(spark, from_datum, to_datum)
        out = out.join(
            F.broadcast(dim.select("region_id", "pipeline_str")), "region_id", "left"
        )

    return out


# --------------------------------------------------------------------
# J5: sampled mode — transform distinct fine cells, join back
# --------------------------------------------------------------------

def cell_center_cols(cell: Column, res: int) -> tuple[Column, Column]:
    """Center lon/lat of a fine cell — pure column math."""
    sz = F.lit(cells.cell_size_deg(res))
    ix = F.shiftrightunsigned(cell, 29).bitwiseAND(F.lit((1 << 29) - 1)).cast("double")
    iy = cell.bitwiseAND(F.lit((1 << 29) - 1)).cast("double")
    lon = F.lit(-180.0) + (ix + F.lit(0.5)) * sz
    lat = F.lit(-90.0) + (iy + F.lit(0.5)) * sz
    return lon, lat


def transform_points_sampled(
    spark: SparkSession,
    points: DataFrame,
    from_datum: str,
    to_datum: str,
    key_col: str = "pid",
    x_col: str = "x",
    y_col: str = "y",
    z_col: str = "z",
    res: int = cells.FINE_RES,
    **kwargs,
) -> DataFrame:
    """Sampled-grid mode (reference points.py:63-102, J5): transform
    only the distinct fine-cell centers, then equi-join the separation
    back to the full point set. THE production path at 10^12 rows —
    O(distinct cells) pandas work instead of O(points).
    """
    x, y, z = F.col(x_col), F.col(y_col), F.col(z_col)
    flip = pl.output_flip(to_datum)

    with_cell = points.withColumn("cell_r", cells.encode_col(x, y, res))
    distinct_cells = with_cell.select("cell_r").distinct()
    lon, lat = cell_center_cols(F.col("cell_r"), res)
    centers = distinct_cells.select(
        F.col("cell_r"), lon.alias("x"), lat.alias("y"), F.lit(0.0).alias("z")
    )
    tc = transform_points(
        spark, centers, from_datum, to_datum,
        key_col="cell_r", x_col="x", y_col="y", z_col="z", **kwargs,
    )
    cell_sep = tc.select(
        "cell_r",
        F.col("sep").alias("cell_sep"),
        F.col("region_id").alias("region_id"),
        F.col("region_ord").alias("region_ord"),
        *(["unc"] if "unc" in tc.columns else []),
    )
    out = with_cell.join(cell_sep, "cell_r", "left")
    covered = F.col("cell_sep").isNotNull()
    out = (
        out.withColumn("sep", F.col("cell_sep"))
        .withColumn("z_out", F.when(covered, F.round(F.lit(flip) * (z + F.col("sep")), 3)))
        .withColumn("covered", covered)
        .drop("cell_sep")
    )
    return out

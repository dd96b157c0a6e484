"""The transform engine: points × regions × grid tiles.

Spark-first re-expression of the reference's ``transform_dataset``
(core.py:357-464). The reference loops regions in the driver and calls
PROJ per region; here the whole thing is a declarative DataFrame plan
with THREE physical strategies sharing one semantics:

sql (DEFAULT, engine/transform_sql.py) — the whole region loop as
    broadcast hash joins + whole-stage-codegen column math: cover-slot
    prune join [J1], literal-codegen ray-cast PIP [J2], pre-combined
    grid corner joins + bilinear expressions [J3/A4], ord-ascending
    slot coalesce [W1]. ZERO shuffles, ZERO Python crossings; heavy
    page columns never leave Tungsten rows.

broadcast — fused mapInArrow kernel: the region loop runs in numpy
    over Arrow batches, grids shipped once per executor via
    sc.broadcast (the PROJ-grid-cache analog). Routes J8 kNN edge
    fallback and W2 count precedence, which the SQL plan can't express
    without extra passes.

cogroup — salted cogroup against the (grid_id, cell5) tile side
    table, for grid working sets beyond broadcast budget:

    points --cell5/cell9--> ⋈ broadcast(fine region cover)  [J1 prune]
           cogroup (region_id, cell5[, salt]) with region tile bundles
               -> ONE pandas kernel: ray-cast PIP [J2] +
                  per-step bilinear [J3/J4/J8] + ordered sum [A4]
           groupBy key -> precedence winner              [W1/W2]
           ⋈ back to points on key                        [enrichment]

All strategies end in the same finalize contract: F1 coverage, the F4
axis-flip matrix, F5 round(3), F6 CATZOC, J6 uncertainty, the
output-frame z-correction — plus the horizontal-CRS pre-step
(spatial/crs.py) when the input is projected or foreign-frame.

Region membership matches the reference's semantics: a point belongs
to a region iff it is inside the region polygon AND every pipeline
step's grid has valid data there (the reference encodes the latter as
PROJ returning inf outside grids, core.py:421-453). Precedence among
valid regions is last-write-wins in catalog order (W1, core.py:446-453)
or count-ranked for raster mode (W2, raster.py:226-233).

Scale notes (100 TB / 10^12 rows):
- the sql strategy is the production path: one codegen pass over the
  driving table, all join sides O(grid nodes + polygons) ≈ MBs; it
  measured 0.865 N→4N scaling efficiency (BENCH/BASELINE.md) because
  there is nothing to shuffle and no Python worker boundary to
  contend on.
- the prune join uses a FINE-res polygon cover (broadcast, a few
  hundred rows) so non-member points mostly skip the expensive math;
  exactness still comes from the exact PIP.
- kernel strategies: each tile bundle ships once per cogroup/executor,
  not once per point row; the hot-key problem (famous coordinates) is
  handled by explicit salting (pmod(xxhash64(key), n_salt)) with AQE
  skew-join as backstop.
- J5 sampled mode (transform_points_sampled) transforms O(distinct
  fine cells) and equi-joins back — the cheapest path when exact
  per-point PIP is not required.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datums import catalog, pipeline as pl
from ..grids import bilinear, tiler
from ..spatial import cells, crs as hcrs, pip

DEFAULT_N_SALT = 8


# --------------------------------------------------------------------
# dimension tables (driver-built, broadcast at join time)
# --------------------------------------------------------------------

def region_cover_df(spark: SparkSession, res: int = cells.FINE_RES) -> DataFrame:
    """(region_id, region_ord, cell5, cell_r) — the J1 prune dimension.

    Fine-res cells tighten the prune (fewer non-member rows reach the
    kernel); each row also carries the COARSE parent cell, the
    tile-bundle cogroup key."""
    rows = []
    for r in catalog.REGIONS:
        for c in pip.polygon_cover(list(r.polygon), res):
            rows.append(
                (r.region_id, r.region_ord, int(cells.parent(c, cells.COARSE_RES)),
                 int(c))
            )
    return spark.createDataFrame(
        rows, "region_id string, region_ord int, cell5 long, _cellr long"
    )


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


def tile_bundles_df(spark: SparkSession, tiles: DataFrame,
                    from_datum: str, to_datum: str) -> DataFrame:
    """Right side of the transform cogroup: per (region_id, cell5),
    one row per pipeline step carrying that step's tile lattice +
    sign/order — the whole regional pipeline for a cell in one group."""
    steps = steps_df(spark, from_datum, to_datum)
    return tiles.join(F.broadcast(steps), "grid_id").select(
        "region_id", "cell5", "step_ord", "sign",
        "lon0", "lat0", "dlon", "dlat", "nx", "ny", "values",
    )


# --------------------------------------------------------------------
# broadcast strategy: zero-shuffle fused kernel over mapInPandas
# --------------------------------------------------------------------

def _bundle_payload(spark: SparkSession, tiles: DataFrame,
                    from_datum: str, to_datum: str):
    """Collect the per-region step tiles into plain dicts for
    broadcast: {region_id: [(step_ord, sign, {cell5: tile_tuple})]}.

    This is the Spark analog of PROJ's grid cache: the regional grids
    needed by one job are a bounded, reusable working set (VDatum
    grids are MBs) — shipping them once per executor beats shuffling
    every point row to the tiles. The cogroup strategy remains for
    grid sets beyond broadcast budget."""
    rows = tile_bundles_df(spark, tiles, from_datum, to_datum).collect()
    by_region: dict = {}
    for r in rows:
        step = by_region.setdefault(r["region_id"], {}).setdefault(
            (r["step_ord"], r["sign"]), {}
        )
        step[r["cell5"]] = (
            r["lon0"], r["lat0"], r["dlon"], r["dlat"], r["nx"], r["ny"],
            np.asarray(r["values"], dtype=np.float64),
        )
    return {
        rid: [(o, s, tiles_by_cell) for (o, s), tiles_by_cell in
              sorted(steps.items())]
        for rid, steps in by_region.items()
    }


def _fixture_payload(from_datum: str, to_datum: str):
    """Same payload as :func:`_bundle_payload` but built directly from
    the catalog's grid definitions in driver-side numpy — no Spark job.

    ``_bundle_payload`` launched a createDataFrame → join → collect job
    costing 0.8-2.6 s of FIXED driver time per transform call, which
    capped N→4N scaling (Amdahl) in round 1. The result is cached per
    (catalog version, datum pair): the grid working set is immutable
    for a catalog version, exactly like PROJ's process-wide grid cache.
    """
    key = (catalog.catalog_version(), from_datum.lower(), to_datum.lower())
    hit = _FIXTURE_PAYLOAD_CACHE.get(key)
    if hit is not None:
        return hit
    defs = {gd.grid_id: gd for gd in tiler.fixture_grid_defs()}
    by_region: dict = {}
    for region_id, _ord, step_ord, grid_id, sign in catalog.region_steps(
        from_datum, to_datum
    ):
        step = by_region.setdefault(region_id, {}).setdefault(
            (step_ord, sign), {}
        )
        for row in tiler.tile_rows(defs[grid_id]):
            # row layout matches TILE_SCHEMA:
            # (grid_id, cell5, lon0, lat0, dlon, dlat, nx, ny, values)
            step[row[1]] = (
                row[2], row[3], row[4], row[5], row[6], row[7],
                np.asarray(row[8], dtype=np.float64),
            )
    payload = {
        rid: [(o, s, tiles_by_cell) for (o, s), tiles_by_cell in
              sorted(steps.items())]
        for rid, steps in by_region.items()
    }
    _FIXTURE_PAYLOAD_CACHE[key] = payload
    return payload


_FIXTURE_PAYLOAD_CACHE: dict = {}


def make_broadcast_kernel(
    key_col: str,
    key_type: str,
    polygons: dict[str, list[tuple[float, float]]],
    covers: dict[str, np.ndarray],      # region -> sorted fine-cell ids
    bc_bundles,                         # sc.broadcast(_bundle_payload output)
    region_ords: dict[str, int],
    n_steps: dict[str, int],
    knn_fallback: bool,
    emit: str,    # "passthrough" | "winner" (W1) | "per_region" (W2)
    x_col: str = "x",
    y_col: str = "y",
):
    """mapInPandas kernel mirroring the reference's region loop
    (core.py:421-453) — regions in catalog order, later regions
    overwrite — vectorized numpy per Arrow batch, no shuffle.

    The grid payload arrives as an EXPLICIT Spark broadcast (not a
    closure capture): the pickled task command stays small and the
    payload lands once per executor via the broadcast machinery,
    instead of being re-deserialized per task."""
    out_schema = (
        f"{key_col} {key_type}, region_id string, region_ord int, sep_total double"
    )
    order = sorted(region_ords, key=lambda r: region_ords[r])

    def _region_sep(region_id, xs, ys, c5s, idx):
        inside = pip.contains(polygons[region_id], xs[idx], ys[idx])
        idx = idx[inside]
        if len(idx) == 0:
            return idx, None
        steps = bc_bundles.value.get(region_id, [])
        if len(steps) != n_steps.get(region_id, -1):
            return idx, np.full(len(idx), np.nan)
        total = np.zeros(len(idx))
        for _ord, sign, tiles_by_cell in steps:
            v = np.full(len(idx), np.nan)
            for c5 in np.unique(c5s[idx]):
                m = c5s[idx] == c5
                t = tiles_by_cell.get(int(c5))
                if t is not None:
                    v[m] = bilinear.interp_tile(
                        t[0], t[1], t[2], t[3], t[4], t[5], t[6],
                        xs[idx][m], ys[idx][m], knn_fallback=knn_fallback,
                    )
            total = total + sign * v  # pipeline order, float64
        return idx, total

    def _winner_arrays_np(xs, ys, c5s, c9s):
        n = len(xs)
        best_sep = np.full(n, np.nan)
        best_ord = np.full(n, -1, dtype=np.int32)
        best_code = np.full(n, -1, dtype=np.int32)  # index into `order`
        for code, rid in enumerate(order):  # ascending ord = W1
            cand = np.isin(c9s, covers[rid])
            idx = np.flatnonzero(cand)
            if len(idx) == 0:
                continue
            idx, total = _region_sep(rid, xs, ys, c5s, idx)
            if total is None or len(idx) == 0:
                continue
            ok = np.isfinite(total)
            upd = idx[ok]
            best_sep[upd] = total[ok]
            best_ord[upd] = region_ords[rid]
            best_code[upd] = code
        return best_code, best_ord, best_sep

    def arrow_passthrough(it):
        """mapInArrow kernel: heavy input columns pass through as raw
        Arrow buffers (no pandas object materialization — measured 4×
        collapse at 32 workers otherwise); string outputs are built in
        Arrow C++ via dictionary take."""
        import pyarrow as pa
        import pyarrow.compute as pc

        region_dict = pa.array(order, type=pa.string())
        for batch in it:
            names = batch.schema.names
            xs = batch.column(names.index(x_col)).to_numpy(zero_copy_only=False)
            ys = batch.column(names.index(y_col)).to_numpy(zero_copy_only=False)
            xs = np.asarray(xs, dtype=np.float64)
            ys = np.asarray(ys, dtype=np.float64)
            c9s = cells.encode_np(xs, ys, cells.FINE_RES)
            c5s = cells.encode_np(xs, ys, cells.COARSE_RES)
            best_code, best_ord, best_sep = _winner_arrays_np(xs, ys, c5s, c9s)
            member = best_code >= 0
            codes = pa.array(
                np.where(member, best_code, 0).astype(np.int32),
                mask=~member,
            )
            region_col = pc.take(region_dict, codes)
            ord_col = pa.array(best_ord, mask=~member)
            sep_col = pa.array(best_sep, mask=~member)
            yield pa.RecordBatch.from_arrays(
                list(batch.columns) + [region_col, ord_col, sep_col],
                names + ["region_id", "region_ord", "sep"],
            )

    def _winner_arrays(pdf, xs, ys, c5s, c9s):
        n = len(pdf)
        best_sep = np.full(n, np.nan)
        best_ord = np.full(n, -1, dtype=np.int32)
        best_region = np.full(n, None, dtype=object)
        for rid in order:  # ascending ord: overwrite = W1
            cand = np.isin(c9s, covers[rid])
            idx = np.flatnonzero(cand)
            if len(idx) == 0:
                continue
            idx, total = _region_sep(rid, xs, ys, c5s, idx)
            if total is None or len(idx) == 0:
                continue
            ok = np.isfinite(total)
            upd = idx[ok]
            best_sep[upd] = total[ok]
            best_ord[upd] = region_ords[rid]
            best_region[upd] = rid
        return best_region, best_ord, best_sep

    if emit == "passthrough":
        return arrow_passthrough, out_schema

    def fn(it):
        for pdf in it:
            n = len(pdf)
            if n == 0:
                continue
            xs = pdf[x_col].to_numpy(dtype=np.float64)
            ys = pdf[y_col].to_numpy(dtype=np.float64)
            c9s = cells.encode_np(xs, ys, cells.FINE_RES)
            c5s = cells.encode_np(xs, ys, cells.COARSE_RES)
            if emit == "winner":
                best_region, best_ord, best_sep = _winner_arrays(
                    pdf, xs, ys, c5s, c9s
                )
                member = best_ord >= 0
                yield pd.DataFrame(
                    {
                        key_col: pdf[key_col].to_numpy()[member],
                        "region_id": best_region[member],
                        "region_ord": best_ord[member],
                        "sep_total": best_sep[member],
                    }
                )
            else:  # per_region rows for count-ranked precedence (W2)
                parts = []
                for rid in order:
                    cand = np.isin(c9s, covers[rid])
                    idx = np.flatnonzero(cand)
                    if len(idx) == 0:
                        continue
                    idx, total = _region_sep(rid, xs, ys, c5s, idx)
                    if total is None or len(idx) == 0:
                        continue
                    parts.append(
                        pd.DataFrame(
                            {
                                key_col: pdf[key_col].to_numpy()[idx],
                                "region_id": rid,
                                "region_ord": region_ords[rid],
                                "sep_total": total,
                            }
                        )
                    )
                if parts:
                    yield pd.concat(parts, ignore_index=True)

    return fn, out_schema


# --------------------------------------------------------------------
# cogroup strategy kernel: PIP + bilinear steps + ordered sum
# --------------------------------------------------------------------

def make_region_kernel(
    key_col: str,
    key_type: str,
    polygons: dict[str, list[tuple[float, float]]],
    n_steps: dict[str, int],
    knn_fallback: bool,
):
    out_schema = (
        f"{key_col} {key_type}, region_id string, region_ord int, sep_total double"
    )
    cols = [key_col, "region_id", "region_ord", "sep_total"]

    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0:
            return pd.DataFrame({c: pd.Series(dtype=t) for c, t in zip(
                cols, ["object", "object", "int32", "float64"])})
        region_id = left["region_id"].iat[0]
        xs = left["x"].to_numpy(dtype=np.float64)
        ys = left["y"].to_numpy(dtype=np.float64)
        inside = pip.contains(polygons[region_id], xs, ys)
        expected = n_steps.get(region_id, 0)
        if expected == 0:
            # zero-step (identity) pipeline — datum pairs with equal
            # step lists but different names (e.g. mllw → 'noaa chart
            # datum') compile to []; the reference runs the empty PROJ
            # pipeline as identity, so in-polygon points get sep 0,
            # NOT out-of-coverage
            total = np.zeros(len(left))
        elif len(right) != expected:
            # a step's tile is missing for this cell ⇒ outside grid
            # coverage (PROJ-inf semantics, core.py:445-446)
            total = np.full(len(left), np.nan)
        else:
            total = np.zeros(len(left))
            for t in right.sort_values("step_ord").itertuples(index=False):
                v = bilinear.interp_tile(
                    float(t.lon0), float(t.lat0), float(t.dlon), float(t.dlat),
                    int(t.nx), int(t.ny),
                    np.asarray(t.values, dtype=np.float64),
                    xs, ys, knn_fallback=knn_fallback,
                )
                total = total + float(t.sign) * v  # pipeline order, float64
        sep = np.where(inside, total, np.nan)
        return pd.DataFrame(
            {
                key_col: left[key_col],
                "region_id": left["region_id"],
                "region_ord": left["region_ord"],
                "sep_total": sep,
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
    strategy: str = "sql",  # "sql" | "broadcast" | "cogroup"
    input_crs: str = "nad83s",
    output_frame: str | None = None,
    grid_defs: list | None = None,
    grid_cache_token: str | None = None,
) -> DataFrame:
    """Transform ``points[z_col]`` from ``from_datum`` to ``to_datum``.

    Returns the input DataFrame (all columns preserved — the
    byte-identical passthrough contract) enriched with:
      cell5 (tile key), region_id/region_ord (winning region, null if
      none), sep (applied separation), z_out (rounded 3, null if
      uncovered and not allowed), unc (if requested), covered flag,
      pipeline_str (if include_lineage).

    Horizontal CRS handling (reference core.py:166-248, 437-445):
      input_crs     — the catalog CRS the x/y (and 3D-frame z) values
                      are in ('nad83s' geographic default; 'spcs_syn' /
                      'utm_syn' projected; 'itrfs' foreign frame). A
                      non-default input adds x_geo/y_geo (geoid-frame
                      lon/lat) columns; all region/grid math runs on
                      those.
      output_frame  — the geodetic frame of the OUTPUT coordinates
                      (default: the input's frame). When it differs
                      from both the input frame and the geoid frame,
                      x_out/y_out are emitted in that frame and z gets
                      the reference's output-frame correction
                      ``new_z = new_z - (z - diffz)``.

    Strategies:
      sql        — pure-JVM broadcast-join plan (transform_sql.py):
                   zero Python, zero shuffle, whole-stage codegen. THE
                   default. Auto-routes to `broadcast` when it can't
                   express the request (caller-supplied tile table) or
                   when the catalog's literal PIP CASE exceeds the
                   measured codegen budget (general polygons past a
                   few dozen crossing edges — janino's 64 KB method
                   limit; transform_sql.sql_strategy_within_budget).
      broadcast  — fused mapInArrow kernel, grids as an explicit Spark
                   broadcast. Needed for J8 kNN and W2 count ranking.
      cogroup    — salted cogroup join against the tile side table, for
                   grid working sets beyond broadcast budget.
    """
    if strategy not in ("sql", "broadcast", "cogroup"):
        raise ValueError(
            f"strategy {strategy!r} not one of ('sql', 'broadcast', 'cogroup')"
        )
    # datum specs may be EPSG ints, WKT, (horizontal, vertical) tuples
    # or names (reference vypercrs.py:685-812); a horizontal component
    # on the input side sets input_crs, on the output side the frame
    if not isinstance(from_datum, str) or from_datum.lower() not in pl.DATUM_DEFINITION:
        from ..datums import resolve as _resolve

        from_datum, in_horiz = _resolve.resolve_vertical(from_datum, "input")
        if in_horiz is not None and input_crs == "nad83s":
            input_crs = in_horiz
    if not isinstance(to_datum, str) or to_datum.lower() not in pl.DATUM_DEFINITION:
        from ..datums import resolve as _resolve

        to_datum, out_horiz = _resolve.resolve_vertical(to_datum, "output")
        if out_horiz is not None and output_frame is None:
            from ..spatial import crs as _hc

            output_frame = _hc.CRS_FRAME[out_horiz]
    # the SQL strategy now covers W2 count precedence and J8 kNN edge
    # fill (round-3); only a caller-supplied TILE DataFrame (no driver-
    # side grid definitions to compile into the broadcast dims) still
    # routes to the Python-kernel strategies
    if strategy == "sql" and tiles is not None and grid_defs is None:
        strategy = "broadcast"
    # expression-budget auto-route (round-5): the SQL strategy bakes a
    # PIP ray-cast CASE over the whole catalog into every slot; past
    # the measured codegen budget (transform_sql.PIP_CASE_BUDGET —
    # general polygons hit janino's 64 KB method limit at a few dozen
    # crossing edges) janino rejects the method and Spark silently
    # degrades to interpreted evaluation. Route those catalogs to the
    # broadcast kernel, where the region loop is numpy per Arrow batch
    # and plan size is O(1) in catalog complexity.
    if strategy == "sql":
        from . import transform_sql as _tsql_budget

        if not _tsql_budget.sql_strategy_within_budget():
            strategy = "broadcast"
    if grid_defs is not None and tiles is None and strategy != "sql":
        tiles = tiler.build_tile_df(spark, grid_defs)
    # F4 sign matrix: depth-axis INPUT negates z before the pipeline,
    # depth-axis OUTPUT negates after (core.py:397-403, 441-449)
    flips = pl.axis_flips(from_datum, to_datum)
    x, y, z = F.col(x_col), F.col(y_col), F.col(z_col)

    # ----- horizontal CRS pre-step (core.py:397-403 then :419) -------
    in_crs = hcrs.validate_crs(input_crs)
    in_frame = hcrs.CRS_FRAME[in_crs]
    out_frame = (output_frame or in_frame).upper()
    if out_frame not in hcrs.FRAMES:
        raise ValueError(f"output_frame {output_frame!r} not in {hcrs.FRAMES}")
    # 'output equals input' in the reference's NAME sense: geographic
    # input whose frame IS the requested output frame
    out_is_in = (in_crs == "nad83s" and out_frame == "NAD83S") or (
        in_crs == "itrfs" and out_frame == "ITRFS"
    )
    dz_corr = None
    emit_out_xy = None
    if in_crs != "nad83s" or out_frame != hcrs.GEOID_FRAME:
        # depth-axis negation FIRST, then the 3D transform to the
        # geoid frame (matches the reference's operation order)
        lon_c, lat_c, zg_c = hcrs.to_geoid_frame_cols(
            in_crs, x, y, F.lit(flips[0]) * z
        )
        points = (
            points.withColumn("x_geo", lon_c)
            .withColumn("y_geo", lat_c)
            .withColumn("_zg", zg_c)
        )
        x_col, y_col, z_col = "x_geo", "y_geo", "_zg"
        x, y, z = F.col(x_col), F.col(y_col), F.col(z_col)
        flips = (1.0, flips[1])  # input flip folded into _zg
        if not out_is_in and out_frame != hcrs.GEOID_FRAME:
            # output-frame z-correction new_z -= (z - diffz): the net
            # in→out 3D frame shift evaluated at the geoid-frame point
            dz_corr = F.lit(0.0)
            if in_frame == "ITRFS":
                dz_corr = dz_corr + hcrs.frame_dz_cols(x, y)
            if out_frame == "ITRFS":
                dz_corr = dz_corr - hcrs.frame_dz_cols(x, y)
        if out_is_in:
            emit_out_xy = None  # original x/y already ARE the output
        elif out_frame == hcrs.GEOID_FRAME:
            emit_out_xy = (x, y)
        else:
            out_crs_name = "nad83s" if out_frame == "NAD83S" else "itrfs"
            emit_out_xy = hcrs.from_geoid_frame_cols(out_crs_name, x, y)

    cell = cells.encode_col(x, y, cells.COARSE_RES)
    base = points.withColumn("cell5", cell)

    def _emit(df: DataFrame) -> DataFrame:
        if emit_out_xy is not None:
            # reference writes output coords only for valid (covered)
            # points (ans_x[valid_index], core.py:446-448); uncovered
            # rows keep null x_out/y_out
            cov = F.col("covered") if "covered" in df.columns else F.lit(True)
            df = df.withColumn(
                "x_out", F.when(cov, emit_out_xy[0])
            ).withColumn("y_out", F.when(cov, emit_out_xy[1]))
        return df.drop("_zg")

    null_steps = pl.compile_steps(from_datum, to_datum, "R", "G")

    if null_steps is None:
        # identical datums: z passes through (flip/round still apply)
        out = base.withColumn("region_id", F.lit(None).cast("string"))
        out = out.withColumn("region_ord", F.lit(None).cast("int"))
        out = out.withColumn("sep", F.lit(0.0))
        out = out.withColumn(
            "z_out", F.round(F.lit(flips[1]) * (F.lit(flips[0]) * z), 3)
        )
        out = out.withColumn("covered", F.lit(True))
        if include_uncertainty:
            out = out.withColumn("unc", F.lit(0.0))
        if include_lineage:
            out = out.withColumn("pipeline_str", F.lit(None).cast("string"))
        return _emit(out)

    if strategy == "sql":
        from . import transform_sql

        enriched = transform_sql.transform_points_sql(
            spark, base.drop("cell5"), from_datum, to_datum, x_col, y_col,
            grid_defs=grid_defs, knn_fallback=knn_fallback,
            precedence=precedence, grid_cache_token=grid_cache_token,
        )
        return _emit(_finalize(
            enriched, None, spark, from_datum, to_datum, z, flips,
            allow_points_outside_coverage, include_uncertainty,
            include_lineage, key_col, dz_corr,
        ))

    fixture_tiles = tiles is None
    if tiles is None and strategy == "cogroup":
        tiles = tiler.build_tile_df(spark)

    polygons = {r.region_id: list(r.polygon) for r in catalog.REGIONS}
    region_ords = {r.region_id: r.region_ord for r in catalog.REGIONS}
    n_steps = {
        r.region_id: len(pl.compile_steps(from_datum, to_datum, r.region_id, r.geoid) or [])
        for r in catalog.REGIONS
    }
    key_type = dict(points.dtypes)[key_col]

    if strategy == "broadcast":
        # zero-shuffle path: regional grids fit the broadcast budget
        # (the PROJ-grid-cache analog), so the whole region loop runs
        # inside one mapInPandas pass over the input partitions.
        covers = {
            r.region_id: np.array(
                sorted(pip.polygon_cover(list(r.polygon), cells.FINE_RES)),
                dtype=np.int64,
            )
            for r in catalog.REGIONS
        }
        if fixture_tiles:
            # catalog grids: pure driver-side numpy, cached — no Spark job
            payload = _fixture_payload(from_datum, to_datum)
        else:
            payload = _bundle_payload(spark, tiles, from_datum, to_datum)
        bc_bundles = spark.sparkContext.broadcast(payload)
        if precedence == "list":
            # passthrough: W1 winner resolved inside the kernel (the
            # region overwrite loop) and every input column rides
            # through Arrow — the WHOLE transform is one zero-shuffle
            # mapInPandas pass
            from pyspark.sql import types as T

            kernel, _ = make_broadcast_kernel(
                key_col, key_type, polygons, covers, bc_bundles,
                region_ords, n_steps, knn_fallback, "passthrough",
                x_col, y_col,
            )
            out_fields = list(base.schema.fields) + [
                T.StructField("region_id", T.StringType(), True),
                T.StructField("region_ord", T.IntegerType(), True),
                T.StructField("sep", T.DoubleType(), True),
            ]
            enriched = base.mapInArrow(kernel, T.StructType(out_fields))
            return _emit(_finalize(
                enriched, None, spark, from_datum, to_datum, z, flips,
                allow_points_outside_coverage, include_uncertainty,
                include_lineage, key_col, dz_corr,
            ))
        kernel, out_schema = make_broadcast_kernel(
            key_col, key_type, polygons, covers, bc_bundles,
            region_ords, n_steps, knn_fallback, "per_region",
            x_col, y_col,
        )
        narrow = points.select(
            F.col(key_col), x.alias(x_col), y.alias(y_col)
        )
        per_region = narrow.mapInPandas(kernel, out_schema)
        valid = per_region.filter(
            F.col("sep_total").isNotNull() & ~F.isnan(F.col("sep_total"))
        )
    else:
        cover = region_cover_df(spark)
        bundles = tile_bundles_df(spark, tiles, from_datum, to_datum)
        kernel, out_schema = make_region_kernel(
            key_col, key_type, polygons, n_steps, knn_fallback
        )
        narrow = points.select(
            F.col(key_col),
            x.alias("x"),
            y.alias("y"),
            cells.encode_col(x, y, cells.FINE_RES).alias("_cellr"),
        )
        cand = narrow.join(F.broadcast(cover), "_cellr", "inner")

        if n_salt and n_salt > 1:
            cand = cand.withColumn(
                "salt", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_salt)).cast("int")
            )
            bundles_s = bundles.withColumn(
                "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
            )
            group_keys = ["region_id", "cell5", "salt"]
        else:
            bundles_s = bundles
            group_keys = ["region_id", "cell5"]

        per_region = (
            cand.groupBy(*group_keys)
            .cogroup(bundles_s.groupBy(*group_keys))
            .applyInPandas(kernel, out_schema)
        )
        # Arrow converts pandas NaN to Spark NULL, and isnan(NULL) is
        # false — both checks are required or out-of-coverage candidates
        # survive into the precedence aggregation
        valid = per_region.filter(
            F.col("sep_total").isNotNull() & ~F.isnan(F.col("sep_total"))
        )

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

    return _emit(_finalize(
        base, winners, spark, from_datum, to_datum, z, flips,
        allow_points_outside_coverage, include_uncertainty,
        include_lineage, key_col, dz_corr,
    ))


def _finalize(
    base: DataFrame,
    winners: DataFrame | None,
    spark: SparkSession,
    from_datum: str,
    to_datum: str,
    z: Column,
    flips: tuple[float, float],
    allow_points_outside_coverage: bool,
    include_uncertainty: bool,
    include_lineage: bool,
    key_col: str,
    dz_corr: Column | None = None,
) -> DataFrame:
    """Attach winners back to the driving table (no-op for the
    passthrough strategy, which already carries them) and apply the
    output contracts: F1 coverage, F4 flip matrix, F5 round(3),
    F6 CATZOC, J6 unc, output-frame z-correction (core.py:443-444)."""
    out = base.join(winners, key_col, "left") if winners is not None else base
    # NaN-vs-NULL: Arrow maps pandas NaN to NULL, but guard both
    covered = F.col("sep").isNotNull() & ~F.isnan(F.col("sep"))
    fin, fout = F.lit(flips[0]), F.lit(flips[1])
    z_h = fin * z  # input z in height (positive-up) convention
    corr = dz_corr if dz_corr is not None else F.lit(0.0)
    z_covered = F.round(fout * (z_h + F.col("sep") + corr), 3)

    if allow_points_outside_coverage:
        z_out = F.when(covered, z_covered).otherwise(F.round(fout * z_h, 3))
    else:
        z_out = F.when(covered, z_covered)
    out = out.withColumn("z_out", z_out).withColumn("covered", covered)

    if include_uncertainty:
        # literal CASE over the (tiny) catalog instead of a broadcast
        # join (r6): same per-region combined_sigma doubles, same
        # left-join-miss null for uncovered rows, one less broadcast
        # exchange + dim build per transform query (guide §2.4)
        unc_case = None
        for r in catalog.REGIONS:
            v = F.lit(float(catalog.combined_sigma(r.region_id, to_datum)))
            unc_case = (
                F.when(F.col("region_id") == r.region_id, v)
                if unc_case is None
                else unc_case.when(F.col("region_id") == r.region_id, v)
            )
        if unc_case is None:
            unc_case = F.lit(None).cast("double")
        out = out.withColumn("unc", unc_case)
        if allow_points_outside_coverage:
            # F6: CATZOC-D vertical uncertainty over the HEIGHT-axis z
            # (raster.py:384-390 negates a sounding input first)
            catzoc = F.when(z_h > 0, F.lit(3.0)).otherwise(
                F.lit(3.0) - F.lit(0.06) * z_h
            )
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

    Horizontal-CRS handling: a non-default ``input_crs`` /
    ``output_frame`` routes to the frame-aware path — cells are binned
    on geoid-frame lon/lat and the FULL transform (projection, frame
    δz, output-frame z-correction) is evaluated at each cell center
    with z=0, exactly the reference's sampled semantics
    (points.py:67: centers run through transform_dataset, :85:
    ``newz = z_sep[cell] + flip·z``). Like the reference, sampled mode
    emits no per-point output x/y (points.py:78-79).
    """
    # resolve datum specs (EPSG/WKT/tuples) exactly as the full path
    # does so the frame detection below sees the resolved CRS
    input_crs = kwargs.pop("input_crs", "nad83s")
    output_frame = kwargs.pop("output_frame", None)
    if not isinstance(from_datum, str) or from_datum.lower() not in pl.DATUM_DEFINITION:
        from ..datums import resolve as _resolve

        from_datum, in_horiz = _resolve.resolve_vertical(from_datum, "input")
        if in_horiz is not None and input_crs == "nad83s":
            input_crs = in_horiz
    if not isinstance(to_datum, str) or to_datum.lower() not in pl.DATUM_DEFINITION:
        from ..datums import resolve as _resolve

        to_datum, out_horiz = _resolve.resolve_vertical(to_datum, "output")
        if out_horiz is not None and output_frame is None:
            output_frame = hcrs.CRS_FRAME[out_horiz]
    in_crs = hcrs.validate_crs(input_crs)
    in_frame = hcrs.CRS_FRAME[in_crs]
    frame_mode = in_crs != "nad83s" or (
        output_frame is not None and output_frame.upper() != in_frame
    )
    if frame_mode:
        return _transform_sampled_frame(
            spark, points, from_datum, to_datum, key_col, x_col, y_col,
            z_col, res, in_crs, output_frame, **kwargs,
        )

    x, y, z = F.col(x_col), F.col(y_col), F.col(z_col)
    fin, fout = pl.axis_flips(from_datum, to_datum)

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
    # no broadcast hint: cell_sep is O(distinct fine cells) of the
    # input — bounded globally (~2M res-9 cells ≈ 100 MB+) but not
    # small; AQE broadcasts it when the runtime size allows
    out = with_cell.join(cell_sep, "cell_r", "left")
    covered = F.col("cell_sep").isNotNull()
    out = (
        out.withColumn("sep", F.col("cell_sep"))
        .withColumn("z_out", F.when(
            covered,
            F.round(F.lit(fout) * (F.lit(fin) * z + F.col("sep")), 3),
        ))
        .withColumn("covered", covered)
        .drop("cell_sep")
    )
    return out


def _transform_sampled_frame(
    spark: SparkSession,
    points: DataFrame,
    from_datum: str,
    to_datum: str,
    key_col: str,
    x_col: str,
    y_col: str,
    z_col: str,
    res: int,
    in_crs: str,
    output_frame: str | None,
    **kwargs,
) -> DataFrame:
    """Sampled mode with a non-default horizontal CRS / output frame.

    The reference evaluates EVERYTHING (projection inverse, frame δz,
    grid separation, output-frame z-correction) at the sampled cell
    center with z=0 (points.py:67), then adds the axis-flipped point z
    to the center's transformed value (points.py:85). We mirror that:
    ``z_out = z_out(center, z=0) + fin·fout·z``. Binning runs on
    geoid-frame lon/lat so cell keys are degree-scaled regardless of
    the input CRS's units."""
    x, y, z = F.col(x_col), F.col(y_col), F.col(z_col)
    fin, fout = pl.axis_flips(from_datum, to_datum)

    lon_g, lat_g, _zg = hcrs.to_geoid_frame_cols(in_crs, x, y, F.lit(0.0))
    with_cell = points.withColumn(
        "cell_r", cells.encode_col(lon_g, lat_g, res)
    )
    distinct_cells = with_cell.select("cell_r").distinct()
    lon, lat = cell_center_cols(F.col("cell_r"), res)
    # centers expressed back in the INPUT CRS so the inner transform
    # applies the same frame path as the full engine
    cx, cy = hcrs.from_geoid_frame_cols(in_crs, lon, lat)
    centers = distinct_cells.select(
        F.col("cell_r"), cx.alias("x"), cy.alias("y"), F.lit(0.0).alias("z")
    )
    tc = transform_points(
        spark, centers, from_datum, to_datum,
        key_col="cell_r", x_col="x", y_col="y", z_col="z",
        input_crs=in_crs, output_frame=output_frame, **kwargs,
    )
    cell_sep = tc.select(
        "cell_r",
        F.col("z_out").alias("_cell_z0"),
        F.col("sep").alias("sep"),
        F.col("region_id").alias("region_id"),
        F.col("region_ord").alias("region_ord"),
        *(["unc"] if "unc" in tc.columns else []),
    )
    out = with_cell.join(cell_sep, "cell_r", "left")
    covered = F.col("_cell_z0").isNotNull()
    # final round(3) mirrors the default sampled path and the full
    # path (core.py:462 rounds once at output): both sampled modes
    # must emit the same precision for the same request shape
    return (
        out.withColumn(
            "z_out",
            F.when(
                covered,
                F.round(F.col("_cell_z0") + F.lit(fin * fout) * z, 3),
            ),
        )
        .withColumn("covered", covered)
        .drop("_cell_z0")
    )

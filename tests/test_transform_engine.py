"""End-to-end engine parity vs the closed-form numpy oracle.

Ports the semantic content of the reference's central correctness
matrix (tests/test_core.py:89-212, tests/test_points.py) to the
synthetic fixture catalog: per-region golden z values for multiple
output datums, inverse transform, multi-region overlap disambiguation,
uncertainty combination, NaN passthrough, sign flip, out-of-coverage
handling, and the sampled-grid mode."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from vyperdatum_spark.datums import catalog
from vyperdatum_spark.engine import transform as tx
from vyperdatum_spark.spatial import cells, pip


def numpy_oracle(xs, ys, zs, from_datum, to_datum):
    """Expected (region_id, z_out, unc) per point under W1 precedence."""
    n = len(xs)
    region = np.full(n, None, dtype=object)
    for r in catalog.REGIONS:  # ascending ord: later write wins
        m = pip.contains(list(r.polygon), xs, ys)
        region[m] = r.region_id
    z_out = np.full(n, np.nan)
    unc = np.full(n, np.nan)
    for i, rid in enumerate(region):
        if rid is None:
            continue
        z_out[i] = round(
            catalog.transform_closed_form(rid, from_datum, to_datum, xs[i], ys[i], zs[i]), 3
        )
        unc[i] = catalog.combined_sigma(rid, to_datum)
    return region, z_out, unc


def run_engine(spark, pdf, from_datum, to_datum, **kw):
    pts = spark.createDataFrame(pdf)
    out = tx.transform_points(spark, pts, from_datum, to_datum, **kw)
    return out.toPandas().set_index("pid").sort_index()


@pytest.mark.parametrize("to_datum", ["mllw", "mhw", "navd88", "tss"])
def test_transform_matrix_exact(spark, fixture_points, to_datum):
    pdf = fixture_points
    out = run_engine(spark, pdf, "ellipse", to_datum, n_salt=4)
    region, z_exp, unc_exp = numpy_oracle(
        pdf.x.values, pdf.y.values, pdf.z.values, "ellipse", to_datum
    )
    assert (out["region_id"].fillna("∅").to_numpy()
            == pd.Series(region).fillna("∅").to_numpy()).all()
    got_z = out["z_out"].to_numpy(dtype=float)
    assert np.array_equal(np.nan_to_num(got_z, nan=-9e9),
                          np.nan_to_num(z_exp, nan=-9e9))
    got_u = out["unc"].to_numpy(dtype=float)
    assert np.allclose(np.nan_to_num(got_u, nan=-1),
                       np.nan_to_num(unc_exp, nan=-1), atol=1e-12)


def test_inverse_round_trip(spark, fixture_points):
    """mllw→ellipse after ellipse→mllw returns the input z (±0.002,
    reference tolerance: two round(3) steps)."""
    pdf = fixture_points
    fwd = run_engine(spark, pdf, "ellipse", "mllw")
    covered = fwd[fwd.covered]
    back_in = covered.reset_index()[["pid", "x", "y", "z_out"]].rename(
        columns={"z_out": "z"}
    )
    inv = run_engine(spark, back_in, "mllw", "ellipse")
    orig = pdf.set_index("pid").loc[inv.index, "z"]
    assert np.allclose(inv["z_out"].to_numpy(), orig.to_numpy(), atol=0.002)


def test_multi_region_overlap_disambiguation(spark):
    """Reference tests/test_core.py:295-310 analog: points in the
    3-region overlap all resolve to region C (highest catalog ord),
    A-only points to A, B-only points to B."""
    pdf = pd.DataFrame(
        {
            "pid": np.arange(4, dtype=np.int64),
            "x": [-76.75, -77.8, -75.2, -76.75],  # ABC, A-only, B-only, ABC
            "y": [34.75, 33.5, 35.8, 34.71],
            "z": [10.5, 11.0, 11.5, 10.0],
        }
    )
    out = run_engine(spark, pdf, "ellipse", "mllw")
    assert list(out["region_id"]) == [
        "RGNCbay01_8301", "RGNAcoast01_8301", "RGNBinner01_8301", "RGNCbay01_8301",
    ]
    assert out["region_ord"].nunique() == 3


def test_count_precedence_mode(spark):
    """W2 raster precedence: the region with the most valid points
    wins everywhere it has data (raster.py:226-233 analog)."""
    # many points in A-only, few in the A∩B∩C overlap
    n_a, n_o = 50, 3
    xs = np.concatenate([np.full(n_a, -77.9), np.full(n_o, -76.75)])
    ys = np.concatenate([np.linspace(33.1, 34.9, n_a), np.full(n_o, 34.75)])
    pdf = pd.DataFrame(
        {"pid": np.arange(n_a + n_o, dtype=np.int64), "x": xs, "y": ys,
         "z": np.full(n_a + n_o, 10.0)}
    )
    out = run_engine(spark, pdf, "ellipse", "mllw", precedence="count")
    # overlap points: A has n_a + n_o valid, B/C only n_o → A wins
    assert set(out.iloc[n_a:]["region_id"]) == {"RGNAcoast01_8301"}
    # list mode would have chosen C
    out_list = run_engine(spark, pdf, "ellipse", "mllw", precedence="list")
    assert set(out_list.iloc[n_a:]["region_id"]) == {"RGNCbay01_8301"}


def test_nan_coordinates_pass_through(spark):
    """Reference tests/test_points.py:47-61: NaN coords yield NaN z
    without breaking the batch."""
    pdf = pd.DataFrame(
        {
            "pid": np.arange(3, dtype=np.int64),
            "x": [np.nan, -76.75, -77.5],
            "y": [34.0, np.nan, 34.0],
            "z": [10.0, 10.0, 10.0],
        }
    )
    out = run_engine(spark, pdf, "ellipse", "mllw")
    assert out.loc[0, "region_id"] is None and np.isnan(out.loc[0, "z_out"])
    assert out.loc[1, "region_id"] is None and np.isnan(out.loc[1, "z_out"])
    assert out.loc[2, "covered"] and not np.isnan(out.loc[2, "z_out"])


def test_depth_output_sign_flip(spark):
    """Reference tests/test_points.py:112-125 analog: a positive-down
    output datum negates z."""
    pdf = pd.DataFrame(
        {"pid": np.array([0], dtype=np.int64), "x": [-77.5], "y": [34.0], "z": [10.5]}
    )
    mllw = run_engine(spark, pdf, "ellipse", "mllw")
    chart = run_engine(spark, pdf, "ellipse", "noaa chart datum")
    nav = run_engine(spark, pdf, "ellipse", "navd88")
    # mllw and its chart alias share steps AND the depth axis
    assert np.isclose(chart.loc[0, "z_out"], mllw.loc[0, "z_out"], atol=1e-9)
    # depth output negates: z_out = -(z + sep)
    sep = mllw.loc[0, "sep"]
    assert np.isclose(mllw.loc[0, "z_out"], round(-(10.5 + sep), 3), atol=1e-9)
    # height output does not (±1 rounding quantum: python round() is
    # half-even, Spark ROUND is half-up, and this point lands on a
    # .0005 boundary)
    assert np.isclose(
        nav.loc[0, "z_out"], round(10.5 + nav.loc[0, "sep"], 3), atol=0.0011
    )


def test_out_of_coverage_passthrough_and_catzoc(spark):
    """F6 semantics (raster.py:380-396): allowed points keep flip·z and
    get CATZOC-D uncertainty (3.0 for z>0)."""
    pdf = pd.DataFrame(
        {
            "pid": np.arange(2, dtype=np.int64),
            "x": [-74.2, -74.2],  # outside all regions
            "y": [34.0, 34.0],
            "z": [10.5, -5.0],
        }
    )
    out = run_engine(spark, pdf, "ellipse", "mllw",
                     allow_points_outside_coverage=True)
    assert not out["covered"].any()
    # uncovered z keeps flip*z (mllw = depth output => negated);
    # CATZOC evaluates over the HEIGHT-convention z
    assert out.loc[0, "z_out"] == -10.5 and out.loc[0, "unc"] == 3.0
    assert out.loc[1, "z_out"] == 5.0 and out.loc[1, "unc"] == 3.0 - 0.06 * (-5.0)


def test_null_transform_identity(spark, fixture_points):
    out = run_engine(spark, fixture_points, "mllw", "mllw")
    assert np.array_equal(out["z_out"].to_numpy(),
                          np.round(fixture_points.set_index("pid")["z"].to_numpy(), 3))


def test_sampled_mode_close_to_exact(spark, fixture_points):
    """Reference tests/test_points.py:34-44: sampled-grid mode agrees
    with the exact path within the sampling tolerance."""
    pdf = fixture_points
    pts = spark.createDataFrame(pdf)
    exact = tx.transform_points(spark, pts, "ellipse", "mllw").toPandas().set_index("pid")
    sampled = tx.transform_points_sampled(
        spark, pts, "ellipse", "mllw", res=cells.FINE_RES
    ).toPandas().set_index("pid")
    both = exact.join(sampled, rsuffix="_s")[
        ["z_out", "z_out_s", "covered", "covered_s", "region_id", "region_id_s"]
    ]
    core = both[both.covered & both.covered_s]
    assert len(core) > 0
    # near region boundaries the cell CENTER may fall in a different
    # region than the point (same artifact as the reference's
    # np.digitize binning) — tight tolerance applies where the region
    # agrees; those must be the vast majority
    same = core[core.region_id == core.region_id_s]
    assert len(same) / len(core) > 0.9
    # plane slopes sum to ~0.044/deg; fine-cell half-diagonal ~0.125°
    assert np.allclose(same.z_out, same.z_out_s, atol=0.02)


def test_sampled_mode_carries_frame_corrections(spark, fixture_points):
    """Regression (round-3 ADVICE): sampled mode combined with a
    non-default output_frame / input_crs must apply the frame δz —
    previously the join-back recomputed z from the grid sep alone and
    silently dropped the ~0.8 m+ frame shift."""
    from vyperdatum_spark.spatial import crs as hcrs

    pdf = fixture_points
    pts = spark.createDataFrame(pdf)
    exact = tx.transform_points(
        spark, pts, "ellipse", "navd88", output_frame="ITRFS"
    ).toPandas().set_index("pid")
    sampled = tx.transform_points_sampled(
        spark, pts, "ellipse", "navd88", output_frame="ITRFS",
        res=cells.FINE_RES,
    ).toPandas().set_index("pid")
    both = exact.join(sampled, rsuffix="_s")
    core = both[both.covered & both.covered_s
                & (both.region_id == both.region_id_s)]
    assert len(core) > 0
    # frame δz is ~0.8 m — without the fix every row is off by that
    assert np.allclose(core.z_out, core.z_out_s, atol=0.02)

    # projected input CRS: sampled path must inverse-project before
    # binning and agree with the exact path
    px, py = hcrs.from_geoid_frame_np("spcs_syn", pdf.x.values, pdf.y.values)
    proj = pdf.assign(x=px, y=py)
    ppts = spark.createDataFrame(proj)
    exact_p = tx.transform_points(
        spark, ppts, "ellipse", "mllw", input_crs="spcs_syn"
    ).toPandas().set_index("pid")
    sampled_p = tx.transform_points_sampled(
        spark, ppts, "ellipse", "mllw", input_crs="spcs_syn",
        res=cells.FINE_RES,
    ).toPandas().set_index("pid")
    both_p = exact_p.join(sampled_p, rsuffix="_s")
    core_p = both_p[both_p.covered & both_p.covered_s
                    & (both_p.region_id == both_p.region_id_s)]
    assert len(core_p) > 0
    assert np.allclose(core_p.z_out, core_p.z_out_s, atol=0.02)


def test_tile_assignment_matches_oracle(spark, fixture_points):
    """'identical tile assignments' check: engine cell5 equals the
    numpy encoder's cell for every point."""
    pdf = fixture_points
    out = run_engine(spark, pdf, "ellipse", "mllw")
    exp = cells.encode_np(pdf.x.values, pdf.y.values, cells.COARSE_RES)
    assert np.array_equal(out["cell5"].to_numpy(), exp)


def test_skew_salting_preserves_results(spark, fixture_points):
    """Salted and unsalted plans must be result-identical."""
    pdf = fixture_points
    a = run_engine(spark, pdf, "ellipse", "mllw", n_salt=0)
    b = run_engine(spark, pdf, "ellipse", "mllw", n_salt=8)
    assert np.array_equal(
        np.nan_to_num(a["z_out"].to_numpy(dtype=float), nan=-9e9),
        np.nan_to_num(b["z_out"].to_numpy(dtype=float), nan=-9e9),
    )


@pytest.mark.parametrize("strategy", ["sql", "broadcast"])
def test_sign_matrix_four_quadrants(spark, fixture_points, strategy):
    """F4 matrix (reference core.py:397-403 negates a depth INPUT,
    :441-449 flips a depth OUTPUT; raster.py:356-364 combined form):
    all four height/depth in × out quadrants, engine vs closed form."""
    pdf = fixture_points
    quadrants = [
        ("ellipse", "navd88"),             # height → height
        ("ellipse", "mllw"),               # height → depth (tidal = depth
                                           # axis, vypercrs.py:545-552)
        ("mllw", "ellipse"),               # depth  → height
        ("noaa chart datum", "navd88"),    # depth  → height (real pipeline)
        ("noaa chart datum", "mllw"),      # depth  → depth (identity steps)
        ("noaa chart datum", "noaa chart datum"),  # depth → depth (null)
    ]
    for from_d, to_d in quadrants:
        out = run_engine(spark, pdf, from_d, to_d, strategy=strategy)
        if from_d == to_d:
            # null transform: z passes through, double flip cancels
            assert np.allclose(
                out["z_out"].to_numpy(dtype=float),
                np.round(pdf.set_index("pid")["z"].to_numpy(), 3),
            ), (from_d, to_d)
            continue
        region, z_exp, _ = numpy_oracle(
            pdf.x.values, pdf.y.values, pdf.z.values, from_d, to_d
        )
        got = out["z_out"].to_numpy(dtype=float)
        assert np.array_equal(
            np.nan_to_num(got, nan=-9e9), np.nan_to_num(z_exp, nan=-9e9)
        ), (from_d, to_d)


def test_depth_input_hand_checked(spark):
    """A sounding of 12.3 m below chart datum (positive-down) in region
    A passes through to MLLW unchanged (identity steps, both axes
    depth — double flip cancels), and the CATZOC out-of-coverage unc
    uses the NEGATED (height-convention) z."""
    pdf = pd.DataFrame({
        "pid": [1, 2],
        "x": [-77.9, -10.0],   # in region A / far outside
        "y": [33.5, 0.0],
        "z": [12.3, 12.3],
    })
    out = run_engine(
        spark, pdf, "noaa chart datum", "mllw",
        allow_points_outside_coverage=True,
    )
    assert out.loc[1, "z_out"] == pytest.approx(12.3, abs=1e-9)
    # uncovered: z_out = flip_out * flip_in * z = z (depth → depth)
    assert out.loc[2, "z_out"] == pytest.approx(12.3, abs=1e-9)
    # CATZOC over height z = -12.3 (negative) -> 3 - 0.06*(-12.3)
    assert out.loc[2, "unc"] == pytest.approx(3 + 0.06 * 12.3, abs=1e-9)
    # depth → HEIGHT single-flips: same sounding to navd88 is the
    # height -12.3 plus the regional geoid pipeline
    out2 = run_engine(spark, pdf, "noaa chart datum", "navd88")
    sep = out2.loc[1, "sep"]
    assert out2.loc[1, "z_out"] == pytest.approx(round(-12.3 + sep, 3), abs=1e-9)


@pytest.mark.parametrize("strategy", ["sql", "broadcast", "cogroup"])
def test_empty_input_all_strategies(spark, strategy):
    """Zero-row input: every strategy returns an empty frame with the
    full output schema (no crash in kernels, joins, or codegen)."""
    empty = spark.createDataFrame(
        [], "pid long, x double, y double, z double"
    )
    out = tx.transform_points(
        spark, empty, "ellipse", "mllw", strategy=strategy,
    )
    assert out.count() == 0
    assert {"region_id", "z_out", "covered", "sep", "unc"} <= set(out.columns)


def test_sql_count_precedence_matches_broadcast(spark, fixture_points):
    """Round-3: W2 count-ranked precedence in the pure-JVM SQL
    strategy must be row-identical to the Python-kernel path."""
    pdf = fixture_points
    pts = spark.createDataFrame(pdf)
    a = tx.transform_points(
        spark, pts, "ellipse", "mllw", precedence="count", strategy="sql",
    ).toPandas().set_index("pid").sort_index()
    b = tx.transform_points(
        spark, pts, "ellipse", "mllw", precedence="count",
        strategy="broadcast",
    ).toPandas().set_index("pid").sort_index()
    assert a.region_id.fillna("-").equals(b.region_id.fillna("-"))
    assert np.array_equal(
        np.nan_to_num(a.z_out.to_numpy(dtype=float), nan=-9e9),
        np.nan_to_num(b.z_out.to_numpy(dtype=float), nan=-9e9),
    )


def test_sql_knn_edge_matches_broadcast(spark):
    """Round-3: J8 kNN edge fill in the SQL strategy (candidate-cell
    broadcast join + argmin column math) vs the numpy kernel, on a
    NaN-masked runtime grid."""
    from vyperdatum_spark.queries.geo import _knn_grid_defs, KNN_NODE_LON

    k = np.arange(200)
    pdf = pd.DataFrame({
        "pid": k,
        "x": KNN_NODE_LON + 0.0005 + ((k * 131) % 39) * 0.001,
        "y": 33.2005 + ((k * 7919) % 100) * 0.008,
        "z": (k % 17) * 0.25,
    })
    pts = spark.createDataFrame(pdf)
    defs = _knn_grid_defs()
    a = tx.transform_points(
        spark, pts, "ellipse", "mllw", grid_defs=defs,
        knn_fallback=True, strategy="sql",
    ).toPandas().set_index("pid").sort_index()
    b = tx.transform_points(
        spark, pts, "ellipse", "mllw", grid_defs=defs,
        knn_fallback=True, strategy="broadcast",
    ).toPandas().set_index("pid").sort_index()
    assert a.covered.any()
    assert a.region_id.fillna("-").equals(b.region_id.fillna("-"))
    assert np.array_equal(
        np.nan_to_num(a.z_out.to_numpy(dtype=float), nan=-9e9),
        np.nan_to_num(b.z_out.to_numpy(dtype=float), nan=-9e9),
    )


def _knn_cells_bruteforce(grids, max_candidates=64):
    """Reference implementation of the candidate build: per candidate
    cell, scan ALL valid nodes (the pre-round-4 O(cells × nodes)
    algorithm). Used only to prove the bucketed build returns the
    exact same rows."""
    import math

    recs = []
    for region_id, gs in grids.items():
        for j, (lon0, lat0, dlon, dlat, nx, ny, w) in enumerate(gs):
            valid = np.isfinite(w)
            if not valid.any():
                continue
            has_nan = bool((~valid).any())
            m = max(dlon, dlat)
            viy, vix = np.nonzero(valid)
            vlon = lon0 + vix.astype(np.float64) * dlon
            vlat = lat0 + viy.astype(np.float64) * dlat
            vval = w[viy, vix]
            vidx = viy.astype(np.int64) * nx + vix.astype(np.int64)
            r = 0.5 * math.hypot(dlon, dlat)
            ix0 = int(math.floor((vlon.min() - m - lon0) / dlon))
            ix1 = int(math.floor((vlon.max() + m - lon0) / dlon))
            iy0 = int(math.floor((vlat.min() - m - lat0) / dlat))
            iy1 = int(math.floor((vlat.max() + m - lat0) / dlat))
            for iy in range(iy0, iy1 + 1):
                for ix in range(ix0, ix1 + 1):
                    interior = 0 <= ix <= nx - 2 and 0 <= iy <= ny - 2
                    if interior and not has_nan:
                        continue
                    if interior and (valid[iy, ix] and valid[iy, ix + 1]
                                     and valid[iy + 1, ix]
                                     and valid[iy + 1, ix + 1]):
                        continue
                    cx = lon0 + (ix + 0.5) * dlon
                    cy = lat0 + (iy + 0.5) * dlat
                    d = np.hypot(vlon - cx, vlat - cy)
                    dmin = float(d.min())
                    if dmin > m + r:
                        continue
                    keep = np.flatnonzero(
                        d <= min(dmin + 2.0 * r, m + r) + 1e-12
                    )
                    keep = keep[np.argsort(vidx[keep])]
                    recs.append((
                        f"{region_id}#g{j}", ix, iy,
                        [(float(vlon[i]), float(vlat[i]),
                          float(vval[i]), int(vidx[i])) for i in keep],
                    ))
    return recs


def test_knn_candidate_build_bucketed():
    """Round-4 (VERDICT #3): the neighborhood-bucketed candidate build
    returns the EXACT brute-force rows (same cells, same candidates,
    same order) on a NaN-holed grid."""
    from vyperdatum_spark.engine import transform_sql as tsql

    rng = np.random.default_rng(42)
    nx, ny = 80, 70
    w = rng.normal(size=(ny, nx))
    w[:4, :] = np.nan            # NaN band along the bottom edge
    w[:, -6:] = np.nan           # and the right edge
    holes = rng.random((ny, nx)) < 0.08
    w[holes] = np.nan            # interior holes
    grids = {"REG": [(-75.0, 33.0, 0.01, 0.0125, nx, ny, w)]}

    got, cmax = tsql.knn_cells_pdf(grids)
    exp = _knn_cells_bruteforce(grids)
    assert len(got) == len(exp) and len(exp) > 50
    assert cmax <= 64
    for g, e in zip(got, exp):
        assert g == e


def test_knn_candidate_build_linear_in_edge_cells():
    """Round-4 (VERDICT #3): build cost must be linear in edge cells,
    not O(edge_cells × valid_nodes). A 600×600 grid (360k nodes,
    ~21k candidate cells after NaN holes) would need ~10^10 float ops
    brute-force; the bucketed build does ~10^6 and finishes in
    seconds. Bound generously to stay robust on a noisy host."""
    import time

    from vyperdatum_spark.engine import transform_sql as tsql

    rng = np.random.default_rng(7)
    nx = ny = 600
    w = rng.normal(size=(ny, nx))
    holes = rng.random((ny, nx)) < 0.02
    w[holes] = np.nan
    grids = {"BIG": [(-80.0, 30.0, 0.001, 0.001, nx, ny, w)]}

    t0 = time.monotonic()
    rows, cmax = tsql.knn_cells_pdf(grids, max_candidates=64)
    dt = time.monotonic() - t0
    # every interior invalid-corner cell + the exterior ring
    inv = ~(np.isfinite(w[:-1, :-1]) & np.isfinite(w[:-1, 1:])
            & np.isfinite(w[1:, :-1]) & np.isfinite(w[1:, 1:]))
    assert len(rows) >= int(inv.sum())  # all fillable interior cells present
    assert cmax <= 64
    assert dt < 30.0, f"candidate build took {dt:.1f}s — not linear?"

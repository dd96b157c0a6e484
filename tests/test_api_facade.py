"""Reference-compatible facade (points.py / raster.py call shapes)."""

import numpy as np
import pytest

from vyperdatum_spark import api
from vyperdatum_spark.datums import catalog, vypercrs


def test_vyperpoints_transform_matches_reference_shape(spark):
    vp = api.VyperPoints(spark)
    x = np.array([-77.5, -76.75, -10.0])     # A, ABC-overlap, outside
    y = np.array([34.0, 34.75, 0.0])
    z = np.array([10.5, 11.0, 11.5])
    nx, ny, nz, unc, ridx = vp.transform_points(
        ("nad83s", "ellipse"), "mllw", x, y, z,
        include_vdatum_uncertainty=True, include_region_index=True,
    )
    # covered points: z = closed form; uncovered: NaN
    for i, rid in [(0, "RGNAcoast01_8301"), (1, "RGNCbay01_8301")]:
        exp = round(catalog.transform_closed_form(
            rid, "ellipse", "mllw", x[i], y[i], z[i]), 3)
        assert nz[i] == pytest.approx(exp, abs=1e-9)
    assert np.isnan(nz[2]) and np.isnan(unc[2])
    assert ridx[0] == 0 and ridx[1] == 2 and ridx[2] == -1
    # lineage artifact present and valid
    assert vypercrs.is_valid_vert_wkt(vp.out_wkt)


def test_vyperpoints_epsg_and_sampled(spark, tmp_path):
    vp = api.VyperPoints(spark)
    rng = np.random.default_rng(9)
    x = rng.uniform(-77.9, -76.1, 200)
    y = rng.uniform(33.1, 34.9, 200)
    z = np.round(rng.uniform(-5, 5, 200), 2)
    vp.transform_points(6319, 5866, x, y, z)          # EPSG specs
    exact = vp.z.copy()
    vp.transform_points(6319, 5866, x, y, z, sample_distance=0.05)
    # sampled within reference-style tolerance of exact; coverage may
    # differ at region edges (cell CENTER outside the polygon), so
    # compare where both are covered and bound the disagreement count
    m = ~np.isnan(exact) & ~np.isnan(vp.z)
    assert m.sum() > 100
    # cell-center sampling can flip the winning region for points near
    # an overlap boundary (the reference's binning has the same
    # artifact) — require 95% within tolerance, bound the flips
    close = np.abs(vp.z[m] - exact[m]) <= 0.02
    assert close.mean() > 0.95
    assert (np.isnan(exact) != np.isnan(vp.z)).sum() <= 10
    vp.transform_points(6319, 5866, x, y, z,
                        include_region_index=True)
    out = str(tmp_path / "pts.csv")
    vp.export_to_csv(out)
    assert sum(1 for _ in open(out)) == 200


def test_vyperraster_facade(spark):
    rng = np.random.default_rng(31)
    vals = np.round(rng.uniform(-30, -5, (10, 10)), 2)
    vrr = api.VyperRaster(spark)
    elev, unc = vrr.transform_raster(
        "ellipse", "mllw", origin_x=-77.95, origin_y=34.4,
        dx=0.02, dy=-0.02, values=vals,
    )
    assert elev.shape == (10, 10) and np.isfinite(elev).all()
    assert unc.shape == (10, 10) and np.isfinite(unc).all()
    # height band -> depth mllw: z = -(v + sep), closed form per cell
    for r, c in [(0, 0), (5, 5), (9, 9)]:
        lon = -77.95 + (c + 0.5) * 0.02
        lat = 34.4 + (r + 0.5) * -0.02
        exp = round(catalog.transform_closed_form(
            "RGNAcoast01_8301", "ellipse", "mllw", lon, lat, vals[r, c]), 3)
        assert elev[r, c] == pytest.approx(exp, abs=1e-9)

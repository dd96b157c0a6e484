"""Bilinear kernel tests: exactness on planes, NaN edges, kNN fill."""

import numpy as np

from vyperdatum_spark.grids import bilinear


def _plane_tile(a=0.01, b=-0.02, c=5.0, nx=21, ny=21, lon0=-78.0, lat0=33.0, d=0.05):
    ixs, iys = np.meshgrid(np.arange(nx), np.arange(ny))
    lon = lon0 + ixs * d
    lat = lat0 + iys * d
    return (lon0, lat0, d, d, nx, ny, (a * lon + b * lat + c).ravel())


def test_plane_exact_within_tolerance():
    lon0, lat0, dl, dL, nx, ny, vals = _plane_tile()
    rng = np.random.default_rng(3)
    xs = rng.uniform(lon0, lon0 + (nx - 1) * dl, 500)
    ys = rng.uniform(lat0, lat0 + (ny - 1) * dL, 500)
    got = bilinear.interp_tile(lon0, lat0, dl, dL, nx, ny, vals, xs, ys)
    exp = 0.01 * xs - 0.02 * ys + 5.0
    assert np.allclose(got, exp, atol=1e-10)


def test_outside_lattice_is_nan():
    lon0, lat0, dl, dL, nx, ny, vals = _plane_tile()
    xs = np.array([lon0 - 1.0, lon0 + nx * dl + 1.0])
    ys = np.array([lat0, lat0])
    got = bilinear.interp_tile(lon0, lat0, dl, dL, nx, ny, vals, xs, ys,
                               knn_fallback=False)
    assert np.isnan(got).all()


def test_nan_corner_without_fallback():
    lon0, lat0, dl, dL, nx, ny, vals = _plane_tile()
    v = vals.copy().reshape(ny, nx)
    v[10, 10] = np.nan
    xs = np.array([lon0 + 9.6 * dl])
    ys = np.array([lat0 + 9.6 * dL])
    got = bilinear.interp_tile(lon0, lat0, dl, dL, nx, ny, v, xs, ys,
                               knn_fallback=False)
    assert np.isnan(got).all()


def test_knn_fallback_fills_edge():
    lon0, lat0, dl, dL, nx, ny, vals = _plane_tile()
    v = vals.copy().reshape(ny, nx)
    v[10, 10] = np.nan
    xs = np.array([lon0 + 9.6 * dl])
    ys = np.array([lat0 + 9.55 * dL])
    got = bilinear.interp_tile(lon0, lat0, dl, dL, nx, ny, v, xs, ys,
                               knn_fallback=True)
    # nearest valid node is (ix=10, iy=9) → its exact plane value
    exp = 0.01 * (lon0 + 10 * dl) - 0.02 * (lat0 + 9 * dL) + 5.0
    assert np.isclose(got[0], exp)


def test_knn_fallback_does_not_fill_far_points():
    lon0, lat0, dl, dL, nx, ny, vals = _plane_tile()
    xs = np.array([lon0 - 10.0])
    ys = np.array([lat0 - 10.0])
    got = bilinear.interp_tile(lon0, lat0, dl, dL, nx, ny, vals, xs, ys,
                               knn_fallback=True)
    assert np.isnan(got).all()

"""Cell-index and point-in-polygon unit tests (pure numpy)."""

import numpy as np

from vyperdatum_spark.datums import catalog
from vyperdatum_spark.spatial import cells, pip


def test_cell_encode_forms_agree():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-90, 90, 500)
    for res in (3, 5, 9, 12):
        enc = cells.encode_np(lon, lat, res)
        for i in range(0, 500, 97):
            assert cells.encode_one(float(lon[i]), float(lat[i]), res) == int(enc[i])


def test_cell_bounds_contain_point():
    rng = np.random.default_rng(11)
    lon = rng.uniform(-180, 179.9, 200)
    lat = rng.uniform(-90, 89.9, 200)
    enc = cells.encode_np(lon, lat, 5)
    for i in range(200):
        x0, y0, x1, y1 = cells.cell_bounds(int(enc[i]))
        assert x0 <= lon[i] < x1 + 1e-12
        assert y0 <= lat[i] < y1 + 1e-12


def test_parent_hierarchy():
    rng = np.random.default_rng(13)
    lon = rng.uniform(-180, 180, 300)
    lat = rng.uniform(-90, 90, 300)
    fine = cells.encode_np(lon, lat, 9)
    coarse = cells.encode_np(lon, lat, 5)
    for f, c in zip(fine, coarse):
        assert cells.parent(int(f), 5) == int(c)


def test_nan_coords_encode_to_minus_one():
    enc = cells.encode_np(np.array([np.nan, 0.0]), np.array([1.0, np.nan]), 5)
    assert list(enc) == [-1, -1]


def test_neighbors_disk():
    c = cells.encode_one(-76.75, 34.75, 5)
    nb = cells.neighbors(c, 1)
    assert c in nb and len(nb) == 9


def test_cover_bbox_covers_probe_points():
    cov = set(cells.cover_bbox(-78.0, 33.0, -76.0, 35.0, 5))
    rng = np.random.default_rng(17)
    lon = rng.uniform(-78, -76, 100)
    lat = rng.uniform(33, 35, 100)
    enc = cells.encode_np(lon, lat, 5)
    assert set(int(e) for e in enc) <= cov


def test_pip_rectangle():
    poly = [(-78.0, 33.0), (-76.0, 33.0), (-76.0, 35.0), (-78.0, 35.0)]
    lon = np.array([-77.0, -75.0, -78.5, -76.5])
    lat = np.array([34.0, 34.0, 34.0, 36.0])
    assert list(pip.contains(poly, lon, lat)) == [True, False, False, False]


def test_pip_concave_polygon():
    # L-shape: the notch must be outside
    poly = [(0, 0), (4, 0), (4, 4), (2, 4), (2, 2), (0, 2)]
    lon = np.array([1.0, 3.0, 1.0, 3.0])
    lat = np.array([1.0, 1.0, 3.0, 3.0])
    assert list(pip.contains(poly, lon, lat)) == [True, True, False, True]


def test_polygon_cover_superset_of_region_points():
    r = catalog.REGIONS[0]
    cov = set(pip.polygon_cover(list(r.polygon), 5))
    x0, y0, x1, y1 = r.bbox
    rng = np.random.default_rng(19)
    lon = rng.uniform(x0, x1, 200)
    lat = rng.uniform(y0, y1, 200)
    inside = pip.contains(list(r.polygon), lon, lat)
    enc = cells.encode_np(lon, lat, 5)
    assert set(int(e) for e in enc[inside]) <= cov

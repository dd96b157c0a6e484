"""Point-in-polygon kernel + polygon covers (pure numpy, no shapely).

The reference assigns region membership implicitly via PROJ grid
coverage (core.py:421-453) after a coarse bbox-intersect prune
(core.py:86-158). We make it explicit and Spark-shaped:

1. driver-side: each region polygon gets a coarse-cell *cover* list
   (J1 prune -> broadcast equi-join on the cell key),
2. executor-side: an exact even-odd ray-cast containment test inside
   a vectorized pandas UDF (J2).

Polygons are simple rings [(lon, lat), ...] (closing vertex optional).
The ray cast is the standard crossing-number algorithm, vectorized
over all points × edges in numpy — no per-row Python.
"""

from __future__ import annotations

import numpy as np

from . import cells


def _ring(poly: list[tuple[float, float]]) -> np.ndarray:
    arr = np.asarray(poly, dtype=np.float64)
    if arr.ndim != 2 or arr.shape[1] != 2 or len(arr) < 3:
        raise ValueError("polygon must be [(lon, lat), ...] with >= 3 vertices")
    if not np.array_equal(arr[0], arr[-1]):
        arr = np.vstack([arr, arr[:1]])
    return arr


def contains(
    poly: list[tuple[float, float]], lon: np.ndarray, lat: np.ndarray
) -> np.ndarray:
    """Even-odd ray-cast containment, vectorized over points.

    Edge semantics: half-open crossings ((y1 <= y) != (y2 <= y)), the
    usual convention — a point exactly on a horizontal lower edge is
    inside, on the upper edge outside. Fixture data avoids boundaries.
    """
    ring = _ring(poly)
    x = np.asarray(lon, dtype=np.float64)[:, None]
    y = np.asarray(lat, dtype=np.float64)[:, None]
    x1, y1 = ring[:-1, 0][None, :], ring[:-1, 1][None, :]
    x2, y2 = ring[1:, 0][None, :], ring[1:, 1][None, :]
    crosses = (y1 <= y) != (y2 <= y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
    hit = crosses & (x < xint)
    return (hit.sum(axis=1) % 2).astype(bool)


def polygon_bbox(poly: list[tuple[float, float]]) -> tuple[float, float, float, float]:
    ring = _ring(poly)
    return (
        float(ring[:, 0].min()),
        float(ring[:, 1].min()),
        float(ring[:, 0].max()),
        float(ring[:, 1].max()),
    )


def polygon_cover(
    poly: list[tuple[float, float]], res: int, refine: bool = False
) -> list[int]:
    """Coarse-cell cover for the prune join.

    Default (refine=False) is the polygon-bbox cover — strictly
    conservative (a superset of intersecting cells), which is all the
    prune join needs for correctness; the exact PIP test downstream
    removes false positives. ``refine=True`` additionally drops bbox
    cells that fail a corner/center-in-polygon and vertex-in-rect
    test — tighter for convex-ish rings (smaller broadcast), still a
    superset for rectangles and convex polygons whose edges don't
    slice a cell between its sampled corners."""
    bbox_cells = cells.cover_bbox(*polygon_bbox(poly), res)
    if not refine:
        return bbox_cells
    ring = _ring(poly)
    keep = []
    for c in bbox_cells:
        x0, y0, x1, y1 = cells.cell_bounds(c)
        corners_lon = np.array([x0, x1, x0, x1, (x0 + x1) / 2])
        corners_lat = np.array([y0, y0, y1, y1, (y0 + y1) / 2])
        if contains(poly, corners_lon, corners_lat).any():
            keep.append(c)
            continue
        inx = (ring[:, 0] >= x0) & (ring[:, 0] <= x1)
        iny = (ring[:, 1] >= y0) & (ring[:, 1] <= y1)
        if (inx & iny).any():
            keep.append(c)
    return keep

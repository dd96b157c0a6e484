"""Sinks: CSV (reference S7), partitioned parquet (S6 analog), and
the catalog/grid version fingerprint (S9).

Reference mapping:
- S7 ``VyperPoints.export_to_csv`` (points.py:104-118) → ``to_csv``:
  x, y, z_out, unc, region_index columns, header, configurable
  delimiter.
- S6 GeoTIFF write (raster.py:513-546) → partitioned parquet keyed by
  coarse cell (GeoTIFF export is a driver-side concern out of engine
  scope; the cell-keyed table is the cluster-native raster container).
- S9 grid md5 fingerprint (core.py:1063-1147): every grid file is
  md5-hashed and matched against known version sets; here the catalog
  version is the md5 of the sorted (grid_id, plane) rows — a pure
  function of catalog constants, checked as a golden.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..datums import catalog


def to_csv(df: DataFrame, path: str, delimiter: str = ",",
           include_region_index: bool = True) -> None:
    """Reference-shaped CSV export of transform output."""
    cols = ["x", "y", "z_out", "unc"]
    if include_region_index:
        cols.append("region_ord")
    (
        df.select(*cols)
        .write.mode("overwrite")
        .option("header", True)
        .option("sep", delimiter)
        .csv(path)
    )


def to_cell_partitioned_parquet(df: DataFrame, path: str) -> None:
    """Raster-sink analog: output partitioned by coarse cell so
    downstream tile readers prune partitions (Iceberg-style layout)."""
    df.write.mode("overwrite").partitionBy("cell5").parquet(path)


def catalog_version_rows() -> list[tuple[str, str]]:
    """(grid_id, md5-of-definition) per grid — the S9 per-grid hash."""
    rows = []
    for grid_id in sorted(catalog.GRID_PLANES):
        a, b, c = catalog.GRID_PLANES[grid_id]
        payload = f"{grid_id}|{a!r}|{b!r}|{c!r}".encode()
        rows.append((grid_id, hashlib.md5(payload).hexdigest()))
    return rows


def catalog_version() -> str:
    """One fingerprint for the whole catalog (grid set + polygons +
    sigmas), the analog of the vdatum version id the reference caches
    (core.py:1109-1147)."""
    h = hashlib.md5()
    for grid_id, ghash in catalog_version_rows():
        h.update(ghash.encode())
    for r in catalog.REGIONS:
        h.update(f"{r.region_id}|{r.region_ord}|{r.wkt}|{r.geoid}".encode())
    for rid in sorted(catalog.SIGMAS):
        for d in sorted(catalog.SIGMAS[rid]):
            h.update(f"{rid}|{d}|{catalog.SIGMAS[rid][d]!r}".encode())
    return h.hexdigest()

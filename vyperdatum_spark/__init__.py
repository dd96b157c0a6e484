"""vyperdatum_spark — a from-scratch PySpark-native vertical-datum
transformation + spatial-join engine.

Re-expresses the capabilities of noaa-ocs-hydrography/vyperdatum
(reference at /root/reference, studied for WHAT it computes, not HOW)
as an idiomatic Spark DataFrame pipeline:

- points geoparsed from a Common-Crawl-shaped ``pages`` table
  (url, warc_ts, html, text, lang),
- hierarchical cell-encoded (H3-analog, pure column math),
- point-in-polygon matched against broadcast region polygons,
- transformed via bilinear interpolation over a pre-tiled separation
  grid side table (raster→vector tiling; cogrouped pandas kernel),
- with last-write-wins / count-ranked region precedence, uncertainty
  joins, per-partition lineage + metrics, and bucket-level
  checkpoint/resume.

No GDAL/PROJ/pyproj at executors: the numeric core is numpy inside
Arrow-batched pandas UDFs; everything relational is Catalyst-planned
DataFrame ops.
"""

__version__ = "0.1.0"

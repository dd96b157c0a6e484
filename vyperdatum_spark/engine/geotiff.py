"""Minimal pure-Python GeoTIFF (baseline TIFF 6.0) writer/reader.

Closes reference S6 to byte-format parity: the reference writes a
multi-band Float32 GTiff with nodata, band names, and projection
(raster.py:513-546 ``_write_gdal_geotiff``). The engine's cluster
sink is the band TABLE (sinks.to_band_table — strips + geotransform
meta); this module is the driver-side final export step that turns
that table into an actual .tif byte layout, from the public TIFF 6.0
and GeoTIFF 1.1 specs, using only ``struct``/``numpy`` (no GDAL in
this container).

Layout written (classic little-endian TIFF):
- one IFD; multi-band as SamplesPerPixel=N with
  PlanarConfiguration=2 (separate planes, GDAL's band-sequential
  layout), one strip per plane;
- Float32 samples (SampleFormat=3, BitsPerSample=32) — the
  reference's explicit output type;
- GeoTIFF tags: ModelPixelScale (33550), ModelTiepoint (33922), a
  minimal GeoKeyDirectory (34735, geographic model);
- GDAL-convention tags: GDAL_METADATA (42112) carrying band
  descriptions, GDAL_NODATA (42113).
"""

from __future__ import annotations

import struct

import numpy as np

# TIFF tag ids
IMAGE_WIDTH = 256
IMAGE_LENGTH = 257
BITS_PER_SAMPLE = 258
COMPRESSION = 259
PHOTOMETRIC = 262
STRIP_OFFSETS = 273
SAMPLES_PER_PIXEL = 277
ROWS_PER_STRIP = 278
STRIP_BYTE_COUNTS = 279
PLANAR_CONFIG = 284
SAMPLE_FORMAT = 339
MODEL_PIXEL_SCALE = 33550
MODEL_TIEPOINT = 33922
GEO_KEY_DIRECTORY = 34735
GDAL_METADATA = 42112
GDAL_NODATA = 42113

_TYPE_SHORT = 3    # uint16
_TYPE_LONG = 4     # uint32
_TYPE_ASCII = 2
_TYPE_DOUBLE = 12
_TYPE_SIZE = {_TYPE_SHORT: 2, _TYPE_LONG: 4, _TYPE_ASCII: 1, _TYPE_DOUBLE: 8}


def write_geotiff(
    path: str,
    bands: list[tuple[str, np.ndarray]],
    origin_x: float,
    origin_y: float,
    dx: float,
    dy: float,
    nodata: float = -9999.0,
) -> None:
    """Write named float bands (each (h, w)) as one multi-band
    baseline GeoTIFF. ``dy`` is the signed GDAL geotransform value
    (negative for north-up); the pixel-scale tag stores |dy| per spec.
    NaNs are replaced by ``nodata`` (reference raster.py:520-521)."""
    if not bands:
        raise ValueError("at least one band required")
    if dy > 0:
        # the baseline layout encodes orientation by the north-up
        # convention (ModelPixelScale is unsigned per spec); a south-up
        # raster needs a ModelTransformation matrix this minimal
        # writer does not emit — refuse rather than flip silently
        raise ValueError(
            "south-up rasters (dy > 0) are not supported by the "
            "baseline GeoTIFF writer (north-up ModelPixelScale "
            "convention); pass dy < 0"
        )
    h, w = bands[0][1].shape
    planes = []
    for name, arr in bands:
        a = np.asarray(arr, dtype=np.float32)
        if a.shape != (h, w):
            raise ValueError(f"band {name!r} shape {a.shape} != {(h, w)}")
        a = np.where(np.isnan(a), np.float32(nodata), a)
        planes.append(a.tobytes())  # row-major, native little-endian
    n_bands = len(bands)
    plane_bytes = h * w * 4

    # out-of-line payloads land after the 8-byte header, data after
    meta_xml = "<GDALMetadata>\n" + "".join(
        f'  <Item name="DESCRIPTION" sample="{i}" role="description">'
        f"{name}</Item>\n"
        for i, (name, _a) in enumerate(bands)
    ) + "</GDALMetadata>\n\x00"
    nodata_ascii = f"{nodata:g}\x00"
    # minimal GeoKeyDirectory: version 1.1.0, 3 keys —
    # GTModelType=Geographic(2), GTRasterType=PixelIsArea(1),
    # GeographicType = user-defined (32767; synthetic CRS registry)
    geokeys = [1, 1, 0, 3,
               1024, 0, 1, 2,
               1025, 0, 1, 1,
               2048, 0, 1, 32767]

    class _Payload:
        def __init__(self):
            self.buf = b""
            self.base = 8  # right after the TIFF header

        def add(self, raw: bytes) -> int:
            if len(self.buf) % 2:
                self.buf += b"\x00"  # word-align per spec
            off = self.base + len(self.buf)
            self.buf += raw
            return off

    pay = _Payload()

    def entry(tag: int, typ: int, values, ascii_bytes: bytes | None = None):
        """One 12-byte IFD entry; payload spills out-of-line when >4B."""
        if typ == _TYPE_ASCII:
            raw = ascii_bytes
            count = len(raw)
        else:
            fmt = {_TYPE_SHORT: "<H", _TYPE_LONG: "<I", _TYPE_DOUBLE: "<d"}[typ]
            raw = b"".join(struct.pack(fmt, v) for v in values)
            count = len(values)
        if len(raw) <= 4:
            inline = raw + b"\x00" * (4 - len(raw))
            return struct.pack("<HHI", tag, typ, count) + inline
        off = pay.add(raw)
        return struct.pack("<HHII", tag, typ, count, off)

    # strip payloads (one strip per plane, planar config 2)
    strip_offsets = [pay.add(p) for p in planes]

    entries = [
        entry(IMAGE_WIDTH, _TYPE_LONG, [w]),
        entry(IMAGE_LENGTH, _TYPE_LONG, [h]),
        entry(BITS_PER_SAMPLE, _TYPE_SHORT, [32] * n_bands),
        entry(COMPRESSION, _TYPE_SHORT, [1]),
        entry(PHOTOMETRIC, _TYPE_SHORT, [1]),
        entry(STRIP_OFFSETS, _TYPE_LONG, strip_offsets),
        entry(SAMPLES_PER_PIXEL, _TYPE_SHORT, [n_bands]),
        entry(ROWS_PER_STRIP, _TYPE_LONG, [h]),
        entry(STRIP_BYTE_COUNTS, _TYPE_LONG, [plane_bytes] * n_bands),
        entry(PLANAR_CONFIG, _TYPE_SHORT, [2]),
        entry(SAMPLE_FORMAT, _TYPE_SHORT, [3] * n_bands),
        entry(MODEL_PIXEL_SCALE, _TYPE_DOUBLE, [dx, abs(dy), 0.0]),
        entry(MODEL_TIEPOINT, _TYPE_DOUBLE,
              [0.0, 0.0, 0.0, origin_x, origin_y, 0.0]),
        entry(GEO_KEY_DIRECTORY, _TYPE_SHORT, geokeys),
        entry(GDAL_METADATA, _TYPE_ASCII,
              None, ascii_bytes=meta_xml.encode()),
        entry(GDAL_NODATA, _TYPE_ASCII,
              None, ascii_bytes=nodata_ascii.encode()),
    ]
    # entries must be ascending by tag id (TIFF 6.0 requirement)
    ifd_offset = 8 + len(pay.buf) + (len(pay.buf) % 2)
    ifd = struct.pack("<H", len(entries)) + b"".join(entries) + struct.pack("<I", 0)

    with open(path, "wb") as f:
        f.write(b"II" + struct.pack("<H", 42) + struct.pack("<I", ifd_offset))
        f.write(pay.buf)
        if len(pay.buf) % 2:
            f.write(b"\x00")
        f.write(ifd)


def read_geotiff(path: str):
    """Parse the baseline layout back: ({band_name: (h, w) float32
    array}, meta dict). Independent of the writer's in-memory state —
    walks the IFD per the TIFF spec."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] != b"II" or struct.unpack("<H", data[2:4])[0] != 42:
        raise ValueError("not a little-endian classic TIFF")
    (ifd_off,) = struct.unpack("<I", data[4:8])
    (n_entries,) = struct.unpack("<H", data[ifd_off:ifd_off + 2])
    tags: dict[int, tuple] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack("<HHI", data[off:off + 8])
        size = _TYPE_SIZE[typ] * count
        if size <= 4:
            raw = data[off + 8:off + 8 + size]
        else:
            (voff,) = struct.unpack("<I", data[off + 8:off + 12])
            raw = data[voff:voff + size]
        if typ == _TYPE_ASCII:
            vals = raw.rstrip(b"\x00").decode()
        else:
            fmt = {_TYPE_SHORT: "H", _TYPE_LONG: "I", _TYPE_DOUBLE: "d"}[typ]
            vals = list(struct.unpack(f"<{count}{fmt}", raw))
        tags[tag] = vals
    w = tags[IMAGE_WIDTH][0]
    h = tags[IMAGE_LENGTH][0]
    n_bands = tags[SAMPLES_PER_PIXEL][0]
    offsets = tags[STRIP_OFFSETS]
    counts = tags[STRIP_BYTE_COUNTS]
    names = []
    meta_xml = tags.get(GDAL_METADATA, "")
    for i in range(n_bands):
        marker = f'sample="{i}" role="description">'
        if marker in meta_xml:
            frag = meta_xml.split(marker, 1)[1]
            names.append(frag.split("<", 1)[0])
        else:
            names.append(f"band_{i + 1}")
    bands = {}
    for i in range(n_bands):
        raw = data[offsets[i]:offsets[i] + counts[i]]
        bands[names[i]] = np.frombuffer(raw, dtype="<f4").reshape(h, w).copy()
    scale = tags[MODEL_PIXEL_SCALE]
    tie = tags[MODEL_TIEPOINT]
    meta = {
        "width": w,
        "height": h,
        "dx": scale[0],
        "dy": -scale[1],  # north-up convention (negative geotransform)
        "origin_x": tie[3],
        "origin_y": tie[4],
        "nodata": float(tags[GDAL_NODATA]) if GDAL_NODATA in tags else None,
        "planar_config": tags[PLANAR_CONFIG][0],
        "sample_format": tags[SAMPLE_FORMAT],
        "bits_per_sample": tags[BITS_PER_SAMPLE],
        "geo_model_type": tags.get(GEO_KEY_DIRECTORY, [0] * 8)[7],
    }
    return bands, meta


def export_band_table(spark, table_path: str, out_tif: str) -> None:
    """The GeoTIFF export endpoint over the cluster band table: read
    each band back (driver-side strip reassembly, sinks.read_band) and
    emit the .tif — the exact analog of the reference's final
    ``_write_gdal_geotiff`` call after the distributed transform."""
    from . import sinks

    first_meta = None
    bands = []
    band_names = (
        spark.read.parquet(f"{table_path}/meta").first()["bands"]
    )
    for name in band_names:
        arr, meta = sinks.read_band(spark, table_path, name)
        first_meta = first_meta or meta
        nod = first_meta["nodata"]
        arr = np.where(arr == nod, np.nan, arr)
        bands.append((name, arr))
    m = first_meta
    write_geotiff(
        out_tif, bands, m["origin_x"], m["origin_y"], m["dx"], m["dy"],
        nodata=m["nodata"],
    )

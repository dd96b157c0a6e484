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
  descriptions, GDAL_NODATA (42113);
- optional write-side compression (round 5, GDAL creation-option
  parity): COMPRESS=DEFLATE (tag 8) or LZW (tag 5), each with
  PREDICTOR=3 (the TechNote-3 floating-point predictor) — the same
  layouts the reader ingests, so the sink and source are symmetric.
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
PREDICTOR = 317
TILE_WIDTH = 322
TILE_LENGTH = 323
TILE_OFFSETS = 324
TILE_BYTE_COUNTS = 325
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
_TYPE_LONG8 = 16   # uint64 (BigTIFF)
_TYPE_SIZE = {_TYPE_SHORT: 2, _TYPE_LONG: 4, _TYPE_ASCII: 1,
              _TYPE_DOUBLE: 8, _TYPE_LONG8: 8}


def write_geotiff(
    path: str,
    bands: list[tuple[str, np.ndarray]],
    origin_x: float,
    origin_y: float,
    dx: float,
    dy: float,
    nodata: float = -9999.0,
    compression: str | None = None,
    predictor: int = 1,
) -> None:
    """Write named float bands (each (h, w)) as one multi-band
    baseline GeoTIFF. ``dy`` is the signed GDAL geotransform value
    (negative for north-up); the pixel-scale tag stores |dy| per spec.
    NaNs are replaced by ``nodata`` (reference raster.py:520-521).

    ``compression``: None (default, uncompressed strips), 'deflate'
    (tag value 8 — GDAL COMPRESS=DEFLATE) or 'lzw' (tag value 5,
    TIFF 6.0 §13 — GDAL's long-time float-raster default, round-5
    write parity with the reader).  ``predictor``: 1 (none) or 3
    (the TIFF TechNote 3 floating-point horizontal predictor, GDAL
    PREDICTOR=3 — byte-plane differencing that makes smooth
    separation surfaces compress far better)."""
    if not bands:
        raise ValueError("at least one band required")
    comp_tag = {None: 1, "none": 1, "deflate": 8, "lzw": 5}.get(compression)
    if comp_tag is None:
        raise ValueError(
            f"compression {compression!r} not supported "
            "(supported: None, 'deflate', 'lzw')"
        )
    if predictor not in (1, 3):
        raise ValueError(
            f"predictor {predictor} not supported for Float32 "
            "(supported: 1=none, 3=floating-point)"
        )
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
        raw = a.tobytes()  # row-major, native little-endian
        if predictor == 3:
            raw = _apply_fp_predictor(raw, h, w)
        if comp_tag == 8:
            import zlib

            raw = zlib.compress(raw)
        elif comp_tag == 5:
            raw = lzw_encode(raw)
        planes.append(raw)
    n_bands = len(bands)

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
        entry(COMPRESSION, _TYPE_SHORT, [comp_tag]),
        entry(PHOTOMETRIC, _TYPE_SHORT, [1]),
        entry(STRIP_OFFSETS, _TYPE_LONG, strip_offsets),
        entry(SAMPLES_PER_PIXEL, _TYPE_SHORT, [n_bands]),
        entry(ROWS_PER_STRIP, _TYPE_LONG, [h]),
        entry(STRIP_BYTE_COUNTS, _TYPE_LONG, [len(p) for p in planes]),
        entry(PLANAR_CONFIG, _TYPE_SHORT, [2]),
    ]
    if predictor == 3:
        entries.append(entry(PREDICTOR, _TYPE_SHORT, [3]))
    entries += [
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


def _undo_fp_predictor(raw: bytes, rows: int, row_samples: int) -> bytes:
    """Reverse the TIFF floating-point horizontal predictor (tag 317
    value 3, GDAL PREDICTOR=3): per row, the 4 byte-planes of the
    Float32 samples are stored MSB-plane-first and byte-differenced
    horizontally. Decode = cumulative byte sum per row (mod 256), then
    reassemble each sample from its 4 plane bytes big-endian."""
    row_bytes = row_samples * 4
    buf = np.frombuffer(raw, dtype=np.uint8).reshape(rows, row_bytes)
    buf = np.add.accumulate(buf, axis=1, dtype=np.uint8)  # wraps mod 256
    planes = buf.reshape(rows, 4, row_samples)
    msb_first = np.ascontiguousarray(planes.transpose(0, 2, 1))
    return (
        np.frombuffer(msb_first.tobytes(), dtype=">f4")
        .astype("<f4")
        .tobytes()
    )


def _apply_fp_predictor(raw: bytes, rows: int, row_samples: int) -> bytes:
    """Forward TIFF floating-point horizontal predictor (tag 317
    value 3) — the encode twin of ``_undo_fp_predictor``: per row,
    split each little-endian Float32 sample into its 4 bytes, store
    MSB-plane-first (TIFF TechNote 3 — big-endian planes regardless
    of file byte order), then horizontal byte-difference the row."""
    arr = (np.frombuffer(raw, dtype="<f4")
           .reshape(rows, row_samples)
           .astype(">f4"))
    planes = (np.frombuffer(arr.tobytes(), dtype=np.uint8)
              .reshape(rows, row_samples, 4)
              .transpose(0, 2, 1))  # (rows, 4 byte-planes, samples)
    buf = np.ascontiguousarray(planes).reshape(rows, row_samples * 4)
    diffed = buf.copy()
    diffed[:, 1:] -= buf[:, :-1]  # uint8 subtraction wraps mod 256
    return diffed.tobytes()


def _lzw_decode(raw: bytes) -> bytes:
    """TIFF 6.0 §13 LZW decompressor (the most common GDAL compression
    in the wild — reference raster.py:60-98 reads anything gdal.Open
    does, and COMPRESS=LZW is GDAL's long-time default for float
    rasters).  Public-spec implementation:

    - codes are packed MSB-first, starting at 9 bits;
    - 256 = ClearCode, 257 = EndOfInformation, strings from 258;
    - TIFF's "early change": the code width bumps when the table
      reaches 2^width − 1 entries (511/1023/2047), one code earlier
      than plain LZW — the documented libtiff-compatible convention.

    Pure Python per block; the read path is one-time ingestion
    (raster → band table), not the per-row transform hot path, so
    spec clarity beats vectorization here.
    """
    CLEAR, EOI = 256, 257
    data = raw
    nbits = len(data) * 8
    pos = 0
    width = 9
    table: list[bytes] = []
    prev: bytes | None = None
    out = bytearray()

    def read_code() -> int:
        nonlocal pos
        if pos + width > nbits:
            return EOI  # spec: a truncated tail terminates the block
        byte_pos, bit_off = divmod(pos, 8)
        chunk = int.from_bytes(
            data[byte_pos:byte_pos + 3].ljust(3, b"\0"), "big"
        )
        pos += width
        return (chunk >> (24 - bit_off - width)) & ((1 << width) - 1)

    while True:
        code = read_code()
        if code == EOI:
            break
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:  # first code after a Clear
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt LZW stream: code {code} beyond "
                             f"table size {len(table)}")
        out += entry
        prev = entry
        # early change, lag-aligned with the encoder: the encoder
        # widens after ITS add makes next_code == 2^w − 1, one code
        # before the decoder's mirroring append lands (the decoder's
        # table trails the encoder's by exactly one entry), so the
        # decoder widens at len == 2^w − 2
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    return bytes(out)


def lzw_encode(raw: bytes) -> bytes:
    """TIFF 6.0 §13 LZW compressor — the encode twin of
    ``_lzw_decode`` (same early-change convention; emits Clear when
    the table reaches 4094 entries, as libtiff does).  Used to author
    round-trip fixtures and available to the band-table exporter."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    accbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, accbits
        acc = (acc << width) | code
        accbits += width
        while accbits >= 8:
            out.append((acc >> (accbits - 8)) & 0xFF)
            accbits -= 8
        acc &= (1 << accbits) - 1

    def fresh_table() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(256)}

    emit(CLEAR)
    table = fresh_table()
    next_code = 258
    w = b""
    for b in raw:
        c = bytes([b])
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        w = c
        if next_code == (1 << width) - 1 and width < 12:
            width += 1  # early change, mirrors the decoder
        elif next_code == 4094:
            emit(CLEAR)
            table = fresh_table()
            next_code = 258
            width = 9
    if w:
        emit(table[w])
        # PHANTOM entry for the final flush: the decoder's mirroring
        # append lags one code behind, so processing this final code
        # still grows ITS table by one — if that crosses the width
        # boundary the decoder widens before reading EOI, and the
        # encoder must do the same (libtiff's LZWPostEncode rule)
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
    emit(EOI)
    if accbits:
        out.append((acc << (8 - accbits)) & 0xFF)
    return bytes(out)


def _decode_block(raw: bytes, rows: int, row_samples: int,
                  compression: int, predictor: int,
                  byte_order: str = "<") -> np.ndarray:
    """One strip/tile payload → (rows, row_samples) float32.

    ``byte_order`` is the FILE's order ('<' II / '>' MM) and applies
    only to plain (predictor-1) samples; the floating-point predictor
    stores MSB-plane-first regardless of file order (TIFF TechNote 3 —
    libtiff's fpDiff reorders to big-endian before differencing), so
    the predictor-3 path is byte-order independent."""
    if compression in (8, 32946):  # Deflate / AdobeDeflate
        import zlib

        raw = zlib.decompress(raw)
    elif compression == 5:  # LZW (TIFF 6.0 §13)
        raw = _lzw_decode(raw)
    elif compression != 1:
        raise ValueError(
            f"TIFF compression {compression} not supported "
            "(supported: 1=none, 5=LZW, 8/32946=DEFLATE)"
        )
    expected = rows * row_samples * 4
    if len(raw) != expected:
        raise ValueError(
            f"block size {len(raw)} != expected {expected} "
            f"({rows} rows × {row_samples} samples × 4B)"
        )
    if predictor == 3:
        raw = _undo_fp_predictor(raw, rows, row_samples)
        return np.frombuffer(raw, dtype="<f4").reshape(rows, row_samples)
    if predictor != 1:
        raise ValueError(
            f"TIFF predictor {predictor} not supported for Float32 "
            "(supported: 1=none, 3=floating-point)"
        )
    return (np.frombuffer(raw, dtype=byte_order + "f4")
            .reshape(rows, row_samples))


def read_geotiff(path: str):
    """Parse a Float32 GeoTIFF: ({band_name: (h, w) float32 array},
    meta dict). Independent of the writer's in-memory state — walks
    the IFD per the TIFF spec.

    Accepts the layouts GDAL emits for separation/sounding rasters
    (reference raster.py:60-98 reads via gdal.Open):
    - classic TIFF (magic 42) AND BigTIFF (magic 43 — 8-byte
      offsets/counts, 20-byte IFD entries, LONG8 values; what GDAL
      emits past 4 GB), round 5;
    - stripped (any RowsPerStrip) or tiled (TileWidth/TileLength,
      edge tiles padded per spec) payloads;
    - PlanarConfiguration 1 (chunky, GDAL default) and 2 (separate
      planes, this module's writer);
    - Compression 1 (none), 5 (LZW — public-spec decoder, round 5) and
      8/32946 (DEFLATE), with Predictor 1 or 3 (the floating-point
      predictor, GDAL's PREDICTOR=3);
    - both byte orders (II little-endian — the GDAL default — and MM
      big-endian, round 5; the floating-point predictor's byte planes
      are MSB-first in either, per TIFF TechNote 3);
    - clear errors for PackBits/JPEG compression and non-Float32
      samples rather than silent misreads.
    """
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] == b"II":
        bo = "<"  # little-endian (Intel) — what GDAL writes by default
    elif data[:2] == b"MM":
        bo = ">"  # big-endian (Motorola) — legacy but valid TIFF 6.0
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    magic = struct.unpack(bo + "H", data[2:4])[0]
    if magic == 43:
        # BigTIFF (the public BigTIFF spec on top of TIFF 6.0): 8-byte
        # offsets, 8-byte counts, 20-byte IFD entries — what GDAL
        # emits for rasters past 4 GB (BIGTIFF=YES / =IF_SAFER)
        osz, pad = struct.unpack(bo + "HH", data[4:8])
        if osz != 8 or pad != 0:
            raise ValueError(
                f"malformed BigTIFF header (offset size {osz}, pad {pad})"
            )
        (ifd_off,) = struct.unpack(bo + "Q", data[8:16])
        (n_entries,) = struct.unpack(bo + "Q", data[ifd_off:ifd_off + 8])
        entry0, entry_sz, inline = ifd_off + 8, 20, 8
        off_fmt = bo + "Q"
    elif magic == 42:
        (ifd_off,) = struct.unpack(bo + "I", data[4:8])
        (n_entries,) = struct.unpack(bo + "H", data[ifd_off:ifd_off + 2])
        entry0, entry_sz, inline = ifd_off + 2, 12, 4
        off_fmt = bo + "I"
    else:
        raise ValueError(f"not a TIFF (magic {magic})")
    tags: dict[int, tuple] = {}
    for i in range(int(n_entries)):
        off = entry0 + entry_sz * i
        tag, typ = struct.unpack(bo + "HH", data[off:off + 4])
        (count,) = struct.unpack(off_fmt, data[off + 4:off + 4 + inline])
        vfield = off + 4 + inline
        size = _TYPE_SIZE[typ] * count
        if size <= inline:
            raw = data[vfield:vfield + size]
        else:
            (voff,) = struct.unpack(off_fmt, data[vfield:vfield + inline])
            raw = data[voff:voff + size]
        if typ == _TYPE_ASCII:
            vals = raw.rstrip(b"\x00").decode()
        else:
            fmt = {_TYPE_SHORT: "H", _TYPE_LONG: "I", _TYPE_DOUBLE: "d",
                   _TYPE_LONG8: "Q"}[typ]
            vals = list(struct.unpack(f"{bo}{count}{fmt}", raw))
        tags[tag] = vals
    w = tags[IMAGE_WIDTH][0]
    h = tags[IMAGE_LENGTH][0]
    n_bands = tags.get(SAMPLES_PER_PIXEL, [1])[0]
    planar = tags.get(PLANAR_CONFIG, [1])[0]
    compression = tags.get(COMPRESSION, [1])[0]
    predictor = tags.get(PREDICTOR, [1])[0]
    if (set(tags.get(BITS_PER_SAMPLE, [32])) != {32}
            or set(tags.get(SAMPLE_FORMAT, [3])) != {3}):
        raise ValueError(
            "only Float32 samples supported (BitsPerSample=32, "
            f"SampleFormat=3); got bits={tags.get(BITS_PER_SAMPLE)} "
            f"format={tags.get(SAMPLE_FORMAT)}"
        )

    # assemble planes: (n_bands, h, w)
    planes = np.empty((n_bands, h, w), dtype="<f4")
    if TILE_OFFSETS in tags:
        tw = tags[TILE_WIDTH][0]
        th = tags[TILE_LENGTH][0]
        offsets = tags[TILE_OFFSETS]
        counts = tags[TILE_BYTE_COUNTS]
        across = (w + tw - 1) // tw
        down = (h + th - 1) // th
        per_plane = across * down
        n_payload_planes = n_bands if planar == 2 else 1
        samples = tw if planar == 2 else tw * n_bands
        for p in range(n_payload_planes):
            for ty in range(down):
                for txi in range(across):
                    idx = p * per_plane + ty * across + txi
                    raw = data[offsets[idx]:offsets[idx] + counts[idx]]
                    block = _decode_block(raw, th, samples,
                                          compression, predictor, bo)
                    y0, x0 = ty * th, txi * tw
                    ys, xs = min(th, h - y0), min(tw, w - x0)
                    if planar == 2:
                        planes[p, y0:y0 + ys, x0:x0 + xs] = block[:ys, :xs]
                    else:
                        chunk = block.reshape(th, tw, n_bands)
                        for b in range(n_bands):
                            planes[b, y0:y0 + ys, x0:x0 + xs] = \
                                chunk[:ys, :xs, b]
    else:
        offsets = tags[STRIP_OFFSETS]
        counts = tags[STRIP_BYTE_COUNTS]
        rps = tags.get(ROWS_PER_STRIP, [h])[0]
        strips_per_plane = (h + rps - 1) // rps
        n_payload_planes = n_bands if planar == 2 else 1
        samples = w if planar == 2 else w * n_bands
        for p in range(n_payload_planes):
            for s in range(strips_per_plane):
                idx = p * strips_per_plane + s
                y0 = s * rps
                rows = min(rps, h - y0)
                raw = data[offsets[idx]:offsets[idx] + counts[idx]]
                block = _decode_block(raw, rows, samples,
                                      compression, predictor, bo)
                if planar == 2:
                    planes[p, y0:y0 + rows] = block
                else:
                    chunk = block.reshape(rows, w, n_bands)
                    for b in range(n_bands):
                        planes[b, y0:y0 + rows] = chunk[:, :, b]

    names = []
    meta_xml = tags.get(GDAL_METADATA, "")
    for i in range(n_bands):
        marker = f'sample="{i}" role="description">'
        if marker in meta_xml:
            frag = meta_xml.split(marker, 1)[1]
            names.append(frag.split("<", 1)[0])
        else:
            names.append(f"band_{i + 1}")
    bands = {names[i]: planes[i].copy() for i in range(n_bands)}
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
        "planar_config": planar,
        "sample_format": tags.get(SAMPLE_FORMAT, [3]),
        "bits_per_sample": tags.get(BITS_PER_SAMPLE, [32]),
        "geo_model_type": tags.get(GEO_KEY_DIRECTORY, [0] * 8)[7],
        "compression": compression,
        "predictor": predictor,
        "tiled": TILE_OFFSETS in tags,
    }
    return bands, meta


def export_band_table(spark, table_path: str, out_tif: str,
                      compression: str | None = None,
                      predictor: int = 1) -> None:
    """The GeoTIFF export endpoint over the cluster band table: read
    each band back (driver-side strip reassembly, sinks.read_band) and
    emit the .tif — the exact analog of the reference's final
    ``_write_gdal_geotiff`` call after the distributed transform.
    ``compression``/``predictor`` pass through to ``write_geotiff``
    (GDAL creation-option parity: COMPRESS=DEFLATE|LZW, PREDICTOR=3)."""
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
        nodata=m["nodata"], compression=compression, predictor=predictor,
    )

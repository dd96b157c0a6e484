"""Read-side GeoTIFF ingestion parity (VERDICT round-4 #6): the reader
must accept the strip/tile layouts GDAL emits (reference
raster.py:60-98 reads rasters via gdal.Open), not only this module's
own writer output.

The fixture writer below builds GDAL-creation-option layouts
(TILED=YES, COMPRESS=DEFLATE, PREDICTOR=3, chunky PlanarConfig)
independently from the engine reader, straight from the TIFF 6.0 spec.
"""

import struct
import zlib

import numpy as np
import pytest

from vyperdatum_spark.engine import geotiff, raster


def _test_lzw_encode(raw: bytes) -> bytes:
    """Independent TIFF 6.0 §13 LZW encoder for fixture authoring —
    written straight from the spec pseudocode (InitializeStringTable /
    WriteCode(ClearCode) / Ω-loop), deliberately NOT importing the
    engine's codec, so reader bugs can't self-certify.  Early change:
    the code width bumps when the next free entry reaches 2^w − 1."""
    out = []
    bitbuf, nbits, width = 0, 0, 9

    def put(code):
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8
        bitbuf &= (1 << nbits) - 1

    put(256)  # ClearCode
    table = {bytes([i]): i for i in range(256)}
    nxt = 258
    omega = b""
    for k in raw:
        cand = omega + bytes([k])
        if cand in table:
            omega = cand
            continue
        put(table[omega])
        table[cand] = nxt
        nxt += 1
        omega = bytes([k])
        if nxt == (1 << width) - 1 and width < 12:
            width += 1
        elif nxt == 4094:
            put(256)
            table = {bytes([i]): i for i in range(256)}
            nxt, width = 258, 9
    if omega:
        put(table[omega])
        # phantom entry for the final flush (the decoder's lagging
        # append still lands after this code): re-check the width
        # bump before EOI — libtiff's LZWPostEncode rule
        nxt += 1
        if nxt == (1 << width) - 1 and width < 12:
            width += 1
    put(257)  # EOI
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _fp_predict(row_f32: np.ndarray) -> bytes:
    """TIFF floating-point predictor encode for one row: split into
    MSB-first byte planes, then horizontal byte differencing."""
    be = row_f32.astype(">f4").tobytes()
    n = len(row_f32)
    planes = np.frombuffer(be, dtype=np.uint8).reshape(n, 4).T  # (4, n)
    buf = np.ascontiguousarray(planes).reshape(-1).astype(np.int16)
    diff = np.empty_like(buf)
    diff[0] = buf[0]
    diff[1:] = (buf[1:] - buf[:-1]) % 256
    return diff.astype(np.uint8).tobytes()


def _write_gdal_style(
    path: str,
    bands: list[tuple[str, np.ndarray]],
    origin_x: float, origin_y: float, dx: float, dy: float,
    nodata: float = -9999.0,
    tiled: bool = False, tile: tuple[int, int] = (16, 16),
    rows_per_strip: int | None = None,
    compress: bool = False, predictor: int = 1,
    planar: int = 1, bigtiff: bool = False,
    byte_order: str = "<",
) -> None:
    """Minimal independent TIFF writer for GDAL-style layouts
    (classic magic-42, or BigTIFF magic-43 with 8-byte offsets,
    20-byte entries and LONG8 strip/tile offset arrays; '<' II or
    '>' MM byte order — the fp-predictor payload is byte-order
    independent per TIFF TechNote 3)."""
    bo = byte_order
    h, w = bands[0][1].shape
    n_bands = len(bands)
    arrs = [
        np.where(np.isnan(np.asarray(a, dtype=np.float32)),
                 np.float32(nodata), np.asarray(a, dtype=np.float32))
        for _n, a in bands
    ]

    def encode_rows(rows_f32: np.ndarray) -> bytes:
        # rows_f32: (rows, samples) little-endian float32
        if predictor == 3:
            raw = b"".join(_fp_predict(r) for r in rows_f32)
        else:
            raw = rows_f32.astype(bo + "f4").tobytes()
        if compress == "lzw":
            return _test_lzw_encode(raw)
        return zlib.compress(raw) if compress else raw

    blocks: list[bytes] = []
    if tiled:
        tw, th = tile
        across = (w + tw - 1) // tw
        down = (h + th - 1) // th
        if planar == 1:
            # chunky: one payload plane of interleaved samples
            inter = np.stack(arrs, axis=-1)  # (h, w, n)
            for ty in range(down):
                for tx in range(across):
                    t = np.full((th, tw, n_bands), np.float32(0), "<f4")
                    ys = min(th, h - ty * th)
                    xs = min(tw, w - tx * tw)
                    t[:ys, :xs] = inter[ty * th:ty * th + ys,
                                        tx * tw:tx * tw + xs]
                    blocks.append(encode_rows(t.reshape(th, tw * n_bands)))
        else:
            for a in arrs:
                for ty in range(down):
                    for tx in range(across):
                        t = np.zeros((th, tw), "<f4")
                        ys = min(th, h - ty * th)
                        xs = min(tw, w - tx * tw)
                        t[:ys, :xs] = a[ty * th:ty * th + ys,
                                        tx * tw:tx * tw + xs]
                        blocks.append(encode_rows(t))
    else:
        rps = rows_per_strip or h
        n_strips = (h + rps - 1) // rps
        if planar == 1:
            inter = np.stack(arrs, axis=-1).reshape(h, w * n_bands)
            for s in range(n_strips):
                blocks.append(encode_rows(inter[s * rps:min((s + 1) * rps, h)]))
        else:
            for a in arrs:
                for s in range(n_strips):
                    blocks.append(encode_rows(a[s * rps:min((s + 1) * rps, h)]))

    # ---- assemble the file ----
    payload = b""
    offsets, counts = [], []
    base = 16 if bigtiff else 8
    for blk in blocks:
        if len(payload) % 2:
            payload += b"\x00"
        offsets.append(base + len(payload))
        counts.append(len(blk))
        payload += blk

    extra = b""
    extra_base = base + len(payload) + (len(payload) % 2)

    def out_of_line(raw: bytes) -> int:
        nonlocal extra
        if len(extra) % 2:
            extra += b"\x00"
        off = extra_base + len(extra)
        extra += raw
        return off

    entries = []
    INL = 8 if bigtiff else 4
    cnt_fmt = bo + ("Q" if bigtiff else "I")

    def entry(tag, typ, values):
        if bigtiff and typ == 4 and tag in (273, 279, 324, 325):
            typ = 16  # offset/count arrays as LONG8 — the BigTIFF shape
        fmt = {3: bo + "H", 4: bo + "I", 12: bo + "d", 16: bo + "Q"}[typ]
        raw = (values if isinstance(values, bytes)
               else b"".join(struct.pack(fmt, v) for v in values))
        count = (len(values) if isinstance(values, bytes) else len(values))
        if typ == 2:
            count = len(raw)
        head = struct.pack(bo + "HH", tag, typ) + struct.pack(cnt_fmt, count)
        if len(raw) <= INL:
            entries.append(head + raw + b"\x00" * (INL - len(raw)))
        else:
            entries.append(head + struct.pack(cnt_fmt, out_of_line(raw)))

    meta_xml = ("<GDALMetadata>\n" + "".join(
        f'  <Item name="DESCRIPTION" sample="{i}" role="description">'
        f"{name}</Item>\n" for i, (name, _a) in enumerate(bands)
    ) + "</GDALMetadata>\n\x00").encode()
    nodata_ascii = f"{nodata:g}\x00".encode()

    entry(256, 4, [w])
    entry(257, 4, [h])
    entry(258, 3, [32] * n_bands)
    entry(259, 3, [5 if compress == "lzw" else (8 if compress else 1)])
    entry(262, 3, [1])
    if not tiled:
        entry(273, 4, offsets)
    entry(277, 3, [n_bands])
    if not tiled:
        entry(278, 4, [rows_per_strip or h])
        entry(279, 4, counts)
    entry(284, 3, [planar])
    if predictor != 1:
        entry(317, 3, [predictor])
    if tiled:
        entry(322, 4, [tile[0]])
        entry(323, 4, [tile[1]])
        entry(324, 4, offsets)
        entry(325, 4, counts)
    entry(339, 3, [3] * n_bands)
    entry(33550, 12, [dx, abs(dy), 0.0])
    entry(33922, 12, [0.0, 0.0, 0.0, origin_x, origin_y, 0.0])

    # ascii tags via raw path
    def ascii_entry(tag, raw):
        head = struct.pack(bo + "HH", tag, 2) + struct.pack(cnt_fmt, len(raw))
        if len(raw) <= INL:
            entries.append(head + raw + b"\x00" * (INL - len(raw)))
        else:
            entries.append(head + struct.pack(cnt_fmt, out_of_line(raw)))

    ascii_entry(42112, meta_xml)
    ascii_entry(42113, nodata_ascii)

    entries.sort(key=lambda e: struct.unpack(bo + "H", e[:2])[0])
    ifd_off = extra_base + len(extra) + (len(extra) % 2)
    mark = b"II" if bo == "<" else b"MM"
    with open(path, "wb") as f:
        if bigtiff:
            f.write(mark + struct.pack(bo + "HHH", 43, 8, 0)
                    + struct.pack(bo + "Q", ifd_off))
        else:
            f.write(mark + struct.pack(bo + "H", 42)
                    + struct.pack(bo + "I", ifd_off))
        f.write(payload)
        if len(payload) % 2:
            f.write(b"\x00")
        f.write(extra)
        if len(extra) % 2:
            f.write(b"\x00")
        if bigtiff:
            f.write(struct.pack(bo + "Q", len(entries)) + b"".join(entries)
                    + struct.pack(bo + "Q", 0))
        else:
            f.write(struct.pack(bo + "H", len(entries)) + b"".join(entries)
                    + struct.pack(bo + "I", 0))


def _fixture_bands(h=37, w=53):
    rng = np.random.default_rng(11)
    z = rng.normal(scale=3.0, size=(h, w)).astype(np.float32)
    u = rng.random((h, w)).astype(np.float32)
    z[3, 5] = np.nan
    z[-1, -1] = np.nan
    return [("z_out", z), ("unc", u)]


def _expected(bands, nodata=-9999.0):
    return {
        n: np.where(np.isnan(a.astype(np.float32)), np.float32(nodata),
                    a.astype(np.float32))
        for n, a in bands
    }


@pytest.mark.parametrize("layout", [
    dict(tiled=True, tile=(16, 16), compress=True, predictor=3, planar=1),
    dict(tiled=True, tile=(32, 8), compress=False, predictor=1, planar=2),
    dict(rows_per_strip=5, compress=True, predictor=3, planar=1),
    dict(rows_per_strip=8, compress=True, predictor=1, planar=2),
    dict(rows_per_strip=37, compress=False, predictor=1, planar=1),
    # LZW (round-5 VERDICT #4): GDAL's most common float compression
    dict(tiled=True, tile=(16, 16), compress="lzw", predictor=3, planar=1),
    dict(rows_per_strip=7, compress="lzw", predictor=1, planar=2),
    # BigTIFF (round 5): 8-byte offsets, 20-byte entries, LONG8 arrays
    dict(tiled=True, tile=(16, 16), compress="lzw", predictor=3,
         planar=1, bigtiff=True),
    dict(rows_per_strip=9, compress=True, predictor=3, planar=1,
         bigtiff=True),
    # big-endian MM (round 5): plain samples follow the file order,
    # the fp-predictor payload is byte-order independent
    dict(rows_per_strip=8, compress=False, predictor=1, planar=1,
         byte_order=">"),
    dict(tiled=True, tile=(16, 16), compress=True, predictor=3,
         planar=1, byte_order=">"),
    dict(rows_per_strip=7, compress="lzw", predictor=1, planar=2,
         byte_order=">"),
    dict(tiled=True, tile=(32, 8), compress="lzw", predictor=3,
         planar=2, bigtiff=True, byte_order=">"),
])
def test_gdal_layout_variants_roundtrip(tmp_path, layout):
    bands = _fixture_bands()
    p = str(tmp_path / "t.tif")
    _write_gdal_style(p, bands, -77.5, 34.8, 0.01, -0.01, **layout)
    got, meta = geotiff.read_geotiff(p)
    exp = _expected(bands)
    assert meta["width"] == 53 and meta["height"] == 37
    assert meta["nodata"] == -9999.0
    assert (meta["origin_x"], meta["origin_y"]) == (-77.5, 34.8)
    for name, arr in exp.items():
        assert np.array_equal(got[name], arr), name


def test_unsupported_layouts_fail_clearly(tmp_path):
    bands = _fixture_bands(8, 8)
    p = str(tmp_path / "t.tif")
    _write_gdal_style(p, bands, 0.0, 0.0, 1.0, -1.0)
    data = open(p, "rb").read()

    # a classic file with the magic flipped to 43 is a MALFORMED
    # BigTIFF (bytes 4-8 are a classic IFD offset, not the 8/0 header
    # words) — must fail loudly, not misparse (real BigTIFF files are
    # covered by the bigtiff=True layout variants above)
    big = data[:2] + struct.pack("<H", 43) + data[4:]
    bp = str(tmp_path / "big.tif")
    open(bp, "wb").write(big)
    with pytest.raises(ValueError, match="malformed BigTIFF"):
        geotiff.read_geotiff(bp)

    # a byte-order mark that is neither II nor MM (real MM files are
    # covered by the byte_order=">" layout variants above)
    xx = b"XX" + data[2:]
    xp = str(tmp_path / "xx.tif")
    open(xp, "wb").write(xx)
    with pytest.raises(ValueError, match="byte-order mark"):
        geotiff.read_geotiff(xp)

    # PackBits compression id (32773) in the COMPRESSION tag — LZW
    # (5) is supported since round 5, PackBits stays a clear error
    pb = bytearray(data)
    ifd_off = struct.unpack("<I", data[4:8])[0]
    n = struct.unpack("<H", data[ifd_off:ifd_off + 2])[0]
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        if struct.unpack("<H", data[off:off + 2])[0] == 259:
            pb[off + 8:off + 10] = struct.pack("<H", 32773)
    pp = str(tmp_path / "pb.tif")
    open(pp, "wb").write(bytes(pb))
    with pytest.raises(ValueError, match="compression 32773"):
        geotiff.read_geotiff(pp)


def test_lzw_spec_vector_and_boundaries():
    """Pin the engine decoder to the TIFF 6.0 §13 worked example
    (input 7,7,7,8,8,7,7,6,6 ⇒ codes ⟨256,7,258,8,8,258,6,6,257⟩ at
    9 bits) and exercise the early-change width boundaries + table
    reset through the independent test encoder."""
    codes = [256, 7, 258, 8, 8, 258, 6, 6, 257]
    acc, bits, buf = 0, 0, bytearray()
    for c in codes:
        acc = (acc << 9) | c
        bits += 9
        while bits >= 8:
            buf.append((acc >> (bits - 8)) & 0xFF)
            bits -= 8
        acc &= (1 << bits) - 1
    if bits:
        buf.append((acc << (8 - bits)) & 0xFF)
    assert geotiff._lzw_decode(bytes(buf)) == bytes([7, 7, 7, 8, 8, 7, 7, 6, 6])
    assert geotiff.lzw_encode(bytes([7, 7, 7, 8, 8, 7, 7, 6, 6])) == bytes(buf)

    rng = np.random.default_rng(3)
    for size in (1000, 6000, 40000):  # crosses 511/1023/2047 widths
        data = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        assert geotiff._lzw_decode(_test_lzw_encode(data)) == data
        assert geotiff._lzw_decode(geotiff.lzw_encode(data)) == data


@pytest.mark.parametrize("compress", [True, "lzw"])
def test_tiled_tiff_through_raster_to_points(spark, tmp_path, compress):
    """S5 on a GDAL-layout raster: tiled+{DEFLATE,LZW}+PREDICTOR=3
    file → read_geotiff → raster_to_points → full raster transform,
    identical to feeding the raw array directly (the oracle-gated
    geo_raster_transform plan)."""
    h, w = 25, 40
    rng = np.random.default_rng(5)
    z = (rng.integers(0, 400, size=(h, w)).astype(np.float32) * 0.01 + 2.0)
    z[(np.arange(h)[:, None] * 7 + np.arange(w)[None, :] * 13) % 37 == 0] = np.nan
    p = str(tmp_path / "s.tif")
    _write_gdal_style(
        p, [("Elevation", z)], -77.5, 34.8, 0.01, -0.01,
        tiled=True, tile=(16, 16), compress=compress, predictor=3,
    )
    bands, meta = geotiff.read_geotiff(p)
    elev = bands["Elevation"]
    pts_tif = raster.raster_to_points(
        spark, meta["origin_x"], meta["origin_y"], meta["dx"], meta["dy"],
        meta["width"], meta["height"], elev.astype(np.float64),
        nodata=meta["nodata"],
    )
    direct = np.where(np.isnan(z), meta["nodata"], z).astype(np.float32)
    pts_raw = raster.raster_to_points(
        spark, -77.5, 34.8, 0.01, -0.01, w, h,
        direct.astype(np.float64), nodata=-9999.0,
    )
    a = raster.transform_raster_points(
        spark, pts_tif, "mllw", "navd88", input_is_height=False,
        allow_points_outside_coverage=True,
    ).toPandas().set_index("cell_id").sort_index()
    b = raster.transform_raster_points(
        spark, pts_raw, "mllw", "navd88", input_is_height=False,
        allow_points_outside_coverage=True,
    ).toPandas().set_index("cell_id").sort_index()
    assert len(a) == h * w
    assert a.region_id.fillna("-").equals(b.region_id.fillna("-"))
    assert np.array_equal(
        np.nan_to_num(a.z_out.to_numpy(dtype=float), nan=-9e9),
        np.nan_to_num(b.z_out.to_numpy(dtype=float), nan=-9e9),
    )


@pytest.mark.parametrize("compression,predictor", [
    (None, 1),
    ("deflate", 1),
    ("deflate", 3),
    ("lzw", 1),
    ("lzw", 3),
])
def test_writer_compression_roundtrip(tmp_path, compression, predictor):
    """Round-5 write parity: the engine WRITER emits COMPRESS=DEFLATE /
    COMPRESS=LZW (+PREDICTOR=3) layouts that its own reader — and, by
    the layout-variant tests above, any spec reader — round-trips
    bit-exactly."""
    bands = _fixture_bands()
    p = str(tmp_path / "w.tif")
    geotiff.write_geotiff(
        p, bands, -77.5, 34.8, 0.01, -0.01,
        compression=compression, predictor=predictor,
    )
    got, meta = geotiff.read_geotiff(p)
    exp = _expected(bands)
    assert meta["compression"] == {None: 1, "deflate": 8, "lzw": 5}[compression]
    assert meta["predictor"] == predictor
    assert (meta["origin_x"], meta["origin_y"]) == (-77.5, 34.8)
    for name, arr in exp.items():
        assert np.array_equal(got[name], arr), name


def test_writer_fp_predictor_inverts_and_compresses(tmp_path):
    """The forward fp-predictor is the exact inverse of the reader's
    decode, and on a smooth separation-style surface predictor-3 +
    deflate beats plain deflate (the reason GDAL defaults to it)."""
    rng = np.random.default_rng(7)
    h, w = 64, 96
    raw = rng.normal(scale=2.0, size=(h, w)).astype("<f4").tobytes()
    fwd = geotiff._apply_fp_predictor(raw, h, w)
    assert geotiff._undo_fp_predictor(fwd, h, w) == raw

    yy, xx = np.mgrid[0:h, 0:w]
    smooth = (0.001 * xx + 0.002 * yy + 5.0).astype(np.float32)
    plain = str(tmp_path / "plain.tif")
    pred = str(tmp_path / "pred.tif")
    geotiff.write_geotiff(plain, [("z", smooth)], 0.0, 1.0, 0.01, -0.01,
                          compression="deflate", predictor=1)
    geotiff.write_geotiff(pred, [("z", smooth)], 0.0, 1.0, 0.01, -0.01,
                          compression="deflate", predictor=3)
    import os
    assert os.path.getsize(pred) < os.path.getsize(plain)
    a, _ = geotiff.read_geotiff(plain)
    b, _ = geotiff.read_geotiff(pred)
    assert np.array_equal(a["z"], b["z"])


def test_export_band_table_compressed(spark, tmp_path):
    """S6 sink end-to-end with compression: band table → compressed
    GeoTIFF export → read back equals the uncompressed export."""
    from vyperdatum_spark.engine import sinks

    h, w = 19, 23
    rng = np.random.default_rng(13)
    z = rng.normal(size=(h, w)).astype(np.float64)
    z[2, 3] = np.nan
    pts = raster.raster_to_points(
        spark, -77.5, 34.8, 0.01, -0.01, w, h,
        np.where(np.isnan(z), -9999.0, z), nodata=-9999.0,
    )
    tbl = str(tmp_path / "band_table")
    sinks.to_band_table(
        pts.withColumnRenamed("value", "z_out"), tbl,
        bands=("z_out",), width=w, height=h,
        origin_x=-77.5, origin_y=34.8, dx=0.01, dy=-0.01,
        nodata=-9999.0,
    )
    plain = str(tmp_path / "plain.tif")
    comp = str(tmp_path / "comp.tif")
    geotiff.export_band_table(spark, tbl, plain)
    geotiff.export_band_table(spark, tbl, comp,
                              compression="lzw", predictor=3)
    a, am = geotiff.read_geotiff(plain)
    b, bm = geotiff.read_geotiff(comp)
    assert bm["compression"] == 5 and bm["predictor"] == 3
    assert np.array_equal(a["z_out"], b["z_out"])

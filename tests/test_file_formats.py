"""S2/S3 pure-stdlib format readers: .xlsx and shapefile-ZIP fixtures
are generated here byte-by-byte from the public specs, then read back
through the engine's ingest functions — including the distributed
(binaryFile + mapInPandas) Excel path and the S3 → geo-operator
composition the reference's admin-boundary upload performs."""

from __future__ import annotations

import struct
import zipfile

import pytest
from pyspark.sql import functions as F

from geoscale_healthflow_etl_django_analytics_spark.sources import files, shapefile as shpmod, xlsx
from geoscale_healthflow_etl_django_analytics_spark.operators import geo

# ---------------------------------------------------------------------------
# .xlsx fixture writer (ECMA-376 minimal subset)
# ---------------------------------------------------------------------------

def write_xlsx(path: str, header: list[str], rows: list[list]) -> None:
    with open(path, "wb") as f:
        f.write(xlsx.write_xlsx_bytes(header, rows))


# ---------------------------------------------------------------------------
# shapefile fixture writer (ESRI spec minimal subset)
# ---------------------------------------------------------------------------


def _shp_bytes(rings: list[list[tuple[float, float]]]) -> bytes:
    # one single-part record per ring
    return shpmod.write_shp_bytes([[r] for r in rings])


def _shp_bytes_parts(shapes: list[list[list[tuple[float, float]]]]) -> bytes:
    return shpmod.write_shp_bytes(shapes)


def _dbf_bytes(field_names: list[str], rows: list[list[str] | None]) -> bytes:
    return shpmod.write_dbf_bytes(field_names, rows)


def write_shapefile_zip(path: str, members: dict[str, tuple[list, list, list]]):
    """members: name -> (rings, field_names, dbf_rows)."""
    with zipfile.ZipFile(path, "w") as zf:
        for name, (rings, field_names, dbf_rows) in members.items():
            zf.writestr(f"{name}.shp", _shp_bytes(rings))
            if field_names:
                zf.writestr(f"{name}.dbf", _dbf_bytes(field_names, dbf_rows))


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_xlsx_roundtrip(spark, tmp_path):
    p = str(tmp_path / "lab.xlsx")
    write_xlsx(
        p,
        ["village", "year", "tests", "note"],
        [
            ["Kigali A", 2023.0, 41.0, "ok"],
            ["Kigali B", 2024.0, 17.0, None],
        ],
    )
    df = files.read_excel(spark, p)
    assert df.columns == ["village", "year", "tests", "note"]
    rows = {r.village: r for r in df.collect()}
    assert rows["Kigali A"].year == 2023.0 and rows["Kigali A"].note == "ok"
    assert rows["Kigali B"].tests == 17.0 and rows["Kigali B"].note is None


def test_xlsx_shared_string_dedup_and_bool(tmp_path):
    p = str(tmp_path / "t.xlsx")
    write_xlsx(p, ["a", "b"], [["x", True], ["x", False]])
    with open(p, "rb") as f:
        header, rows = xlsx.parse_xlsx_bytes(f.read())
    assert header == ["a", "b"]
    assert rows == [["x", True], ["x", False]]


def test_read_excel_many_distributed(spark, tmp_path):
    for i in range(3):
        write_xlsx(
            str(tmp_path / f"wb{i}.xlsx"),
            ["village", "tests"],
            [[f"v{i}", float(10 * i)], [f"w{i}", float(10 * i + 1)]],
        )
    df = files.read_excel_many(
        spark, str(tmp_path / "*.xlsx"), ["village", "tests"]
    )
    out = df.collect()
    assert len(out) == 6
    assert {r.village for r in out} == {"v0", "w0", "v1", "w1", "v2", "w2"}
    # executes as a distributed Arrow-batched stage, not a driver loop
    from geoscale_healthflow_etl_django_analytics_spark.plans import audit as pa

    assert "MapInPandas" in pa.formatted_plan(df)


def test_shapefile_zip_selects_village_level(spark, tmp_path):
    p = str(tmp_path / "adm.zip")
    square = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
    big = [(0.0, 0.0), (100.0, 0.0), (100.0, 50.0), (0.0, 50.0), (0.0, 0.0)]
    write_shapefile_zip(
        p,
        {
            "country_adm0": ([big], ["COUNTRY"], [["Rwanda"]]),
            "rwa_villages": (
                [square, [(10.0, 10.0), (14.0, 10.0), (14.0, 13.0), (10.0, 13.0), (10.0, 10.0)]],
                ["VILL_NAME", "DISTRICT"],
                [["Nyamata", "Bugesera"], ["Kinyinya", "Gasabo"]],
            ),
        },
    )
    df = files.read_shapefile_zip(spark, p)
    rows = {r.VILL_NAME: r for r in df.collect()}
    assert set(rows) == {"Nyamata", "Kinyinya"}  # village layer won
    assert rows["Nyamata"].geometry.startswith("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")


def test_shapefile_scoring_matches_reference_heuristic():
    scored = shpmod.score_shp_candidates(
        [
            ("adm0.shp", ["COUNTRY"], 1),
            ("villages.shp", ["VILL_NAME"], 10),
            ("big_sectors.shp", ["ID"], 500),
        ]
    )
    assert scored[0][1] == "villages.shp"  # keyword(10) + name col(20)
    # sectors: keyword 'sector'+'sectors' (two hits = 20) + count(5)
    assert dict((n, s) for s, n in scored)["big_sectors.shp"] == 25


def test_shapefile_to_zonal_stats_pipeline(spark, tmp_path):
    """S3 → J8/J6: parsed WKT polygons flow through polygons_from_wkt
    into the pixel-in-polygon zonal-stats join (the reference's
    boundary-upload → zonal analysis path, end-to-end)."""
    p = str(tmp_path / "z.zip")
    write_shapefile_zip(
        p,
        {
            "cells": (
                [
                    [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)],
                    [(20.0, 20.0), (30.0, 20.0), (30.0, 30.0), (20.0, 30.0), (20.0, 20.0)],
                ],
                ["CELL_NAME"],
                [["alpha"], ["beta"]],
            )
        },
    )
    polys = geo.polygons_from_wkt(
        files.read_shapefile_zip(spark, p)
    ).select(
        F.col("CELL_NAME").alias("name"),
        F.monotonically_increasing_id().alias("poly_id"),
        "ring", "x0", "y0", "x1", "y1",
    )
    pixels = geo.pixel_grid(spark.range(1), nx=40, ny=40)
    stats = {r.name: r for r in geo.zonal_stats(polys, pixels).collect()}
    # 10x10 and 10x10 boxes over unit pixels -> 100 pixel centers each
    assert stats["alpha"].pixel_count == 100
    assert stats["beta"].pixel_count == 100
    assert stats["alpha"].min_value >= 0.0


def test_polygons_from_wkt_bbox(spark):
    df = spark.createDataFrame(
        [("POLYGON ((1 2, 5 2, 5 8, 1 8, 1 2))",)], schema=["geometry"]
    )
    r = geo.polygons_from_wkt(df).collect()[0]
    assert (r.x0, r.y0, r.x1, r.y1) == (1.0, 2.0, 5.0, 8.0)
    assert len(r.ring) == 5 and r.ring[0]["lon"] == 1.0
    assert r.n_rings == 1


# CW square (ESRI exterior winding) and a CCW hole inside it
_CW_SQ = [(0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0), (0.0, 0.0)]
_CCW_HOLE = [(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0), (1.0, 1.0)]
_CW_SQ2 = [(10.0, 10.0), (10.0, 14.0), (14.0, 14.0), (14.0, 10.0), (10.0, 10.0)]


def test_shapefile_multipart_winding():
    """Multi-part polygon records split by ring winding: two clockwise
    rings = two exterior shells (MULTIPOLYGON — islands/exclaves), a
    counter-clockwise ring = hole of the preceding shell (POLYGON with
    two rings). Emitting every part as a sibling POLYGON ring silently
    merges separate shells."""
    wkts = shpmod.parse_shp_bytes(
        _shp_bytes_parts([[_CW_SQ, _CCW_HOLE], [_CW_SQ, _CW_SQ2]])
    )
    assert wkts[0] == (
        "POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))"
    )
    assert wkts[1] == (
        "MULTIPOLYGON (((0 0, 0 4, 4 4, 4 0, 0 0)), "
        "((10 10, 10 14, 14 14, 14 10, 10 10)))"
    )


def test_polygons_from_wkt_multiring_exterior_only(spark):
    """Holes / MULTIPOLYGON shells must not null out the ring parse:
    the bridge extracts the exterior ring exactly and reports the
    total ring count so callers can route multipart geometries."""
    df = spark.createDataFrame(
        [
            ("POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))",),
            ("MULTIPOLYGON (((0 0, 0 4, 4 4, 4 0, 0 0)), ((9 9, 9 9, 9 9)))",),
        ],
        schema=["geometry"],
    )
    rows = geo.polygons_from_wkt(df).collect()
    for r in rows:
        assert len(r.ring) == 5
        assert all(p["lon"] is not None and p["lat"] is not None for p in r.ring)
        assert (r.x0, r.y0, r.x1, r.y1) == (0.0, 0.0, 4.0, 4.0)
    assert rows[0].n_rings == 2
    assert rows[1].n_rings == 2


def test_geotiff_roundtrip(spark, tmp_path):
    from geoscale_healthflow_etl_django_analytics_spark.sources import geotiff as gt

    vals = [float(i) for i in range(12)]
    data = gt.write_geotiff_bytes(4, 3, vals, origin_x=100.0, origin_y=50.0, px_size=2.0)
    g = gt.parse_geotiff_bytes(data)
    assert (g["width"], g["height"]) == (4, 3)
    assert g["values"] == vals
    assert (g["origin_x"], g["origin_y"]) == (100.0, 50.0)
    assert (g["px_size_x"], g["px_size_y"]) == (2.0, -2.0)

    p = str(tmp_path / "r.tif")
    with open(p, "wb") as f:
        f.write(data)
    px = files.read_geotiff_pixels(spark, p).collect()
    assert len(px) == 12
    got = {(r.i, r.j): (r.px, r.py, r.pixel_value) for r in px}
    # north-up affine: row 0 center sits one half-pixel below the top
    assert got[(0, 0)] == (101.0, 49.0, 0.0)
    assert got[(3, 2)] == (107.0, 45.0, 11.0)


def test_geotiff_parser_multistrip_uint16_bigendian():
    """Parser generality beyond the writer's subset: big-endian,
    uint16 samples, two strips."""
    from geoscale_healthflow_etl_django_analytics_spark.sources import geotiff as gt

    w, h = 3, 4
    vals = list(range(12))
    strip1 = struct.pack(">6H", *vals[:6])
    strip2 = struct.pack(">6H", *vals[6:])
    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 16), (259, 3, 1, 1),
        (273, 4, 2, None), (278, 4, 1, 2), (279, 4, 2, None), (339, 3, 1, 1),
    ]
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    off_arrays = ifd_off + ifd_size          # strip offsets (2×LONG)
    cnt_arrays = off_arrays + 8              # strip counts (2×LONG)
    data_off = cnt_arrays + 8
    out = b"MM" + struct.pack(">HI", 42, ifd_off)
    out += struct.pack(">H", len(entries))
    for tag, ftype, count, val in entries:
        if tag == 273:
            val = off_arrays
        elif tag == 279:
            val = cnt_arrays
        if ftype == 3:
            # inline SHORT values are LEFT-justified in the 4-byte
            # value field (TIFF 6.0 §2) — matters for big-endian
            out += struct.pack(">HHIHH", tag, ftype, count, val, 0)
        else:
            out += struct.pack(">HHII", tag, ftype, count, val)
    out += struct.pack(">I", 0)
    out += struct.pack(">2I", data_off, data_off + len(strip1))
    out += struct.pack(">2I", len(strip1), len(strip2))
    out += strip1 + strip2
    g = gt.parse_geotiff_bytes(out)
    assert (g["width"], g["height"]) == (3, 4)
    assert g["values"] == [float(v) for v in vals]


def test_geotiff_deflate_roundtrip():
    """Compression=8 (Adobe deflate, TIFF TechNote 2): multi-strip
    zlib-compressed rasters round-trip bit-exactly, including a
    partial last strip; the compressed stream is materially smaller."""
    from geoscale_healthflow_etl_django_analytics_spark.sources import geotiff as gt

    w, h = 17, 11
    vals = [((i * 13 + 5) % 29) / 7.0 for i in range(w * h)]
    plain = gt.write_geotiff_bytes(w, h, vals, origin_x=2.0, origin_y=11.0)
    for rps in (None, 3, 11):
        data = gt.write_geotiff_bytes(
            w, h, vals, origin_x=2.0, origin_y=11.0,
            compression="deflate", rows_per_strip=rps,
        )
        g = gt.parse_geotiff_bytes(data)
        assert (g["width"], g["height"]) == (w, h)
        assert g["values"] == vals
        assert (g["origin_x"], g["origin_y"]) == (2.0, 11.0)
    assert len(data) < len(plain) // 2


def test_geotiff_deflate_truncated_strip_raises():
    """A decoded strip shorter than rows*width samples is a
    ValueError (explicit check — not a stripped-under-O assert)."""
    from geoscale_healthflow_etl_django_analytics_spark.sources import geotiff as gt

    data = bytearray(
        gt.write_geotiff_bytes(4, 4, [1.0] * 16, compression="deflate")
    )
    # grow the advertised image length + rows-per-strip so the parser
    # expects MORE samples from the single strip than it decodes
    import struct as st

    ifd_off = st.unpack_from("<I", data, 4)[0]
    n = st.unpack_from("<H", data, ifd_off)[0]
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag = st.unpack_from("<H", data, base)[0]
        if tag in (257, 278):  # ImageLength, RowsPerStrip
            st.pack_into("<I", data, base + 8, 8)
    with pytest.raises(ValueError, match="required"):
        gt.parse_geotiff_bytes(bytes(data))


def test_geotiff_lzw_roundtrip():
    """Compression=5 (TIFF 6.0 §13 LZW, early-change code widths):
    multi-strip compressed rasters round-trip bit-exactly."""
    from geoscale_healthflow_etl_django_analytics_spark.sources import geotiff as gt

    w, h = 23, 13
    vals = [((i * 7 + 3) % 31) / 4.0 for i in range(w * h)]
    for rps in (None, 5):
        data = gt.write_geotiff_bytes(
            w, h, vals, origin_x=1.0, origin_y=13.0,
            compression="lzw", rows_per_strip=rps,
        )
        g = gt.parse_geotiff_bytes(data)
        assert (g["width"], g["height"]) == (w, h)
        assert g["values"] == vals


def test_lzw_codec_spec_behaviors():
    """TIFF-variant LZW specifics: the stream begins with ClearCode,
    ends with EOI, uses MSB-first 9-bit codes initially (pinned on a
    hand-decoded 'AAAA' stream: A + AA + A), survives table resets
    (incompressible input > 4094 entries) and handles the KwKwK
    self-referential code case ('ababab...')."""
    import random
    import struct as st

    from geoscale_healthflow_etl_django_analytics_spark.sources.lzw import (
        _BitReader,
        lzw_decode,
        lzw_encode,
    )

    enc = lzw_encode(b"AAAA")
    r = _BitReader(enc)
    assert [r.read(9) for _ in range(5)] == [256, 65, 258, 65, 257]

    for payload in (
        b"",
        b"\x00",
        b"abababababab",  # KwKwK chains
        bytes(range(256)) * 3,
        bytes(random.Random(9).randrange(256) for _ in range(30000)),
        st.pack("<3000d", *[((i * 31) % 97) / 3.0 for i in range(3000)]),
    ):
        assert lzw_decode(lzw_encode(payload)) == payload


def test_geotiff_predictor2_raises():
    from geoscale_healthflow_etl_django_analytics_spark.sources import geotiff as gt

    data = bytearray(gt.write_geotiff_bytes(2, 2, [1.0] * 4))
    import struct as st

    # append no tag; instead rewrite Compression tag id to Predictor=2
    ifd_off = st.unpack_from("<I", data, 4)[0]
    n = st.unpack_from("<H", data, ifd_off)[0]
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        if st.unpack_from("<H", data, base)[0] == 339:  # SampleFormat
            st.pack_into("<H", data, base, 317)  # -> Predictor
            st.pack_into("<H", data, base + 8, 2)
    with pytest.raises(ValueError, match="Predictor"):
        gt.parse_geotiff_bytes(bytes(data))


def test_geotiff_polygonize_feeds_wkt_bridge(spark, tmp_path):
    """S4 → J6 composition: per-pixel polygonize output parses through
    polygons_from_wkt with exact bboxes."""
    from geoscale_healthflow_etl_django_analytics_spark.sources import geotiff as gt

    p = str(tmp_path / "s.tif")
    with open(p, "wb") as f:
        f.write(gt.write_geotiff_bytes(2, 2, [1.0, 2.0, 3.0, 4.0], origin_y=2.0))
    polys = geo.polygons_from_wkt(files.read_geotiff_polygons(spark, p))
    rows = {(r.x0, r.y0, r.x1, r.y1): r.value for r in polys.collect()}
    assert rows[(0.0, 1.0, 1.0, 2.0)] == 1.0  # top-left pixel, value 1
    assert rows[(1.0, 0.0, 2.0, 1.0)] == 4.0  # bottom-right pixel
    assert all(r.n_rings == 1 for r in polys.collect())


def test_dbf_deleted_record_keeps_alignment(spark, tmp_path):
    """A deleted dbf record must not shift later features' attributes
    onto the wrong geometry — deleted slots become empty-prop
    placeholders, keeping the positional shp↔dbf pairing intact."""
    p = str(tmp_path / "del.zip")
    sq = lambda x: [  # noqa: E731
        (x, 0.0), (x + 1.0, 0.0), (x + 1.0, 1.0), (x, 1.0), (x, 0.0)
    ]
    write_shapefile_zip(
        p,
        {
            "villages": (
                [sq(0.0), sq(10.0), sq(20.0)],
                ["VILL_NAME"],
                [["alpha"], None, ["gamma"]],
            )
        },
    )
    with open(p, "rb") as f:
        _, rows = shpmod.parse_shapefile_zip_bytes(f.read())
    assert rows[0]["VILL_NAME"] == "alpha"
    assert "VILL_NAME" not in rows[1]  # deleted → no properties
    assert rows[2]["VILL_NAME"] == "gamma"
    assert rows[2]["geometry"].startswith("POLYGON ((20 0")


def test_bmp_roundtrip_and_padding():
    """24-bit BMP writer/parser round-trip across widths that exercise
    every row-padding remainder (w*3 mod 4), bottom-up storage and
    BGR order."""
    from geoscale_healthflow_etl_django_analytics_spark.sources import bmp

    for w, h in [(1, 1), (2, 3), (3, 2), (4, 4), (5, 7), (13, 11)]:
        px = [
            ((x * 7 + y * 3) % 256, (x * 5 + y * 11) % 256, (x * 13 + y) % 256)
            for y in range(h)
            for x in range(w)
        ]
        assert bmp.parse_bmp_bytes(bmp.write_bmp_bytes(w, h, px)) == (w, h, px)
    # position sensitivity: the parser must NOT be flip/channel
    # symmetric — asymmetric pixels round-trip exactly
    px = [(1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12)]
    assert bmp.parse_bmp_bytes(bmp.write_bmp_bytes(2, 2, px))[2] == px


def test_bmp_parser_rejects_unsupported():
    from geoscale_healthflow_etl_django_analytics_spark.sources import bmp

    with pytest.raises(ValueError, match="magic"):
        bmp.parse_bmp_bytes(b"PNG garbage")
    data = bytearray(bmp.write_bmp_bytes(2, 2, [(0, 0, 0)] * 4))
    struct.pack_into("<H", data, 28, 8)  # bpp 24 -> 8
    with pytest.raises(ValueError, match="24-bit"):
        bmp.parse_bmp_bytes(bytes(data))


def test_wav_roundtrip_and_chunk_skip():
    """Mono 16-bit PCM round-trip, including negative samples and a
    LIST metadata chunk inserted between fmt and data (RIFF says skip
    unknown chunks, with word alignment for odd sizes)."""
    from geoscale_healthflow_etl_django_analytics_spark.sources import wav

    samples = [0, 1, -1, 32767, -32768, 1001, -1001]
    data = wav.write_wav_bytes(samples, sample_rate=8000)
    assert wav.parse_wav_bytes(data) == (8000, samples)

    # splice an odd-sized LIST chunk before 'data'
    di = data.index(b"data")
    spliced = (
        data[:di] + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
        + data[di:]
    )
    assert wav.parse_wav_bytes(spliced) == (8000, samples)


def test_wav_parser_rejects_unsupported():
    from geoscale_healthflow_etl_django_analytics_spark.sources import wav

    with pytest.raises(ValueError, match="RIFF"):
        wav.parse_wav_bytes(b"OggS nope")
    data = bytearray(wav.write_wav_bytes([1, 2, 3]))
    fi = bytes(data).index(b"fmt ") + 8
    struct.pack_into("<H", data, fi + 2, 2)  # stereo
    with pytest.raises(ValueError, match="mono"):
        wav.parse_wav_bytes(bytes(data))


class TestJpegCodec:
    """Baseline grayscale JPEG (sources/jpeg.py) + Compression=7 TIFF."""

    def test_arbitrary_image_matches_numpy_reference(self):
        """decode(encode(img, q)) must EXACTLY equal the numpy
        reference round(IDCT(round(DCT(x-128)/Q)*Q))+128 — entropy
        coding is lossless, so any zigzag/Huffman/bit-stuffing bug
        breaks exact equality; this pins the whole container, not a
        tolerance band."""
        import numpy as np

        from geoscale_healthflow_etl_django_analytics_spark.sources import jpeg

        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, size=(24, 40)).astype(np.uint8)
        A = jpeg._A
        for q in (1, 8):
            dec = jpeg.decode_gray(jpeg.encode_gray(img, quant=q))
            ref = np.zeros((24, 40))
            for by in range(0, 24, 8):
                for bx in range(0, 40, 8):
                    b = img[by:by + 8, bx:bx + 8].astype(float) - 128.0
                    co = np.rint((A @ b @ A.T) / q) * q
                    ref[by:by + 8, bx:bx + 8] = A.T @ co @ A + 128.0
            ref = np.clip(np.rint(ref), 0, 255).astype(np.uint8)
            assert np.array_equal(dec, ref), f"q={q}"

    def test_block_constant_is_bit_exact(self):
        import numpy as np

        from geoscale_healthflow_etl_django_analytics_spark.sources import jpeg

        rng = np.random.RandomState(11)
        blocks = rng.randint(0, 256, size=(4, 6))
        img = np.kron(blocks, np.ones((8, 8), dtype=int)).astype(np.uint8)
        assert np.array_equal(jpeg.decode_gray(jpeg.encode_gray(img, 1)), img)

    def test_odd_dims_crop(self):
        import numpy as np

        from geoscale_healthflow_etl_django_analytics_spark.sources import jpeg

        img = (np.arange(13 * 21).reshape(13, 21) % 251).astype(np.uint8)
        assert jpeg.decode_gray(jpeg.encode_gray(img, 4)).shape == (13, 21)

    def test_tiff_jpeg_strips_roundtrip_exact(self):
        import numpy as np

        from geoscale_healthflow_etl_django_analytics_spark.sources.geotiff import (
            parse_geotiff_bytes,
            write_geotiff_bytes,
        )

        blocks = np.array(
            [[(i * 31 + j * 17) % 97 for j in range(9)] for i in range(6)]
        )
        img = np.kron(blocks, np.ones((8, 8), dtype=int))
        vals = [float(v) for v in img.flatten()]
        data = write_geotiff_bytes(
            72, 48, vals, origin_x=10.0, origin_y=40.0, px_size=0.5,
            compression="jpeg", rows_per_strip=24,
        )
        out = parse_geotiff_bytes(data)
        assert out["values"] == vals
        assert (out["width"], out["height"]) == (72, 48)
        assert (out["origin_x"], out["px_size_y"]) == (10.0, -0.5)

    def test_jpeg_rejects_non_8bit_values(self):
        import pytest

        from geoscale_healthflow_etl_django_analytics_spark.sources.geotiff import (
            write_geotiff_bytes,
        )

        with pytest.raises(ValueError, match="8-bit"):
            write_geotiff_bytes(8, 1, [0.5] * 8, compression="jpeg")
        with pytest.raises(ValueError, match="8-bit"):
            write_geotiff_bytes(8, 1, [300.0] * 8, compression="jpeg")

"""Codec + decoded-feature tests for operators/multimodal.py.

The golden-byte tests construct BMP/PPM payloads BY HAND (literal bytes,
not via encode_bmp/encode_ppm), so a symmetric bug in encode+decode
cannot cancel out — decode is pinned to the on-disk format spec.
"""

from __future__ import annotations

import struct

import pytest

from lakehouse_v3_spark.operators.multimodal import (
    decode_image,
    encode_bmp,
    encode_ppm,
    synthetic_image_payload,
)


def _hand_bmp_2x2() -> bytes:
    """2x2 24-bit BMP, built field-by-field from the spec.

    Logical (top-down) image:
        (0,0)=R(255,0,0)   (1,0)=G(0,255,0)
        (0,1)=B(0,0,255)   (1,1)=W(255,255,255)
    Stored bottom-up, BGR, rows padded 2*3=6 -> 8 bytes.
    """
    row_bottom = bytes([255, 0, 0, 255, 255, 255]) + b"\x00\x00"  # B, W
    row_top = bytes([0, 0, 255, 0, 255, 0]) + b"\x00\x00"  # R, G
    raster = row_bottom + row_top  # bottom row FIRST in the file
    file_header = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(raster), 0, 0, 0, 0)
    return file_header + dib + raster


def test_decode_bmp_golden_bytes():
    img = decode_image(_hand_bmp_2x2())
    assert (img["width"], img["height"], img["channels"]) == (2, 2, 3)
    # top-down RGB: R, G / B, W
    assert img["pixels"] == bytes(
        [255, 0, 0, 0, 255, 0] + [0, 0, 255, 255, 255, 255]
    )


def test_decode_ppm_golden_bytes():
    # P6 with a comment line and multi-whitespace header
    payload = b"P6\n# test image\n2 1\n255\n" + bytes([1, 2, 3, 4, 5, 6])
    img = decode_image(payload)
    assert (img["width"], img["height"], img["channels"]) == (2, 1, 3)
    assert img["pixels"] == bytes([1, 2, 3, 4, 5, 6])


def test_decode_pgm_golden_bytes():
    payload = b"P5 3 2 255 " + bytes([9, 8, 7, 6, 5, 4])
    img = decode_image(payload)
    assert (img["width"], img["height"], img["channels"]) == (3, 2, 1)
    assert img["pixels"] == bytes([9, 8, 7, 6, 5, 4])


@pytest.mark.parametrize("bpp", [24, 32])
@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (5, 4)])
def test_bmp_roundtrip(w, h, bpp):
    rgb = bytes((i * 37) % 256 for i in range(w * h * 3))
    img = decode_image(encode_bmp(w, h, rgb, bpp=bpp))
    assert (img["width"], img["height"]) == (w, h)
    assert img["pixels"] == rgb


def test_ppm_roundtrip():
    rgb = bytes(range(4 * 3 * 3))
    img = decode_image(encode_ppm(4, 3, rgb))
    assert img["pixels"] == rgb


def test_decode_rejects_malformed():
    with pytest.raises(ValueError, match="unsupported image format"):
        decode_image(b"GIF89a....")
    with pytest.raises(ValueError, match="truncated BMP"):
        decode_image(b"BM" + b"\x00" * 20)
    # valid header, short pixel array
    good = _hand_bmp_2x2()
    with pytest.raises(ValueError, match="pixel array shorter"):
        decode_image(good[:-4])
    with pytest.raises(ValueError, match="raster shorter"):
        decode_image(b"P6\n4 4\n255\n\x00\x01")
    with pytest.raises(ValueError, match="maxval"):
        decode_image(b"P6\n1 1\n65535\n\x00\x00")


def _hand_png_2x2() -> bytes:
    """2x2 8-bit RGB PNG, chunks built field-by-field from the spec
    (NOT via encode_png, so a symmetric encode/decode bug can't cancel).

    Logical top-down pixels: (1,2,3) (11,12,13) / (5,5,5) (6,7,8).
    Row 0 uses filter 1 (Sub):  [1,2,3, 11-1,12-2,13-3] = [1,2,3,10,10,10]
    Row 1 uses filter 2 (Up):   [5-1,5-2,5-3, 6-11,7-12,8-13]
                              = [4,3,2, 251,251,251] (mod 256)
    """
    import zlib

    raster = bytes([1, 1, 2, 3, 10, 10, 10]) + bytes([2, 4, 3, 2, 251, 251, 251])

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raster))
        + chunk(b"IEND", b"")
    )


def test_decode_png_golden_bytes():
    img = decode_image(_hand_png_2x2())
    assert (img["width"], img["height"], img["channels"]) == (2, 2, 3)
    assert img["pixels"] == bytes([1, 2, 3, 11, 12, 13, 5, 5, 5, 6, 7, 8])


@pytest.mark.parametrize("color_type", [2, 6])
@pytest.mark.parametrize("w,h", [(1, 1), (3, 7), (5, 6)])
def test_png_roundtrip(w, h, color_type):
    """h ≥ 5 cases exercise every scanline filter (encode_png rotates
    filter type row % 5); color type 6 exercises the RGBA/alpha-drop
    path."""
    from lakehouse_v3_spark.operators.multimodal import encode_png

    rgb = bytes((i * 89 + 7) % 256 for i in range(w * h * 3))
    img = decode_image(encode_png(w, h, rgb, color_type=color_type))
    assert (img["width"], img["height"], img["channels"]) == (w, h, 3)
    assert img["pixels"] == rgb


def test_decode_png_rejects_malformed():
    import zlib

    from lakehouse_v3_spark.operators.multimodal import encode_png

    good = encode_png(3, 3, bytes(range(27)))
    # interlaced flag set
    bad = bytearray(good)
    bad[8 + 8 + 12] = 1  # IHDR interlace byte
    with pytest.raises(ValueError, match="interlac"):
        decode_image(bytes(bad))
    # palette color type
    bad = bytearray(good)
    bad[8 + 8 + 9] = 3  # IHDR color type
    with pytest.raises(ValueError, match="color type"):
        decode_image(bytes(bad))
    # raster shorter than the header claims
    short = zlib.compress(b"\x00" * 5)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    trunc = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IDAT", short) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="raster shorter"):
        decode_image(trunc)


def test_synthetic_payload_formats_rotate():
    fmts = {synthetic_image_payload(i)[0] for i in range(10)}
    assert fmts == {"bmp24", "ppm", "bmp32", "png", "png32"}
    for i in range(10):
        fmt, payload = synthetic_image_payload(i)
        img = decode_image(payload)
        assert (img["width"], img["height"]) == (3 + i % 5, 2 + i % 4)
        # decoded pixels equal the closed-form pattern regardless of format
        w, h = img["width"], img["height"]
        assert img["pixels"] == bytes(
            (i * 7919 + j * 131) % 251 for j in range(w * h * 3)
        )


def test_no_notimplemented_left():
    """Round-2 verdict item: the codec stub is gone from the tree.

    What this guards against is STUB bodies (`raise NotImplementedError`
    as a function's whole implementation). Loud CAPABILITY guards on
    working implementations are the opposite of stubs and are allowed
    where their raising behavior is itself pinned by a test:

    - the vendored protobuf mini runtime's unsupported-wire-format
      guards (r4 advisory; pinned by test_protobuf_shim.py);
    - ``TableManager._require_parquet_backend`` (r8 advisory, medium:
      the z-order/skipping path must REFUSE non-parquet backends
      instead of pruning with dead delta files; pinned by
      test_zorder_skipping.py::test_cluster_by_rejects_non_parquet_backend).
    """
    import pathlib

    pkg = pathlib.Path(__file__).resolve().parents[1] / "lakehouse_v3_spark"
    allowed = {"tables.py"}  # _require_parquet_backend capability guard
    hits = [
        p
        for p in pkg.rglob("*.py")
        if "vendor" not in p.parts
        and p.name not in allowed
        and "NotImplementedError" in p.read_text(encoding="utf-8")
    ]
    assert hits == [], f"NotImplementedError still present in {hits}"
    # the allowance is exactly one guard method, not a creeping license
    import re

    tables_src = (pkg / "tables.py").read_text(encoding="utf-8")
    assert len(re.findall(r"raise NotImplementedError", tables_src)) == 1


def test_decoded_image_features_spark(spark):
    """mapInPandas decode path on a real session: features of the decoded
    pixels match an independent per-row recomputation in plain Python."""
    from lakehouse_v3_spark.operators.multimodal import decoded_image_features

    df = spark.range(12).withColumnRenamed("id", "doc_id")
    rows = {r.doc_id: r for r in decoded_image_features(df).collect()}
    assert len(rows) == 12
    for doc_id, r in rows.items():
        w, h = 3 + doc_id % 5, 2 + doc_id % 4
        px = [(doc_id * 7919 + j * 131) % 251 for j in range(w * h * 3)]
        assert (r.width, r.height, r.channels) == (w, h, 3)
        assert r.sum_r == sum(px[0::3])
        assert r.sum_b == sum(px[2::3])
        assert r.row0_sum == sum(px[: w * 3])

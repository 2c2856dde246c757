"""Multimodal columns: opaque binary payloads with typed metadata, and
Arrow-batched feature extraction via mapInPandas.

Design for image/audio/video at 100 TB:
  - payloads are ``binary`` columns (or object-store URIs for >~1 MB
    blobs) with a metadata struct (mime, n_bytes, checksum) alongside;
  - decode / resize / frame-sample run as mapInPandas over Arrow record
    batches — Python touches each batch once, partitioning and pushdown
    stay with Spark;
  - ``decode_image`` is a REAL pure-stdlib codec: uncompressed BMP
    24/32-bit, binary PPM/PGM, and non-interlaced 8-bit RGB/RGBA PNG
    (zlib inflate + all five scanline filters) — decoded-pixel features
    are oracle-checked end-to-end via multimodal_image_decode_features.
    JPEG and video still want PIL/ffmpeg on a full cluster image; they
    plug into the same mapInPandas plumbing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, payload_sha string, fake_width long, fake_height long"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model an opaque media payload: utf-8 bytes of the text column plus
    a typed metadata struct (stand-in for image/audio bytes)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("application/octet-stream").alias("mime"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("checksum"),
    )
    return df.withColumn("payload", payload).withColumn("media_meta", meta)


def decode_image(payload: bytes) -> dict:
    """Pure-stdlib image decode: uncompressed BMP (24/32-bit BI_RGB),
    binary PPM (P6) / PGM (P5), and non-interlaced 8-bit RGB/RGBA PNG
    (stdlib zlib inflate + full scanline-filter reconstruction). No
    PIL/ffmpeg needed. JPEG and video still want a codec library on a
    full cluster image, but the engine's decode path itself is REAL and
    oracle-checked (plans/multimodal_queries.py
    multimodal_image_decode_features).

    Returns ``{"width", "height", "channels", "pixels"}`` with pixels as
    top-down row-major bytes — RGB interleaved for color (channels=3),
    single byte per pixel for PGM (channels=1). BMP's bottom-up rows,
    BGR(A) channel order, and 4-byte row padding are all normalized.
    """
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] in (b"P6", b"P5"):
        return _decode_pnm(payload)
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    raise ValueError(
        f"unsupported image format (magic {payload[:2]!r}); supported: "
        "BMP (24/32-bit uncompressed), PPM (P6), PGM (P5), "
        "PNG (non-interlaced 8-bit RGB/RGBA)"
    )


def _decode_bmp(payload: bytes) -> dict:
    import struct

    if len(payload) < 54:
        raise ValueError("truncated BMP: missing header")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:
        raise ValueError(f"unsupported BMP DIB header size {dib_size} (< 40)")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression} (only BI_RGB)")
    if bpp not in (24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp} (only 24/32)")
    if width <= 0 or height == 0:
        raise ValueError(f"bad BMP dimensions {width}x{height}")
    bottom_up = height > 0
    height = abs(height)
    n_ch = bpp // 8
    stride = (width * n_ch + 3) & ~3  # rows pad to 4-byte boundaries
    if len(payload) < data_offset + stride * height:
        raise ValueError("truncated BMP: pixel array shorter than header claims")
    out = bytearray(width * height * 3)
    for row in range(height):
        src_row = (height - 1 - row) if bottom_up else row
        base = data_offset + src_row * stride
        o = row * width * 3
        for x in range(width):
            b = base + x * n_ch  # stored as BGR(A); alpha/X byte ignored
            out[o] = payload[b + 2]
            out[o + 1] = payload[b + 1]
            out[o + 2] = payload[b]
            o += 3
    return {"width": width, "height": height, "channels": 3, "pixels": bytes(out)}


def _decode_pnm(payload: bytes) -> dict:
    """Binary PPM (P6, RGB) / PGM (P5, gray): ASCII header of
    magic/width/height/maxval separated by whitespace and '#' comments,
    then one whitespace byte, then the raw sample array (already
    top-down RGB — no normalization needed)."""
    magic = payload[:2]
    pos = 2
    fields = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end-of-line
            while pos < len(payload) and payload[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PNM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # exactly one whitespace byte before the raster
    width, height, maxval = fields
    if width <= 0 or height <= 0:
        raise ValueError(f"bad PNM dimensions {width}x{height}")
    if not 0 < maxval < 256:
        raise ValueError(f"unsupported PNM maxval {maxval} (only 1-byte samples)")
    channels = 3 if magic == b"P6" else 1
    n = width * height * channels
    pixels = payload[pos : pos + n]
    if len(pixels) < n:
        raise ValueError("truncated PNM: raster shorter than header claims")
    return {"width": width, "height": height, "channels": channels, "pixels": pixels}


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (spec §9.4): pick the neighbour (left a,
    up b, up-left c) closest to a + b - c, ties left > up > up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png(payload: bytes) -> dict:
    """Non-interlaced 8-bit truecolor PNG: color type 2 (RGB) and 6
    (RGBA — alpha dropped, matching the BMP32 path). Real inflate via
    stdlib zlib; all five scanline filters (None/Sub/Up/Average/Paeth)
    reconstructed per spec §9. Palette, interlace, and sub-byte depths
    raise — they'd want a full imaging library."""
    import struct
    import zlib

    pos = 8
    width = height = color_type = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        ln, ctype = struct.unpack_from(">I4s", payload, pos)
        pos += 8
        data = payload[pos : pos + ln]
        if len(data) < ln:
            raise ValueError("truncated PNG: chunk shorter than its length field")
        pos += ln + 4  # + CRC (not verified: decode is feature-path, not fsck)
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported PNG bit depth {bit_depth} (only 8)")
            if color_type not in (2, 6):
                raise ValueError(
                    f"unsupported PNG color type {color_type} (only 2=RGB, 6=RGBA)"
                )
            if comp != 0 or filt != 0:
                raise ValueError("unsupported PNG compression/filter method")
            if interlace != 0:
                raise ValueError("unsupported PNG interlacing (only non-interlaced)")
            if width <= 0 or height <= 0:
                raise ValueError(f"bad PNG dimensions {width}x{height}")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("truncated PNG: missing IHDR")
    raw = zlib.decompress(bytes(idat))
    n_ch = 3 if color_type == 2 else 4
    stride = width * n_ch
    if len(raw) < (stride + 1) * height:
        raise ValueError("truncated PNG: raster shorter than header claims")
    out = bytearray(width * height * 3)
    prev = bytearray(stride)
    ptr = 0
    for row in range(height):
        ftype = raw[ptr]
        ptr += 1
        cur = bytearray(raw[ptr : ptr + stride])
        ptr += stride
        if ftype == 1:  # Sub
            for i in range(n_ch, stride):
                cur[i] = (cur[i] + cur[i - n_ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                cur[i] = (cur[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = cur[i - n_ch] if i >= n_ch else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = cur[i - n_ch] if i >= n_ch else 0
                upleft = prev[i - n_ch] if i >= n_ch else 0
                cur[i] = (cur[i] + _paeth(left, prev[i], upleft)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unsupported PNG filter type {ftype}")
        o = row * width * 3
        for x in range(width):
            b = x * n_ch
            out[o] = cur[b]
            out[o + 1] = cur[b + 1]
            out[o + 2] = cur[b + 2]
            o += 3
        prev = cur
    return {"width": width, "height": height, "channels": 3, "pixels": bytes(out)}


def encode_png(width: int, height: int, rgb: bytes, color_type: int = 2) -> bytes:
    """Encode top-down RGB bytes as a real non-interlaced 8-bit PNG
    (fixture-side counterpart of ``_decode_png``): proper chunk CRCs,
    zlib-compressed raster. The scanline filter type ROTATES row % 5 so
    every filter reconstruction path (None/Sub/Up/Average/Paeth) is
    exercised by any image ≥5 rows. color_type 6 adds an opaque alpha
    byte per pixel (dropped again on decode)."""
    import struct
    import zlib

    assert len(rgb) == width * height * 3
    assert color_type in (2, 6)
    n_ch = 3 if color_type == 2 else 4
    stride = width * n_ch
    prev = bytearray(stride)
    raster = bytearray()
    for row in range(height):
        cur = bytearray(stride)
        i = row * width * 3
        for x in range(width):
            o = x * n_ch
            cur[o : o + 3] = rgb[i : i + 3]
            if n_ch == 4:
                cur[o + 3] = 0xFF
            i += 3
        ftype = row % 5
        filt = bytearray(stride)
        for j in range(stride):
            left = cur[j - n_ch] if j >= n_ch else 0
            up = prev[j]
            upleft = prev[j - n_ch] if j >= n_ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) >> 1
            else:
                pred = _paeth(left, up, upleft)
            filt[j] = (cur[j] - pred) & 0xFF
        raster.append(ftype)
        raster += filt
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raster)))
        + chunk(b"IEND", b"")
    )


def encode_bmp(width: int, height: int, rgb: bytes, bpp: int = 24) -> bytes:
    """Encode top-down RGB bytes as a bottom-up uncompressed BMP (the
    fixture-side counterpart of ``_decode_bmp``; 24- or 32-bit)."""
    import struct

    assert len(rgb) == width * height * 3, "rgb must be width*height*3 bytes"
    assert bpp in (24, 32)
    n_ch = bpp // 8
    stride = (width * n_ch + 3) & ~3
    raster = bytearray(stride * height)
    for row in range(height):
        base = (height - 1 - row) * stride  # bottom-up storage
        i = row * width * 3
        for x in range(width):
            o = base + x * n_ch
            raster[o] = rgb[i + 2]  # B
            raster[o + 1] = rgb[i + 1]  # G
            raster[o + 2] = rgb[i]  # R
            if n_ch == 4:
                raster[o + 3] = 0
            i += 3
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(raster), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, width, height, 1, bpp, 0, len(raster), 2835, 2835, 0, 0)
    return header + bytes(raster)


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Encode top-down RGB bytes as binary PPM (P6, maxval 255)."""
    assert len(rgb) == width * height * 3
    return f"P6\n{width} {height}\n255\n".encode("ascii") + rgb


IMAGE_FEATURE_SCHEMA = (
    "doc_id long, fmt string, width int, height int, channels int, "
    "sum_r long, sum_g long, sum_b long, row0_sum long, resized_sum long"
)


def synthetic_image_payload(doc_id: int) -> tuple[str, bytes]:
    """Deterministic tiny test image for a doc id: dimensions and every
    pixel byte are closed-form integer functions of (doc_id, flat index),
    so an SQL oracle can recompute decoded-pixel features without running
    a decoder. Format rotates bmp24 → ppm → bmp32 → png → png32 so all
    five decode branches (incl. PNG RGB and RGBA) are exercised."""
    w = 3 + doc_id % 5
    h = 2 + doc_id % 4
    rgb = bytes((doc_id * 7919 + i * 131) % 251 for i in range(w * h * 3))
    fmt = ("bmp24", "ppm", "bmp32", "png", "png32")[doc_id % 5]
    if fmt == "bmp24":
        return fmt, encode_bmp(w, h, rgb, bpp=24)
    if fmt == "bmp32":
        return fmt, encode_bmp(w, h, rgb, bpp=32)
    if fmt == "png":
        return fmt, encode_png(w, h, rgb, color_type=2)
    if fmt == "png32":
        return fmt, encode_png(w, h, rgb, color_type=6)
    return fmt, encode_ppm(w, h, rgb)


def decoded_image_features(
    df: DataFrame, id_col: str = "doc_id", resize_factor: int = 2
) -> DataFrame:
    """REAL image decode via mapInPandas: per record, build the synthetic
    payload, run ``decode_image`` (pure-stdlib BMP/PPM codec — no stub),
    and emit integer features of the DECODED pixels: per-channel sums,
    first-logical-row sum (catches bottom-up/padding mistakes — BMP
    stores the top row LAST), and a nearest-neighbour ``resize_factor``
    downscale sum (the resize path on decoded pixels). All integers, so
    the oracle recomputes them exactly from the closed-form pixel
    function."""
    f = resize_factor

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in (
                "doc_id", "fmt", "width", "height", "channels",
                "sum_r", "sum_g", "sum_b", "row0_sum", "resized_sum",
            )}
            for doc_id in pdf[id_col]:
                fmt, payload = synthetic_image_payload(int(doc_id))
                img = decode_image(payload)
                w, h, px = img["width"], img["height"], img["pixels"]
                rw, rh = (w + f - 1) // f, (h + f - 1) // f
                resized = sum(
                    px[(y * f * w + x * f) * 3 + c]
                    for y in range(rh)
                    for x in range(rw)
                    for c in range(3)
                )
                rows["doc_id"].append(int(doc_id))
                rows["fmt"].append(fmt)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(img["channels"])
                rows["sum_r"].append(sum(px[0::3]))
                rows["sum_g"].append(sum(px[1::3]))
                rows["sum_b"].append(sum(px[2::3]))
                rows["row0_sum"].append(sum(px[: w * 3]))
                rows["resized_sum"].append(resized)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "fmt": pd.Series(rows["fmt"], dtype="object"),
                    "width": pd.Series(rows["width"], dtype="int32"),
                    "height": pd.Series(rows["height"], dtype="int32"),
                    "channels": pd.Series(rows["channels"], dtype="int32"),
                    "sum_r": pd.Series(rows["sum_r"], dtype="int64"),
                    "sum_g": pd.Series(rows["sum_g"], dtype="int64"),
                    "sum_b": pd.Series(rows["sum_b"], dtype="int64"),
                    "row0_sum": pd.Series(rows["row0_sum"], dtype="int64"),
                    "resized_sum": pd.Series(rows["resized_sum"], dtype="int64"),
                }
            )

    return df.select(id_col).mapInPandas(batches, schema=IMAGE_FEATURE_SCHEMA)


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over Arrow batches: deterministic
    metadata features (byte count, sha prefix, fake decoded dimensions
    derived from the payload hash). Swap the inner function for a real
    decoder without touching the Spark plumbing."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            shas = payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest())
            n_bytes = payloads.map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": n_bytes,
                    "payload_sha": shas,
                    # deterministic stand-ins for decoded dimensions
                    "fake_width": (n_bytes % 64 + 16).astype("int64"),
                    "fake_height": shas.map(lambda s: int(s[:4], 16) % 64 + 16).astype("int64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(batches, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_sha string"


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
    stride: int = 64,
    frame_len: int = 32,
    max_frames: int = 4,
) -> DataFrame:
    """Frame sampling as mapInPandas: each input row fans out to
    1..max_frames rows, one per sampled frame (a fixed-stride slice of
    the content hashed as the frame's fingerprint). This is the VIDEO
    batch shape — one Arrow batch in, a multi-row batch out per record —
    with the codec stubbed (decode_image) and the slicing deterministic
    so the oracle can recompute it. On a real cluster the inner loop
    becomes ffmpeg frame extraction; the Spark plumbing is unchanged."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, shas = [], [], []
            for doc_id, content in zip(pdf[id_col], pdf[content_col]):
                s = content or ""
                n_frames = min(max_frames, max(1, len(s) // stride))
                for i in range(n_frames):
                    frame = s[i * stride : i * stride + frame_len]
                    ids.append(doc_id)
                    idxs.append(i)
                    shas.append(hashlib.sha256(frame.encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_sha": pd.Series(shas, dtype="object"),
                }
            )

    return df.select(id_col, content_col).mapInPandas(batches, schema=FRAME_SCHEMA)


AUDIO_SCHEMA = "doc_id long, frame_idx int, n_samples int, energy long, peak_code int"


def audio_frame_features(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
    frame_len: int = 64,
    max_frames: int = 4,
) -> DataFrame:
    """Audio feature-extraction batch shape: treat the content as a 1-D
    sample stream (code points stand in for PCM samples — a real cluster
    wires soundfile/ffmpeg decode into the same loop, see decode_image),
    window it into fixed-length frames, and emit per-frame energy
    (sum of squared samples) and peak. Integer features only, so the
    oracle recomputes them exactly with no float-order hazards.
    mapInPandas: one Arrow batch in, 1..max_frames rows per record out."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, ns, energies, peaks = [], [], [], [], []
            for doc_id, content in zip(pdf[id_col], pdf[content_col]):
                s = content or ""
                n_frames = min(max_frames, max(1, len(s) // frame_len))
                for i in range(n_frames):
                    codes = [ord(c) for c in s[i * frame_len : (i + 1) * frame_len]]
                    ids.append(doc_id)
                    idxs.append(i)
                    ns.append(len(codes))
                    energies.append(sum(c * c for c in codes))
                    peaks.append(max(codes) if codes else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "energy": pd.Series(energies, dtype="int64"),
                    "peak_code": pd.Series(peaks, dtype="int32"),
                }
            )

    return df.select(id_col, content_col).mapInPandas(batches, schema=AUDIO_SCHEMA)


RESIZE_SCHEMA = "doc_id long, orig_len long, resized_len long, resized_sha string"


def resize_media(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
    factor: int = 4,
) -> DataFrame:
    """Resize/downsample batch shape: keep every ``factor``-th sample of
    the content (the 1-D stand-in for image downscaling — a real cluster
    wires PIL/ffmpeg into the same loop, see decode_image) and
    fingerprint the result. mapInPandas: one Arrow batch in, one row per
    record out, deterministic so the oracle can recompute it."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, olens, rlens, shas = [], [], [], []
            for doc_id, content in zip(pdf[id_col], pdf[content_col]):
                s = content or ""
                r = s[::factor]
                ids.append(doc_id)
                olens.append(len(s))
                rlens.append(len(r))
                shas.append(hashlib.sha256(r.encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "orig_len": pd.Series(olens, dtype="int64"),
                    "resized_len": pd.Series(rlens, dtype="int64"),
                    "resized_sha": pd.Series(shas, dtype="object"),
                }
            )

    return df.select(id_col, content_col).mapInPandas(batches, schema=RESIZE_SCHEMA)

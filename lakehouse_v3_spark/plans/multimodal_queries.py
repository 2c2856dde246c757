"""Multimodal plumbing query: binary payload + metadata struct +
mapInPandas feature extraction, oracle-checked end-to-end (the features
are deterministic functions of the bytes, so DuckDB can recompute them
without running Python)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io_utils import load
from ..operators.multimodal import (
    attach_binary_payload,
    audio_frame_features,
    decoded_image_features,
    extract_features,
    resize_media,
    sample_frames,
)
from . import register

_FEATURES_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT)         AS n_bytes,
       sha256(text)                                       AS payload_sha,
       CAST(octet_length(encode(text)) % 64 + 16 AS BIGINT) AS fake_width,
       CAST(('0x' || substr(sha256(text), 1, 4))::BIGINT % 64 + 16 AS BIGINT)
                                                          AS fake_height
FROM documents
"""


@register("multimodal_binary_features", oracle=_FEATURES_ORACLE)
def multimodal_binary_features(spark, sf_dir):
    """Binary-column pipeline: encode payload (stand-in for image bytes)
    + metadata struct → mapInPandas Arrow-batch feature extraction
    (operators/multimodal.py). The oracle recomputes every feature from
    the bytes, so the whole Python batch path is value-checked. (The
    real pixel-decode path is multimodal_image_decode_features.)"""
    d = load(spark, sf_dir, "documents")
    with_payload = attach_binary_payload(d, text_col="text")
    return extract_features(with_payload, id_col="doc_id")


_FRAME_ORACLE = """
WITH base AS (
  SELECT doc_id, text,
         least(4, greatest(1, length(text) // 64)) AS n_frames
  FROM documents
)
SELECT doc_id,
       CAST(i AS INT) AS frame_idx,
       sha256(substring(text, CAST(i * 64 + 1 AS INT), 32)) AS frame_sha
FROM base, UNNEST(range(0, n_frames)) AS u(i)
"""


@register("multimodal_frame_sample", oracle=_FRAME_ORACLE)
def multimodal_frame_sample(spark, sf_dir):
    """Frame-sampling batch shape (video path): mapInPandas fans each
    record out to one row per sampled frame — fixed-stride slices
    fingerprinted by sha256 (operators/multimodal.py sample_frames; a
    video decoder like ffmpeg plugs into the same loop on a full
    cluster image). The oracle recomputes every
    frame fingerprint, so the multi-row-per-record Arrow plumbing is
    value-checked end-to-end."""
    d = load(spark, sf_dir, "documents")
    return sample_frames(d, id_col="doc_id", content_col="text")


_AUDIO_ORACLE = """
WITH base AS (
  SELECT doc_id, text,
         least(4, greatest(1, length(text) // 64)) AS n_frames
  FROM documents
),
frames AS (
  SELECT doc_id, CAST(i AS INT) AS frame_idx,
         substring(text, CAST(i * 64 + 1 AS INT), 64) AS frame
  FROM base, UNNEST(range(0, n_frames)) AS u(i)
)
SELECT doc_id, frame_idx,
       CAST(length(frame) AS INT) AS n_samples,
       CAST(COALESCE(list_sum(list_transform(range(1, length(frame) + 1),
              i -> unicode(substring(frame, CAST(i AS INT), 1))
                   * unicode(substring(frame, CAST(i AS INT), 1)))), 0) AS BIGINT)
           AS energy,
       CAST(COALESCE(list_max(list_transform(range(1, length(frame) + 1),
              i -> unicode(substring(frame, CAST(i AS INT), 1)))), 0) AS INT)
           AS peak_code
FROM frames
"""


@register("multimodal_audio_frames", oracle=_AUDIO_ORACLE)
def multimodal_audio_frames(spark, sf_dir):
    """Audio path (operators/multimodal.py audio_frame_features):
    window the sample stream into fixed-length frames and extract
    per-frame energy + peak via mapInPandas — the same batch shape a
    real PCM decode (soundfile/ffmpeg on a full cluster image) would feed.
    Integer-only features, so the oracle recomputes them exactly."""
    d = load(spark, sf_dir, "documents")
    return audio_frame_features(d, id_col="doc_id", content_col="text")


_RESIZE_ORACLE = """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS orig_len,
       CAST(length(array_to_string(list_transform(
              range(1, (length(text) + 3) // 4 + 1),
              i -> substring(text, CAST((i - 1) * 4 + 1 AS INT), 1)), '')) AS BIGINT)
           AS resized_len,
       sha256(array_to_string(list_transform(
              range(1, (length(text) + 3) // 4 + 1),
              i -> substring(text, CAST((i - 1) * 4 + 1 AS INT), 1)), ''))
           AS resized_sha
FROM documents
"""


_DECODE_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         3 + doc_id % 5 AS w,
         2 + doc_id % 4 AS h,
         (3 + doc_id % 5 + 1) // 2 AS rw,
         (2 + doc_id % 4 + 1) // 2 AS rh
  FROM documents
)
SELECT doc_id,
       CASE doc_id % 5 WHEN 0 THEN 'bmp24' WHEN 1 THEN 'ppm' WHEN 2 THEN 'bmp32'
                       WHEN 3 THEN 'png' ELSE 'png32' END
           AS fmt,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(3 AS INT) AS channels,
       CAST(list_sum(list_transform(range(0, w * h * 3, 3),
              i -> (doc_id * 7919 + i * 131) % 251)) AS BIGINT) AS sum_r,
       CAST(list_sum(list_transform(range(1, w * h * 3, 3),
              i -> (doc_id * 7919 + i * 131) % 251)) AS BIGINT) AS sum_g,
       CAST(list_sum(list_transform(range(2, w * h * 3, 3),
              i -> (doc_id * 7919 + i * 131) % 251)) AS BIGINT) AS sum_b,
       CAST(list_sum(list_transform(range(0, w * 3),
              i -> (doc_id * 7919 + i * 131) % 251)) AS BIGINT) AS row0_sum,
       CAST(list_sum(list_transform(range(0, rw * rh * 3),
              j -> (doc_id * 7919
                    + ((((j // 3) // rw) * 2 * w + ((j // 3) % rw) * 2) * 3
                       + j % 3) * 131) % 251)) AS BIGINT) AS resized_sum
FROM dims
"""


@register("multimodal_image_decode_features", oracle=_DECODE_ORACLE)
def multimodal_image_decode_features(spark, sf_dir):
    """REAL codec path (no stub): per document, a deterministic tiny
    image is encoded as BMP-24/PPM-P6/BMP-32/PNG-RGB/PNG-RGBA (rotating
    by doc_id) and decoded back by the pure-stdlib codec
    (operators/multimodal.py decode_image — BMP bottom-up rows, BGR
    order, 4-byte padding, PNM header parsing, PNG zlib inflate +
    Sub/Up/Average/Paeth filter reconstruction + alpha drop all
    normalized), then integer pixel features are extracted from the
    DECODED bytes. The oracle recomputes every
    feature from the closed-form pixel function, so a decoder that
    mis-handles row order, padding, or channel order hash-mismatches
    (row0_sum pins the spatial layout; sum_r/sum_b pin BGR→RGB)."""
    d = load(spark, sf_dir, "documents")
    return decoded_image_features(d, id_col="doc_id", resize_factor=2)


@register("multimodal_resize_downsample", oracle=_RESIZE_ORACLE)
def multimodal_resize_downsample(spark, sf_dir):
    """Resize/downsample path (operators/multimodal.py resize_media):
    every-4th-sample decimation with a fingerprint of the result — the
    1-D stand-in for image resizing (decoded-pixel resize is covered by
    multimodal_image_decode_features), Arrow plumbing oracle-checked."""
    d = load(spark, sf_dir, "documents")
    return resize_media(d, id_col="doc_id", content_col="text", factor=4)

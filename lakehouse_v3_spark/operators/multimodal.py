"""Multimodal columns: opaque binary payloads with typed metadata, and
Arrow-batched feature extraction via mapInPandas.

Design for image/audio/video at 100 TB:
  - payloads are ``binary`` columns (or object-store URIs for >~1 MB
    blobs) with a metadata struct (mime, n_bytes, checksum) alongside;
  - decode / resize / frame-sample run as mapInPandas over Arrow record
    batches — Python touches each batch once, partitioning and pushdown
    stay with Spark;
  - the actual codec step needs PIL/ffmpeg (not in this container), so
    ``decode_image`` is a clearly-marked stub behind an import-try; the
    Spark-side plumbing (schema, batch iteration, deterministic feature
    columns) is real and oracle-checked via multimodal_binary_features.
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


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """STUB: real decode needs an image codec library not present in this
    container. The mapInPandas plumbing around it is real."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires PIL/pillow (not installed in this harness)"
        ) from exc
    raise NotImplementedError("wire PIL decode here on a full cluster image")


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

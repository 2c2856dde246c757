"""Multimodal plumbing query: binary payload + metadata struct +
mapInPandas feature extraction, oracle-checked end-to-end (the features
are deterministic functions of the bytes, so DuckDB can recompute them
without running Python)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io_utils import load
from ..operators.multimodal import attach_binary_payload, extract_features
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
    the bytes, so the whole Python batch path is value-checked. The real
    codec step is stubbed (no image libs in this container) behind
    decode_image's NotImplementedError."""
    d = load(spark, sf_dir, "documents")
    with_payload = attach_binary_payload(d, text_col="text")
    return extract_features(with_payload, id_col="doc_id")

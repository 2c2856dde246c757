"""Line-level dedup + mapInArrow surface.

Line-level (sentence/paragraph) dedup is the CCNet/RefinedWeb curation
step this catalog didn't yet cover: doc-level dedup (exact/MinHash/
SimHash) removes whole documents, within-doc repetition scores one
document's self-similarity — line-level dedup finds boilerplate
sentences REPEATED ACROSS documents (headers, cookie banners,
navigation) and scores each document by how much of it is corpus-wide
boilerplate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io_utils import load
from . import register

# split on '.', trim spaces, drop empties — identical on both engines
_LINES_SQL = "list_filter(list_transform(string_split(text, '.'), s -> trim(s, ' ')), s -> s <> '')"

_LINE_DEDUP_ORACLE = f"""
WITH lines AS (
  SELECT doc_id, unnest({_LINES_SQL}) AS line
  FROM documents
),
freq AS (
  SELECT line, COUNT(DISTINCT doc_id) AS n_docs
  FROM lines GROUP BY line
)
SELECT l.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       ROUND(SUM(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS boiler_frac
FROM lines l JOIN freq f ON l.line = f.line
GROUP BY l.doc_id
"""


@register("dedup_line_level", oracle=_LINE_DEDUP_ORACLE)
def dedup_line_level(spark, sf_dir):
    """Cross-document line-level dedup scoring: explode documents into
    trimmed sentences, count distinct documents per sentence, and score
    each document by its fraction of corpus-boilerplate lines (lines
    appearing in >1 document). Scale shape: the line table shuffles
    once on the line hash for the distinct-doc count — at 100 TB the
    shuffle key would be xxhash64(line) (32 bytes/line) and frequent
    lines are exactly the skewed keys AQE splits; the re-join back to
    documents is a second hash join on the same key. The removal
    variant (keep first occurrence) filters f.n_docs > 1 instead of
    counting it."""
    d = load(spark, sf_dir, "documents")
    lines = d.select(
        "doc_id",
        F.explode(
            F.filter(
                F.transform(F.split("text", "\\."), lambda s: F.trim(s)),
                lambda s: s != "",
            )
        ).alias("line"),
    )
    freq = lines.groupBy("line").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    scored = lines.join(freq, "line")
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).cast("long").alias("n_boiler"),
        F.round(
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("boiler_frac"),
    )


_ARROW_ORACLE = """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_arrow,
       CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_nonspace
FROM documents
WHERE doc_id % 7 = 0
"""


@register("arrow_batch_charstats", oracle=_ARROW_ORACLE)
def arrow_batch_charstats(spark, sf_dir):
    """mapInArrow surface: per-batch computation directly on pyarrow
    RecordBatches — zero pandas materialization, the lowest-overhead
    Python escape hatch (vs mapInPandas, which converts each batch to a
    DataFrame). Uses pyarrow.compute kernels (C++, vectorized) for the
    string stats; the Spark-side contract (schema, batch iteration,
    column pruning before the Python boundary) is identical to the
    mapInPandas multimodal paths."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def batch_stats(batches):
        for batch in batches:
            text = batch.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(
                        pc.utf8_length(pc.replace_substring(text, " ", "")),
                        pa.int64(),
                    ),
                ],
                names=["doc_id", "n_chars_arrow", "n_nonspace"],
            )

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    return d.select("doc_id", "text").mapInArrow(
        batch_stats, "doc_id long, n_chars_arrow long, n_nonspace long"
    )

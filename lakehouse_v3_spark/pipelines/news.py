"""News-domain pipeline: article JSON → normalized silver with stable
ids → sentiment gold.

Reference semantics (finance_bronze2_to_silver.py, news_article_sentiment.py):
  - nested source.name access, \\r\\n stripped from text fields (:67-80);
  - article_id = sha2(lower(url), 256) (:90);
  - TWO-STAGE dedup: latest-per-url by (published_at DESC NULLS LAST,
    bronze ts DESC) THEN dropDuplicates(article_id) (:92-94, SURVEY §7.4);
  - id-preserving upsert: existing article_ids keep their cd_silver_id,
    new ones continue after MAX (:152-192);
  - sentiment gold: lexicon score with strict ±0.1 labels
    (news_article_sentiment.py:134-139).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import sentiment_label, sentiment_score_udf
from ..ids import max_id_seed, with_dense_id


def normalize(bronze: DataFrame) -> DataFrame:
    """Flatten source struct, strip CR/LF noise, type timestamps, derive
    the sha2 article id."""
    df = bronze.select(
        F.col("source.name").alias("source_name"),
        *[c for c in bronze.columns if c != "source"],
    )
    for c in ("title", "description", "content"):
        if c in df.columns:
            df = df.withColumn(c, F.regexp_replace(F.col(c), "[\\r\\n]+", " "))
    df = df.withColumn("published_at", F.to_timestamp("publishedAt")).drop("publishedAt")
    if "urlToImage" in df.columns:
        df = df.withColumnRenamed("urlToImage", "url_to_image")
    return df.withColumn("article_id", F.sha2(F.lower(F.col("url")), 256))


def two_stage_dedup(df: DataFrame, bronze_ts: str = "dt_record_to_bronze2") -> DataFrame:
    """Stage 1: latest row per url (published_at DESC NULLS LAST, bronze
    ts DESC). Stage 2: dropDuplicates(article_id) — urls differing only
    by case collapse to one article."""
    w = Window.partitionBy("url").orderBy(
        F.col("published_at").desc_nulls_last(), F.col(bronze_ts).desc()
    )
    latest = df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    return latest.dropDuplicates(["article_id"])


def upsert_with_stable_ids(
    existing_silver: DataFrame | None, incoming: DataFrame
) -> DataFrame:
    """J3: incoming ⟕ existing(article_id, cd_silver_id); matched rows
    reuse their id, new rows get dense ids after MAX(existing)."""
    if existing_silver is None:
        out = with_dense_id(incoming, ["article_id"], id_col="cd_silver_id")
        replaced = None
    else:
        id_map = existing_silver.select("article_id", F.col("cd_silver_id").alias("_old_id"))
        joined = incoming.join(id_map, on="article_id", how="left")
        known = joined.filter(F.col("_old_id").isNotNull()).withColumn(
            "cd_silver_id", F.col("_old_id")
        ).drop("_old_id")
        seed = max_id_seed(existing_silver, "cd_silver_id")
        new = with_dense_id(
            joined.filter(F.col("_old_id").isNull()).drop("_old_id"),
            ["article_id"],
            id_col="cd_silver_id",
            offset=seed,
        )
        out = known.unionByName(new)
        replaced = existing_silver.join(incoming.select("article_id"), on="article_id", how="left_anti")
    if replaced is not None:
        out = replaced.unionByName(out, allowMissingColumns=True)
    return out


def sentiment_gold(silver_df: DataFrame, text_col: str = "content") -> DataFrame:
    """Per-article sentiment score + label (F1 pandas_udf), the terminal
    gold table of the news domain."""
    scored = silver_df.withColumn(
        "sentiment_score", sentiment_score_udf(F.col(text_col))
    ).withColumn("sentiment_label", sentiment_label(F.col("sentiment_score")))
    return scored.select(
        "cd_silver_id", "article_id", "symbol", "sentiment_score", "sentiment_label"
    )

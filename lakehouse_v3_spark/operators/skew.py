"""Skew mitigation: key salting for hot-key aggregations and joins.

AQE's skew-join handling (enabled in session.py) covers sort-merge
joins at runtime; explicit salting remains the tool for (a) hot-key
groupBy aggregations, which AQE does not split, and (b) deterministic
plans on engines/configs without AQE.

Pattern: scatter the hot key across ``n_salts`` sub-keys, aggregate
partially per (key, salt), then aggregate the partials — two small
shuffles instead of one shuffle with a straggler partition. For joins:
salt the skewed fact side and explode the dimension side n_salts ways.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt derived from a stable hash of the whole row's
    partition id + a cheap per-row counter is NOT reproducible; use a
    hash of existing columns when determinism matters. Here: uniform
    salt from monotonically_increasing_id (adequate for scatter)."""
    return df.withColumn(salt_col, (F.monotonically_increasing_id() % n_salts).cast("int"))


def salted_sum_by_key(
    df: DataFrame, key: str, value, n_salts: int = 16
) -> DataFrame:
    """Two-phase aggregation for skewed keys:
    groupBy(key, salt) partial → groupBy(key) final. The partial sum is
    decimal-accumulated so the two-phase result is bit-equal to a
    single-phase sum."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(key, "_salt").agg(
        F.sum(value.cast("decimal(30,6)")).alias("_psum"),
        F.count(F.lit(1)).alias("_pcnt"),
    )
    return partial.groupBy(key).agg(
        F.sum("_psum").cast("double").alias("total"),
        F.sum("_pcnt").cast("long").alias("n_rows"),
    )


def salted_join_hot_keys(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skewed equi-join: salt the (large, skewed) fact side; replicate
    the dimension side n_salts ways so every (key, salt) bucket finds
    its match. Dimension grows ×n_salts — keep it the small side."""
    salted_fact = with_salt(fact, n_salts)
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    replicated_dim = dim.select("*", salts)
    return salted_fact.join(replicated_dim, on=[key, "_salt"]).drop("_salt")

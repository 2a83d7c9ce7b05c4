"""Skew handling: salted repartition + two-phase aggregation.

North-rule requirement: "conversation-level skew (mega-threads) is
handled with salted repartitioning and AQE skew-join hints". AQE
(enabled in session.py: ``spark.sql.adaptive.skewJoin.enabled``) splits
skewed *join* partitions at runtime; this module covers the cases AQE
does not: skewed **aggregations** and explicit pre-partitioning.

Two-phase (salted) aggregation: a mega-conversation whose turns all hash
to one reducer is first aggregated on (key, salt) — spreading the hot
key over ``n_salts`` reducers with map-side partial aggregation — then
re-aggregated on the key alone. The second shuffle moves one row per
(key, salt), so the hot key costs n_salts rows instead of its full
cardinality.

The reference has no skew story at all — whole datasets are processed
single-threaded with a 1-hour timeout as the only defense (Boss.java:21).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_repartition(df: DataFrame, key: str, n_salts: int = 16, partitions: int | None = None) -> DataFrame:
    """Repartition on (key, random-ish salt) so a hot key spreads.

    The salt hashes ``monotonically_increasing_id`` — no RNG state, but
    the assignment DOES depend on the physical partition layout; only
    aggregate results (which are salt-invariant) are reproducible, which
    is all salting requires.
    """
    salted = df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    n = partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return salted.repartition(int(n), F.col(key), F.col(SALT_COL)).drop(SALT_COL)


def salted_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """count per key via two-phase salted aggregation → (key, n)."""
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    partial = (
        df.withColumn(SALT_COL, salt)
        .groupBy(key, SALT_COL)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return partial.groupBy(key).agg(F.sum("__n").cast("long").alias("n"))


def salted_agg(
    df: DataFrame,
    key: str,
    partial_aggs: list[Column],
    final_aggs: Callable[[], list[Column]],
    n_salts: int = 16,
) -> DataFrame:
    """General two-phase aggregation.

    ``partial_aggs`` run on (key, salt); ``final_aggs()`` build the
    re-aggregation over the partial columns. Caller aliases partial
    columns and references them in the final stage.
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    partial = df.withColumn(SALT_COL, salt).groupBy(key, SALT_COL).agg(*partial_aggs)
    return partial.groupBy(key).agg(*final_aggs())

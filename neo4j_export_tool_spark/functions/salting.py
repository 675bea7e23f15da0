"""Skew mitigation: explicit key salting for head-entity hot spots.

AQE's skew-join splitting handles storage-partition skew at runtime, but a
gazetteer-head aggregation key ("USA"-class entities appearing in a large
fraction of documents) concentrates one reducer regardless — the classic
two-phase salted aggregate fixes it:

  phase 1: groupBy(key, salt = hash(row) % S)  → partial aggregates
  phase 2: groupBy(key)                        → merge partials

Costs one extra narrow shuffle of S×|keys| rows; wins when a single key
holds >~1/shuffle-partitions of the data.  (SURVEY.md §4.2 item 4.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_buckets: int, salt_col: str = "_salt") -> DataFrame:
    """Add a uniform salt column derived from the full row (monotonic id is
    partition-local and free; no shuffle)."""
    return df.withColumn(
        salt_col, (F.monotonically_increasing_id() % salt_buckets).cast("int")
    )


def salted_count(
    df: DataFrame, keys: list[str], salt_buckets: int = 16
) -> DataFrame:
    """Two-phase skew-proof count per key group: returns keys + ``n``."""
    salted = with_salt(df, salt_buckets)
    partial = salted.groupBy(*keys, "_salt").agg(F.count(F.lit(1)).alias("_n"))
    return partial.groupBy(*keys).agg(F.sum("_n").alias("n"))


def salted_sum(
    df: DataFrame, keys: list[str], value: Column, salt_buckets: int = 16
) -> DataFrame:
    """Two-phase skew-proof sum per key group: returns keys + ``total``."""
    salted = with_salt(df.withColumn("_v", value), salt_buckets)
    partial = salted.groupBy(*keys, "_salt").agg(F.sum("_v").alias("_s"))
    return partial.groupBy(*keys).agg(F.sum("_s").alias("total"))


def salted_count_sum(
    df: DataFrame, keys: list[str], value: Column, salt_buckets: int = 16
) -> DataFrame:
    """Two-phase skew-proof count AND sum per key group in ONE pass:
    returns keys + ``n`` + ``total``.  Single groupBy chain — no key join,
    so NULL group keys survive exactly as a plain GROUP BY keeps them."""
    salted = with_salt(df.withColumn("_v", value), salt_buckets)
    partial = salted.groupBy(*keys, "_salt").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_v").alias("_s")
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").alias("n"), F.sum("_s").alias("total")
    )

"""Scan-parallelism helper: conditional repartition after an under-split read.

The driver's test tables are single-row-group parquet files, so a scan
yields ONE input partition no matter the core count — every per-row-heavy
operator (shingling, fingerprinting, Arrow decode kernels) then runs on one
core of N.  This is the guide's "input skew" case (spark_optimization_guide
§2.5: one huge unsplittable input → repartition immediately after the read).

``fan_out`` is scale-adaptive by construction: it compares the input's
partition count to the session parallelism and is a NO-OP when the input is
already split at least half as wide as the core count — at 100 TB a parquet
scan arrives with thousands of splits and no repartition (or shuffle) is
added.  Only narrow inputs pay one small exchange of the raw rows, which is
then amortized by running the heavy per-row compute on every core.

Determinism: with ``key`` given, the exchange is a plain hash partitioning
on that column (retry-safe, no sort); without it, round-robin repartition
relies on Spark's sort-before-repartition (on by default) for retry
determinism.  Every operator in this package is partitioning-independent by
contract (integer/hash-exact folds), so results are unchanged either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fan_out(df: DataFrame, key: str | None = None) -> DataFrame:
    """Repartition ``df`` to the session parallelism iff it is under-split.

    ``key``: optional column to hash-partition on (skips the round-robin
    pre-sort); pick a high-cardinality column (a row id).
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:
        return df  # unplannable here (e.g. streaming) — leave untouched
    if 2 * n >= target:
        return df
    if key is not None and key in df.columns:
        return df.repartition(target, F.col(key))
    return df.repartition(target)

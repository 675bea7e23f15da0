"""Scalar quantization of embedding vectors (the IVF-PQ memory lever).

At 10^12 documents the float32 embedding column dominates storage and
ANN working-set size; int8-style scalar quantization cuts both by 4–8×
and is the standard first rung of the product-quantization ladder.  The
codes here use a FIXED global scale (``levels`` per unit), so:

- encoding is a pure column expression (floor + clamp — JVM codegen,
  linear, shuffle-free);
- the math is integer-exact across engines (IEEE double product, FLOOR,
  integral cast), so the driver oracle recomputes codes bit-for-bit;
- distances on codes are monotone approximations of the true distances,
  and a caller re-ranks survivors with the exact float vectors (the same
  candidates-then-verify shape the LSH/GEMM dedup paths use).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from neo4j_export_tool_spark.functions.similarity import as_double_array


def quantize_code(x: Column, levels: int = 64) -> Column:
    """floor(x·levels) clamped to [-levels, levels-1] — int8-ranged for
    levels ≤ 128.  FLOOR (not cast) so Spark and SQL engines agree on
    negatives; the clamp bounds make the cast value-preserving."""
    return F.greatest(
        F.least(F.floor(x * levels), F.lit(levels - 1)),
        F.lit(-levels),
    ).cast("int")


def scalar_quantize(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    levels: int = 64,
) -> DataFrame:
    """(id, pos, code): one row per vector component — the exploded form
    keeps every code scalar-typed (hash-comparable) and partitions evenly
    at any scale; storage engines fold it back to packed arrays."""
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(as_double_array(F.col(vec_col))).alias("pos", "x"),
    ).select("vec_id", "pos", quantize_code(F.col("x"), levels).alias("code"))

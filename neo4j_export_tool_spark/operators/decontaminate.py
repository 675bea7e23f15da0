"""Benchmark decontamination: flag training docs that overlap an eval set.

Standard training-corpus hygiene (beyond the reference's operator set):
documents sharing word n-gram shingles with a held-out benchmark must be
dropped or down-weighted before training, or the benchmark is contaminated.

Spark shape: both sides explode to DISTINCT n-gram shingles, the overlap is
a plain equi-join on the shingle string, and hits aggregate per document.
No broadcast hint — eval sets are usually tiny (AQE broadcasts them at
runtime), but a pathological eval side degrades to a sort-merge join
instead of an executor OOM.  Everything is JVM-side; at 100 TB the posting
explode is linear and the join key (shingle) is the same distribution the
Jaccard dedup join already handles (stop-shingle pruning applies upstream
if the corpus has hot boilerplate shingles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neo4j_export_tool_spark.functions.similarity import (
    tokens_col,
    word_shingles_col,
)


def _distinct_shingles(
    df: DataFrame, text_col: str, shingle_n: int, *extra_cols: str
) -> DataFrame:
    return df.select(
        *extra_cols,
        F.explode(
            word_shingles_col(tokens_col(F.col(text_col)), shingle_n)
        ).alias("shingle"),
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
) -> DataFrame:
    """(doc_id, n_eval_shingles): per training doc, how many of its DISTINCT
    word ``shingle_n``-grams appear anywhere in the eval set.  Only
    contaminated docs (count > 0) are returned — the caller anti-joins them
    away or thresholds on the count."""
    eval_shingles = _distinct_shingles(eval_docs, text_col, shingle_n).distinct()
    doc_shingles = _distinct_shingles(docs, text_col, shingle_n, id_col)
    return (
        doc_shingles.join(eval_shingles, "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_eval_shingles"))
    )

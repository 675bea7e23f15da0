"""Deterministic mixture sampling for training-corpus construction.

A training run mixes sources at chosen rates ("30% web, 80% wiki, …").
Doing that with ``rand()`` makes runs irreproducible and resumes
inconsistent; the standard fix is HASH sampling — keep a row iff a
deterministic hash of its id falls under the group's rate.  Properties a
100 TB pipeline needs, all free here:

- reproducible across runs, engines, partitionings (pure column exprs);
- consistent under resume/backfill (a row's fate never changes);
- nested rates compose (rate 30 ⊂ rate 60 for the same salt), so scaling
  a mixture up keeps every previously selected row — no churn.

The bucket is the 60-bit md5 prefix recipe that is bit-portable between
Spark (``conv(substring(md5, 1, 15), 16, 10)``) and DuckDB
(``('0x' || substr(md5, 1, 15))::BIGINT``), so oracles run it verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from neo4j_export_tool_spark.functions.similarity import shingle_hash_col


def portable_bucket(col: Column, n_buckets: int = 100, salt: str = "mix") -> Column:
    """Deterministic engine-portable bucket in [0, n_buckets) — the same
    60-bit md5-prefix hash the shingle joins use (`shingle_hash_col`)."""
    key = F.concat(F.lit(salt + ":"), col.cast("string"))
    return shingle_hash_col(key) % n_buckets


def hash_sample(
    df: DataFrame, id_col: str, rate_pct: int, salt: str = "mix"
) -> DataFrame:
    """Keep ~rate_pct% of rows, deterministically by id."""
    return df.filter(portable_bucket(F.col(id_col), 100, salt) < rate_pct)


def mixture_sample(
    df: DataFrame, id_col: str, rate_col: Column, salt: str = "mix"
) -> DataFrame:
    """Per-group mixture: keep each row iff its bucket < its group's rate
    percentage (``rate_col`` — any integer column expression, e.g. a CASE
    over the source column or a joined-in rates dimension)."""
    return df.filter(portable_bucket(F.col(id_col), 100, salt) < rate_col)


def negative_samples(
    triples: DataFrame,
    subj_col: str,
    pred_col: str,
    obj_col: str,
    pool_df: DataFrame,
    k: int = 2,
    salt: str = "neg",
) -> DataFrame:
    """Deterministic corrupted-tail negatives for KG-embedding training
    (the TransE-family sampling step): for each (s, p, o) emit ``k`` rows
    (s, p, o, neg_idx, neg_obj) with
    ``neg_obj = pool[h(s,p,o,i) % |pool|]``, cyclically bumped one slot
    while it equals the true object.

    ``pool_df`` is a one-row DataFrame with a sorted ARRAY column named
    ``pool`` (e.g. ``triples.select(F.sort_array(F.collect_set(obj))
    .alias("pool"))``) — broadcast-cross-joined in, so the
    candidate-entity universe stays in-plan with no driver collect.  The hash is the same
    60-bit md5 prefix as `portable_bucket`, so a DuckDB oracle replays
    the sampling verbatim; reproducible across runs, engines and
    partitionings, and resume-consistent like `mixture_sample`.
    Requires |pool| ≥ 2 for the bump to terminate.
    """
    s, p, o = F.col(subj_col), F.col(pred_col), F.col(obj_col)
    n = F.size("pool")
    base = triples.select(s.alias("subj"), p.alias("pred"), o.alias("obj"))
    exploded = base.select(
        "*", F.explode(F.array(*[F.lit(i) for i in range(1, k + 1)])).alias("neg_idx")
    ).crossJoin(F.broadcast(pool_df.select(F.col("pool"))))
    key = F.concat_ws(
        ":", F.lit(salt), F.col("subj"), F.col("pred"), F.col("obj"),
        F.col("neg_idx").cast("string"),
    )
    idx = shingle_hash_col(key) % n
    cand = F.element_at(F.col("pool"), (idx + 1).cast("int"))
    bumped = F.element_at(F.col("pool"), (((idx + 1) % n) + 1).cast("int"))
    # |pool| < 2 cannot yield a negative != the true object — fail loud
    # (runtime raise_error: the pool size only exists in-plan)
    neg = F.when(
        n < 2,
        F.raise_error(
            F.lit("negative_samples needs a candidate pool of >= 2 objects")
        ).cast("string"),
    ).otherwise(F.when(cand == F.col("obj"), bumped).otherwise(cand))
    return exploded.select(
        "subj", "pred", "obj", "neg_idx", neg.alias("neg_obj")
    )

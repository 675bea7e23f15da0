"""Deterministic random-walk corpus generation over KG edges.

Graph-embedding training (DeepWalk / node2vec family) consumes a corpus
of fixed-length walks.  ``rand()``-driven walks are irreproducible and
resume-inconsistent — the same objection the mixture sampler solves
(functions/sampling.py): a 100 TB pipeline needs every walk to be a
pure function of (graph, salt), identical across runs, partitionings,
and engines.  Here the "random" next hop from node u at step t of walk
w is the neighbor minimizing the portable 60-bit md5 hash of
``salt:w:t:neighbor`` — i.e. a salted hash-argmin, exactly the
deterministic-pick convention of ``negative_samples``.

Per step the plan is: active walks ⋈ edges on the current node (one
equi-join), a per-walk ``min(struct(hash, dst))`` argmin (one keyed
agg; the struct makes ties impossible — the hash includes the
neighbor), and a 1:1 join back.  Dead-end walks retire into the result
as-is.  walk_len rounds of linear joins, lineage cut per round with
localCheckpoint — the CC/PageRank discipline.  Walk count =
|nodes| × walks_per_node rows; nothing is ever driver-side.

Determinism is pinned by an independent python replay of the identical
md5 picks (tests/test_walks.py) and a repartition-equality test.

``skipgram_pairs`` completes the pipeline: walks → (center, context)
training pairs for a skip-gram embedding model.  It is a pure
projection (nested array higher-order functions, zero Exchange until
the optional count aggregation) — the pair explosion happens inside
whole-stage codegen on each walk row, never via a self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neo4j_export_tool_spark.functions.similarity import shingle_hash_col


def random_walks(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    walk_len: int = 10,
    walks_per_node: int = 2,
    salt: str = "walk",
    use_local_checkpoint: bool = True,
) -> DataFrame:
    """(walk_id, start, path) — ``walks_per_node`` walks from every node
    with at least one outgoing edge, each following ``walk_len - 1``
    hash-argmin hops (shorter when a dead end retires the walk early).

    ``walk_id`` = ``start#i`` for i in [0, walks_per_node); the path is
    an array of node strings beginning with ``start``.  Node ids are
    cast to string (the hash needs a canonical byte form).
    """
    if walk_len < 1:
        raise ValueError("walk_len must be >= 1")
    if walks_per_node < 1:
        raise ValueError("walks_per_node must be >= 1")
    e = (
        edges.select(
            F.col(src_col).cast("string").alias("src"),
            F.col(dst_col).cast("string").alias("dst"),
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    # use_local_checkpoint=False keeps pure lineage (the edge scan is
    # recomputed per round) — debugging/small-graph mode.  A persist()
    # here would leak cached blocks for the session: the returned
    # DataFrame is lazy, so there is no point at which this function
    # could safely unpersist.
    if use_local_checkpoint:
        e = e.localCheckpoint(eager=False)

    active = (
        e.select("src")
        .distinct()
        .select(
            F.col("src").alias("start"),
            F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("_i"),
        )
        .select(
            F.concat("start", F.lit("#"), F.col("_i")).alias("walk_id"),
            "start",
            F.col("start").alias("cur"),
            F.array("start").alias("path"),
        )
    )
    done = active.limit(0)

    for step in range(1, walk_len):
        if use_local_checkpoint:
            active = active.localCheckpoint(eager=False)
            done = done.localCheckpoint(eager=False)
        cand = active.join(e, active["cur"] == e["src"])
        h = shingle_hash_col(
            F.concat(
                F.lit(salt + ":"),
                F.col("walk_id"),
                F.lit(f":{step}:"),
                F.col("dst"),
            )
        )
        pick = cand.groupBy("walk_id").agg(
            F.min(F.struct(h.alias("h"), F.col("dst").alias("d"))).alias("_m")
        ).select("walk_id", F.col("_m.d").alias("_next"))
        done = done.unionByName(
            active.join(pick, "walk_id", "left_anti")
        )
        active = active.join(pick, "walk_id").select(
            "walk_id",
            "start",
            F.col("_next").alias("cur"),
            F.concat("path", F.array("_next")).alias("path"),
        )
    return done.unionByName(active).select("walk_id", "start", "path")


def skipgram_pairs(
    walks: DataFrame,
    path_col: str = "path",
    window: int = 2,
    with_counts: bool = False,
) -> DataFrame:
    """Skip-gram training pairs from walk paths: one ``(center,
    context)`` row per ordered pair of positions ``(i, j)`` with
    ``j != i`` and ``|j - i| <= window`` (both directions, the standard
    skip-gram context).  With ``with_counts=True`` the pairs are
    aggregated to ``(center, context, n)`` — the frequency table an
    embedding trainer consumes.

    Scale shape: the pair expansion is a pure array projection (indexed
    structs + nested transform/filter, all JVM-side in whole-stage
    codegen) followed by one explode — ZERO shuffles for the raw-pair
    form.  A self-join formulation would shuffle the exploded positions
    table twice; this never shuffles at all.  Per-row cost is
    O(len(path)^2) element ops, bounded by walk_len (typically 5-40).
    Null/empty paths yield no pairs.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    indexed = F.transform(
        F.col(path_col),
        lambda x, j: F.struct(x.alias("x"), j.alias("j")),
    )
    pairs = F.expr(
        "flatten(transform(_ix, c -> "
        "  transform("
        f"    filter(_ix, t -> t.j != c.j AND abs(t.j - c.j) <= {int(window)}),"
        "    t -> named_struct('center', c.x, 'context', t.x))))"
    )
    out = (
        walks.where(F.col(path_col).isNotNull())
        .select(indexed.alias("_ix"))
        .select(F.explode(pairs).alias("_p"))
        .select(F.col("_p.center").alias("center"), F.col("_p.context").alias("context"))
    )
    if with_counts:
        out = out.groupBy("center", "context").agg(
            F.count(F.lit(1)).alias("n")
        )
    return out

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

"""Deterministic label-propagation community detection (LPA).

The standard cheap community detector over the derived concept graph
(after `operators/triangles.py` co-occurrence projection): each node
repeatedly adopts the most frequent label among its neighbors.  Classic
LPA breaks ties randomly and updates asynchronously — both
irreproducible.  This variant is fully deterministic: SYNCHRONOUS
rounds (every node updates from the same previous labeling) and ties
broken by the smallest label (then the algorithm is a pure function of
the graph, independent of partitioning and engine — an independent
python replay reproduces it exactly, tests/test_communities.py).

Per round: one equi-join of the (node, label) table to the symmetrized
edge list, one (node, label) count agg, one per-node argmax via
``min(struct(-count, label))`` (the struct makes the tie-break part of
the ordering), lineage cut with localCheckpoint — the CC/PageRank loop
discipline.  Labels start as the node ids, so label values stay in the
node-id domain and the final (node, community) output is stable across
runs.

Synchronous LPA on bipartite-ish structures can oscillate 2-cycles;
``n_iters`` is therefore a fixed round count (the common practical
choice — DeepWalk-adjacent pipelines run 3-10 rounds), not a
convergence loop that could never terminate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neo4j_export_tool_spark.functions.partitioning import broadcast_if_small

# Symmetrized-edge ceiling for broadcasting the per-round label table
# (see the block comment in `label_propagation`; a label row is two
# short strings, so 500k rows ≈ the session's 64 MB auto-broadcast
# threshold — `operators/pagerank.py::_BROADCAST_RANKS_MAX_NODES`).
_BROADCAST_SYM_EDGES_MAX = 500_000


def label_propagation(
    edges: DataFrame,
    a_col: str,
    b_col: str,
    n_iters: int = 5,
    use_local_checkpoint: bool = True,
) -> DataFrame:
    """(node, community) after ``n_iters`` synchronous LPA rounds on the
    undirected simple graph.  Edges are canonicalized (least, greatest)
    before dedup, so an input containing both ``(a, b)`` and ``(b, a)``
    still contributes ONE undirected edge (one vote per neighbor).
    Self-loops are dropped; a node appearing only in self-loops has no
    neighbors and is absent from the output."""
    if n_iters < 0:
        raise ValueError("n_iters must be >= 0")
    und = (
        edges.select(
            F.least(F.col(a_col), F.col(b_col)).alias("a"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    # Broadcast the per-round (node, label) table when the symmetrized
    # edge table is small (labels ≤ distinct sources ≤ |sym|): behind
    # the localCheckpoint boundary the planner has no size statistics
    # and shuffle-joins even tiny graphs (guide §3.1; the pagerank /
    # walks convention).  The count materializes the checkpoint the
    # first round would pay for anyway; results are identical (the
    # vote fold is a min, partitioning-independent).
    _bl = lambda df: df
    if use_local_checkpoint:
        sym = sym.localCheckpoint(eager=False)
        if n_iters >= 1:  # n_iters == 0: the loop never runs
            _bl = broadcast_if_small(sym.count(), _BROADCAST_SYM_EDGES_MAX)

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("community"))
    )
    for _ in range(n_iters):
        if use_local_checkpoint:
            labels = labels.localCheckpoint(eager=False)
        neigh = sym.join(
            _bl(labels.withColumnRenamed("node", "b")), "b"
        ).select(F.col("a").alias("node"), "community")
        counts = neigh.groupBy("node", "community").agg(
            F.count(F.lit(1)).alias("c")
        )
        labels = counts.groupBy("node").agg(
            F.min(
                F.struct((-F.col("c")).alias("nc"), F.col("community").alias("l"))
            ).alias("_m")
        ).select("node", F.col("_m.l").alias("community"))
    return labels

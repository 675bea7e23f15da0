"""Strongly connected components via deterministic min-label coloring.

The directed sibling of `operators/components.py` (weakly connected):
SCCs are what make a KG hierarchy cyclic — `operators/closure.py`
RAISES on a cycle-heavy graph; this operator is how a user finds the
cycles to fix.  Algorithm: the coloring method (Orzan 2004 — the
standard distributed SCC scheme; FW-BW's recursive pivoting doesn't
map to a driver loop):

  outer round:
    1. FORWARD fixpoint: every node's color = min node id that can
       reach it (min-label propagation along edge direction).
    2. BACKWARD sweep: from each color's root (the node that IS its
       color), walk the reversed edges restricted to same-color nodes;
       everything reached is in the root's SCC (reaches the root
       forward by construction of the color, and is reached backward).
    3. Emit those SCCs, delete their nodes, repeat on the remainder.

Every pick is a ``min`` — fully deterministic, partitioning/engine
independent, no salt needed.  An isolated or acyclic node emits a
singleton SCC (scc_id = its own id).

Scale shape: every step is an equi-join + keyed min-agg fixpoint with
localCheckpoint lineage cuts (the CC/PageRank discipline).  Forward
rounds are bounded by the color diameter, outer rounds by the SCC
condensation's chain structure; both carry RAISING ceilings
(`max_label_rounds`, `max_outer_rounds`) — the closure convention:
explicit cost ceilings, never silent truncation.  Worst case (one long
path) is O(diameter) rounds — the known cost of label-propagation SCC;
for that shape raise the ceilings deliberately.

Independent python twin: iterative Tarjan in tests/test_scc.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neo4j_export_tool_spark.functions.partitioning import broadcast_if_small

# Node ceiling under which the per-round node-sized tables (colors,
# inbound mins, trim/removal sets, the backward frontier) are broadcast
# instead of shuffle-joined (guide §3.1; the pagerank convention —
# `operators/pagerank.py::_BROADCAST_RANKS_MAX_NODES`).  Every such
# table sits behind a localCheckpoint boundary with no size statistics,
# so the planner sort-merge-joins even a 500-node graph, paying 2
# exchanges per fixpoint round.  The count that decides it replaces the
# `isEmpty` action each outer round already paid.  Above the ceiling the
# loop keeps the shuffle-join shape.  Results are identical either way:
# every pick is a `min`, independent of partitioning.
_BROADCAST_NODES_MAX = 500_000


def strongly_connected_components(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    max_outer_rounds: int = 32,
    max_label_rounds: int = 64,
    use_local_checkpoint: bool = True,
) -> DataFrame:
    """(node, scc_id) — scc_id is the minimum node id of the component.

    Node ids are CAST TO STRING in the output (both columns; the
    min-label fixpoint needs one canonical orderable form — the walks
    convention).  Join the result back to a non-string-keyed node table
    through an explicit cast, or ANSI mode faults the comparison.

    Nodes appearing only as endpoints still get a row (singleton unless
    cyclic).  Self-loops are irrelevant to the grouping (a node is
    always in its own SCC).  Raises RuntimeError if a fixpoint is still
    moving at its ceiling.
    """
    e_all = (
        edges.select(
            F.col(src_col).cast("string").alias("src"),
            F.col(dst_col).cast("string").alias("dst"),
        )
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes_all = (
        edges.select(F.col(src_col).cast("string").alias("node"))
        .unionByName(edges.select(F.col(dst_col).cast("string").alias("node")))
        .where(F.col("node").isNotNull())
        .distinct()
    )

    def _ckpt(df):
        return df.localCheckpoint(eager=False) if use_local_checkpoint else df

    e_all = _ckpt(e_all)
    nodes = _ckpt(nodes_all)
    e = e_all
    spark = edges.sparkSession
    assigned = spark.createDataFrame([], "node string, scc_id string")

    for _ in range(max_outer_rounds):
        if use_local_checkpoint:
            # count (not isEmpty): on the materialized checkpoint both
            # are one cheap job, and the measured node count decides the
            # broadcast tier for this outer round
            n_nodes = nodes.count()
            _bn = broadcast_if_small(n_nodes, _BROADCAST_NODES_MAX)
        else:
            # pure-lineage debug mode: isEmpty short-circuits after one
            # row where a count would recompute the whole surviving
            # subgraph; no checkpoint boundary means the planner sees
            # sizes itself, so no forced tier either
            n_nodes = 0 if nodes.isEmpty() else 1
            _bn = lambda df: df
        if n_nodes == 0:
            return assigned
        # 0. TRIM: a node with no in-edge or no out-edge in the
        # surviving subgraph cannot sit in a multi-node SCC — emit
        # singletons until the fixpoint.  This removes entire DAG
        # portions cheaply; without it a plain 40-node path would need
        # 40 outer rounds (one root SCC each) and trip the ceiling.
        for _t in range(max_label_rounds):
            srcs = e.select(F.col("src").alias("node")).distinct()
            dsts = e.select(F.col("dst").alias("node")).distinct()
            trivial = (
                nodes.join(_bn(srcs), "node", "left_anti")
                .unionByName(nodes.join(_bn(dsts), "node", "left_anti"))
                .distinct()
            )
            trivial = _ckpt(trivial)
            if trivial.isEmpty():
                break
            assigned = _ckpt(
                assigned.unionByName(
                    trivial.select("node", F.col("node").alias("scc_id"))
                )
            )
            nodes = _ckpt(nodes.join(_bn(trivial), "node", "left_anti"))
            e = _ckpt(
                e.join(
                    _bn(trivial.select(F.col("node").alias("src"))),
                    "src",
                    "left_anti",
                ).join(
                    _bn(trivial.select(F.col("node").alias("dst"))),
                    "dst",
                    "left_anti",
                )
            )
        # (trim ceiling exhausting is not an error — coloring below
        # handles whatever remains)
        if nodes.isEmpty():
            return assigned
        # 1. forward min-label fixpoint: color(v) = min id reaching v
        colors = nodes.select("node", F.col("node").alias("color"))
        for _r in range(max_label_rounds):
            colors = _ckpt(colors)
            pushed = (
                e.join(
                    _bn(colors.select(
                        F.col("node").alias("src"), F.col("color").alias("_c")
                    )),
                    "src",
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min("_c").alias("_in"))
            )
            nxt = (
                colors.join(_bn(pushed), "node", "left")
                .select(
                    "node",
                    F.least(
                        "color", F.coalesce("_in", F.col("color"))
                    ).alias("color"),
                    (F.col("_in") < F.col("color")).alias("_moved"),
                )
            )
            # checkpoint BEFORE the moved-check: the isEmpty action
            # materializes nxt so the next round reads it instead of
            # re-running this round's join (closure.py discipline)
            nxt = _ckpt(nxt)
            moved = nxt.where(F.col("_moved")).isEmpty()
            colors = nxt.select("node", "color")
            if moved:
                break
        else:
            raise RuntimeError(
                f"SCC forward labeling still moving after "
                f"max_label_rounds={max_label_rounds}; raise the ceiling "
                "(long-diameter graph)"
            )
        colors = _ckpt(colors)

        # 2. backward sweep from roots within each color
        e_col = (
            e.join(
                _bn(colors.select(F.col("node").alias("src"),
                                  F.col("color").alias("_cs"))),
                "src",
            )
            .join(
                _bn(colors.select(F.col("node").alias("dst"),
                                  F.col("color").alias("_cd"))),
                "dst",
            )
            .where(F.col("_cs") == F.col("_cd"))
            .select("src", "dst", F.col("_cs").alias("color"))
        )
        e_col = _ckpt(e_col)
        member = _ckpt(
            colors.where(F.col("node") == F.col("color")).select(
                "node", "color"
            )
        )
        frontier = member
        for _r in range(max_label_rounds):
            if frontier.isEmpty():
                break
            stepped = (
                _bn(frontier.select(F.col("node").alias("dst"), "color"))
                .join(e_col, ["dst", "color"])
                .select(F.col("src").alias("node"), "color")
                .distinct()
            )
            # checkpoint BEFORE branching: frontier feeds both the next
            # round's expansion and the member union, so without a
            # barrier the step join evaluated twice per round (the
            # walks pick discipline)
            frontier = _ckpt(
                stepped.join(_bn(member.select("node")), "node", "left_anti")
            )
            member = _ckpt(member.unionByName(frontier))
        else:
            raise RuntimeError(
                f"SCC backward sweep still moving after "
                f"max_label_rounds={max_label_rounds}; raise the ceiling"
            )

        found = member.select("node", F.col("color").alias("scc_id"))
        assigned = _ckpt(assigned.unionByName(found))
        # 3. remove assigned nodes; keep only edges between survivors
        nodes = _ckpt(
            nodes.join(_bn(found.select("node")), "node", "left_anti")
        )
        e = _ckpt(
            e.join(
                _bn(found.select(F.col("node").alias("src"))),
                "src", "left_anti",
            ).join(
                _bn(found.select(F.col("node").alias("dst"))),
                "dst", "left_anti",
            )
        )
    if not nodes.isEmpty():
        raise RuntimeError(
            f"SCC still has unassigned nodes after "
            f"max_outer_rounds={max_outer_rounds}; raise the ceiling "
            "(deep SCC condensation chain)"
        )
    return assigned

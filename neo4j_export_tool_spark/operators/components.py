"""Connected components via iterative DataFrame label propagation.

The canonicalization clusterer (SURVEY.md §2.3 J4): alias edges from the
MinHash-LSH similarity join are clustered into canonical entities.  No
GraphFrames dependency — plain DataFrame min-label propagation:

    comp(v) ← min(comp(v), min over neighbors u of comp(u))

iterated to fixpoint.  Convergence is detected with a changed-label count;
lineage is cut with ``checkpoint()`` every ``checkpoint_interval`` rounds
(without it the plan doubles per iteration and the driver OOMs planning, the
classic iterative-DataFrame failure at scale).

Complexity: O(diameter) rounds, each a self-join shuffle on the vertex id.
For web-scale alias graphs the diameter is small (entity clusters are
near-cliques); ``max_iterations`` bounds the pathological chain case and is
surfaced in the result so callers can tell fixpoint from cutoff.
"""

from __future__ import annotations

import dataclasses

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclasses.dataclass
class CCResult:
    components: DataFrame  # (id, component)
    iterations: int
    converged: bool


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
    checkpoint_interval: int = 3,
    use_local_checkpoint: bool = True,
) -> CCResult:
    """Min-label propagation over an undirected edge list.

    ``edges``: two columns of the same orderable type.  Vertices appearing
    only as isolated endpoints keep their own id as component.

    ``use_local_checkpoint=True`` truncates lineage EVERY round with an
    eager localCheckpoint — without it the logical plan doubles per round
    and driver-side planning dominates wall time long before data does.
    Set False on clusters that need executor-loss tolerance: then a reliable
    ``checkpoint()`` runs every ``checkpoint_interval`` rounds instead.
    """
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct()
    sym = sym.persist()

    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    ).persist()
    cached = labels  # handle to the DataFrame actually persisted

    iterations = 0
    converged = False
    for i in range(max_iterations):
        iterations = i + 1
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["id"])
            .groupBy(F.col("a").alias("id2"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["id2"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
                (
                    F.coalesce("nbr_component", F.col("component"))
                    < F.col("component")
                ).alias("_changed"),
            )
        )
        # pointer doubling (path compression): follow component → its
        # component one hop, halving chain depth → O(log n) rounds on chains
        # instead of O(diameter)
        comp_map = new_labels.select(
            F.col("id").alias("cid"), F.col("component").alias("ccomp")
        )
        new_labels = (
            new_labels.join(
                comp_map, new_labels["component"] == comp_map["cid"], "left"
            )
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("ccomp", F.col("component"))
                ).alias("component"),
                (
                    F.col("_changed")
                    | (F.coalesce("ccomp", F.col("component")) < F.col("component"))
                ).alias("_changed"),
            )
        )
        if use_local_checkpoint:
            new_labels = new_labels.localCheckpoint(eager=True)
        elif checkpoint_interval and (i + 1) % checkpoint_interval == 0:
            new_labels = new_labels.checkpoint(eager=True)
        else:
            new_labels = new_labels.persist()
        changed = new_labels.filter(F.col("_changed")).count()
        # unpersist the handle that was actually cached (a derived plan like
        # .drop() is a different DataFrame and its unpersist is a no-op)
        cached.unpersist()
        cached = new_labels
        labels = new_labels.drop("_changed")
        if changed == 0:
            converged = True
            break

    sym.unpersist()
    return CCResult(components=labels, iterations=iterations, converged=converged)

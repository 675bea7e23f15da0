"""Weak-scaling study for the round-6 graph operators (north-rule
evidence extended beyond the flagship).

The north rule's two-cluster-size criterion is evidenced in this
sandbox by running the SAME operator at two parallelism levels with
proportionally scaled input: local[8] over ~25% of the edges vs
local[32] over 100% — equal work per core, so ideal weak scaling means
equal wall time (efficiency = t_small / t_big ≈ 1, normalized by the
measured per-core work ratio since the hash sample is only ~25%).

Ops measured (all linear in edges per round): node2vec biased walks,
integer personalized PageRank, synchronous label propagation.
Replicates are interleaved A/B/A/B (the round-4 pairing discipline) so
window drift hits both arms; a bench JVM control rides each arm for
absolute window context.

Usage: python tools/scaling_graph_ops.py [sf_dir] [replicates]
Writes BENCH/scaling_graph_ops_round6.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EDGES_PATH = "/tmp/scaling_graph_edges.parquet"


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def prep(sf_dir: str) -> None:
    # the doc↔concept BIPARTITE mention graph, not the concept
    # co-occurrence projection: the projection is bounded by the
    # gazetteer vocabulary (~500 edges at any sf — round-overhead
    # dominates and scaling is meaningless), while the bipartite graph
    # grows with the corpus (the actual 100 TB shape)
    from neo4j_export_tool_spark.plans.flagship import doc_mentions, load_documents
    from neo4j_export_tool_spark.session import get_spark
    import pyspark.sql.functions as F

    spark = get_spark(master="local[32]")
    # doc_id is bigint, concept is string: cast BEFORE the union (ANSI
    # union coercion would otherwise cast concepts to BIGINT and fail),
    # and prefix docs so the two id spaces stay disjoint
    m = doc_mentions(load_documents(spark, sf_dir)).select(
        F.concat(F.lit("d:"), F.col("doc_id").cast("string")).alias("c1"),
        F.col("concept").alias("c2"),
    ).distinct()
    sym = m.unionByName(
        m.select(F.col("c2").alias("c1"), F.col("c1").alias("c2"))
    )
    sym.write.mode("overwrite").parquet(EDGES_PATH)
    spark.stop()


def run_arm(cores: int, rate_pct: int) -> dict:
    import bench
    from neo4j_export_tool_spark.functions.sampling import portable_bucket
    from neo4j_export_tool_spark.operators.communities import label_propagation
    from neo4j_export_tool_spark.operators.pagerank import (
        personalized_pagerank_int,
    )
    from neo4j_export_tool_spark.operators.walks import node2vec_walks
    from neo4j_export_tool_spark.session import get_spark
    import pyspark.sql.functions as F

    spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores)
    ctrl = bench._control_jvm(spark)
    e = spark.read.parquet(EDGES_PATH)
    if rate_pct < 100:
        # sample by the CANONICAL undirected key so both directions of an
        # edge share a fate — (a,b) and (b,a) hashed independently would
        # give LPA (which canonicalizes) 1-(1-r)^2 of undirected edges
        # while n_edges reports r of directed rows, inflating its
        # efficiency ~1.75x
        e = e.filter(
            portable_bucket(
                F.concat_ws(
                    "|", F.least("c1", "c2"), F.greatest("c1", "c2")
                ),
                100,
                "scale",
            ) < rate_pct
        )
    e = e.localCheckpoint(eager=True)
    n_edges = e.count()
    seeds = [
        r.c1
        for r in e.select("c1").distinct().orderBy("c1").limit(4).collect()
    ]
    # per-op work measures: node2vec's per-step candidate expansion is
    # sum over walk starts of min(outdeg, cap) — NOT the edge count once
    # the cap binds; PPR joins every directed edge per round; LPA works
    # on the canonical undirected set (= n_edges/2 under canonical
    # sampling of a symmetrized graph)
    cap = 32
    n2v_work = e.groupBy("c1").count().agg(
        F.sum(F.least(F.col("count"), F.lit(cap)))
    ).collect()[0][0]
    out = {"cores": cores, "rate_pct": rate_pct, "n_edges": n_edges,
           "control_jvm_sec": round(ctrl, 3),
           "work": {"node2vec": int(n2v_work), "ppr": n_edges,
                    "lpa": n_edges // 2},
           "ops": {}}
    for name, fn in (
        # max_neighbors_per_node: the hub cap that makes walk cost
        # linear in edges (uncapped study: eff 0.27-0.45 — see the
        # _uncapped archive and cap_neighbors docstring)
        ("node2vec", lambda: node2vec_walks(
            e, "c1", "c2", walk_len=4, walks_per_node=1, w_return=1,
            w_near=2, w_far=4, max_neighbors_per_node=cap)),
        ("ppr", lambda: personalized_pagerank_int(
            e, "c1", "c2", seeds, n_iters=5)),
        ("lpa", lambda: label_propagation(e, "c1", "c2", n_iters=4)),
    ):
        t0 = time.perf_counter()
        _force(fn())
        out["ops"][name] = round(time.perf_counter() - t0, 3)
    spark.stop()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    prep(sf_dir)
    arms = []
    for r in range(reps):
        # interleaved pairing: small, big, per replicate
        arms.append(run_arm(8, 25))
        arms.append(run_arm(32, 100))
        print(f"replicate {r + 1}: {arms[-2]} {arms[-1]}", flush=True)
    effs = {}
    for op in ("node2vec", "ppr", "lpa"):
        per_rep = []
        for i in range(reps):
            small, big = arms[2 * i], arms[2 * i + 1]
            work_small = small["work"][op] / small["cores"]
            work_big = big["work"][op] / big["cores"]
            # weak-scaling efficiency, normalized to measured work/core
            eff = (small["ops"][op] / big["ops"][op]) * (
                work_big / work_small
            )
            per_rep.append(round(eff, 3))
        effs[op] = per_rep
    result = {
        "study": "weak-scaling local[8]@25%-edges vs local[32]@100%-edges",
        "sf_dir": sf_dir,
        "arms": arms,
        "efficiency_per_replicate": effs,
        "rule": "eff = (t_small/t_big) * (work_per_core_big/work_per_core_small); >=0.8 passes",
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling_graph_ops_round6.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"efficiency_per_replicate": effs}))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark harness.

Default mode: run the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

``--scaling`` mode: run the flagship KG job at two parallelism levels
(local[8] vs local[32] by default) on the SAME input and report throughput at
both plus scaling efficiency — the sandbox evidence for the north rule's
two-cluster-size criterion (BASELINE.md) — into ``BENCH/BASELINE.md``.

Full computation is forced with the ``noop`` sink (count() alone would let
Catalyst prune the very columns we mean to benchmark).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


# Lanes whose single-run numbers swung up to 7× between windows on this
# co-tenanted host (round-5 judge measurement: lsh_full_table 17.2 s vs
# the 2.3 s archive on a window whose trailing control spiked 4×).  These
# run median-of-3 with a recorded spread instead of min-of-2, so an
# archive is robust to one interfered run AND carries evidence of how
# contended its window was, per lane.
NOISY_LANES = {"q16_embedding_neardup", "lsh_full_table",
               "jsonl_export", "jsonl_export_dir"}


def _median_timed(fn, n: int = 3) -> tuple[float, float, list[float]]:
    """(median, spread, runs) over n timed calls; spread = (max-min)/median
    — 0 on a quiet window, O(1) when a neighbor stole the core mid-lane."""
    import statistics

    runs = [_timed(fn) for _ in range(n)]
    med = statistics.median(runs)
    spread = (max(runs) - min(runs)) / med if med else 0.0
    return med, spread, runs


# Host-speed reference for the control lanes, measured on a quiet window
# (round 5, local[32], best-of-3 of best-of-2).  Cross-round absolute
# comparisons divide by host_speed = control_sec / ref — the round-4
# archive was confounded by a degraded host (untouched lanes +66-83%), so
# every archive now carries its own engine-independent normalizer.  The
# controls are DATA-INDEPENDENT (spark.range, no parquet, no package
# code), so one scalar serves every sf and every topology with the same
# core count.
# Quiet-window reference (2026-08-17, local[32], best of 5×best-of-2);
# only meaningful at 32 cores — other -cpus values report the raw control
# seconds but host_speed stays comparable only against same-core runs.
# PY ref re-based in round 6: the control input gained a string column
# (JIT-deopt immunity, see _control_python docstring / PLANS.md §12), so
# round ≤5 python_sec values (long-only lane, ref 2.0) are NOT comparable
# to round ≥6 values.  2.5 = best-of-9 across three fresh sessions on a
# 1.3×-slow window, scaled by the same window's JVM-control ratio.
_CONTROL_REF_JVM_SEC = 1.17
_CONTROL_REF_PY_SEC = 2.5


def _control_jvm(spark) -> float:
    """Engine-independent JVM control: a fixed xxhash64 reduction over
    spark.range — zero package code and zero IO, so its wall time moves
    ONLY with host state (co-tenants, CPU clocks, GC pressure), never
    with this repo or the input tables."""
    from pyspark.sql import functions as F

    # pmod keeps the running sum < 2^62 (ANSI mode faults long overflow);
    # sized for ~1-2 s on an idle 32-core host — long enough that
    # scheduling noise is <5%, short enough to run twice per bench.
    # A FRESH DataFrame per run: re-collecting one DataFrame object reuses
    # its RDD lineage, so Spark skips the finished shuffle map stage and
    # the second run times ~nothing.
    def _fresh():
        return spark.range(0, 2_000_000_000, 1, 64).select(
            F.sum(F.pmod(F.xxhash64("id"), F.lit(1_000_000_007))).alias("h")
        )

    return min(_timed(lambda: _fresh().collect()) for _ in range(2))


def _control_python(spark) -> float:
    """Engine-independent Python-worker control: an Arrow-batched numpy +
    string reduction over spark.range — host normalizer for the pandas-UDF
    lanes (python fork/Arrow costs move differently from JVM costs under
    load).

    The input schema is deliberately MIXED (bigint + string).  A long-only
    control is a trap on this JVM: the C2-compiled JVM→Python Arrow writer
    specializes to the first input value-profile it sees, and the first
    pandas lane with any other column type permanently deoptimizes it —
    measured 2.3 s → 17-18 s for a 96M-row long-only stream, reproduced on
    vanilla Spark 4.1.2, surviving worker replacement (fresh PIDs equally
    slow), input-side only, erased under -XX:TieredStopAtLevel=1 (so: JIT
    profile pollution, not host noise).  Real lanes all carry strings and
    always run the generic path at full speed; only a type-pure control
    ever saw the fast specialization, which made the TRAILING control of
    every bench run read ~7× "contended" on a quiet host.  Mixed input
    measures the steady-state generic path first and last.  Full diagnosis:
    PLANS.md §12."""
    from pyspark.sql import functions as F

    def _k(batches):
        import numpy as _np
        import pandas as _pd

        for b in batches:
            a = b["id"].to_numpy()
            acc = 0.0
            for _ in range(8):  # fixed numpy work per Arrow batch
                acc += float(_np.sqrt((a * 2654435761 % 1000003)).sum())
            acc += float(b["s"].str.len().sum())  # fixed string work
            yield _pd.DataFrame({"s": [acc]})

    def _fresh():
        return (
            spark.range(0, 12_000_000, 1, 64)
            .select("id", F.format_string("ctl-%d-x", "id").alias("s"))
            .mapInPandas(_k, schema="s double")
            .groupBy()
            .sum("s")
        )

    return min(_timed(lambda: _fresh().collect()) for _ in range(2))


def _control_block(spark) -> dict:
    return {
        "jvm_sec": round(_control_jvm(spark), 3),
        "python_sec": round(_control_python(spark), 3),
    }


def run_bench(sf_dir: str, cpus: int, flagship_only: bool = False, replicate: int = 40,
              input_dir: str | None = None, gen_only: bool = False,
              master: str | None = None, executor_cores: int | None = None,
              cores_max: int | None = None) -> dict:
    from neo4j_export_tool_spark.session import get_spark

    import __spark_entry__ as entry_mod

    extra_conf = {}
    if master:  # standalone-cluster run: fixed-size executor JVMs
        extra_conf["spark.pyspark.python"] = sys.executable
        if executor_cores:
            extra_conf["spark.executor.cores"] = str(executor_cores)
            extra_conf["spark.executor.memory"] = "3g"
        if cores_max:
            extra_conf["spark.cores.max"] = str(cores_max)
    spark = get_spark(
        master=master or f"local[{cpus}]",
        app_name=f"bench-{cores_max or cpus}",
        shuffle_partitions=max(cores_max or cpus, 8),
        extra_conf=extra_conf,
    )
    try:
        timings: dict[str, float] = {}

        # warm the JVM / codegen / Arrow-Python-worker paths once (excluded
        # from timings — standard JIT-warmup practice; the engine under test
        # is the dataflow, not cold-start)
        from pyspark.sql import functions as _F

        docs_warm = spark.read.parquet(f"{sf_dir}/documents.parquet")
        docs_warm.count()
        docs_warm.groupBy("lang").agg(_F.count(_F.lit(1))).collect()

        def _warm_py(it):
            yield from it

        docs_warm.limit(64).mapInPandas(
            _warm_py, schema=docs_warm.schema
        ).count()
        # warm the package import + Aho-Corasick build on executor python
        # workers (the dominant first-UDF cost)
        from neo4j_export_tool_spark.plans.flagship import doc_mentions

        doc_mentions(docs_warm.limit(32)).count()
        # engine-independent host-speed control, timed FIRST (and again
        # LAST below): archives carry their own normalizer so cross-round
        # absolute comparisons survive a noisy host
        control_first = None if flagship_only else _control_block(spark)
        if flagship_only:
            import tempfile as _tf

            from pyspark.sql import functions as F

            from neo4j_export_tool_spark.operators.extract import extract_text_udf
            from neo4j_export_tool_spark.operators.graph import (
                attach_node_hashes,
                edges_from,
                nodes_from,
                nodes_union,
            )
            from neo4j_export_tool_spark.operators.mentions import (
                build_relation_patterns,
                extract_triples,
            )
            from neo4j_export_tool_spark.sources.synth import (
                ORGS,
                PERSONS,
                PLACES,
                RELATION_TEMPLATES,
                pages_spark_distributed,
            )

            # North-rule scaling workload: the REAL pages pipeline
            # (HTML extraction → pattern triple extraction → entity edges →
            # content hashes → J1 join), which is Python-CPU-bound per split —
            # the component that must scale with executors at 10^12 docs.
            # Input synthesized in parallel and MATERIALIZED TO PARQUET
            # OUTSIDE THE TIMED REGION (the study measures the pipeline over
            # a many-file parquet input, the production shape).
            n_docs = replicate * 5000
            if input_dir is None:
                input_dir = _tf.mkdtemp(prefix="scaling-pages-")
            if not os.path.exists(os.path.join(input_dir, "_SUCCESS")):
                pages_spark_distributed(spark, n_docs, seed=7, partitions=128)\
                    .write.mode("overwrite").parquet(input_dir)
            if gen_only:
                return {"metric": "gen_only", "value": 0, "unit": "sec",
                        "queries": {}, "sf": sf_dir, "input_dir": input_dir}
            pages = spark.read.parquet(input_dir)

            surfaces = {
                "Person": [s for a in PERSONS.values() for s in a],
                "Organization": [s for a in ORGS.values() for s in a],
                "Place": [s for a in PLACES.values() for s in a],
            }
            patterns = build_relation_patterns(RELATION_TEMPLATES, surfaces)
            surface_label = {
                s: lbl
                for lbl, ss in surfaces.items()
                for s in ss
            }

            def build():
                extracted = pages.select(
                    "url", extract_text_udf(F.col("html")).alias("text")
                )
                triples = extract_triples(extracted, patterns)
                lbl_map = F.create_map(
                    *[x for s, l in surface_label.items() for x in (F.lit(s), F.lit(l))]
                )
                resolved = triples.select(
                    "url",
                    "pred",
                    "char_start",
                    F.concat(
                        F.lit("entity:"),
                        lbl_map[F.col("subj_surface")],
                        F.lit(":"),
                        F.col("subj_surface"),
                    ).alias("s_id"),
                    F.concat(
                        F.lit("entity:"),
                        lbl_map[F.col("obj_surface")],
                        F.lit(":"),
                        F.col("obj_surface"),
                    ).alias("o_id"),
                    F.col("subj_surface"),
                )
                nodes = nodes_union(
                    nodes_from(
                        resolved.select(
                            F.col("s_id").alias("eid"), F.col("subj_surface").alias("name")
                        ).distinct(),
                        labels=["Entity"],
                        element_id=F.col("eid"),
                        props={"name": F.col("name")},
                    )
                )
                edges = edges_from(
                    resolved,
                    rel_type=F.upper(F.col("pred")),
                    start_element_id=F.col("s_id"),
                    end_element_id=F.col("o_id"),
                    props={"source_url": F.col("url"), "char_start": F.col("char_start")},
                )
                return attach_node_hashes(edges, nodes, broadcast_nodes=True)

            # untimed warmup (codegen/broadcast/python-worker spin-up)
            n_triples = build().count()
            par_before = spark.sparkContext.defaultParallelism
            # timed: best of 3 full materializations (single-host runs are
            # noisy; min is the least-interfered estimate)
            kg_sec = min(
                _timed(lambda: _force(build())) for _ in range(3)
            )
            return {
                "metric": "flagship_kg_sec",
                "value": round(kg_sec, 3),
                "unit": "sec",
                "queries": {"pages_pipeline": round(kg_sec, 3)},
                "sf": sf_dir,
                "cpus": cpus,
                # cores actually granted (standalone apps can be
                # short-granted if a neighbor phase hasn't released yet —
                # the scaling study validates this against its request).
                # min(before timed region, after): a grant that grew later
                # means the timed runs executed under-provisioned.
                "parallelism": min(
                    par_before, spark.sparkContext.defaultParallelism
                ),
                "replicate": replicate,
                "flagship_docs": n_docs,
                "flagship_triples": n_triples,
                "flagship_triples_per_sec": round(n_triples / kg_sec, 1),
                "flagship_docs_per_sec": round(n_docs / kg_sec, 1),
            }

        lane_stats: dict[str, dict] = {}

        def _record_noisy(name: str, run) -> None:
            med, spread, runs = _median_timed(run)
            timings[name] = round(med, 3)
            lane_stats[name] = {
                "median": round(med, 3),
                "spread": round(spread, 3),
                "runs": [round(r, 3) for r in runs],
            }

        for name, fn in sorted(entry_mod.queries().items()):
            if name in NOISY_LANES:
                # median-of-3 + spread for lanes the round-5 adjudication
                # measured at up to 7× between windows
                _record_noisy(name, lambda: _force(fn(spark, sf_dir)))
                continue
            # best of 2: a single cold run conflates machine contention with
            # real regressions (round-2 per-query numbers swung ±150% on an
            # otherwise-unchanged operator); min matches the export/flagship
            # best-of-N policy while capping the added wall time
            timings[name] = round(
                min(_timed(lambda: _force(fn(spark, sf_dir))) for _ in range(2)), 3
            )

        # perf-only lane (no oracle; round-3 advice): hyperplane LSH over
        # the FULL embeddings table — the q27 gate pins exactness on planted
        # twins, this keeps LSH-at-corpus-scale on the bench surface
        from neo4j_export_tool_spark.operators.ann import hyperplane_lsh_pairs

        emb_full = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        _record_noisy(
            "lsh_full_table",
            lambda: _force(
                hyperplane_lsh_pairs(
                    emb_full, "embedding", "vec_id", min_cosine=0.9
                )
            ),
        )

        # perf-only lane (round 5): the composed corpus-prep hygiene flow
        # (canonical-URL dedup → LSH near-dup prune → quality floor →
        # span report → chunking → sample) over the documents table —
        # each stage is gate-verified; this keeps the COMPOSITION's cost
        # on the bench surface
        from neo4j_export_tool_spark.plans.corpus_prep import prepare_corpus

        docs_cp = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            _F.concat(_F.lit("http://synth.example/doc/"), "doc_id").alias(
                "url"
            ),
            "text",
        )
        n_docs_cp = docs_cp.count()
        # best-of-2 like every other lane (a single cold run conflates
        # scheduling noise with regressions); the timing includes the
        # plan's own metric counts — they are part of its contract
        cp_sec = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            cp_res = prepare_corpus(
                docs_cp, min_tokens=5, neardup_threshold_pct=90,
                max_bucket_frac=0.05, chunk_tokens=32, overlap=8,
            )
            cp_sec = min(cp_sec, time.perf_counter() - t0)
        timings["corpus_prep_full"] = round(cp_sec, 3)
        corpus_prep_docs_per_sec = round(n_docs_cp / cp_sec, 1)
        corpus_prep_chunks = cp_res.metrics["chunks"]

        # perf-only lane (round 6): PQ build+search over the FULL
        # embeddings table — train (2 k-means rounds), encode, ADC
        # candidates, exact re-verify; 16 queries.  Exactness is pinned by
        # tests/test_pq.py (planted-copy equality with brute force); this
        # keeps the memory-scale ANN path's cost on the bench surface.
        from neo4j_export_tool_spark.operators.pq import pq_topk

        pq_queries = emb_full.orderBy("vec_id").limit(16)
        timings["pq_search"] = round(
            min(
                _timed(
                    lambda: _force(
                        pq_topk(
                            emb_full, pq_queries, "embedding", "vec_id",
                            k=5, m=8, n_codes=64, n_iters=2,
                        )
                    )
                )
                for _ in range(2)
            ),
            3,
        )

        # Derived concept graph, shared by the four graph-analytics lanes
        # below (triangles, walks, skip-gram, label propagation).  Built
        # and materialized ONCE, outside every timed region, so each lane
        # measures its own operator rather than the common upstream NLP
        # (lane semantics changed this round: triangles/walks previously
        # timed the upstream too).  Co-occurrence edges are canonicalized
        # c1 < c2; walking needs the symmetrized view (else every walk
        # would only ascend concept ids and dead-end immediately).
        from neo4j_export_tool_spark.operators.triangles import (
            cooccurrence_edges,
            triangle_counts,
        )
        from neo4j_export_tool_spark.plans.flagship import (
            doc_mentions,
            load_documents,
        )

        _mentions = doc_mentions(load_documents(spark, sf_dir)).localCheckpoint(
            eager=True
        )  # shared: the graph build here + the predicate_profile lane
        _g_edges = cooccurrence_edges(
            _mentions, "doc_id", "concept", max_concepts_per_doc=256
        ).localCheckpoint(eager=True)
        _g_sym = _g_edges.select("c1", "c2").unionByName(
            _g_edges.select(_F.col("c2").alias("c1"), _F.col("c1").alias("c2"))
        )

        # perf-only lane (round 6): exact per-node triangle counts
        # (degree-ordered orientation) over the shared concept graph.
        # Exactness pinned by tests/test_triangles.py DuckDB twins.
        timings["cooccur_triangles"] = round(
            min(
                _timed(lambda: _force(triangle_counts(_g_edges, "c1", "c2")))
                for _ in range(2)
            ),
            3,
        )

        # perf-only lane (round 6): bigram-LM perplexity — train on the
        # full documents table, score the same table (the CCNet quality
        # filter, train+apply).  Exactness pinned by tests/test_lm_score.py
        # (python twin, rel 1e-12; partitioning-independent fold).
        from neo4j_export_tool_spark.operators.lm_score import (
            score_docs,
            train_bigram_lm,
        )

        docs_lm = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )

        def _lm_run():
            lm = train_bigram_lm(docs_lm, "text", "doc_id", max_vocab=65536)
            _force(score_docs(docs_lm, lm, "doc_id", "text"))

        timings["lm_perplexity"] = round(
            min(_timed(_lm_run) for _ in range(2)), 3
        )

        # perf-only lane (round 6): per-doc TF-IDF keyword extraction
        # (exactness pinned by tests/test_tfidf.py python twin)
        from neo4j_export_tool_spark.functions.text import tfidf_keywords

        timings["tfidf_keywords"] = round(
            min(
                _timed(
                    lambda: _force(
                        tfidf_keywords(docs_lm, "doc_id", "text", k=10, min_df=2)
                    )
                )
                for _ in range(2)
            ),
            3,
        )

        # perf-only lane (round 6): BM25 top-k — inverted-index join over
        # the documents table, 16 queries drawn from the corpus itself.
        # Exactness pinned by tests/test_retrieval.py (python twin).
        from neo4j_export_tool_spark.operators.retrieval import bm25_topk

        bm_queries = (
            docs_lm.orderBy("doc_id")
            .limit(16)
            .select(
                "doc_id",
                _F.array_join(
                    _F.slice(_F.split("text", " "), 1, 4), " "
                ).alias("qtext"),
            )
        )

        timings["bm25_topk"] = round(
            min(
                _timed(
                    lambda: _force(
                        bm25_topk(
                            docs_lm, bm_queries,
                            doc_id="doc_id", doc_text="text",
                            query_id="doc_id", query_text="qtext",
                            k=10,
                        )
                    )
                )
                for _ in range(2)
            ),
            3,
        )

        # perf-only lane (round 6): deterministic random-walk corpus over
        # the shared concept graph (DeepWalk-style input for graph
        # embeddings).  Exactness pinned by tests/test_walks.py (python
        # replay of the md5 hash-argmin picks).
        from neo4j_export_tool_spark.operators.walks import random_walks

        timings["random_walks"] = round(
            min(
                _timed(
                    lambda: _force(
                        random_walks(
                            _g_sym, "c1", "c2", walk_len=5, walks_per_node=1
                        )
                    )
                )
                for _ in range(2)
            ),
            3,
        )

        # perf-only lane (round 6): HLL distinct sketch over the concept
        # column of the mention edges (the fixed-size mergeable
        # cardinality probe a data card carries).  Exactness pinned by
        # tests/test_sketches.py (bit-exact python register twin).
        from neo4j_export_tool_spark.operators.sketches import (
            approx_distinct_hll,
        )

        timings["hll_distinct"] = round(
            min(
                _timed(
                    lambda: _force(approx_distinct_hll(_g_edges, "c1", p=12))
                )
                for _ in range(2)
            ),
            3,
        )

        # perf-only lane (round 6): log2 histogram of doc token counts
        # (the data-card distribution probe).  Exactness pinned by
        # tests/test_sketches.py (python twin + closed-form quantiles).
        from neo4j_export_tool_spark.operators.sketches import (
            histogram_quantiles,
            log2_histogram,
        )

        _doclen = docs_lm.where(_F.col("text").isNotNull()).select(
            _F.size(_F.split("text", " ")).alias("n_tokens")
        )  # a null text would trip the histogram's in-plan reject
        timings["log2_histogram"] = round(
            min(
                _timed(
                    lambda: _force(
                        histogram_quantiles(
                            log2_histogram(_doclen, "n_tokens"),
                            [0.5, 0.9, 0.99],
                        )
                    )
                )
                for _ in range(2)
            ),
            3,
        )

        # perf-only lane (round 6): count-min counters over the same
        # column (the hot-key probe feeding the salting operator).
        # Exactness pinned by tests/test_sketches.py (python twin).
        from neo4j_export_tool_spark.operators.sketches import cms_counters

        timings["cms_counters"] = round(
            min(
                _timed(
                    lambda: _force(
                        cms_counters(_g_edges, "c1", depth=4, width=2048)
                    )
                )
                for _ in range(2)
            ),
            3,
        )

        # perf-only lane (round 6): personalized PageRank from the 8
        # highest-degree concepts (entity relevance over the KG
        # neighborhood).  Exactness pinned by tests/test_ppr.py (integer
        # python twin, bit-equal across partitionings).
        from neo4j_export_tool_spark.operators.pagerank import (
            personalized_pagerank_int,
        )

        # seed selection is input prep — collect the 8 ids OUTSIDE the
        # timed region so the lane times only the PPR loop
        _ppr_seeds = [
            r.s
            for r in _g_sym.groupBy(_F.col("c1").alias("s"))
            .count()
            .orderBy(_F.desc("count"), "s")
            .limit(8)
            .collect()
        ]

        # perf-only lane (round 6): weighted PageRank over the
        # co-occurrence weights (exactness pinned by tests/test_ppr.py
        # two-step integer-div python twin)
        from neo4j_export_tool_spark.operators.pagerank import (
            weighted_pagerank_int,
        )

        _g_wsym = _g_edges.select("c1", "c2", "weight").unionByName(
            _g_edges.select(
                _F.col("c2").alias("c1"), _F.col("c1").alias("c2"), "weight"
            )
        )
        timings["weighted_pagerank"] = round(
            min(
                _timed(
                    lambda: _force(
                        weighted_pagerank_int(
                            _g_wsym, "c1", "c2", "weight", n_iters=5
                        )
                    )
                )
                for _ in range(2)
            ),
            3,
        )

        timings["personalized_pagerank"] = round(
            min(
                _timed(
                    lambda: _force(
                        personalized_pagerank_int(
                            _g_sym, "c1", "c2", _ppr_seeds, n_iters=5
                        )
                    )
                )
                for _ in range(2)
            ),
            3,
        )

        # perf-only lane (round 6): the graph-embedding prep COMPOSITION
        # (mentions → projection → cap → node2vec → skip-gram → PMI →
        # negatives-ready splits); per-stage exactness pinned by each
        # operator's own tests, composition by tests/test_embedding_prep.py
        from neo4j_export_tool_spark.plans.embedding_prep import (
            prepare_embedding_corpus,
        )

        def _embed_prep_run():
            res = prepare_embedding_corpus(
                _mentions, walk_len=5, walks_per_node=1
            )
            _force(res.pairs)
            _force(res.collocations)

        timings["embedding_prep_full"] = round(
            min(_timed(_embed_prep_run) for _ in range(2)), 3
        )

        # perf-only lane (round 6): strongly connected components over
        # the symmetrized concept graph (every WCC is an SCC there —
        # the lane measures the coloring loop's cost; directed-graph
        # exactness pinned by tests/test_scc.py Tarjan twin).
        from neo4j_export_tool_spark.operators.scc import (
            strongly_connected_components,
        )

        timings["scc_coloring"] = round(
            min(
                _timed(
                    lambda: _force(
                        strongly_connected_components(
                            _g_sym, "c1", "c2", max_label_rounds=128
                        )
                    )
                )
                for _ in range(2)
            ),
            3,
        )

        # perf-only lane (round 6): HyperANF neighborhood function (h=3)
        # over the shared concept graph (exactness pinned by
        # tests/test_anf.py register twin at rel 1e-12)
        from neo4j_export_tool_spark.operators.anf import (
            neighborhood_function,
        )

        timings["hyperanf"] = round(
            min(
                _timed(
                    lambda: _force(
                        neighborhood_function(_g_sym, "c1", "c2", h=3, p=8)
                    )
                )
                for _ in range(2)
            ),
            3,
        )

        # perf-only lane (round 6): k-truss peel at k=3 over the shared
        # concept graph (exactness pinned by tests/test_triangles.py
        # python twin + closed forms)
        from neo4j_export_tool_spark.operators.triangles import ktruss

        timings["ktruss"] = round(
            min(
                _timed(lambda: _force(ktruss(_g_edges, "c1", "c2", 3)))
                for _ in range(2)
            ),
            3,
        )

        # perf-only lane (round 6): link-prediction scores (CN / Jaccard /
        # Adamic-Adar / resource allocation) over the shared concept graph
        # — the wedge self-join cost law of the triangles lane plus the
        # sorted-fold float aggs.  Exactness pinned by tests/test_linkpred.py
        # (python twin; bit-equal across partitionings).
        from neo4j_export_tool_spark.operators.linkpred import (
            link_prediction_scores,
        )

        timings["link_prediction"] = round(
            min(
                _timed(
                    lambda: _force(link_prediction_scores(_g_edges, "c1", "c2"))
                )
                for _ in range(2)
            ),
            3,
        )

        # perf-only lane (round 6): node2vec-biased walks (integer ladder
        # pick; 2 extra joins + 1 window per step vs random_walks' argmin).
        # Exactness pinned by tests/test_walks.py python replay.
        from neo4j_export_tool_spark.operators.walks import node2vec_walks

        timings["node2vec_walks"] = round(
            min(
                _timed(
                    lambda: _force(
                        node2vec_walks(
                            _g_sym, "c1", "c2", walk_len=5, walks_per_node=1,
                            w_return=1, w_near=2, w_far=4,
                        )
                    )
                )
                for _ in range(2)
            ),
            3,
        )

        # perf-only lanes (round 6): skip-gram pair generation + synchronous
        # label propagation over the same shared graph.  Pair expansion is
        # a zero-shuffle array projection (tests/test_walks.py pins a
        # no-Exchange plan); LPA exactness is pinned by
        # tests/test_communities.py (python replay).
        from neo4j_export_tool_spark.operators.communities import (
            label_propagation,
        )
        from neo4j_export_tool_spark.operators.walks import skipgram_pairs

        _walk_corpus = random_walks(
            _g_sym, "c1", "c2", walk_len=10, walks_per_node=2
        ).localCheckpoint(eager=True)

        timings["skipgram_pairs"] = round(
            min(
                _timed(
                    lambda: _force(
                        skipgram_pairs(
                            _walk_corpus, "path", window=2, with_counts=True
                        )
                    )
                )
                for _ in range(2)
            ),
            3,
        )
        # perf-only lane (round 6): PMI/NPMI collocation scoring over the
        # raw skip-gram pairs of the walk corpus (the word2phrase step of
        # an embedding pipeline).  Exactness pinned by
        # tests/test_collocations.py (python twin; bit-equal floats).
        from neo4j_export_tool_spark.operators.collocations import pmi_scores

        timings["pmi_collocations"] = round(
            min(
                _timed(
                    lambda: _force(
                        pmi_scores(
                            skipgram_pairs(_walk_corpus, "path", window=2),
                            "center", "context", min_count=2,
                        )
                    )
                )
                for _ in range(2)
            ),
            3,
        )
        timings["label_propagation"] = round(
            min(
                _timed(
                    lambda: _force(
                        label_propagation(_g_edges, "c1", "c2", n_iters=4)
                    )
                )
                for _ in range(2)
            ),
            3,
        )

        # perf-only lanes (round 6): temporal joins over the events table.
        # As-of: every event picks up the latest prior 'purchase' by the
        # same user (union+window shape, one shuffle).  Range: events
        # falling in ±300 s validity windows around each purchase
        # (bucket-expansion equi-join).  Exactness pinned by
        # tests/test_temporal.py (DuckDB ASOF + inequality-join twins).
        from neo4j_export_tool_spark.operators.temporal import (
            asof_join,
            range_join_points,
        )

        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id", "user_id", "event_type",
            _F.unix_seconds(_F.col("ts").cast("timestamp")).alias("ts"),
        )
        ref_type = ev.select(_F.min("event_type")).first()[0]
        ev_ref = ev.where(_F.col("event_type") == ref_type).select(
            "user_id", "ts", _F.col("event_id").alias("ref_event_id")
        )

        timings["asof_join_events"] = round(
            min(
                _timed(
                    lambda: _force(
                        asof_join(
                            ev, ev_ref, "user_id", "ts", ["ref_event_id"],
                            tolerance=86_400,
                        )
                    )
                )
                for _ in range(2)
            ),
            3,
        )

        iv = ev_ref.select(
            "user_id",
            (_F.col("ts") - 300).alias("w_start"),
            (_F.col("ts") + 300).alias("w_end"),
            "ref_event_id",
        )
        pts = ev.select("user_id", "ts", "event_id", "event_type")
        timings["range_join_events"] = round(
            min(
                _timed(
                    lambda: _force(
                        range_join_points(
                            iv, pts, "user_id", "w_start", "w_end", "ts",
                            bucket_width=600,
                        )
                    )
                )
                for _ in range(2)
            ),
            3,
        )

        # perf-only lane (round 6): interval×interval overlap join —
        # reference-event validity windows against non-reference event
        # windows per user (the temporal-KG validity-intersection join).
        # Exactness pinned by tests/test_temporal.py (DuckDB inequality
        # twin, bucket-width independence).
        from neo4j_export_tool_spark.operators.temporal import (
            interval_overlap_join,
        )

        riv = ev.where(_F.col("event_type") != ref_type).select(
            "user_id",
            (_F.col("ts") - 120).alias("o_start"),
            (_F.col("ts") + 120).alias("o_end"),
            "event_id",
        )
        timings["interval_overlap_events"] = round(
            min(
                _timed(
                    lambda: _force(
                        interval_overlap_join(
                            iv, riv, "user_id",
                            "w_start", "w_end", "o_start", "o_end",
                            bucket_width=600,
                        )
                    )
                )
                for _ in range(2)
            ),
            3,
        )

        # flagship KG end-to-end (mentions → edges → hash join), with
        # throughput accounting
        from neo4j_export_tool_spark.plans.flagship import documents_kg

        # perf-only lane (round 6): KG schema induction — per-predicate
        # cardinality profile of the mention-edge table (exactness pinned
        # by tests/test_ontology.py DuckDB twins)
        from neo4j_export_tool_spark.operators.ontology import (
            predicate_profile,
        )

        _m_edges = _mentions.select(
            "doc_id", _F.lit("MENTIONS").alias("rel"), "concept"
        )
        timings["predicate_profile"] = round(
            min(
                _timed(
                    lambda: _force(
                        predicate_profile(_m_edges, "doc_id", "rel", "concept")
                    )
                )
                for _ in range(2)
            ),
            3,
        )

        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        _, hashed = documents_kg(spark, sf_dir)
        n_triples = hashed.count()  # untimed warmup + count (as in --scaling)
        t0 = time.perf_counter()
        _force(hashed)
        kg_sec = time.perf_counter() - t0
        timings["flagship_kg"] = round(kg_sec, 3)

        # JSONL export throughput (comparable to the reference's 50-60K
        # records/s single-thread streaming export)
        import tempfile

        from neo4j_export_tool_spark.sources.jsonl_sink import (
            export_jsonl,
            with_properties_json,
        )

        # materialize the KG inputs first so the export timing measures the
        # SINK (serialization + stats + write), matching the reference's
        # records/s semantics (its 50-60K rec/s loop serializes records the
        # Bolt cursor already fetched); KG construction is timed separately
        # above as flagship_kg
        nodes, _ = documents_kg(spark, sf_dir)
        nodes = nodes.persist()
        edges_p = with_properties_json(hashed).persist()
        nodes.count()
        edges_p.count()
        export_records = 0

        def _timed_export(lane, **kw):
            # median-of-3 + spread (NOISY_LANES policy): export swung
            # 56K→30K rec/s between the round-4/5 driver windows on pure
            # host contention
            nonlocal export_records

            def one():
                nonlocal export_records
                with tempfile.TemporaryDirectory() as td:
                    res = export_jsonl(nodes, edges_p, td, db_name="bench", **kw)
                    export_records = res.node_count + res.rel_count

            _record_noisy(lane, one)
            return timings[lane]

        # sort_lines=False matches the reference's semantics (it streams
        # records in cursor order; no global sort) — the sorted single-file
        # mode is an extra determinism feature, benchmarked by its tests
        export_sec = _timed_export("jsonl_export", sort_lines=False)
        # dir mode: executor-parallel section writes (the 100 TB path)
        export_dir_sec = _timed_export(
            "jsonl_export_dir", single_file=False, sort_lines=False
        )
        nodes.unpersist()
        edges_p.unpersist()

        control_last = _control_block(spark)
        control_sec = min(control_first["jvm_sec"], control_last["jvm_sec"])
        control_py_sec = min(
            control_first["python_sec"], control_last["python_sec"]
        )
        total = round(sum(timings.values()), 3)
        return {
            "control_first": control_first,
            "control_last": control_last,
            # per-lane {median, spread, runs} for the NOISY_LANES set:
            # spread >> 0 marks a lane whose window was contended
            "lane_stats": lane_stats,
            "control_jvm_sec": control_sec,
            "control_python_sec": control_py_sec,
            "control_ref_jvm_sec": _CONTROL_REF_JVM_SEC,
            "control_ref_python_sec": _CONTROL_REF_PY_SEC,
            # >1 = this run's host was slower than the reference window;
            # divide cross-round per-lane deltas by this before reading
            # them as engine changes
            "host_speed_jvm": (
                round(control_sec / _CONTROL_REF_JVM_SEC, 3)
                if _CONTROL_REF_JVM_SEC
                else None
            ),
            "host_speed_python": (
                round(control_py_sec / _CONTROL_REF_PY_SEC, 3)
                if _CONTROL_REF_PY_SEC
                else None
            ),
            "corpus_prep_docs_per_sec": corpus_prep_docs_per_sec,
            "corpus_prep_chunks": corpus_prep_chunks,
            "export_records": export_records,
            "export_records_per_sec": round(export_records / export_sec, 1),
            "export_dir_records_per_sec": round(export_records / export_dir_sec, 1),
            "metric": "headline_queries_total_sec",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf_dir,
            "cpus": cpus,
            "flagship_docs": n_docs,
            "flagship_triples": n_triples,
            "flagship_triples_per_sec": round(n_triples / kg_sec, 1),
            "flagship_docs_per_sec": round(n_docs / kg_sec, 1),
        }
    finally:
        spark.stop()


def _flagship_subprocess(sf_dir, cpus, replicate, input_dir,
                         timeout_s: int = 900, retries: int = 1,
                         master: str | None = None,
                         executor_cores: int | None = None,
                         cores_max: int | None = None):
    """One measured flagship run in a fresh JVM.  A rare startup deadlock
    (JVM launch hang in a concurrently-forked subprocess) can leave a run
    pinned at ~0 CPU forever — bound it with a timeout.

    Retry policy: TIMEOUT only (the deadlock case), never real failures,
    and the result is flagged ``retried`` — a retried small-job run
    executes after its concurrent peers finished (idle machine, higher
    turbo), so run_scaling must not silently fold it into a load-matched
    aggregate."""
    attempts = 0
    cmd = [sys.executable, __file__, "--single-run", "--flagship-only",
           "--cpus", str(cpus), "--replicate", str(replicate),
           "--input-dir", input_dir]
    if master:
        cmd += ["--master", master]
    if executor_cores:
        cmd += ["--executor-cores", str(executor_cores)]
    if cores_max:
        cmd += ["--cores-max", str(cores_max)]
    while True:
        try:
            out = subprocess.run(
                cmd,
                env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
                capture_output=True, text=True, check=True, timeout=timeout_s,
            )
            res = json.loads(out.stdout.strip().splitlines()[-1])
            res["retried"] = attempts
            return res
        except subprocess.TimeoutExpired:
            attempts += 1
            if attempts > retries:
                raise


def run_scaling(sf_dir: str, low: int, high: int, replicate: int = 40) -> dict:
    """Load-matched scaling study: one local[high] job vs high/low CONCURRENT
    local[low] jobs over the same read-only input.

    Running the levels load-matched keeps the number of busy cores equal, so
    CPU frequency scaling (2 active cores turbo higher than 8) does not
    masquerade as poor framework scaling.  Efficiency = throughput of the
    one big job / aggregate throughput of the small jobs — exactly the
    "N small clusters vs one 4N cluster" question the north rule asks.
    """
    import concurrent.futures as _fut
    import tempfile as _tf

    input_dir = os.path.join(_tf.gettempdir(), f"scaling-shared-{replicate}")
    subprocess.run(
        [sys.executable, __file__, "--single-run", "--flagship-only",
         "--gen-only", "--cpus", str(high), "--replicate", str(replicate),
         "--input-dir", input_dir],
        env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
        capture_output=True, text=True, check=True,
    )

    n_small = high // low
    with _fut.ThreadPoolExecutor(max_workers=n_small) as pool:
        futs = []
        for _ in range(n_small):
            futs.append(
                pool.submit(_flagship_subprocess, sf_dir, low, replicate, input_dir)
            )
            time.sleep(3)  # stagger JVM launches (simultaneous cold starts
            # have deadlocked one launcher in this sandbox)
        small = [f.result() for f in futs]
    big = _flagship_subprocess(sf_dir, high, replicate, input_dir)

    thr_small_each = [s["flagship_triples_per_sec"] for s in small]
    thr_low_aggregate = round(sum(thr_small_each), 1)
    thr_high = big["flagship_triples_per_sec"]
    eff = thr_high / thr_low_aggregate
    # a retried small job ran after its peers (idle machine) — its number
    # is not load-matched, so the study must be re-run, not published
    load_matched = all(s.get("retried", 0) == 0 for s in small)
    return {
        "sf": sf_dir,
        "method": "load-matched: %d concurrent local[%d] vs 1 local[%d]"
        % (n_small, low, high),
        "low_cpus": low,
        "high_cpus": high,
        "throughput_low_each": thr_small_each,
        "throughput_low": thr_low_aggregate,
        "throughput_high": thr_high,
        "scaling_efficiency": round(eff, 3),
        "load_matched_valid": load_matched,
        "detail": {"small": small, "big": big},
    }


def run_scaling_study(
    sf_dir: str, low: int, high: int, replicate: int = 40,
    n_replicates: int = 5,
) -> dict:
    """Round-4 hardened scaling evidence: INTERLEAVED paired phases.

    Round 3's weakness: each replicate ran its (concurrent-low, single-high)
    phases once, minutes apart across replicates — the single high-side job
    absorbs any co-tenant spike whole (measured: one of three replicates at
    0.702 vs 0.955/0.815).  This study alternates phases

        L_0  H_0  L_1  H_1  ...  L_{R-1}  H_{R-1}  L_R

    over the SAME materialized input and pairs every high phase with the
    MEAN of its two adjacent low phases:

        eff_k = thr(H_k) / mean(agg_thr(L_k), agg_thr(L_{k+1}))

    so machine drift is bounded to one phase-pair window (~1-2 min) instead
    of the whole session, and a spike during H_k drags L_k/L_{k+1}'s
    neighborhood with it rather than biasing one side.  Published numbers:
    every per-replicate efficiency plus median and min.
    """
    import concurrent.futures as _fut
    import statistics as _stats
    import tempfile as _tf

    input_dir = os.path.join(_tf.gettempdir(), f"scaling-shared-{replicate}")
    subprocess.run(
        [sys.executable, __file__, "--single-run", "--flagship-only",
         "--gen-only", "--cpus", str(high), "--replicate", str(replicate),
         "--input-dir", input_dir],
        env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
        capture_output=True, text=True, check=True,
    )

    n_small = high // low

    def _low_phase() -> dict:
        with _fut.ThreadPoolExecutor(max_workers=n_small) as pool:
            futs = []
            for _ in range(n_small):
                futs.append(pool.submit(
                    _flagship_subprocess, sf_dir, low, replicate, input_dir))
                time.sleep(3)  # stagger JVM cold starts (deadlock guard)
            small = [f.result() for f in futs]
        return {
            "each": [s["flagship_triples_per_sec"] for s in small],
            "aggregate": round(
                sum(s["flagship_triples_per_sec"] for s in small), 1),
            "load_matched_valid": all(s.get("retried", 0) == 0 for s in small),
        }

    lows: list[dict] = []
    highs: list[dict] = []
    for k in range(n_replicates):
        lows.append(_low_phase())
        highs.append(_flagship_subprocess(sf_dir, high, replicate, input_dir))
    lows.append(_low_phase())  # closing low phase pairs with the last high

    effs = []
    for k in range(n_replicates):
        low_pair = (lows[k]["aggregate"] + lows[k + 1]["aggregate"]) / 2.0
        effs.append(round(highs[k]["flagship_triples_per_sec"] / low_pair, 3))
    valid = all(p["load_matched_valid"] for p in lows) and all(
        h.get("retried", 0) == 0 for h in highs
    )
    return {
        "sf": sf_dir,
        "method": (
            "interleaved paired phases: %d replicates of {%d concurrent "
            "local[%d]} vs {1 local[%d]}, eff_k = high_k / mean(adjacent lows)"
            % (n_replicates, n_small, low, high)
        ),
        "low_cpus": low,
        "high_cpus": high,
        "low_phases": lows,
        "high_phases": [
            {"triples_per_sec": h["flagship_triples_per_sec"],
             "retried": h.get("retried", 0)}
            for h in highs
        ],
        "efficiencies": effs,
        "efficiency_median": round(_stats.median(effs), 3),
        "efficiency_min": round(min(effs), 3),
        "load_matched_valid": valid,
    }


def _find_spark_home() -> str | None:
    for cand in (os.environ.get("SPARK_HOME"), "/opt/spark-4.1.2-bin-hadoop3"):
        if cand and os.path.exists(os.path.join(cand, "sbin", "start-master.sh")):
            return cand
    return None


_MASTER_WEBUI_PORT = 8090  # set by ensure_standalone_cluster when reusing


def _master_json(timeout: float = 5.0) -> tuple[dict | None, int | None]:
    """Fetch the standalone master's JSON status, probing
    SPARK_MASTER_WEBUI_PORT (when set) first, then the port we start
    masters on (8090), then the stock default (8080).  A payload only
    counts as the master when it has the master JSON shape (a "workers"
    list) — any other JSON-speaking service on 8080 is ignored.  Returns
    (payload, port) or (None, None) when no port answers as a master."""
    import urllib.request

    ports: list[int] = []
    env_port = os.environ.get("SPARK_MASTER_WEBUI_PORT")
    if env_port and env_port.isdigit():
        ports.append(int(env_port))
    ports += [p for p in (8090, 8080) if p not in ports]
    for port in ports:
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/json/", timeout=timeout
            ) as r:
                payload = json.load(r)
        except Exception:
            continue
        if isinstance(payload, dict) and isinstance(
            payload.get("workers"), list
        ):
            return payload, port
    return None, None


def ensure_standalone_cluster(worker_cores: int = 32,
                              worker_mem: str = "64g") -> tuple[str, bool]:
    """Start (or reuse) a localhost standalone master + one worker.

    Returns (master_url, started_here).  This is the cluster-faithful
    emulation of the north rule's "N vs 4N executors": applications get
    FIXED-SIZE executor JVMs (spark.executor.cores) from the worker, so
    both sides of the scaling comparison run the same executor topology —
    unlike local mode, where the high side is one big JVM whose shared
    heap/GC serializes all tasks (a single-host artifact measured at
    ~5-10% efficiency, see BENCH/BASELINE.md)."""
    home = _find_spark_home()
    if home is None:
        raise RuntimeError("no Spark distribution with sbin/ found")
    master_url = "spark://127.0.0.1:7077"
    running = subprocess.run(
        ["pgrep", "-f", "deploy.master.Master"], capture_output=True
    ).returncode == 0
    if running:
        # a pre-existing master is only reusable when a live worker with
        # the requested cores is actually registered — otherwise every
        # cores-free poll burns its timeout and the measured topology is
        # not the requested one
        global _MASTER_WEBUI_PORT
        payload, port = _master_json()
        if payload is None:
            raise RuntimeError(
                "a standalone master is running but no probed webui port "
                "(SPARK_MASTER_WEBUI_PORT, 8090, 8080) answered with a "
                "master-shaped JSON payload — stop it (sbin/stop-master."
                "sh), or set SPARK_MASTER_WEBUI_PORT to its webui port"
            )
        _MASTER_WEBUI_PORT = port
        alive_cores = sum(
            w.get("cores", 0)
            for w in payload.get("workers", [])
            if w.get("state") == "ALIVE"
        )
        if alive_cores < worker_cores:
            raise RuntimeError(
                f"reused master on port {port} has {alive_cores} ALIVE "
                f"worker cores, need {worker_cores} — stop the stale "
                "cluster or start a matching worker"
            )
        return master_url, False
    env = {**os.environ}
    env.pop("SPARK_NO_DAEMONIZE", None)
    subprocess.run(
        [os.path.join(home, "sbin", "start-master.sh"),
         "--host", "127.0.0.1", "--port", "7077", "--webui-port", "8090"],
        check=True, capture_output=True, env=env,
    )
    time.sleep(3)
    subprocess.run(
        [os.path.join(home, "sbin", "start-worker.sh"), master_url,
         "--host", "127.0.0.1", "--webui-port", "8091"],
        check=True, capture_output=True,
        env={**env, "SPARK_WORKER_CORES": str(worker_cores),
             "SPARK_WORKER_MEMORY": worker_mem},
    )
    time.sleep(4)
    return master_url, True


def stop_standalone_cluster() -> None:
    home = _find_spark_home()
    if home is None:
        return
    env = {**os.environ}
    env.pop("SPARK_NO_DAEMONIZE", None)
    subprocess.run([os.path.join(home, "sbin", "stop-worker.sh")],
                   capture_output=True, env=env)
    subprocess.run([os.path.join(home, "sbin", "stop-master.sh")],
                   capture_output=True, env=env)


def run_scaling_standalone(
    sf_dir: str, low_execs: int = 2, high_execs: int = 8,
    executor_cores: int = 2, replicate: int = 40, n_replicates: int = 5,
    weak_scaling: bool = False,
) -> dict:
    """North-rule evidence on a real multi-executor (localhost standalone)
    cluster: N=``low_execs`` executors vs 4N=``high_execs`` executors, the
    SAME fixed 2-core executor JVM topology on both sides, apps submitted
    against a live master — interleaved paired phases exactly like
    ``run_scaling_study``, load-matched (high_execs/low_execs concurrent
    low apps vs one high app → equal busy cores)."""
    import concurrent.futures as _fut
    import statistics as _stats
    import tempfile as _tf

    master_url, started = ensure_standalone_cluster(
        worker_cores=2 * high_execs * executor_cores
    )
    try:
        n_small = high_execs // low_execs
        low_cores = low_execs * executor_cores
        high_cores = high_execs * executor_cores

        def _gen(rep: int) -> str:
            d = os.path.join(_tf.gettempdir(), f"scaling-shared-{rep}")
            subprocess.run(
                [sys.executable, __file__, "--single-run", "--flagship-only",
                 "--gen-only", "--cpus", str(high_cores),
                 "--replicate", str(rep), "--input-dir", d],
                env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
                capture_output=True, text=True, check=True,
            )
            return d

        input_dir = _gen(replicate)
        # weak scaling: the 4N side processes 4N/N × the input, so both
        # phases run comparable WALL TIME and per-run fixed costs (stage
        # scheduling, barrier tails, GC, python batch boundaries) weigh
        # the same per unit of work — the throughput-per-cluster-size
        # question the north rule asks.  Strong scaling (same input both
        # sides) over-penalizes the big cluster, which finishes ~4× faster
        # and pays its fixed costs 4× more often per second.
        replicate_high = replicate * n_small if weak_scaling else replicate
        input_dir_high = _gen(replicate_high) if weak_scaling else input_dir

        def _wait_cores_free(timeout_s: float = 60.0) -> None:
            """Poll the master's JSON endpoint until every core is
            released — a phase started while a neighbor's executors
            linger gets short-granted and measures a smaller cluster."""
            import urllib.request

            t0 = time.time()
            while time.time() - t0 < timeout_s:
                try:
                    with urllib.request.urlopen(
                        f"http://127.0.0.1:{_MASTER_WEBUI_PORT}/json/",
                        timeout=5,
                    ) as r:
                        if json.load(r).get("coresused", 1) == 0:
                            return
                except Exception:
                    pass
                time.sleep(1)

        def _run(cores_max: int, rep: int = replicate,
                 in_dir: str | None = None) -> dict:
            # re-run once if the app was short-granted (timed region saw
            # fewer cores than requested) — that run measured a different
            # cluster size, not this phase's
            for _attempt in range(2):
                res = _flagship_subprocess(
                    sf_dir, cores_max, rep, in_dir or input_dir,
                    master=master_url, executor_cores=executor_cores,
                    cores_max=cores_max,
                )
                res["granted_ok"] = res.get("parallelism") == cores_max
                if res["granted_ok"]:
                    return res
                _wait_cores_free()
            return res

        def _low_phase() -> dict:
            _wait_cores_free()
            with _fut.ThreadPoolExecutor(max_workers=n_small) as pool:
                futs = []
                for _ in range(n_small):
                    futs.append(pool.submit(_run, low_cores))
                    time.sleep(3)
                small = [f.result() for f in futs]
            return {
                "each": [s["flagship_triples_per_sec"] for s in small],
                "aggregate": round(
                    sum(s["flagship_triples_per_sec"] for s in small), 1),
                "load_matched_valid": all(
                    s.get("retried", 0) == 0 and s.get("granted_ok")
                    for s in small),
            }

        lows, highs = [], []
        for _k in range(n_replicates):
            lows.append(_low_phase())
            _wait_cores_free()
            highs.append(_run(high_cores, replicate_high, input_dir_high))
        lows.append(_low_phase())

        effs = [
            round(highs[k]["flagship_triples_per_sec"]
                  / ((lows[k]["aggregate"] + lows[k + 1]["aggregate"]) / 2.0), 3)
            for k in range(n_replicates)
        ]
        return {
            "sf": sf_dir,
            "method": (
                "standalone cluster, fixed %d-core executor JVMs: %d "
                "replicates of {%d concurrent apps @ %d executors} vs "
                "{1 app @ %d executors}, interleaved paired phases%s"
                % (executor_cores, n_replicates, n_small, low_execs,
                   high_execs,
                   ", WEAK scaling (high side processes %dx the input)"
                   % n_small if weak_scaling else " (strong scaling)")
            ),
            "weak_scaling": weak_scaling,
            "low_executors": low_execs,
            "high_executors": high_execs,
            "executor_cores": executor_cores,
            "low_phases": lows,
            "high_phases": [
                {"triples_per_sec": h["flagship_triples_per_sec"],
                 "retried": h.get("retried", 0),
                 "granted_ok": h.get("granted_ok")} for h in highs
            ],
            "efficiencies": effs,
            "efficiency_median": round(_stats.median(effs), 3),
            "efficiency_min": round(min(effs), 3),
            "load_matched_valid": all(p["load_matched_valid"] for p in lows)
            and all(
                h.get("retried", 0) == 0 and h.get("granted_ok")
                for h in highs
            ),
        }
    finally:
        if started:
            stop_standalone_cluster()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scaling-study", action="store_true")
    ap.add_argument("--scaling-standalone", action="store_true")
    ap.add_argument("--low-execs", type=int, default=2)
    ap.add_argument("--high-execs", type=int, default=8)
    ap.add_argument("--executor-cores-opt", type=int, default=2,
                    help="executor size for --scaling-standalone")
    ap.add_argument("--weak", action="store_true",
                    help="weak scaling: high side gets (high/low)x input")
    ap.add_argument("--master", default=None)
    ap.add_argument("--executor-cores", type=int, default=None)
    ap.add_argument("--cores-max", type=int, default=None)
    ap.add_argument("--replicates", type=int, default=5)
    ap.add_argument("--single-run", action="store_true")
    ap.add_argument("--flagship-only", action="store_true")
    ap.add_argument("--replicate", type=int, default=40)
    ap.add_argument("--input-dir", default=None)
    ap.add_argument("--gen-only", action="store_true")
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    args = ap.parse_args()

    if args.scaling_standalone:
        res = run_scaling_standalone(
            args.sf_dir, low_execs=args.low_execs, high_execs=args.high_execs,
            executor_cores=args.executor_cores_opt,
            replicate=args.replicate, n_replicates=args.replicates,
            weak_scaling=args.weak,
        )
        print(json.dumps(res))
        return

    if args.scaling_study:
        res = run_scaling_study(
            args.sf_dir, args.low, args.high, args.replicate,
            n_replicates=args.replicates,
        )
        print(json.dumps(res))
        return

    if args.scaling:
        res = run_scaling(args.sf_dir, args.low, args.high, args.replicate)
        print(json.dumps(res))
        return

    res = run_bench(args.sf_dir, args.cpus, flagship_only=args.flagship_only,
                    replicate=args.replicate, input_dir=args.input_dir,
                    gen_only=args.gen_only, master=args.master,
                    executor_cores=args.executor_cores,
                    cores_max=args.cores_max)
    print(json.dumps(res))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Round-7 optimization harness (bench.py is FROZEN for measurement; this
file exists so the optimization work can isolate lanes, capture plans, and
time repeatedly in one warm session — guide §1.4/§1.5).

Usage:
  python bench_extra.py --lanes q13_dedup_jaccard q55_jaccard_prefix -n 3
  python bench_extra.py --lanes q52_pagerank_degrees --explain plans/r07 --tag before

Each lane is forced with the noop sink (computes every column, like
bench.py).  ``--explain DIR --tag T`` additionally writes
``DIR/<lane>_<T>.txt`` with ``explain("formatted")`` output.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def perf_lanes(spark, sf_dir):
    """Reconstructions of bench.py's perf-only lanes (same inputs/knobs),
    so they can be isolated here.  Each value is a zero-arg callable whose
    full execution is the timed region (mirrors the frozen bench)."""
    from pyspark.sql import functions as F

    from neo4j_export_tool_spark.operators.ann import hyperplane_lsh_pairs
    from neo4j_export_tool_spark.operators.pq import pq_topk
    from neo4j_export_tool_spark.operators.triangles import (
        cooccurrence_edges,
        triangle_counts,
    )
    from neo4j_export_tool_spark.plans.corpus_prep import prepare_corpus
    from neo4j_export_tool_spark.plans.flagship import (
        doc_mentions,
        documents_kg,
        load_documents,
    )

    lanes = {}
    emb_full = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs_lm = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )

    lanes["lsh_full_table"] = lambda: _force(
        hyperplane_lsh_pairs(emb_full, "embedding", "vec_id", min_cosine=0.9)
    )

    docs_cp = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.concat(F.lit("http://synth.example/doc/"), "doc_id").alias("url"),
        "text",
    )
    lanes["corpus_prep_full"] = lambda: prepare_corpus(
        docs_cp, min_tokens=5, neardup_threshold_pct=90,
        max_bucket_frac=0.05, chunk_tokens=32, overlap=8,
    )

    pq_queries = emb_full.orderBy("vec_id").limit(16)
    lanes["pq_search"] = lambda: _force(
        pq_topk(emb_full, pq_queries, "embedding", "vec_id",
                k=5, m=8, n_codes=64, n_iters=2)
    )

    _mentions = doc_mentions(load_documents(spark, sf_dir)).localCheckpoint(
        eager=True
    )
    _g_edges = cooccurrence_edges(
        _mentions, "doc_id", "concept", max_concepts_per_doc=256
    ).localCheckpoint(eager=True)
    _g_sym = _g_edges.select("c1", "c2").unionByName(
        _g_edges.select(F.col("c2").alias("c1"), F.col("c1").alias("c2"))
    )

    lanes["cooccur_triangles"] = lambda: _force(
        triangle_counts(_g_edges, "c1", "c2")
    )

    from neo4j_export_tool_spark.operators.lm_score import (
        score_docs,
        train_bigram_lm,
    )

    def _lm_run():
        lm = train_bigram_lm(docs_lm, "text", "doc_id", max_vocab=65536)
        _force(score_docs(docs_lm, lm, "doc_id", "text"))

    lanes["lm_perplexity"] = _lm_run

    from neo4j_export_tool_spark.functions.text import tfidf_keywords

    lanes["tfidf_keywords"] = lambda: _force(
        tfidf_keywords(docs_lm, "doc_id", "text", k=10, min_df=2)
    )

    from neo4j_export_tool_spark.operators.retrieval import bm25_topk

    bm_queries = (
        docs_lm.orderBy("doc_id").limit(16)
        .select(
            "doc_id",
            F.array_join(F.slice(F.split("text", " "), 1, 4), " ").alias("qtext"),
        )
    )
    lanes["bm25_topk"] = lambda: _force(
        bm25_topk(docs_lm, bm_queries, doc_id="doc_id", doc_text="text",
                  query_id="doc_id", query_text="qtext", k=10)
    )

    from neo4j_export_tool_spark.operators.walks import (
        node2vec_walks,
        random_walks,
        skipgram_pairs,
    )

    lanes["random_walks"] = lambda: _force(
        random_walks(_g_sym, "c1", "c2", walk_len=5, walks_per_node=1)
    )
    lanes["node2vec_walks"] = lambda: _force(
        node2vec_walks(_g_sym, "c1", "c2", walk_len=5, walks_per_node=1,
                       w_return=1, w_near=2, w_far=4)
    )

    from neo4j_export_tool_spark.operators.sketches import (
        approx_distinct_hll,
        cms_counters,
        histogram_quantiles,
        log2_histogram,
    )

    lanes["hll_distinct"] = lambda: _force(
        approx_distinct_hll(_g_edges, "c1", p=12)
    )
    _doclen = docs_lm.where(F.col("text").isNotNull()).select(
        F.size(F.split("text", " ")).alias("n_tokens")
    )
    lanes["log2_histogram"] = lambda: _force(
        histogram_quantiles(log2_histogram(_doclen, "n_tokens"), [0.5, 0.9, 0.99])
    )
    lanes["cms_counters"] = lambda: _force(
        cms_counters(_g_edges, "c1", depth=4, width=2048)
    )

    from neo4j_export_tool_spark.operators.pagerank import (
        personalized_pagerank_int,
        weighted_pagerank_int,
    )

    _g_wsym = _g_edges.select("c1", "c2", "weight").unionByName(
        _g_edges.select(F.col("c2").alias("c1"), F.col("c1").alias("c2"), "weight")
    )
    lanes["weighted_pagerank"] = lambda: _force(
        weighted_pagerank_int(_g_wsym, "c1", "c2", "weight", n_iters=5)
    )
    _ppr_seeds = [
        r.s
        for r in _g_sym.groupBy(F.col("c1").alias("s")).count()
        .orderBy(F.desc("count"), "s").limit(8).collect()
    ]
    lanes["personalized_pagerank"] = lambda: _force(
        personalized_pagerank_int(_g_sym, "c1", "c2", _ppr_seeds, n_iters=5)
    )

    from neo4j_export_tool_spark.plans.embedding_prep import (
        prepare_embedding_corpus,
    )

    def _embed_prep_run():
        res = prepare_embedding_corpus(_mentions, walk_len=5, walks_per_node=1)
        _force(res.pairs)
        _force(res.collocations)

    lanes["embedding_prep_full"] = _embed_prep_run

    from neo4j_export_tool_spark.operators.scc import (
        strongly_connected_components,
    )

    lanes["scc_coloring"] = lambda: _force(
        strongly_connected_components(_g_sym, "c1", "c2", max_label_rounds=128)
    )

    from neo4j_export_tool_spark.operators.anf import neighborhood_function

    lanes["hyperanf"] = lambda: _force(
        neighborhood_function(_g_sym, "c1", "c2", h=3, p=8)
    )

    from neo4j_export_tool_spark.operators.triangles import ktruss

    lanes["ktruss"] = lambda: _force(ktruss(_g_edges, "c1", "c2", 3))

    from neo4j_export_tool_spark.operators.linkpred import (
        link_prediction_scores,
    )

    lanes["link_prediction"] = lambda: _force(
        link_prediction_scores(_g_edges, "c1", "c2")
    )

    from neo4j_export_tool_spark.operators.communities import label_propagation

    _walk_corpus = random_walks(
        _g_sym, "c1", "c2", walk_len=10, walks_per_node=2
    ).localCheckpoint(eager=True)
    lanes["skipgram_pairs"] = lambda: _force(
        skipgram_pairs(_walk_corpus, "path", window=2, with_counts=True)
    )
    from neo4j_export_tool_spark.operators.collocations import pmi_scores

    lanes["pmi_collocations"] = lambda: _force(
        pmi_scores(skipgram_pairs(_walk_corpus, "path", window=2),
                   "center", "context", min_count=2)
    )
    lanes["label_propagation"] = lambda: _force(
        label_propagation(_g_edges, "c1", "c2", n_iters=4)
    )

    from neo4j_export_tool_spark.operators.temporal import (
        asof_join,
        interval_overlap_join,
        range_join_points,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type",
        F.unix_seconds(F.col("ts").cast("timestamp")).alias("ts"),
    )
    ref_type = ev.select(F.min("event_type")).first()[0]
    ev_ref = ev.where(F.col("event_type") == ref_type).select(
        "user_id", "ts", F.col("event_id").alias("ref_event_id")
    )
    lanes["asof_join_events"] = lambda: _force(
        asof_join(ev, ev_ref, "user_id", "ts", ["ref_event_id"],
                  tolerance=86_400)
    )
    iv = ev_ref.select(
        "user_id", (F.col("ts") - 300).alias("w_start"),
        (F.col("ts") + 300).alias("w_end"), "ref_event_id",
    )
    pts = ev.select("user_id", "ts", "event_id", "event_type")
    lanes["range_join_events"] = lambda: _force(
        range_join_points(iv, pts, "user_id", "w_start", "w_end", "ts",
                          bucket_width=600)
    )
    riv = ev.where(F.col("event_type") != ref_type).select(
        "user_id", (F.col("ts") - 120).alias("o_start"),
        (F.col("ts") + 120).alias("o_end"), "event_id",
    )
    lanes["interval_overlap_events"] = lambda: _force(
        interval_overlap_join(iv, riv, "user_id", "w_start", "w_end",
                              "o_start", "o_end", bucket_width=600)
    )

    from neo4j_export_tool_spark.operators.ontology import predicate_profile

    _m_edges = _mentions.select(
        "doc_id", F.lit("MENTIONS").alias("rel"), "concept"
    )
    lanes["predicate_profile"] = lambda: _force(
        predicate_profile(_m_edges, "doc_id", "rel", "concept")
    )

    def _flagship():
        _, hashed = documents_kg(spark, sf_dir)
        _force(hashed)

    lanes["flagship_kg"] = _flagship

    import tempfile

    from neo4j_export_tool_spark.sources.jsonl_sink import (
        export_jsonl,
        with_properties_json,
    )

    def _export(single_file=True):
        nodes, hashed = documents_kg(spark, sf_dir)
        with tempfile.TemporaryDirectory() as td:
            export_jsonl(nodes, with_properties_json(hashed), td,
                         db_name="bench", sort_lines=False,
                         single_file=single_file)

    lanes["jsonl_export"] = lambda: _export(True)
    lanes["jsonl_export_dir"] = lambda: _export(False)
    return lanes


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", nargs="+", required=True)
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--explain", default=None, help="dir for explain output")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    args = ap.parse_args()

    from neo4j_export_tool_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(
        master=f"local[{args.cpus}]",
        app_name="bench-extra",
        shuffle_partitions=max(args.cpus, 8),
    )
    try:
        # same warmup as bench.py
        from pyspark.sql import functions as F

        docs_warm = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
        docs_warm.count()
        docs_warm.groupBy("lang").agg(F.count(F.lit(1))).collect()

        def _warm_py(it):
            yield from it

        docs_warm.limit(64).mapInPandas(_warm_py, schema=docs_warm.schema).count()
        from neo4j_export_tool_spark.plans.flagship import doc_mentions

        doc_mentions(docs_warm.limit(32)).count()

        queries = entry_mod.queries()
        planes = None
        out = {}
        for lane in args.lanes:
            if lane in queries:
                fn = queries[lane]

                def run(fn=fn):
                    _force(fn(spark, args.sf_dir))

                df_for_explain = lambda fn=fn: fn(spark, args.sf_dir)
            else:
                if planes is None:
                    planes = perf_lanes(spark, args.sf_dir)
                if lane not in planes:
                    print(f"unknown lane {lane}", file=sys.stderr)
                    continue
                run = planes[lane]
                df_for_explain = None
            spark.sparkContext.setJobDescription(f"r07:{lane}")
            runs = [round(_timed(run), 3) for _ in range(args.n)]
            spark.sparkContext.setJobDescription(None)
            out[lane] = {
                "runs": runs,
                "min": min(runs),
                "median": round(statistics.median(runs), 3),
            }
            print(json.dumps({lane: out[lane]}), flush=True)
            if args.explain and df_for_explain is not None:
                os.makedirs(args.explain, exist_ok=True)
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df_for_explain().explain("formatted")
                with open(
                    os.path.join(args.explain, f"{lane}_{args.tag}.txt"), "w"
                ) as f:
                    f.write(buf.getvalue())
        print(json.dumps({"summary": {k: v["min"] for k, v in out.items()}}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()

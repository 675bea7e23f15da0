#!/usr/bin/env python
"""spark-submit entry point for the flagship KG pipeline.

The north rule asks for the pipeline to run "via spark-submit --py-files
on a multi-executor cluster".  This script is that entry point — it takes
its SparkSession from spark-submit (master/executor topology come from
the submit command, the package ships as a --py-files zip) and runs the
full flagship dataflow: synthesized Common-Crawl-style pages → HTML
boilerplate extraction (Arrow pandas UDF) → pattern triple extraction →
entity nodes/edges → SHA-256 content hashes → J1 hash join, materialized
through the noop sink.

Example (against the localhost standalone cluster that
``bench.py --scaling-standalone`` manages):

    cd /root/repo && python - <<'PY'
    import shutil
    shutil.make_archive("/tmp/kg_pkg", "zip", root_dir=".",
                        base_dir="neo4j_export_tool_spark")
    PY
    /opt/spark-4.1.2-bin-hadoop3/bin/spark-submit \
        --master spark://127.0.0.1:7077 \
        --py-files /tmp/kg_pkg.zip \
        --conf spark.executor.cores=2 \
        --conf spark.executor.memory=3g \
        --conf spark.cores.max=16 \
        --conf spark.pyspark.python=$(which python) \
        tools/submit_flagship.py --n-docs 200000

Prints one JSON line: {"docs": N, "triples": N, "wall_sec": s,
"triples_per_sec": r, "executors": E}.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=100_000)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--partitions", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("kg-flagship-submit").getOrCreate()

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

    pages = pages_spark_distributed(
        spark, args.n_docs, seed=args.seed, partitions=args.partitions
    ).localCheckpoint()  # materialize input outside the timed region

    surfaces = {
        "Person": [s for a in PERSONS.values() for s in a],
        "Organization": [s for a in ORGS.values() for s in a],
        "Place": [s for a in PLACES.values() for s in a],
    }
    patterns = build_relation_patterns(RELATION_TEMPLATES, surfaces)
    surface_label = {s: lbl for lbl, ss in surfaces.items() for s in ss}

    def build():
        extracted = pages.select(
            "url", extract_text_udf(F.col("html")).alias("text")
        )
        triples = extract_triples(extracted, patterns)
        lbl_map = F.create_map(
            *[x for s, l in surface_label.items() for x in (F.lit(s), F.lit(l))]
        )
        resolved = triples.select(
            "url", "pred", "char_start",
            F.concat(F.lit("entity:"), lbl_map[F.col("subj_surface")],
                     F.lit(":"), F.col("subj_surface")).alias("s_id"),
            F.concat(F.lit("entity:"), lbl_map[F.col("obj_surface")],
                     F.lit(":"), F.col("obj_surface")).alias("o_id"),
            F.col("subj_surface"),
        )
        nodes = nodes_union(
            nodes_from(
                resolved.select(
                    F.col("s_id").alias("eid"),
                    F.col("subj_surface").alias("name"),
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
            props={"source_url": F.col("url"),
                   "char_start": F.col("char_start")},
        )
        return attach_node_hashes(edges, nodes, broadcast_nodes=True)

    n_triples = build().count()  # warmup (codegen / python workers)
    t0 = time.perf_counter()
    build().write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0

    print(json.dumps({
        "docs": args.n_docs,
        "triples": n_triples,
        "wall_sec": round(wall, 3),
        "triples_per_sec": round(n_triples / wall, 1),
        "parallelism": spark.sparkContext.defaultParallelism,
    }))
    spark.stop()


if __name__ == "__main__":
    main()

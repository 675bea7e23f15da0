"""Physical-plan quality gates.

These pin the scale-critical plan properties so a refactor can't silently
regress them: filter/column pushdown into the parquet scan, broadcast hash
join for the J1 node-hash lookup, no shuffle in the extraction stage, and
whole-stage codegen around the hash expressions.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_keyset_scan_pushdown(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = docs.filter(F.col("doc_id") > 100).select("doc_id", "lang")
    plan = plan_of(q)
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,100)]" in plan
    # column pruning: text (the fat column) must not be read
    assert "text" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_j1_join_is_broadcast(spark, sf_dir):
    from neo4j_export_tool_spark.plans.flagship import documents_kg

    _, hashed = documents_kg(spark, sf_dir)
    plan = plan_of(hashed)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_extract_stage_no_shuffle(spark):
    from neo4j_export_tool_spark.operators.extract import extract_text_udf
    from neo4j_export_tool_spark.sources.synth import pages_spark_df

    pages = pages_spark_df(spark, 20, seed=1)
    q = pages.select("url", extract_text_udf(F.col("html")).alias("text"))
    plan = plan_of(q)
    assert "Exchange" not in plan  # embarrassingly parallel, no shuffle


def test_hash_columns_in_codegen(spark, sf_dir):
    from neo4j_export_tool_spark.plans.flagship import document_nodes, load_documents

    nodes = document_nodes(load_documents(spark, sf_dir))
    plan = plan_of(nodes)
    assert "codegen id" in plan  # whole-stage codegen spans present
    # sha2 must be a plain projection over the scan — no Python UDF involved
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # constant labels fold at plan time — no per-row lambda comparator
    assert "lambdafunction" not in plan


def test_unrolled_dot_in_codegen(spark, sf_dir):
    from neo4j_export_tool_spark.operators.dedup import embedding_neardup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = embedding_neardup_pairs(emb, "embedding", "vec_id", 0.5)
    plan = plan_of(pairs)
    # the fixed-dim expression compiles; no interpreted 'aggregate(' HOF in
    # the pair-join projection
    assert "aggregate(" not in plan.lower().split("broadcastnestedloopjoin")[-1][:2000]


def test_export_fast_lane_is_jvm_side(spark, sf_dir):
    """Simple-bag JSONL serialization must not evaluate Python per row: the
    only Python node in the plan is the coalesced hazard-lane mapInPandas
    (plus the upstream mention detection); no scalar ArrowEvalPython."""
    from neo4j_export_tool_spark.plans.flagship import documents_kg
    from neo4j_export_tool_spark.sources.jsonl_sink import (
        _serialize_nodes,
        with_properties_json,
    )

    nodes, hashed = documents_kg(spark, sf_dir)
    lines = _serialize_nodes(
        nodes.select("element_id", "labels", "properties_json", "content_hash"),
        "EXP",
        hashed_ids=True,
    )
    plan = plan_of(lines)
    # exactly one iterator-Python stage: the coalesced hazard fallback lane
    # (the remaining ArrowEvalPython is the NULL-GATED contract UDF — safe
    # rows feed None, so per-row Python work is a None check)
    # ("MapInPandas (" is the tree form; formatted explain also repeats the
    # node name in the details section)
    assert plan.count("MapInPandas (") == 1
    # never row-at-a-time Python
    assert "BatchEvalPython" not in plan

    edges = with_properties_json(hashed)
    eplan = plan_of(edges)
    assert "BatchEvalPython" not in eplan


def test_pii_scrub_is_pure_codegen(spark, sf_dir):
    """PII redaction must stay a JVM regexp chain: no Python of any kind
    in the plan."""
    from neo4j_export_tool_spark.functions.scrub import pii_scrub

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cols = pii_scrub(F.col("text"))
    plan = plan_of(docs.select(*[c.alias(n) for n, c in cols.items()]))
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "codegen id" in plan  # formatted explain's codegen-span marker


def test_decontaminate_no_cartesian_no_hint(spark, sf_dir):
    """The eval-overlap join must be an equi-join on the shingle (AQE
    decides broadcast at runtime), never a cartesian product or a baked-in
    broadcast hint."""
    from neo4j_export_tool_spark.operators.decontaminate import decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = decontaminate(docs, docs.filter(F.col("doc_id") % 97 == 0))
    plan = plan_of(out)
    assert "CartesianProduct" not in plan
    assert "ResolvedHint" not in out._jdf.queryExecution().logical().toString()

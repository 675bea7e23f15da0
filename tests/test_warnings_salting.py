"""Hash-fallback warning records (R5/R6 analog) and salted aggregates."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from neo4j_export_tool_spark.functions.salting import salted_count, salted_sum
from neo4j_export_tool_spark.operators.graph import (
    attach_node_hashes,
    edges_from,
    hash_fallback_warnings,
    nodes_from,
    nodes_union,
)
from neo4j_export_tool_spark.sources.jsonl_sink import export_jsonl, with_properties_json


@pytest.fixture(scope="module")
def dangling_graph(spark):
    """Two edges: one resolvable, one pointing at a node that doesn't exist."""
    nodes_src = spark.createDataFrame([("a", "Alpha")], "id string, name string")
    nodes = nodes_union(
        nodes_from(
            nodes_src,
            labels=["X"],
            element_id=F.col("id"),
            props={"name": F.col("name")},
        )
    )
    edge_src = spark.createDataFrame(
        [("a", "a"), ("a", "ghost")], "src string, dst string"
    )
    edges = edges_from(
        edge_src,
        rel_type="R",
        start_element_id=F.col("src"),
        end_element_id=F.col("dst"),
        props={},
    )
    return nodes, attach_node_hashes(edges, nodes, broadcast_nodes=True)


def test_fallback_flag_and_coalesce(dangling_graph):
    _, hashed = dangling_graph
    rows = {r["end_element_id"]: r for r in hashed.collect()}
    assert rows["ghost"]["_hash_fallback"] is True
    assert rows["ghost"]["end_node_content_hash"] == "ghost"  # fallback = element_id
    assert rows["a"]["_hash_fallback"] is False
    assert len(rows["a"]["end_node_content_hash"]) == 64


def test_warning_records_in_export(dangling_graph, tmp_path):
    nodes, hashed = dangling_graph
    warnings = hash_fallback_warnings(hashed)
    assert len(warnings) == 1
    assert warnings[0]["details"]["occurrences"] == 1
    res = export_jsonl(
        nodes,
        with_properties_json(hashed),
        str(tmp_path),
        db_name="dangling",
        warnings=warnings,
    )
    with open(res.path, encoding="utf-8") as f:
        lines = [json.loads(line) for line in f]
    warns = [r for r in lines if r.get("type") == "warning"]
    assert len(warns) == 1
    assert "unresolved" in warns[0]["message"]
    assert lines[0]["error_summary"]["total_warnings"] == 1


def test_salted_count_matches_plain(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plain = {
        (r["lang"],): r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {
        (r["lang"],): r["n"] for r in salted_count(docs, ["lang"], 8).collect()
    }
    assert salted == plain


def test_salted_sum_matches_plain(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plain = {
        r["lang"]: r["t"]
        for r in docs.groupBy("lang").agg(F.sum("n_chars").alias("t")).collect()
    }
    salted = {
        r["lang"]: r["total"]
        for r in salted_sum(docs, ["lang"], F.col("n_chars"), 8).collect()
    }
    assert salted == plain

"""JSONL export equivalence on reference-shaped fixture graphs.

Replicates the reference's SimpleGraph fixture
(``Neo4jExport.Tests/EndToEnd/Infrastructure/TestDataManagement.fs:87-168``):
nodes ``:TestNode {id, name:'Node '+id, created, value: id*1.5}``, edges
``(:TestNode{id=k mod N})-[:CONNECTED {id, weight: id/100.0, created}]->
(:TestNode{id=(k+1) mod N})`` — exports it through the engine and checks the
format contract the reference's own BasicExportTests assert: counts, 64-hex
IDs on every record, section layout, and hash round-trip against a pure-
Python recomputation (the same dual-implementation check the reference's
property suite does).
"""

from __future__ import annotations

import json
import re

import pytest
from pyspark.sql import functions as F

from neo4j_export_tool_spark.functions.canonical import (
    node_content_hash,
    rel_identity_hash,
)
from neo4j_export_tool_spark.operators.graph import (
    attach_node_hashes,
    edges_from,
    nodes_from,
    nodes_union,
)
from neo4j_export_tool_spark.sources.jsonl_sink import export_jsonl, with_properties_json

HEX64 = re.compile(r"^[a-f0-9]{64}$")
N_NODES = 500
N_RELS = 1000
CREATED = "2024-01-15T10:30:00Z"


@pytest.fixture(scope="module")
def simple_graph(spark):
    nodes_rows = [
        (i, f"Node {i}", CREATED, i * 1.5) for i in range(N_NODES)
    ]
    nodes_df = spark.createDataFrame(
        nodes_rows, "id long, name string, created string, value double"
    )
    rels_rows = [
        (k, k % N_NODES, (k + 1) % N_NODES, k / 100.0, CREATED)
        for k in range(N_RELS)
    ]
    rels_df = spark.createDataFrame(
        rels_rows, "id long, src long, dst long, weight double, created string"
    )

    nodes = nodes_union(
        nodes_from(
            nodes_df,
            labels=["TestNode"],
            element_id=F.concat(F.lit("n"), F.col("id")),
            props={
                "id": F.col("id"),
                "name": F.col("name"),
                "created": F.col("created"),
                "value": F.col("value"),
            },
        )
    )
    edges = edges_from(
        rels_df,
        rel_type="CONNECTED",
        start_element_id=F.concat(F.lit("n"), F.col("src")),
        end_element_id=F.concat(F.lit("n"), F.col("dst")),
        props={
            "id": F.col("id"),
            "weight": F.col("weight"),
            "created": F.col("created"),
        },
    )
    hashed = attach_node_hashes(edges, nodes, broadcast_nodes=True)
    return nodes, hashed


@pytest.fixture(scope="module")
def exported(simple_graph, tmp_path_factory):
    nodes, hashed = simple_graph
    out = tmp_path_factory.mktemp("simple_graph")
    res = export_jsonl(nodes, with_properties_json(hashed), str(out), db_name="simple")
    with open(res.path, encoding="utf-8") as f:
        lines = [json.loads(line) for line in f]
    return res, lines


def test_counts_and_sections(exported):
    res, lines = exported
    meta = lines[0]
    assert meta["database_statistics"]["nodeCount"] == N_NODES
    assert meta["database_statistics"]["relCount"] == N_RELS
    assert meta["database_schema"]["labels"] == ["TestNode"]
    assert meta["database_schema"]["relationshipTypes"] == ["CONNECTED"]
    types = [r["type"] for r in lines[1:]]
    assert types == ["node"] * N_NODES + ["relationship"] * N_RELS


def test_every_record_has_hex64_ids(exported):
    _, lines = exported
    for r in lines[1:]:
        if r["type"] == "node":
            assert HEX64.match(r["NET_node_content_hash"])
        else:
            assert HEX64.match(r["NET_rel_identity_hash"])
            assert HEX64.match(r["start_node_content_hash"])
            assert HEX64.match(r["end_node_content_hash"])


def test_node_hashes_match_pure_python(exported):
    """Dual-implementation check: JVM sha2-over-to_json must equal the
    pure-Python canonicalizer byte-for-byte for every fixture node."""
    _, lines = exported
    for r in lines[1:]:
        if r["type"] != "node":
            continue
        expected = node_content_hash(r["labels"], r["properties"])
        assert r["NET_node_content_hash"] == expected, r["element_id"]


def test_rel_hashes_match_pure_python(exported):
    _, lines = exported
    for r in lines[1:]:
        if r["type"] != "relationship":
            continue
        expected = rel_identity_hash(
            r["label"],
            r["start_element_id"],
            r["end_element_id"],
            r["properties"],
        )
        assert r["NET_rel_identity_hash"] == expected, r["element_id"]


def test_start_end_hashes_resolve_to_node_hashes(exported):
    _, lines = exported
    node_hash = {
        r["element_id"]: r["NET_node_content_hash"]
        for r in lines[1:]
        if r["type"] == "node"
    }
    for r in lines[1:]:
        if r["type"] != "relationship":
            continue
        assert r["start_node_content_hash"] == node_hash[r["start_element_id"]]
        assert r["end_node_content_hash"] == node_hash[r["end_element_id"]]


def test_property_values_round_trip(exported):
    _, lines = exported
    node0 = next(
        r for r in lines[1:] if r["type"] == "node" and r["properties"]["id"] == 0
    )
    assert node0["properties"] == {
        "id": 0,
        "name": "Node 0",
        "created": CREATED,
        "value": 0.0,
    }
    rel7 = next(
        r
        for r in lines[1:]
        if r["type"] == "relationship" and r["properties"]["id"] == 7
    )
    assert rel7["properties"]["weight"] == 0.07
    assert rel7["start_element_id"] == "n7"
    assert rel7["end_element_id"] == "n8"

"""JSONL export format equivalence tests.

Modeled on the reference's end-to-end suite
(``Neo4jExport.Tests/EndToEnd/ExportTests/BasicExportTests.fs:23-139``):
- empty graph → exactly 1 line (metadata only)
- record counts match metadata statistics
- 64-hex hash IDs on every record
- section ordering + start-line offsets
- hashed_ids=False omits all hash fields
- filename pattern
"""

from __future__ import annotations

import json
import os
import re

import pytest
from pyspark.sql import functions as F

from neo4j_export_tool_spark.operators.graph import nodes_union
from neo4j_export_tool_spark.plans.flagship import documents_kg
from neo4j_export_tool_spark.sources.jsonl_sink import (
    export_jsonl,
    generate_filename,
    with_properties_json,
)

HEX64 = re.compile(r"^[a-f0-9]{64}$")


@pytest.fixture(scope="module")
def export_path(spark, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("export")
    nodes, hashed = documents_kg(spark, sf_dir)
    res = export_jsonl(
        nodes,
        with_properties_json(hashed),
        str(out),
        db_name="flagship",
        warnings=[{"timestamp": "2026-01-01T00:00:00Z", "message": "test warning"}],
    )
    return res


@pytest.fixture(scope="module")
def lines(export_path):
    with open(export_path.path, encoding="utf-8") as f:
        return [json.loads(line) for line in f]


def test_line1_is_metadata(lines):
    meta = lines[0]
    assert meta["format_version"] == "1.0.0"
    assert meta["export_metadata"]["format"]["metadata_line"] == 1
    assert meta["database_statistics"]["nodeCount"] > 0
    assert set(meta["supported_record_types"]) == {
        "node",
        "relationship",
        "error",
        "warning",
    }


def test_counts_match_metadata(lines, export_path):
    meta = lines[0]
    nodes = [r for r in lines if r.get("type") == "node"]
    rels = [r for r in lines if r.get("type") == "relationship"]
    warns = [r for r in lines if r.get("type") == "warning"]
    assert len(nodes) == meta["database_statistics"]["nodeCount"] == export_path.node_count
    assert len(rels) == meta["database_statistics"]["relCount"] == export_path.rel_count
    assert len(warns) == 1
    assert len(lines) == 1 + len(nodes) + len(rels) + len(warns)


def test_section_order_and_offsets(lines):
    meta = lines[0]
    fmt = meta["export_metadata"]["format"]
    types = [r.get("type") for r in lines[1:]]
    n, m = meta["database_statistics"]["nodeCount"], meta["database_statistics"]["relCount"]
    assert all(t == "node" for t in types[:n])
    assert all(t == "relationship" for t in types[n : n + m])
    assert fmt["node_start_line"] == 2
    assert fmt["relationship_start_line"] == 2 + n
    assert fmt["error_start_line"] == 2 + n + m
    assert fmt["warning_start_line"] == 2 + n + m  # zero errors


def test_node_record_schema(lines):
    node = next(r for r in lines if r.get("type") == "node")
    for key in ("type", "element_id", "export_id", "labels", "properties"):
        assert key in node
    assert HEX64.match(node["NET_node_content_hash"])
    assert isinstance(node["labels"], list)
    assert isinstance(node["properties"], dict)
    # key ORDER in the record mirrors the reference writer
    assert list(node.keys())[:2] == ["type", "element_id"]


def test_rel_record_schema(lines):
    rel = next(r for r in lines if r.get("type") == "relationship")
    for key in (
        "type",
        "element_id",
        "export_id",
        "label",
        "start_element_id",
        "end_element_id",
        "properties",
    ):
        assert key in rel
    assert HEX64.match(rel["NET_rel_identity_hash"])
    assert HEX64.match(rel["start_node_content_hash"])
    assert HEX64.match(rel["end_node_content_hash"])


def test_every_record_has_export_id(lines, export_path):
    for r in lines[1:]:
        if r.get("type") in ("node", "relationship"):
            assert r["export_id"] == export_path.export_id


def test_label_stats_manifest(lines):
    meta = lines[0]
    stats = meta["export_manifest"]["file_statistics"]
    by_label = {s["label"]: s for s in stats}
    nodes = [r for r in lines if r.get("type") == "node"]
    n_docs = sum(1 for r in nodes if "Document" in r["labels"])
    assert by_label["Document"]["record_count"] == n_docs
    assert by_label["MENTIONS"]["record_count"] == meta["database_statistics"]["relCount"]
    assert all(s["bytes_written"] > 0 for s in stats)


def test_empty_graph_single_line(spark, tmp_path):
    from neo4j_export_tool_spark.operators.graph import edges_from, nodes_from

    empty = spark.createDataFrame([], "id string, name string")
    nodes = nodes_union(
        nodes_from(
            empty,
            labels=["X"],
            element_id=F.col("id"),
            props={"name": F.col("name")},
        )
    )
    edges = edges_from(
        empty,
        rel_type="R",
        start_element_id=F.col("id"),
        end_element_id=F.col("id"),
        props={},
    ).withColumns(
        {
            "start_node_content_hash": F.col("start_element_id"),
            "end_node_content_hash": F.col("end_element_id"),
        }
    )
    res = export_jsonl(nodes, with_properties_json(edges), str(tmp_path), db_name="empty")
    with open(res.path, encoding="utf-8") as f:
        all_lines = f.readlines()
    assert len(all_lines) == 1
    meta = json.loads(all_lines[0])
    assert meta["database_statistics"]["nodeCount"] == 0


def test_hashed_ids_disabled(spark, sf_dir, tmp_path):
    nodes, hashed = documents_kg(spark, sf_dir)
    res = export_jsonl(
        nodes.limit(5),
        with_properties_json(hashed.limit(5)),
        str(tmp_path),
        db_name="nohash",
        hashed_ids=False,
    )
    with open(res.path, encoding="utf-8") as f:
        recs = [json.loads(line) for line in f][1:]
    for r in recs:
        assert "NET_node_content_hash" not in r
        assert "NET_rel_identity_hash" not in r
        assert "start_node_content_hash" not in r


def test_filename_pattern():
    import time

    name = generate_filename(
        "my-db!with$chars_and_a_long_name", 12, 34, "abcdef1234567890", time.gmtime(0)
    )
    assert re.match(r"^[A-Za-z0-9]{1,20}_\d{8}T\d{6}Z_12n_34r_abcdef12\.jsonl$", name)


def test_dir_mode_scale_path(spark, sf_dir, tmp_path):
    nodes, hashed = documents_kg(spark, sf_dir)
    res = export_jsonl(
        nodes,
        with_properties_json(hashed),
        str(tmp_path / "dir_export"),
        db_name="flagship",
        single_file=False,
    )
    assert os.path.isdir(os.path.join(res.path, "nodes"))
    assert os.path.isdir(os.path.join(res.path, "relationships"))
    with open(os.path.join(res.path, "_metadata.json"), encoding="utf-8") as f:
        meta = json.loads(f.read())
    assert meta["database_statistics"]["nodeCount"] == res.node_count

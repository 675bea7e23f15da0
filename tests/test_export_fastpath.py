"""Byte-parity tests for the JVM record-serialization fast path.

The sink assembles record lines JVM-side (to_json + concat) whenever
properties arrive as contract-final ``properties_json`` bytes; rows whose
strings contain hazard characters fall back to the Python writer.  Every
line, whichever lane produced it, must equal the pure-Python reference
rendering: ``dumps({...head..., "properties": encode_properties(bag)})``.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from neo4j_export_tool_spark.functions.encoding import (
    MAX_LABELS_PER_NODE,
    dumps,
    encode_properties,
)
from neo4j_export_tool_spark.functions.export_json import (
    bag_is_export_fast,
    export_props_json_col,
)
from neo4j_export_tool_spark.operators.graph import nodes_from, nodes_union
from neo4j_export_tool_spark.sources.jsonl_sink import (
    _serialize_nodes,
    _serialize_rels,
)

TRICKY = [
    "plain ascii",
    'quote " and \\ backslash',
    "shorthand \n\t\r\b\f escapes",
    "unicode café über \U0001f600  sep",
    "hazard ctrl \x01\x0b\x1f\x7f chars",
    "",
]


def _py_node_line(eid, labels, bag, chash, export_id):
    rec = {
        "type": "node",
        "element_id": eid,
        "NET_node_content_hash": chash,
        "export_id": export_id,
        "labels": labels,
        "properties": encode_properties(bag),
    }
    return dumps(rec)


def test_node_lines_byte_exact_vs_python(spark):
    df = spark.createDataFrame(
        [(f"doc:{i}", s, i) for i, s in enumerate(TRICKY)],
        "eid string, text string, num long",
    )
    nodes = nodes_from(
        df,
        labels=["Doc"],
        element_id=F.col("eid"),
        props={"text": F.col("text"), "num": F.col("num")},
    )
    union = nodes_union(nodes)
    out = {
        json.loads(r["line"])["element_id"]: r["line"]
        for r in _serialize_nodes(union, "EXP", hashed_ids=True).collect()
    }
    hashes = {
        r["element_id"]: r["content_hash"] for r in union.collect()
    }
    for i, s in enumerate(TRICKY):
        eid = f"doc:{i}"
        expected = _py_node_line(
            eid, ["Doc"], {"text": s, "num": i}, hashes[eid], "EXP"
        )
        assert out[eid] == expected, f"line {i} diverges: {out[eid]!r}"


def test_hazard_in_head_strings_routes_python(spark):
    """element_id with a control char must still render contract bytes."""
    df = spark.createDataFrame(
        [("id\x0bwith\x1fctrl", "v")], "eid string, val string"
    )
    nodes = nodes_union(
        nodes_from(
            df,
            labels=["X"],
            element_id=F.col("eid"),
            props={"val": F.col("val")},
        )
    )
    [row] = _serialize_nodes(nodes, "EXP", hashed_ids=False).collect()
    assert "\\u000b" in row["line"] and "\\u000B" not in row["line"]
    assert json.loads(row["line"])["element_id"] == "id\x0bwith\x1fctrl"


def test_label_validation_and_cap(spark):
    long_label = "L" * 1001
    many = [f"l{i:03d}" for i in range(120)]
    df = spark.createDataFrame([(1,)], "k long")
    nodes = nodes_union(
        nodes_from(
            df,
            labels=F.array(
                F.lit(None).cast("string"), F.lit(long_label), *[F.lit(x) for x in many]
            ),
            element_id=F.lit("n1"),
            props={"k": F.col("k")},
        )
    )
    [row] = _serialize_nodes(nodes, "EXP", hashed_ids=True).collect()
    rec = json.loads(row["line"])
    # cap is silent (reference Seq.truncate, GraphElements.fs:146-148)
    assert len(rec["labels"]) == MAX_LABELS_PER_NODE
    assert rec["labels"][0] == "_invalid_label"  # null label
    assert rec["labels"][1] == "_invalid_label"  # over-long label


def test_rel_lines_byte_exact_vs_python(spark):
    df = spark.createDataFrame(
        [(s, i) for i, s in enumerate(TRICKY)], "text string, num long"
    )
    from neo4j_export_tool_spark.operators.graph import edges_from
    from neo4j_export_tool_spark.sources.jsonl_sink import with_properties_json

    edges = edges_from(
        df,
        rel_type="REL",
        start_element_id=F.concat(F.lit("a:"), F.col("num")),
        end_element_id=F.concat(F.lit("b:"), F.col("num")),
        props={"text": F.col("text"), "num": F.col("num")},
    ).withColumns(
        {
            "start_node_content_hash": F.lit("0" * 64),
            "end_node_content_hash": F.lit("1" * 64),
        }
    )
    rows = _serialize_rels(
        with_properties_json(edges), "EXP", hashed_ids=True
    ).collect()
    by_start = {json.loads(r["line"])["start_element_id"]: r["line"] for r in rows}
    eids = {
        r["start_element_id"]: r["element_id"] for r in edges.collect()
    }
    for i, s in enumerate(TRICKY):
        start = f"a:{i}"
        rec = {
            "type": "relationship",
            "element_id": eids[start],
            "NET_rel_identity_hash": eids[start],
            "export_id": "EXP",
            "label": "REL",
            "start_element_id": start,
            "end_element_id": f"b:{i}",
            "start_node_content_hash": "0" * 64,
            "end_node_content_hash": "1" * 64,
            "properties": encode_properties({"text": s, "num": i}),
        }
        assert by_start[start] == dumps(rec), f"rel {i} diverges"


def test_fractional_bags_route_through_contract_udf(spark):
    """Float property formatting must match the contract (1e-07, not 1.0E-7)."""
    df = spark.createDataFrame([(1e-7, 1.5, float("nan"))], "a double, b double, c double")
    col = export_props_json_col(
        df.select(
            F.struct(
                F.col("a").alias("a"), F.col("b").alias("b"), F.col("c").alias("c")
            ).alias("properties")
        )
    )
    [row] = (
        df.select(
            F.struct(
                F.col("a").alias("a"), F.col("b").alias("b"), F.col("c").alias("c")
            ).alias("properties")
        )
        .select(col.alias("pj"))
        .collect()
    )
    obj = json.loads(row["pj"])
    assert row["pj"] == dumps({"a": 1e-07, "b": 1.5, "c": "NaN"})
    assert obj["c"] == "NaN"


def test_bag_fast_detection(spark):
    from pyspark.sql import types as T

    simple = T.StructType(
        [
            T.StructField("s", T.StringType()),
            T.StructField("i", T.LongType()),
            T.StructField("b", T.BooleanType()),
        ]
    )
    assert bag_is_export_fast(simple)
    with_float = T.StructType([T.StructField("f", T.DoubleType())])
    assert not bag_is_export_fast(with_float)
    nested = T.StructType(
        [T.StructField("a", T.ArrayType(T.StringType()))]
    )
    assert not bag_is_export_fast(nested)
    with_ts = T.StructType([T.StructField("t", T.TimestampType())])
    assert not bag_is_export_fast(with_ts)
    long_key = T.StructType([T.StructField("k" * 1001, T.StringType())])
    assert not bag_is_export_fast(long_key)


def test_typed_bag_via_union_lane_matches_contract(spark):
    """Bags with temporal fields routed through nodes_union must render the
    contract's temporal format (9-digit nanos), not Jackson's timestamp
    string (review finding: to_json stringification lost typed semantics)."""
    import datetime as dt

    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 2, 29, 12, 30, 45, 123456), b"\x00\x01")],
        "id string, ts timestamp_ntz, blob binary",
    )
    nodes = nodes_union(
        nodes_from(
            df,
            labels=["T"],
            element_id=F.col("id"),
            props={"ts": F.col("ts"), "blob": F.col("blob")},
        )
    )
    [row] = nodes.select("properties_json").collect()
    obj = json.loads(row["properties_json"])
    assert obj["ts"] == "2024-02-29T12:30:45.123456000"
    import base64

    assert obj["blob"] == base64.b64encode(b"\x00\x01").decode()


def test_duplicate_struct_field_names_not_fast(spark):
    from pyspark.sql import types as T

    dup = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("k", T.StringType())]
    )
    assert not bag_is_export_fast(dup)


def test_single_file_unsorted_parallel_write(spark, tmp_path):
    """sort_lines=False single-file must not funnel through an orderBy on
    the 2-valued section key; sections still land in order."""
    from neo4j_export_tool_spark.operators.graph import edges_from
    from neo4j_export_tool_spark.sources.jsonl_sink import (
        export_jsonl,
        with_properties_json,
    )

    df = spark.createDataFrame([(i, f"t{i}") for i in range(50)], "k long, t string")
    nodes = nodes_union(
        nodes_from(df, labels=["N"], element_id=F.concat(F.lit("n:"), F.col("k")),
                   props={"t": F.col("t")})
    )
    edges = with_properties_json(
        edges_from(df, rel_type="R", start_element_id=F.concat(F.lit("n:"), F.col("k")),
                   end_element_id=F.concat(F.lit("n:"), F.col("k")),
                   props={}).withColumns(
            {"start_node_content_hash": F.lit("0" * 64),
             "end_node_content_hash": F.lit("1" * 64)})
    )
    res = export_jsonl(nodes, edges, str(tmp_path), db_name="p",
                       sort_lines=False)
    lines = open(res.path).read().splitlines()[1:]  # skip metadata line
    kinds = [json.loads(x)["type"] for x in lines]
    # nodes strictly before relationships
    assert kinds == sorted(kinds, key=lambda k: 0 if k == "node" else 1)
    assert res.node_count == 50 and res.rel_count == 50


def test_typed_bag_int_column_with_nulls_stays_integral(spark):
    """Arrow→pandas coerces int64 columns with nulls to float64; the typed
    lane must restore ints and drop coerced-null NaNs (review finding:
    {'n':5.0} / {'n':'NaN'} corruption)."""
    import datetime as dt

    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1), 5), ("b", dt.datetime(2024, 1, 2), None)],
        "id string, ts timestamp_ntz, n long",
    )
    nodes = nodes_union(
        nodes_from(df, labels=["T"], element_id=F.col("id"),
                   props={"ts": F.col("ts"), "n": F.col("n")})
    )
    got = {r["element_id"]: json.loads(r["properties_json"])
           for r in nodes.select("element_id", "properties_json").collect()}
    assert got["a"]["n"] == 5 and isinstance(got["a"]["n"], int)
    assert "n" not in got["b"]  # null dropped, not "NaN"


def test_duplicate_struct_fields_raise_at_plan_time(spark):
    """Silent last-key-wins data loss is rejected with a clear error."""
    df = spark.createDataFrame([(1, "x")], "a long, b string").select(
        F.struct(F.col("a").alias("k"), F.col("b").alias("k")).alias("properties")
    )
    with pytest.raises(ValueError, match="duplicate struct field names"):
        export_props_json_col(df)


def test_fuzz_byte_parity_over_exotic_strings(spark):
    """300 seeded random strings spanning control chars, all escape
    classes, astral planes, and bidi/zero-width marks — every exported
    line must equal the pure-Python contract rendering."""
    import random

    rng = random.Random(20260816)
    pools = [
        lambda: chr(rng.randrange(0x00, 0x20)),          # C0 controls
        lambda: chr(rng.randrange(0x20, 0x7F)),          # ASCII
        lambda: chr(rng.randrange(0x80, 0x2500)),        # BMP
        lambda: chr(rng.randrange(0x1F300, 0x1F700)),    # astral emoji
        lambda: rng.choice('"\\/​  ‮\x7f'),
    ]
    strings = [
        "".join(rng.choice(pools)() for _ in range(rng.randrange(0, 24)))
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strings)], "num long, text string"
    )
    nodes = nodes_union(
        nodes_from(df, labels=["F"], element_id=F.concat(F.lit("f:"), F.col("num")),
                   props={"text": F.col("text"), "num": F.col("num")})
    )
    rows = _serialize_nodes(nodes, "EXP", hashed_ids=True).collect()
    hashes = {r["element_id"]: r["content_hash"] for r in nodes.collect()}
    got = {json.loads(r["line"])["element_id"]: r["line"] for r in rows}
    assert len(got) == 300
    for i, s in enumerate(strings):
        eid = f"f:{i}"
        expected = _py_node_line(eid, ["F"], {"text": s, "num": i}, hashes[eid], "EXP")
        assert got[eid] == expected, f"fuzz {i}: {s!r}"

"""Nested graph-element serialization goldens.

Ported from the reference's depth-adaptive behavior: modes by depth
(``Context.fs:38-43``: Deep < 5 ≤ Shallow < 8 ≤ Reference), record shapes
(``GraphElements.fs:40-125``), path levels (``Path.fs:161-210``), limits
(``Core/Constants.fs:180-193``), and the integration cases in
``GraphSerializationTests.fs:27-141``.
"""

from __future__ import annotations

from neo4j_export_tool_spark.functions.encoding import (
    MAX_COLLECTION_ITEMS,
    Node,
    Path,
    Relationship,
    dumps,
    encode_properties,
    encode_value,
)

NODE = Node("node:123", ("Person", "Employee"), {"name": "Test Person", "age": 42})
REL = Relationship("rel:456", "KNOWS", "node:123", "node:789", {"since": 2020})


def at_depth(value, depth):
    """Wrap a value in `depth` lists so encode_value sees it at that depth,
    then unwrap the encoded result."""
    v = value
    for _ in range(depth):
        v = [v]
    out = encode_value(v)
    for _ in range(depth):
        assert isinstance(out, list) and len(out) == 1
        out = out[0]
    return out


def test_node_deep_mode():
    # GraphSerializationTests.fs:27-56: top-level node serializes fully
    out = encode_value(NODE)
    assert out == {
        "_type": "embedded_node",
        "element_id": "node:123",
        "labels": ["Person", "Employee"],
        "properties": {"name": "Test Person", "age": 42},
    }
    # field order is part of the contract
    assert list(out) == ["_type", "element_id", "labels", "properties"]


def test_node_shallow_mode_at_depth_5():
    assert at_depth(NODE, 4)["_type"] == "embedded_node"
    out = at_depth(NODE, 5)
    assert out == {
        "_type": "embedded_node_shallow",
        "element_id": "node:123",
        "labels": ["Person", "Employee"],
        "_property_count": 2,
    }


def test_node_reference_mode_at_depth_8():
    assert at_depth(NODE, 7)["_type"] == "embedded_node_shallow"
    out = at_depth(NODE, 8)
    assert out == {
        "_type": "node_reference",
        "element_id": "node:123",
        "_labels": ["Person", "Employee"],
    }
    many = Node("n", tuple(f"L{i}" for i in range(15)))
    assert len(at_depth(many, 8)["_labels"]) == 10  # MaxLabelsInReferenceMode


def test_node_at_depth_limit_is_depth_marker():
    # Engine checks exceedsLimit BEFORE graph-element dispatch
    out = at_depth(NODE, 10)
    assert out["_truncated"] == "depth_limit_exceeded"


def test_relationship_modes():
    deep = encode_value(REL)
    assert deep == {
        "_type": "embedded_relationship",
        "element_id": "rel:456",
        "type": "KNOWS",
        "start_element_id": "node:123",
        "end_element_id": "node:789",
        "properties": {"since": 2020},
    }
    shallow = at_depth(REL, 5)
    assert shallow["_type"] == "embedded_relationship_shallow"
    assert shallow["_property_count"] == 1
    assert shallow["start_element_id"] == "node:123"
    ref = at_depth(REL, 8)
    assert ref == {
        "_type": "relationship_reference",
        "element_id": "rel:456",
        "_type_name": "KNOWS",
    }


def test_nested_node_properties_shift_mode():
    """A node at depth 4 is Deep, but a node inside ITS properties sits at
    depth 5 → Shallow (serializeProperties gets increment depth)."""
    inner = Node("node:inner", ("X",), {"k": 1})
    outer = Node("node:outer", ("Y",), {"child": inner})
    out = at_depth(outer, 4)
    assert out["_type"] == "embedded_node"
    assert out["properties"]["child"]["_type"] == "embedded_node_shallow"


def test_node_in_record_properties_roundtrip():
    """encode_properties (record top level) embeds a Deep node; json bytes
    are stable."""
    props = encode_properties({"manager": NODE})
    s = dumps(props)
    assert '"_type":"embedded_node"' in s
    assert '"element_id":"node:123"' in s


def test_path_full_mode():
    p = Path(
        nodes=(Node("node:1", ("Start",), {"name": "A"}),
               Node("node:2", ("End",), {"name": "B"})),
        relationships=(Relationship("rel:10", "CONNECTED", "node:1", "node:2",
                                    {"weight": 1.5}),),
    )
    out = encode_value(p)
    assert out["_type"] == "path"
    assert out["length"] == 2
    assert out["_serialization_level"] == "Full"
    assert out["nodes"][0]["properties"] == {"name": "A"}
    assert out["relationships"][0]["properties"] == {"weight": 1.5}
    assert out["sequence"] == [
        {"type": "node", "index": 0},
        {"type": "relationship", "index": 0},
        {"type": "node", "index": 1},
    ]


def test_path_compact_and_ids_only_modes():
    def mkpath(n):
        nodes = tuple(
            Node(f"node:{i}", tuple(f"L{j}" for j in range(7)), {"x": i})
            for i in range(n)
        )
        rels = tuple(
            Relationship(f"rel:{i}", "R", f"node:{i}", f"node:{i+1}")
            for i in range(n - 1)
        )
        return Path(nodes, rels)

    compact = encode_value(mkpath(1001))
    assert compact["_serialization_level"] == "Compact"
    assert "properties" not in compact["nodes"][0]
    assert len(compact["nodes"][0]["labels"]) == 5  # MaxLabelsInPathCompact
    assert compact["relationships"][0] == {"element_id": "rel:0", "type": "R"}

    ids_only = encode_value(mkpath(10_001))
    assert ids_only["_serialization_level"] == "IdsOnly"
    assert ids_only["node_element_ids"][0] == "node:0"
    assert ids_only["relationship_element_ids"][0] == "rel:0"
    assert "nodes" not in ids_only


def test_path_too_long_marker():
    nodes = tuple(Node(f"n{i}") for i in range(100_001))
    out = encode_value(Path(nodes, ()))
    assert out == {"_type": "path", "_error": "path_too_long"}


def test_bag_cap_still_applies_in_nested_properties():
    big = {f"k{i:05d}": i for i in range(MAX_COLLECTION_ITEMS + 2)}
    out = encode_value(Node("n", ("L",), big))
    assert out["properties"]["_truncated"] == (
        f"too_many_properties: {MAX_COLLECTION_ITEMS + 2} total"
    )

"""Golden-vector + property tests for the hash/canonicalization kernel.

Golden vectors come from the reference spec
(``/root/reference/docs/Neo4JExportToolID.md:47-63,96-106``) and the
reference's property-based suite
(``Neo4jExport.Tests/Properties/IdGenerationProperties.fs:42-172``):
determinism, 64-hex format, label-order independence, key-order independence,
distinctness, null/empty safety.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from neo4j_export_tool_spark.functions.canonical import (
    canonical_properties,
    node_content_hash,
    node_hash_input,
    rel_hash_input,
    rel_identity_hash,
    sha256_hex,
)

HEX64 = re.compile(r"^[a-f0-9]{64}$")


# --- golden vectors (docs/Neo4JExportToolID.md) ---------------------------

def test_node_hash_input_labels_and_props():
    assert (
        node_hash_input(["Person", "Employee"], {"name": "John", "age": 30})
        == 'node:Employee+Person:{"age":30,"name":"John"}'
    )


def test_node_hash_input_labels_only():
    assert node_hash_input(["Config"], {}) == "node:Config:"
    assert node_hash_input(["Config"], None) == "node:Config:"


def test_node_hash_input_no_labels():
    assert node_hash_input([], {"value": 1}) == 'node::{"value":1}'


def test_rel_hash_input_golden():
    assert (
        rel_hash_input("KNOWS", "123", "456", {"since": 2020})
        == 'rel:KNOWS:123:456:{"since":2020}'
    )


def test_rel_hash_input_neo4j5_element_ids():
    assert (
        rel_hash_input("KNOWS", "4:abc:123", "4:def:456", {"since": 2020})
        == 'rel:KNOWS:4:abc:123:4:def:456:{"since":2020}'
    )


def test_canonicalization_rules():
    # keys sorted, compact, nulls omitted, ints without decimal point
    assert canonical_properties({"b": 1, "a": None, "c": "x"}) == '{"b":1,"c":"x"}'
    assert canonical_properties({}) == ""
    assert canonical_properties(None) == ""
    assert canonical_properties({"only_null": None}) == ""
    assert canonical_properties({"f": 3.14}) == '{"f":3.14}'
    assert canonical_properties({"i": 30}) == '{"i":30}'
    # no HTML escaping, unicode kept raw
    assert canonical_properties({"s": "<a>&'\""}) == '{"s":"<a>&\'\\""}'
    assert canonical_properties({"u": "héllo☕"}) == '{"u":"héllo☕"}'


def test_known_sha256():
    # independently verifiable vector
    assert (
        sha256_hex("node:Config:")
        == "9b872f1ec4d5d1895bd09296a297d6a30f4101d21bf761c7abd01005aa163a31"
    )


# --- properties (port of IdGenerationProperties.fs) ------------------------

label_st = st.lists(st.text(min_size=1, max_size=20), max_size=5)
scalar_st = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=40),
)
props_st = st.dictionaries(st.text(min_size=1, max_size=20), scalar_st, max_size=8)


@settings(max_examples=200, deadline=None)
@given(labels=label_st, props=props_st)
def test_node_hash_deterministic_and_hex(labels, props):
    h1 = node_content_hash(labels, props)
    h2 = node_content_hash(list(labels), dict(props))
    assert h1 == h2
    assert HEX64.match(h1)


@settings(max_examples=200, deadline=None)
@given(labels=st.lists(st.text(min_size=1, max_size=10), min_size=2, max_size=5), props=props_st)
def test_label_order_independence(labels, props):
    assert node_content_hash(labels, props) == node_content_hash(
        list(reversed(labels)), props
    )


@settings(max_examples=200, deadline=None)
@given(props=st.dictionaries(st.text(min_size=1, max_size=10), scalar_st, min_size=2, max_size=8))
def test_key_order_independence(props):
    reordered = dict(reversed(list(props.items())))
    assert canonical_properties(props) == canonical_properties(reordered)


@settings(max_examples=100, deadline=None)
@given(rel_type=st.text(min_size=1, max_size=15), s=st.text(max_size=20), e=st.text(max_size=20), props=props_st)
def test_rel_hash_hex_and_deterministic(rel_type, s, e, props):
    h = rel_identity_hash(rel_type, s, e, props)
    assert HEX64.match(h)
    assert h == rel_identity_hash(rel_type, s, e, dict(props))


def test_distinctness_over_inputs():
    hashes = {node_content_hash(["L"], {"i": i}) for i in range(1000)}
    assert len(hashes) == 1000


def test_null_empty_safety():
    assert HEX64.match(node_content_hash(None, None))
    assert HEX64.match(rel_identity_hash("", "", "", None))

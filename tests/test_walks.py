"""Random-walk corpus tests: closed-form paths, dead-end retirement,
multiplicity, an independent python replay of the md5 hash-argmin
picks, and partitioning independence."""

from __future__ import annotations

import hashlib

import pytest

from neo4j_export_tool_spark.operators.walks import random_walks


def _h60(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)


def _py_walks(edges, walk_len, walks_per_node, salt="walk"):
    adj = {}
    for s, d in set(edges):
        adj.setdefault(str(s), set()).add(str(d))
    out = {}
    for start in adj:
        for i in range(walks_per_node):
            wid = f"{start}#{i}"
            path, cur = [start], start
            for step in range(1, walk_len):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = min(nbrs, key=lambda d: (_h60(f"{salt}:{wid}:{step}:{d}"), d))
                path.append(cur)
            out[wid] = (start, path)
    return out


def _spark_walks(spark, edges, walk_len, walks_per_node, n_parts=None, **kw):
    df = spark.createDataFrame(edges, "s string, d string")
    if n_parts:
        df = df.repartition(n_parts)
    rows = random_walks(df, "s", "d", walk_len=walk_len, walks_per_node=walks_per_node, **kw).collect()
    return {r.walk_id: (r.start, list(r.path)) for r in rows}


def test_single_path_graph_is_followed(spark):
    got = _spark_walks(spark, [("a", "b"), ("b", "c"), ("c", "d")], 4, 1)
    assert got["a#0"] == ("a", ["a", "b", "c", "d"])
    assert got["b#0"] == ("b", ["b", "c", "d"])


def test_dead_end_retires_early(spark):
    got = _spark_walks(spark, [("a", "b")], 5, 1)
    assert got["a#0"] == ("a", ["a", "b"])
    assert set(got) == {"a#0"}  # b has no outgoing edge → no walk from b


def test_walks_per_node_multiplicity_and_divergence(spark):
    edges = [("a", f"n{i}") for i in range(8)] + [(f"n{i}", "a") for i in range(8)]
    got = _spark_walks(spark, edges, 3, 4)
    assert sum(1 for w in got if w.startswith("a#")) == 4
    # different walk ids hash differently → walks from 'a' should not all
    # pick the same first hop (8 neighbors, 4 salted picks)
    firsts = {got[f"a#{i}"][1][1] for i in range(4)}
    assert len(firsts) > 1


def test_matches_python_replay(spark):
    edges = [
        (f"n{i}", f"n{j}")
        for i in range(20)
        for j in range(20)
        if i != j and (i * 23 + j * 7) % 11 < 3
    ]
    got = _spark_walks(spark, edges, 6, 2)
    want = _py_walks(edges, 6, 2)
    assert got == want


def test_partitioning_independent(spark):
    edges = [
        (f"n{i}", f"n{(i * 3 + 1) % 15}")
        for i in range(15)
    ] + [(f"n{i}", f"n{(i * 5 + 2) % 15}") for i in range(15)]
    a = _spark_walks(spark, edges, 5, 2, n_parts=1)
    b = _spark_walks(spark, edges, 5, 2, n_parts=6)
    assert a == b


def test_validation(spark):
    df = spark.createDataFrame([("a", "b")], "s string, d string")
    with pytest.raises(ValueError):
        random_walks(df, "s", "d", walk_len=0)
    with pytest.raises(ValueError):
        random_walks(df, "s", "d", walks_per_node=0)

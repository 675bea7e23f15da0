"""Co-occurrence graph + triangle counting tests.

Tiers: closed-form graphs (K4, C5, bipartite, dirty-input collapse), a
DuckDB twin replaying the canonical-triple definition on a pseudo-random
graph, and an end-to-end mentions → co-occurrence → triangles pipeline
twin (both steps replayed in SQL, integer-exact)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from neo4j_export_tool_spark.operators.triangles import (
    cooccurrence_edges,
    triangle_counts,
)


def _counts(spark, edges):
    df = spark.createDataFrame(edges, "a string, b string")
    return {r.node: r.triangles for r in triangle_counts(df, "a", "b").collect()}


def test_k4_every_node_on_three_triangles(spark):
    nodes = ["a", "b", "c", "d"]
    edges = [(x, y) for i, x in enumerate(nodes) for y in nodes[i + 1 :]]
    assert _counts(spark, edges) == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_cycle_and_bipartite_are_triangle_free(spark):
    c5 = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "a")]
    assert _counts(spark, c5) == {}
    bip = [(f"l{i}", f"r{j}") for i in range(3) for j in range(3)]
    assert _counts(spark, bip) == {}


def test_dirty_input_collapses_to_simple_graph(spark):
    edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
             ("a", "c"), ("a", "a"), ("a", "b")]
    assert _counts(spark, edges) == {"a": 1, "b": 1, "c": 1}


def test_star_plus_triangle_counts_only_the_triangle(spark):
    edges = [("hub", f"s{i}") for i in range(12)]
    edges += [("hub", "p"), ("hub", "q"), ("p", "q")]
    assert _counts(spark, edges) == {"hub": 1, "p": 1, "q": 1}


def test_matches_duckdb_on_pseudorandom_graph(spark):
    edges = [
        (f"n{i}", f"n{j}")
        for i in range(30)
        for j in range(30)
        if i != j and (i * 31 + j * 17) % 7 < 2
    ]
    got = _counts(spark, edges)

    con = duckdb.connect()
    con.register("raw", pd.DataFrame(edges, columns=["a", "b"]))
    want = dict(
        con.execute(
            """
            WITH und AS (
              SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
              FROM raw WHERE a <> b
            ),
            tri AS (
              SELECT e1.u AS a, e1.v AS b, e2.v AS c
              FROM und e1
              JOIN und e2 ON e2.u = e1.v
              JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
            ),
            corners AS (
              SELECT a AS node FROM tri
              UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri
            )
            SELECT node, count(*) AS triangles FROM corners GROUP BY node
            """
        ).fetchall()
    )
    assert got == want
    assert len(want) > 5  # non-vacuous


def _mentions_df(spark):
    rows = []
    for d in range(40):
        for k in range(d % 6 + 2):
            rows.append((f"d{d}", f"c{(d * 13 + k * 29) % 17}"))
    rows.append(("d0", "c1"))  # duplicate mention: must not inflate weight
    return spark.createDataFrame(rows, "doc_id string, concept string")


def test_cooccurrence_weights_match_duckdb(spark):
    m = _mentions_df(spark)
    got = {
        (r.c1, r.c2): r.weight
        for r in cooccurrence_edges(m, "doc_id", "concept").collect()
    }
    con = duckdb.connect()
    con.register("m", m.toPandas())
    want = dict(
        con.execute(
            """
            WITH d AS (SELECT DISTINCT doc_id, concept FROM m)
            SELECT (a.concept, b.concept), count(*)
            FROM d a JOIN d b
              ON a.doc_id = b.doc_id AND a.concept < b.concept
            GROUP BY a.concept, b.concept
            """
        ).fetchall()
    )
    assert got == {tuple(k): v for k, v in want.items()}
    assert len(got) > 10


def test_max_concepts_per_doc_drops_mega_docs(spark):
    rows = [("mega", f"c{i}") for i in range(50)]
    rows += [("d1", "x"), ("d1", "y"), ("d2", "x"), ("d2", "y")]
    m = spark.createDataFrame(rows, "doc_id string, concept string")
    got = {
        (r.c1, r.c2): r.weight
        for r in cooccurrence_edges(
            m, "doc_id", "concept", max_concepts_per_doc=10
        ).collect()
    }
    assert got == {("x", "y"): 2}
    with pytest.raises(ValueError):
        cooccurrence_edges(m, "doc_id", "concept", max_concepts_per_doc=1)


def test_mentions_to_triangles_end_to_end_twin(spark):
    m = _mentions_df(spark)
    edges = cooccurrence_edges(m, "doc_id", "concept")
    got = {r.node: r.triangles for r in triangle_counts(edges, "c1", "c2").collect()}

    con = duckdb.connect()
    con.register("m", m.toPandas())
    want = dict(
        con.execute(
            """
            WITH d AS (SELECT DISTINCT doc_id, concept FROM m),
            und AS (
              SELECT DISTINCT a.concept AS u, b.concept AS v
              FROM d a JOIN d b
                ON a.doc_id = b.doc_id AND a.concept < b.concept
            ),
            tri AS (
              SELECT e1.u AS a, e1.v AS b, e2.v AS c
              FROM und e1
              JOIN und e2 ON e2.u = e1.v
              JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
            ),
            corners AS (
              SELECT a AS node FROM tri
              UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri
            )
            SELECT node, count(*) FROM corners GROUP BY node
            """
        ).fetchall()
    )
    assert got == want
    assert sum(got.values()) % 3 == 0 and got  # 3 corners per triangle


# --------------------------------------------------------------- k-truss


def _py_ktruss(edges, k):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    if k <= 2:
        return und
    need = k - 2
    while True:
        adj = {}
        for u, v in und:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        keep = {
            (u, v)
            for u, v in und
            if len(adj[u] & adj[v]) >= need
        }
        if keep == und:
            return keep
        und = keep


def _spark_ktruss(spark, edges, k, n_parts=None, **kw):
    from neo4j_export_tool_spark.operators.triangles import ktruss

    df = spark.createDataFrame(edges, "a string, b string")
    if n_parts:
        df = df.repartition(n_parts)
    return {(r.u, r.v) for r in ktruss(df, "a", "b", k, **kw).collect()}


def _k4(prefix="k"):
    ns = [f"{prefix}{i}" for i in range(4)]
    return [(x, y) for i, x in enumerate(ns) for y in ns[i + 1:]]


def test_ktruss_closed_forms(spark):
    # K4 is a 4-truss (every edge on 2 triangles); a triangle with a
    # pendant edge: the pendant dies at k=3, the triangle survives
    assert _spark_ktruss(spark, _k4(), 4) == set(_py_ktruss(_k4(), 4))
    assert len(_spark_ktruss(spark, _k4(), 4)) == 6
    tri_pendant = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    assert _spark_ktruss(spark, tri_pendant, 3) == {
        ("a", "b"), ("a", "c"), ("b", "c")
    }
    # K4 is NOT a 5-truss; a square (no triangles) is empty at k=3
    assert _spark_ktruss(spark, _k4(), 5) == set()
    square = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")]
    assert _spark_ktruss(spark, square, 3) == set()
    # k<=2 returns every canonical edge
    assert _spark_ktruss(spark, square, 2) == {
        ("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")
    }


def test_ktruss_cascade_and_twin(spark):
    # two K4s sharing one edge plus a chain of triangles hanging off:
    # peeling the chain must cascade
    edges = _k4("p") + _k4("q") + [("p0", "q0")]
    edges += [("q0", "t1"), ("q1", "t1"), ("t1", "t2"), ("q1", "t2")]
    for k in (3, 4):
        assert _spark_ktruss(spark, edges, k) == _py_ktruss(edges, k)


def test_ktruss_partitioning_and_validation(spark):
    edges = _k4("x") + [("x0", "y"), ("y", "x1")]
    a = _spark_ktruss(spark, edges, 3, n_parts=1)
    b = _spark_ktruss(spark, edges, 3, n_parts=7)
    assert a == b
    import pytest as _pytest

    from neo4j_export_tool_spark.operators.triangles import ktruss

    df = spark.createDataFrame([("a", "b")], "a string, b string")
    with _pytest.raises(ValueError):
        ktruss(df, "a", "b", 0)

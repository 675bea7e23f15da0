"""Transitive-closure tests: closed-form hierarchies, cycle handling,
cost ceilings, a DuckDB recursive-CTE twin on a pseudo-random graph,
and the ancestor-stats rollup."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from neo4j_export_tool_spark.operators.closure import (
    ancestor_stats,
    transitive_closure,
)


def _pairs(spark, edges, **kw):
    df = spark.createDataFrame(edges, "s string, d string")
    rows = transitive_closure(df, "s", "d", **kw).collect()
    return {(r.src, r.dst): r.hops for r in rows}


def test_chain_min_hops(spark):
    got = _pairs(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {
        ("a", "b"): 1, ("b", "c"): 1, ("c", "d"): 1,
        ("a", "c"): 2, ("b", "d"): 2, ("a", "d"): 3,
    }


def test_diamond_takes_shortest_path(spark):
    # a→b→d and a→c→d plus a→d directly: (a,d) must be hops=1.
    got = _pairs(spark, [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("a", "d")])
    assert got[("a", "d")] == 1
    assert got[("b", "d")] == 1 and got[("a", "b")] == 1


def test_two_cycle_closure(spark):
    got = _pairs(spark, [("a", "b"), ("b", "a")])
    assert got == {
        ("a", "b"): 1, ("b", "a"): 1, ("a", "a"): 2, ("b", "b"): 2,
    }


def test_self_loop_is_hops_one(spark):
    got = _pairs(spark, [("a", "a"), ("a", "b")])
    assert got == {("a", "a"): 1, ("a", "b"): 1}


def test_max_hops_ceiling_raises(spark):
    chain = [(f"n{i}", f"n{i+1}") for i in range(6)]
    with pytest.raises(RuntimeError, match="max_hops"):
        _pairs(spark, chain, max_hops=3)
    # exactly deep enough is fine
    assert len(_pairs(spark, chain, max_hops=6)) == 6 * 7 // 2


def test_max_pairs_ceiling_raises(spark):
    chain = [(f"n{i}", f"n{i+1}") for i in range(10)]
    with pytest.raises(RuntimeError, match="max_pairs"):
        _pairs(spark, chain, max_pairs=10)


def test_matches_duckdb_recursive_cte(spark):
    edges = [
        (f"n{i}", f"n{j}")
        for i in range(24)
        for j in range(24)
        if i != j and (i * 37 + j * 13) % 19 < 2
    ]
    got = _pairs(spark, edges)

    con = duckdb.connect()
    con.register("raw", pd.DataFrame(edges, columns=["s", "d"]))
    want = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            """
            WITH RECURSIVE e AS (SELECT DISTINCT s, d FROM raw),
            reach(src, dst, hops) AS (
              SELECT s, d, 1 FROM e
              UNION
              SELECT r.src, e.d, r.hops + 1
              FROM reach r JOIN e ON e.s = r.dst
              WHERE r.hops < 32
            )
            SELECT src, dst, MIN(hops) FROM reach GROUP BY src, dst
            """
        ).fetchall()
    }
    assert got == want


def test_ancestor_stats_chain(spark):
    df = spark.createDataFrame([("a", "b"), ("b", "c")], "s string, d string")
    clo = transitive_closure(df, "s", "d")
    rows = {r.node: r for r in ancestor_stats(clo).collect()}
    assert (rows["a"].n_ancestors, rows["a"].n_descendants, rows["a"].max_down) == (0, 2, 2)
    assert (rows["b"].n_ancestors, rows["b"].n_descendants) == (1, 1)
    assert (rows["c"].n_ancestors, rows["c"].max_up, rows["c"].n_descendants) == (2, 2, 0)

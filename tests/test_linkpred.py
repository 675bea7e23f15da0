"""Link-prediction tests: closed-form scores, existing-edge exclusion,
an independent python twin (ints exact, floats rel 1e-12), hub
ceiling, and partitioning independence (bit-equal floats)."""

from __future__ import annotations

import math

import pytest

from neo4j_export_tool_spark.operators.linkpred import link_prediction_scores


def _py_linkpred(edges, include_existing=False):
    und = set()
    for a, b in edges:
        if a != b:
            und.add((min(a, b), max(a, b)))
    adj: dict[str, set[str]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    nodes = sorted(adj)
    for i, n1 in enumerate(nodes):
        for n2 in nodes[i + 1:]:
            common = adj[n1] & adj[n2]
            if not common:
                continue
            if not include_existing and (n1, n2) in und:
                continue
            dws = sorted(len(adj[w]) for w in common)
            cn = len(common)
            aa = 0.0
            ra = 0.0
            for d in dws:  # same fold order as the Spark sorted fold
                aa += 1.0 / math.log(d)
                ra += 1.0 / d
            out[(n1, n2)] = (
                cn,
                cn / (len(adj[n1]) + len(adj[n2]) - cn),
                aa,
                ra,
            )
    return out


def _spark_linkpred(spark, edges, n_parts=None, **kw):
    df = spark.createDataFrame(edges, "a string, b string")
    if n_parts:
        df = df.repartition(n_parts)
    rows = link_prediction_scores(df, "a", "b", **kw).collect()
    return {
        (r.n1, r.n2): (
            r.common_neighbors,
            r.jaccard,
            r.adamic_adar,
            r.resource_allocation,
        )
        for r in rows
    }


def _assert_close(got, want):
    assert set(got) == set(want)
    for k, (cn, jac, aa, ra) in want.items():
        g = got[k]
        assert g[0] == cn
        assert g[1] == pytest.approx(jac, rel=1e-12)
        assert g[2] == pytest.approx(aa, rel=1e-12)
        assert g[3] == pytest.approx(ra, rel=1e-12)


def test_closed_form_path(spark):
    # path a-b-c: only candidate pair is (a, c) via center b (deg 2)
    got = _spark_linkpred(spark, [("a", "b"), ("b", "c")])
    assert set(got) == {("a", "c")}
    cn, jac, aa, ra = got[("a", "c")]
    assert cn == 1
    assert jac == pytest.approx(1.0, rel=1e-12)  # 1 / (1 + 1 - 1)
    assert aa == pytest.approx(1.0 / math.log(2.0), rel=1e-12)
    assert ra == pytest.approx(0.5, rel=1e-12)


def test_existing_edges_excluded_by_default(spark):
    # triangle a-b-c: every pair is an existing edge → empty candidates
    tri = [("a", "b"), ("b", "c"), ("a", "c")]
    assert _spark_linkpred(spark, tri) == {}
    got = _spark_linkpred(spark, tri, include_existing=True)
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert all(v[0] == 1 for v in got.values())


def test_matches_python_twin(spark):
    edges = [
        (f"n{i:02d}", f"n{j:02d}")
        for i in range(18)
        for j in range(18)
        if i < j and (i * 13 + j * 7) % 6 < 2
    ]
    # reversed duplicates and a self-loop must not change anything
    edges += [(b, a) for a, b in edges[::4]] + [("n01", "n01")]
    for inc in (False, True):
        _assert_close(
            _spark_linkpred(spark, edges, include_existing=inc),
            _py_linkpred(edges, include_existing=inc),
        )


def test_partitioning_independent_bit_equal(spark):
    edges = [(f"n{i}", f"n{(i * 5 + 2) % 17}") for i in range(17)]
    edges = [(a, b) for a, b in edges if a != b]
    a = _spark_linkpred(spark, edges, n_parts=1, include_existing=True)
    b = _spark_linkpred(spark, edges, n_parts=7, include_existing=True)
    assert a == b  # exact ==, including every float bit


def test_center_degree_ceiling(spark):
    star = [("hub", f"leaf{i}") for i in range(6)]
    with pytest.raises(RuntimeError, match="max_center_degree"):
        link_prediction_scores(
            spark.createDataFrame(star, "a string, b string"),
            "a", "b", max_center_degree=5,
        ).collect()
    # at the ceiling it runs
    got = _spark_linkpred(spark, star, max_center_degree=6)
    assert len(got) == 15  # C(6,2) leaf pairs via the hub

"""PMI/NPMI collocation tests: closed form, python twin, min_count
marginal semantics, degenerate NPMI, bit-equal repartitioning."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from neo4j_export_tool_spark.operators.collocations import pmi_scores


def _py_pmi(events, min_count=1):
    events = [(a, b) for a, b in events if a is not None and b is not None]
    n = Counter(events)
    na = Counter(a for a, _ in events)
    nb = Counter(b for _, b in events)
    N = len(events)
    out = {}
    for (a, b), c in n.items():
        if c < min_count:
            continue
        pmi = math.log(c) + math.log(N) - math.log(na[a]) - math.log(nb[b])
        nlp = math.log(N) - math.log(c)
        out[(a, b)] = (c, na[a], nb[b], pmi, pmi / nlp if nlp != 0.0 else None)
    return out


def _spark_pmi(spark, events, n_parts=None, **kw):
    df = spark.createDataFrame(events, "a string, b string")
    if n_parts:
        df = df.repartition(n_parts)
    rows = pmi_scores(df, "a", "b", **kw).collect()
    return {(r.a, r.b): (r.n, r.n_a, r.n_b, r.pmi, r.npmi) for r in rows}


def test_closed_form(spark):
    # 4 events: (x,y) twice, (x,z) once, (w,y) once
    events = [("x", "y"), ("x", "y"), ("x", "z"), ("w", "y")]
    got = _spark_pmi(spark, events)
    n, na, nb, pmi, npmi = got[("x", "y")]
    assert (n, na, nb) == (2, 3, 3)
    want_pmi = math.log(2 * 4 / (3 * 3))
    assert pmi == pytest.approx(want_pmi, rel=1e-12)
    assert npmi == pytest.approx(want_pmi / math.log(4 / 2), rel=1e-12)


def test_matches_python_twin(spark):
    events = [
        (f"a{(i * 7) % 5}", f"b{(i * 11 + 3) % 7}") for i in range(200)
    ] + [(None, "b1"), ("a1", None)]
    for mc in (1, 3):
        got = _spark_pmi(spark, events, min_count=mc)
        want = _py_pmi(events, min_count=mc)
        assert set(got) == set(want)
        for k, (c, na, nb, pmi, npmi) in want.items():
            g = got[k]
            assert g[:3] == (c, na, nb)
            assert g[3] == pytest.approx(pmi, rel=1e-12)
            if npmi is None:
                assert g[4] is None
            else:
                assert g[4] == pytest.approx(npmi, rel=1e-12)


def test_min_count_filters_pairs_but_not_marginals(spark):
    events = [("x", "y"), ("x", "y"), ("x", "z")]
    got = _spark_pmi(spark, events, min_count=2)
    assert set(got) == {("x", "y")}
    # marginal n_a for x must still count the filtered (x, z) event
    assert got[("x", "y")][1] == 3


def test_single_pair_type_npmi_null(spark):
    got = _spark_pmi(spark, [("x", "y"), ("x", "y")])
    n, na, nb, pmi, npmi = got[("x", "y")]
    assert (n, na, nb) == (2, 2, 2)
    assert pmi == pytest.approx(math.log(2 * 2 / (2 * 2)), rel=1e-12)
    assert npmi is None


def test_partitioning_independent_bit_equal(spark):
    events = [(f"a{i % 4}", f"b{(i * 3) % 5}") for i in range(60)]
    a = _spark_pmi(spark, events, n_parts=1)
    b = _spark_pmi(spark, events, n_parts=7)
    assert a == b  # exact ==, including float bits


def test_validation(spark):
    df = spark.createDataFrame([("a", "b")], "a string, b string")
    with pytest.raises(ValueError):
        pmi_scores(df, "a", "b", min_count=0)


def test_precounted_input_matches_raw_events(spark):
    import pyspark.sql.functions as F

    events = [(f"a{(i * 7) % 5}", f"b{(i * 11 + 3) % 7}") for i in range(120)]
    raw = spark.createDataFrame(events, "a string, b string")
    pre = raw.groupBy("a", "b").agg(F.count(F.lit(1)).alias("cnt"))
    got_raw = {
        (r.a, r.b): (r.n, r.n_a, r.n_b, r.pmi, r.npmi)
        for r in pmi_scores(raw, "a", "b", min_count=2).collect()
    }
    got_pre = {
        (r.a, r.b): (r.n, r.n_a, r.n_b, r.pmi, r.npmi)
        for r in pmi_scores(
            pre, "a", "b", min_count=2, count_col="cnt"
        ).collect()
    }
    assert got_raw == got_pre  # exact ==, float bits included

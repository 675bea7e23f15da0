"""TF-IDF keyword tests: python twin, tie determinism, min_df pruning,
bit-equal repartitioning."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from neo4j_export_tool_spark.functions.text import tfidf_keywords


def _py_tfidf(docs, k, min_df=1):
    # tokens_col == split on single space (no lowering, empties kept)
    tf = {d: Counter(t.split(" ")) for d, t in docs if t is not None}
    df_ = Counter(tok for c in tf.values() for tok in c)
    n = sum(1 for _, t in docs if t is not None)
    out = {}
    for d, c in tf.items():
        scored = [
            (tfc * (math.log((n + 1) / (df_[tok] + 1)) + 1.0), tok, tfc)
            for tok, tfc in c.items()
            if df_[tok] >= min_df
        ]
        scored.sort(key=lambda x: (-x[0], x[1]))
        out[d] = [
            (tok, tfc, df_[tok], s, i + 1)
            for i, (s, tok, tfc) in enumerate(scored[:k])
        ]
    return out


def _spark_tfidf(spark, docs, k, n_parts=None, **kw):
    df = spark.createDataFrame(docs, "doc_id string, text string")
    if n_parts:
        df = df.repartition(n_parts)
    rows = tfidf_keywords(df, "doc_id", "text", k=k, **kw).collect()
    out: dict = {}
    for r in sorted(rows, key=lambda r: (r.doc, r.rank)):
        out.setdefault(r.doc, []).append((r.token, r.tf, r.df, r.tfidf, r.rank))
    return out


DOCS = [
    ("d1", "spark shuffle join spark spark"),
    ("d2", "join partition broadcast join"),
    ("d3", "spark partition skew salt salt salt"),
    ("d4", None),
]


def test_matches_python_twin(spark):
    got = _spark_tfidf(spark, DOCS, 3)
    want = _py_tfidf(DOCS, 3)
    assert set(got) == set(want)
    for d in want:
        assert [(t, tf, df_, r) for t, tf, df_, _, r in got[d]] == [
            (t, tf, df_, r) for t, tf, df_, _, r in want[d]
        ]
        for g, w in zip(got[d], want[d]):
            assert g[3] == pytest.approx(w[3], rel=1e-12)


def test_rare_term_beats_common_term(spark):
    got = _spark_tfidf(spark, DOCS, 1)
    # d3's top keyword is 'salt' (tf 3, df 1), not corpus-wide 'spark'
    assert got["d3"][0][0] == "salt"


def test_min_df_prunes(spark):
    got = _spark_tfidf(spark, DOCS, 5, min_df=2)
    for d, kws in got.items():
        assert all(df_ >= 2 for _, _, df_, _, _ in kws)
    assert all(t != "salt" for t, *_ in got.get("d3", []))


def test_partitioning_bit_equal(spark):
    a = _spark_tfidf(spark, DOCS, 3, n_parts=1)
    b = _spark_tfidf(spark, DOCS, 3, n_parts=7)
    assert a == b  # exact ==, float bits included


def test_validation(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    with pytest.raises(ValueError):
        tfidf_keywords(df, "doc_id", "text", k=0)
    with pytest.raises(ValueError):
        tfidf_keywords(df, "doc_id", "text", min_df=0)

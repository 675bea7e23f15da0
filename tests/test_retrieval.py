"""BM25 retrieval tests: closed-form single-term ranking, an
independent python twin on a pseudo-random corpus, tie-break and
query-term dedup semantics, the df ceiling, and
partitioning-independence of the score fold."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from neo4j_export_tool_spark.operators.retrieval import bm25_topk, build_postings


def _py_bm25(docs, queries, k, k1=1.2, b=0.75, max_term_df_frac=None):
    toks = {i: t.split(" ") for i, t in docs}
    tf = {i: Counter(ts) for i, ts in toks.items()}
    dl = {i: len(ts) for i, ts in toks.items()}
    n = len(docs)
    avgdl = sum(dl.values()) / n
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    if max_term_df_frac is not None:
        ceil = max(1, int(max_term_df_frac * n))
        dropped = {t for t, d in df.items() if d > ceil}
    else:
        dropped = set()
    out = {}
    for qid, qt in queries:
        scores = {}
        for d in tf:
            s = 0.0
            for t in sorted(set(qt.split(" "))):
                if t in dropped or t not in tf[d]:
                    continue
                idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                f = tf[d][t]
                s += idf * f * (k1 + 1) / (f + k1 * (1 - b + b * dl[d] / avgdl))
            if s != 0.0:
                scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qid] = ranked
    return out


DOCS = [
    (i, " ".join(f"t{(i * 5 + j * 7) % 13}" for j in range(5 + i % 6)))
    for i in range(30)
]
QUERIES = [(100 + q, f"t{q % 13} t{(q * 3) % 13}") for q in range(8)]


def _spark_bm25(spark, docs, queries, n_parts=None, **kw):
    d = spark.createDataFrame(docs, "id long, text string")
    q = spark.createDataFrame(queries, "qid long, qtext string")
    if n_parts:
        d, q = d.repartition(n_parts), q.repartition(n_parts)
    rows = bm25_topk(
        d, q, doc_id="id", doc_text="text", query_id="qid", query_text="qtext", **kw
    ).collect()
    out = {}
    for r in sorted(rows, key=lambda r: (r.query, r.rank)):
        out.setdefault(r.query, []).append((r.doc, r.score))
    return out


def test_single_term_ranks_by_tf_and_length(spark):
    docs = [(1, "apple apple pear"), (2, "apple pear plum fig"), (3, "pear fig")]
    got = _spark_bm25(spark, docs, [(7, "apple")], k=5)
    # doc 1 has tf=2 and is shorter than doc 2 (tf=1); doc 3 lacks the term.
    assert [d for d, _ in got[7]] == [1, 2]
    want = _py_bm25(docs, [(7, "apple")], k=5)
    for (gd, gs), (wd, ws) in zip(got[7], want[7]):
        assert gd == wd and gs == pytest.approx(ws, rel=1e-12)


def test_matches_python_twin_on_pseudorandom_corpus(spark):
    got = _spark_bm25(spark, DOCS, QUERIES, k=6)
    want = _py_bm25(DOCS, QUERIES, k=6)
    assert set(got) == {q for q, r in want.items() if r}
    for qid in got:
        assert [d for d, _ in got[qid]] == [d for d, _ in want[qid]]
        for (_, gs), (_, ws) in zip(got[qid], want[qid]):
            assert gs == pytest.approx(ws, rel=1e-12)


def test_query_terms_deduplicated(spark):
    docs = [(1, "a b"), (2, "a a b")]
    once = _spark_bm25(spark, docs, [(5, "a")], k=5)
    thrice = _spark_bm25(spark, docs, [(5, "a a a")], k=5)
    assert once == thrice


def test_equal_scores_tie_break_by_doc_asc(spark):
    docs = [(2, "x y"), (1, "x y"), (3, "z z")]
    got = _spark_bm25(spark, docs, [(5, "x")], k=5)
    assert [d for d, _ in got[5]] == [1, 2]
    assert got[5][0][1] == got[5][1][1]


def test_df_ceiling_drops_stop_terms(spark):
    docs = [(i, f"common rare{i % 2}") for i in range(10)]
    got = _spark_bm25(spark, docs, [(5, "common")], k=20, max_term_df_frac=0.5)
    assert got == {}  # 'common' df=10 > 5 → no scored pairs at all
    got2 = _spark_bm25(spark, docs, [(6, "common rare1")], k=20, max_term_df_frac=0.5)
    want2 = _py_bm25(docs, [(6, "common rare1")], k=20, max_term_df_frac=0.5)
    assert [d for d, _ in got2[6]] == [d for d, _ in want2[6]]


def test_scores_partitioning_independent(spark):
    a = _spark_bm25(spark, DOCS, QUERIES, k=6, n_parts=1)
    b = _spark_bm25(spark, DOCS, QUERIES, k=6, n_parts=7)
    assert a == b  # bit-identical doubles


def test_postings_shape(spark):
    d = spark.createDataFrame([(1, "a b a")], "id long, text string")
    rows = {(r.doc, r.term): (r.tf, r.dl) for r in build_postings(d, "id", "text").collect()}
    assert rows == {(1, "a"): (2, 3), (1, "b"): (1, 3)}


def test_empty_corpus_returns_empty_not_crash(spark):
    d = spark.createDataFrame([], "id long, text string")
    q = spark.createDataFrame([(1, "a")], "qid long, qtext string")
    out = bm25_topk(d, q, doc_id="id", doc_text="text",
                    query_id="qid", query_text="qtext", k=5)
    assert out.count() == 0
    assert [f.name for f in out.schema] == ["query", "doc", "score", "rank"]

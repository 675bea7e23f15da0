"""Bigram-LM perplexity scorer tests: a hand-computed closed form, an
independent pure-python twin on a pseudo-random corpus, vocab-cap /
<unk> semantics, short-doc NULLs, and partitioning-independence of the
double fold."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from neo4j_export_tool_spark.operators.lm_score import (
    UNK,
    score_docs,
    train_bigram_lm,
)


def _py_lm(train, score, max_vocab):
    cnt = Counter()
    for _, t in train:
        cnt.update(t.split(" "))
    keep = {w for w, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:max_vocab]}
    vs = len(keep) + 1
    big, ctx = Counter(), Counter()
    for _, t in train:
        toks = [w if w in keep else UNK for w in t.split(" ")]
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] += 1
            ctx[a] += 1
    out = {}
    for i, t in score:
        toks = [w if w in keep else UNK for w in t.split(" ")]
        pairs = list(zip(toks, toks[1:]))
        s = 0.0
        for a, b in pairs:
            s += -math.log((big.get((a, b), 0) + 1) / (ctx.get(a, 0) + vs))
        out[i] = (len(pairs), s if pairs else None)
    return out


def _spark_scores(spark, train, score, max_vocab, n_parts=None):
    tdf = spark.createDataFrame(train, "id long, text string")
    sdf = spark.createDataFrame(score, "id long, text string")
    if n_parts:
        tdf, sdf = tdf.repartition(n_parts), sdf.repartition(n_parts)
    lm = train_bigram_lm(tdf, "text", "id", max_vocab=max_vocab)
    rows = score_docs(sdf, lm, "id", "text").collect()
    return {r.id: (r.n_bigrams, r.sum_neg_logprob) for r in rows}


CORPUS = [
    (i, " ".join(f"w{(i * 7 + j * 3) % 11}" for j in range(4 + i % 5)))
    for i in range(40)
]


def test_closed_form_two_docs(spark):
    train = [(1, "a b a b"), (2, "a c")]
    # vocab = {a, b, c}; V = 4
    # bigrams: (a,b):2 (b,a):1 (a,c):1 → ctx a:3, b:1
    got = _spark_scores(spark, train, [(9, "a b c")], max_vocab=10)
    want = -math.log((2 + 1) / (3 + 4)) - math.log((0 + 1) / (1 + 4))
    assert got[9][0] == 2
    assert got[9][1] == pytest.approx(want, rel=1e-12)


def test_matches_python_twin_on_pseudorandom_corpus(spark):
    got = _spark_scores(spark, CORPUS, CORPUS, max_vocab=7)
    want = _py_lm(CORPUS, CORPUS, max_vocab=7)
    assert set(got) == set(want)
    for i in got:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], rel=1e-12)


def test_vocab_cap_maps_to_unk(spark):
    train = [(1, "x x x y z")]
    lm = train_bigram_lm(
        spark.createDataFrame(train, "id long, text string"), "text", "id", max_vocab=1
    )
    assert {r.term for r in lm.vocab.collect()} == {"x"}
    assert lm.v_smooth == 2
    # bigram stream is x x, x <unk>, <unk> <unk>
    big = {(r.prev, r.next): r.c for r in lm.bigrams.collect()}
    assert big == {("x", "x"): 2, ("x", UNK): 1, (UNK, UNK): 1}


def test_short_doc_scores_null(spark):
    got = _spark_scores(spark, [(1, "a b")], [(2, "solo"), (3, "a b")], max_vocab=5)
    assert got[2] == (0, None)
    assert got[3][0] == 1


def test_fold_is_partitioning_independent(spark):
    a = _spark_scores(spark, CORPUS, CORPUS, max_vocab=7, n_parts=1)
    b = _spark_scores(spark, CORPUS, CORPUS, max_vocab=7, n_parts=7)
    assert a == b  # bit-identical doubles, not approx

"""Learned-BPE correctness: the distributed learner must equal the pure
twin exactly on arbitrary corpora; encoding must round-trip (concat of
tokens == word) and agree with sequential merge application."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from neo4j_export_tool_spark.functions.bpe import (
    _merge_word,
    encode_bpe,
    encode_word_reference,
    learn_bpe,
    learn_bpe_reference,
    seed_corpus_lines,
    seed_word_counts,
)

words_strategy = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=8), min_size=1, max_size=40
)


@given(words=words_strategy)
@settings(max_examples=200, deadline=None)
def test_encode_roundtrip_identity(words):
    """decode(encode(w)) == w for any word and any learned table."""
    counts: dict[str, int] = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    merges = learn_bpe_reference(counts, n_merges=20)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in counts:
        toks = encode_word_reference(w, ranks)
        assert "".join(toks) == w
        assert all(toks)


@given(words=words_strategy)
@settings(max_examples=200, deadline=None)
def test_encode_matches_sequential_merge_application(words):
    """GPT-2-style lowest-rank-first encode == applying the learned merges
    in order (the definition of BPE segmentation)."""
    counts: dict[str, int] = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    merges = learn_bpe_reference(counts, n_merges=20)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in counts:
        seq = tuple(w)
        for pair in merges:
            seq = _merge_word(seq, pair)
        assert encode_word_reference(w, ranks) == list(seq), w


def test_distributed_learner_equals_pure_twin(spark):
    """learn_bpe (split → explode → groupBy → driver merges) must produce
    EXACTLY the pure twin's merge table on a corpus with ties and skew."""
    import random

    rng = random.Random(11)
    vocab = ["alpha", "beta", "gamma", "delta", "banana", "bandana",
             "band", "ban", "an", "anna", "a"]
    lines = [
        " ".join(rng.choices(vocab, k=rng.randint(1, 12))) for _ in range(200)
    ]
    counts: dict[str, int] = {}
    for line in lines:
        for w in line.split():
            counts[w] = counts.get(w, 0) + 1

    df = spark.createDataFrame([(line,) for line in lines], "text string")
    assert learn_bpe(df, n_merges=30) == learn_bpe_reference(counts, 30)


def test_seed_merges_are_stable(spark):
    """The q46 gate's seed learning is deterministic and identical between
    the distributed and pure paths (this is what makes the closed-form
    oracle valid)."""
    seed = spark.createDataFrame(
        [(line,) for line in seed_corpus_lines()], "text string"
    )
    assert learn_bpe(seed, n_merges=24) == learn_bpe_reference(
        seed_word_counts(), 24
    )


def test_encode_bpe_dataframe(spark):
    """Per-doc stats from the distributed encode match a hand computation."""
    merges = learn_bpe_reference(seed_word_counts(), 24)
    ranks = {p: i for i, p in enumerate(merges)}
    docs = [
        (1, "spark window customer"),
        (2, "a"),
        (3, "sort sort merge"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["max_word_tokens"], r["head_tokens"])
        for r in encode_bpe(df, merges).collect()
    }
    for doc_id, text in docs:
        encs = [encode_word_reference(w, ranks) for w in text.split()]
        assert got[doc_id] == (
            sum(len(e) for e in encs),
            max(len(e) for e in encs),
            "|".join(encs[0]),
        )

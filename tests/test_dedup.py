"""Dedup family: exact, Jaccard pairs, MinHash-LSH, SimHash, embedding cosine.

The pages corpus plants near-duplicate docs (same sentences, one filler
swapped), so recall targets are known.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_export_tool_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_fingerprints,
    simhash_pairs,
)
from neo4j_export_tool_spark.sources.synth import pages_spark_df


@pytest.fixture(scope="module")
def pages(spark):
    return pages_spark_df(spark, 250, seed=5, partitions=4).persist()


def test_exact_dedup_groups(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], "id long, text string"
    )
    out = {r["canonical_id"]: r["n_copies"] for r in exact_dedup(df, "text", "id").collect()}
    assert out[1] == 2
    assert out[3] == 1


def test_jaccard_pairs_find_planted_neardups(pages):
    pairs = jaccard_pairs(pages, "text", "url", threshold_pct=60, shingle_n=3)
    got = pairs.collect()
    assert len(got) > 0, "planted near-dups must be found"
    for r in got:
        jac = r["shared"] / (r["n_a"] + r["n_b"] - r["shared"])
        assert jac >= 0.6


def test_minhash_lsh_matches_exact(pages):
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_pairs(pages, "text", "url", threshold_pct=60).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(pages, "text", "url", threshold_pct=60).collect()
    }
    # verified LSH output must equal the exact join (k=64/b=32 → recall ≈ 1)
    assert lsh == exact
    assert len(lsh) > 0


def test_minhash_bucket_cap_subsets_and_prunes(spark, pages):
    """``max_bucket_size`` (the q13 df-cap analog for LSH, round-4 sf1
    knee): capped output must be a SUBSET of the uncapped verified pairs
    (only candidate generation shrinks — verification is unchanged), a
    generous cap must change nothing, and on a corpus with a planted hot
    bucket (many identical docs) a tight cap must actually drop the
    quadratic group while keeping unrelated near-dup pairs."""
    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(pages, "text", "url").collect()
    }
    generous = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(
            pages, "text", "url", max_bucket_size=10_000
        ).collect()
    }
    assert generous == uncapped

    capped = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(pages, "text", "url", max_bucket_size=5).collect()
    }
    assert capped <= uncapped

    # planted hot bucket: 40 identical docs (one 40²-pair bucket in every
    # band) + 2 near-dup docs unique in the corpus
    hot = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(40)]
    pair = [
        (100, "unique snowflake words one two three four five six seven"),
        (101, "unique snowflake words one two three four five six EIGHT"),
    ]
    df = spark.createDataFrame(hot + pair, "doc_id long, text string")
    tight = minhash_lsh_pairs(df, "text", "doc_id", max_bucket_size=5)
    got = {(r["doc_a"], r["doc_b"]) for r in tight.collect()}
    assert (100, 101) in got, "pairs outside hot buckets must survive"
    assert not any(a < 40 and b < 40 for a, b in got), (
        "the hot 40-doc bucket must be skipped under the cap"
    )


def test_simhash_deterministic_and_close_for_neardups(spark, pages):
    fps = simhash_fingerprints(pages, "text", "url")
    again = simhash_fingerprints(pages, "text", "url")
    assert fps.collect() == again.collect()

    pairs = simhash_pairs(pages, "text", "url", max_hamming=6)
    got = pairs.collect()
    assert all(r["hamming"] <= 6 for r in got)
    assert len(got) > 0


def test_embedding_neardup(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    pairs = embedding_neardup_pairs(emb, "embedding", "vec_id", min_cosine=0.5)
    got = pairs.collect()
    for r in got:
        assert r["cosine"] >= 0.5
        assert r["id_a"] < r["id_b"]


def test_stop_shingle_pruning_kills_boilerplate_pairs(spark):
    """Hot-shingle skew: docs sharing ONLY a boilerplate phrase pair up
    without pruning but not with it; genuinely near-duplicate docs survive
    either way.  The pruning is a left-semi join ahead of the posting
    self-join (the O(df²) skew bomb at web scale)."""
    from neo4j_export_tool_spark.operators.dedup import jaccard_pairs

    boiler = "click here to subscribe to our newsletter today and save"
    # one unique token + dominant boilerplate → Jaccard ≈ 0.8 between any two
    uniq = [f"topic{i} " + boiler for i in range(30)]
    # two true near-dups: long shared body, tiny difference
    body = " ".join(f"w{j}" for j in range(40))
    rows = [(i, t) for i, t in enumerate(uniq)]
    rows += [(100, body + " ending one"), (101, body + " ending two")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    unpruned = jaccard_pairs(docs, "text", "doc_id", threshold_pct=60)
    pruned = jaccard_pairs(docs, "text", "doc_id", threshold_pct=60,
                           max_shingle_df=10)
    up = {(r["doc_a"], r["doc_b"]) for r in unpruned.collect()}
    pr = {(r["doc_a"], r["doc_b"]) for r in pruned.collect()}
    assert (100, 101) in up and (100, 101) in pr  # true pair survives
    boiler_pairs_up = {p for p in up if p[0] < 100 and p[1] < 100}
    boiler_pairs_pr = {p for p in pr if p[0] < 100 and p[1] < 100}
    assert boiler_pairs_up, "test corpus should pair on boilerplate unpruned"
    assert not boiler_pairs_pr, "pruning must kill boilerplate-only pairs"
    # plan: pruning is a semi-join before the self-join
    from tests.test_plan_quality import plan_of

    assert "LeftSemi" in plan_of(pruned)


def test_blocked_gemm_equals_codegen_bitexact(spark):
    """The GEMM filter-then-verify path must reproduce the codegen all-pairs
    join EXACTLY — ids and cosine doubles bit-for-bit — including across
    multiple blocks."""
    import random

    from neo4j_export_tool_spark.operators.dedup import embedding_neardup_pairs

    rng = random.Random(7)
    rows = []
    for i in range(120):
        base = [rng.uniform(-1, 1) for _ in range(16)]
        rows.append((i, [float(f"{x:.6g}") for x in base]))
        if i % 3 == 0:  # planted near-dups
            rows.append((1000 + i, [x + rng.uniform(-0.01, 0.01) for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def as_set(out):
        return {(r["id_a"], r["id_b"], r["cosine"]) for r in out.collect()}

    # rows_per_block=50 → 5 blocks → exercises within- AND cross-block paths
    gemm = as_set(embedding_neardup_pairs(
        df, "embedding", "vec_id", min_cosine=0.5, rows_per_block=50))
    exact = as_set(embedding_neardup_pairs(
        df, "embedding", "vec_id", min_cosine=0.5, strategy="codegen"))
    assert gemm == exact
    assert len(gemm) >= 40  # planted pairs actually present


def test_fractional_caps_match_absolute_at_same_n(spark, pages):
    """The scale-safe fractional knobs: at matched N, frac·N resolving to
    the same integer cap must give BIT-IDENTICAL output to the absolute
    form, and the subset/prune semantics carry over (COVERAGE.md §sf1:
    an absolute cap is always wrong at 10^12 docs)."""
    n = pages.count()

    # --- jaccard: frac chosen so floor(frac·N) == 10 on the boilerplate
    # corpus from the stop-shingle test
    boiler = "click here to subscribe to our newsletter today and save"
    uniq = [f"topic{i} " + boiler for i in range(30)]
    body = " ".join(f"w{j}" for j in range(40))
    rows = [(i, t) for i, t in enumerate(uniq)]
    rows += [(100, body + " ending one"), (101, body + " ending two")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    n_docs = 32
    absolute = jaccard_pairs(
        docs, "text", "doc_id", threshold_pct=60, max_shingle_df=10
    )
    frac = jaccard_pairs(
        docs, "text", "doc_id", threshold_pct=60,
        max_shingle_df_frac=10.4 / n_docs,  # floor → 10
    )
    rows_a = sorted(map(tuple, absolute.collect()))
    rows_f = sorted(map(tuple, frac.collect()))
    assert rows_a == rows_f and rows_a

    # --- minhash: same equivalence on the pages corpus
    cap = 5
    abs_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(
            pages, "text", "url", max_bucket_size=cap
        ).collect()
    }
    frac_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(
            pages, "text", "url", max_bucket_frac=(cap + 0.7) / n
        ).collect()
    }
    assert frac_pairs == abs_pairs
    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(pages, "text", "url").collect()
    }
    assert frac_pairs <= uncapped  # prune-only semantics

    # both forms at once is a usage error
    with pytest.raises(ValueError):
        jaccard_pairs(docs, "text", "doc_id", max_shingle_df=5,
                      max_shingle_df_frac=0.1).collect()
    with pytest.raises(ValueError):
        minhash_lsh_pairs(pages, "text", "url", max_bucket_size=5,
                          max_bucket_frac=0.1).collect()


def test_prefix_jaccard_equals_unpruned_exact(spark, pages):
    """PPJoin prefix filtering is EXACT: output equals the unpruned
    posting-self-join jaccard bit-for-bit, including on the boilerplate
    corpus where the df cap (by design) drops pairs."""
    from neo4j_export_tool_spark.operators.dedup import jaccard_pairs_prefix

    unpruned = sorted(
        map(tuple, jaccard_pairs(pages, "text", "url", threshold_pct=60).collect())
    )
    prefix = sorted(
        map(tuple,
            jaccard_pairs_prefix(pages, "text", "url", threshold_pct=60).collect())
    )
    assert prefix == unpruned and prefix

    boiler = "click here to subscribe to our newsletter today and save"
    uniq = [f"topic{i} " + boiler for i in range(30)]
    body = " ".join(f"w{j}" for j in range(40))
    rows = [(i, t) for i, t in enumerate(uniq)]
    rows += [(100, body + " ending one"), (101, body + " ending two")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    up = sorted(map(tuple, jaccard_pairs(docs, "text", "doc_id").collect()))
    pf = sorted(map(tuple, jaccard_pairs_prefix(docs, "text", "doc_id").collect()))
    # prefix filtering keeps the boilerplate-only pairs the df cap drops —
    # it is exact, not a prune
    assert pf == up
    assert any(a < 100 and b < 100 for a, b, *_ in pf)
    # stricter threshold still exact
    up9 = sorted(map(tuple, jaccard_pairs(docs, "text", "doc_id", threshold_pct=90).collect()))
    pf9 = sorted(map(tuple, jaccard_pairs_prefix(docs, "text", "doc_id", threshold_pct=90).collect()))
    assert pf9 == up9

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

"""Deterministic mixture sampling (functions/sampling.py)."""

from __future__ import annotations


def test_hash_sample_nesting_and_determinism(spark):
    """Raising a rate must keep every previously selected row (nested
    samples), and the same call twice returns identical row sets."""
    from neo4j_export_tool_spark.functions.sampling import hash_sample

    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    keep30 = {r["doc_id"] for r in hash_sample(df, "doc_id", 30).collect()}
    keep60 = {r["doc_id"] for r in hash_sample(df, "doc_id", 60).collect()}
    again = {r["doc_id"] for r in hash_sample(df, "doc_id", 30).collect()}
    assert keep30 <= keep60
    assert keep30 == again
    # rate is approximately honored (hash uniformity)
    assert 200 < len(keep30) < 400 and 500 < len(keep60) < 700


def test_hash_sample_salt_independence(spark):
    """Different salts give (near-)independent samples — changing the
    mixture salt reshuffles membership instead of reusing it."""
    from neo4j_export_tool_spark.functions.sampling import hash_sample

    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"] for r in hash_sample(df, "doc_id", 50, salt="a").collect()}
    b = {r["doc_id"] for r in hash_sample(df, "doc_id", 50, salt="b").collect()}
    overlap = len(a & b) / max(len(a), 1)
    assert 0.3 < overlap < 0.7  # ~50% expected for independent halves


def test_scalar_quantize_closed_form(spark):
    """Codes on crafted values: negatives floor toward -inf, extremes
    clamp to [-levels, levels-1]."""
    from neo4j_export_tool_spark.functions.quantize import scalar_quantize

    df = spark.createDataFrame(
        [(1, [0.0, 0.5, -0.5, 0.999, -0.001, 5.0, -5.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {
        r["pos"]: r["code"]
        for r in scalar_quantize(df, "embedding", "vec_id", levels=64).collect()
    }
    assert rows == {0: 0, 1: 32, 2: -32, 3: 63, 4: -1, 5: 63, 6: -64}

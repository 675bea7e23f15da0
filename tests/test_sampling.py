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


# ------------------------------------------------------------- splits


def _py_split(v, splits, salt="split"):
    import hashlib

    h = int(hashlib.md5(f"{salt}:{v}".encode()).hexdigest()[:15], 16) % 1000
    lo = 0
    for name, w in splits.items():
        if h < lo + w:
            return name
        lo += w
    raise AssertionError("unreachable: weights sum to 1000")


def test_assign_splits_matches_python_twin_and_is_total(spark):
    from neo4j_export_tool_spark.functions.sampling import assign_splits

    splits = {"train": 900, "val": 60, "test": 40}
    ids = [(f"doc{i}",) for i in range(2000)]
    df = spark.createDataFrame(ids, "doc_id string")
    got = {
        r.doc_id: r.split
        for r in assign_splits(df, "doc_id", splits).collect()
    }
    assert len(got) == 2000  # total: every row assigned exactly once
    for (v,) in ids:
        assert got[v] == _py_split(v, splits)
    # proportions roughly honored (binomial: 900/60/40 per mille)
    from collections import Counter

    c = Counter(got.values())
    assert 1700 < c["train"] < 1900 and c["val"] > 60 and c["test"] > 30


def test_assign_splits_stable_under_corpus_growth(spark):
    from neo4j_export_tool_spark.functions.sampling import assign_splits

    small = spark.createDataFrame(
        [(f"d{i}",) for i in range(100)], "doc_id string"
    )
    big = spark.createDataFrame(
        [(f"d{i}",) for i in range(300)], "doc_id string"
    )
    a = {r.doc_id: r.split for r in assign_splits(small, "doc_id").collect()}
    b = {r.doc_id: r.split for r in assign_splits(big, "doc_id").collect()}
    assert all(b[k] == v for k, v in a.items())  # no reassignment


def test_assign_splits_zero_shuffle_plan(spark):
    from neo4j_export_tool_spark.functions.sampling import assign_splits

    df = spark.createDataFrame([("a",)], "doc_id string")
    plan = (
        assign_splits(df, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_assign_splits_validation(spark):
    import pytest

    from neo4j_export_tool_spark.functions.sampling import assign_splits

    df = spark.createDataFrame([("a",)], "doc_id string")
    with pytest.raises(ValueError):
        assign_splits(df, "doc_id", {"train": 999})  # sums to 999
    with pytest.raises(ValueError):
        assign_splits(df, "doc_id", {"train": 1001, "val": -1})
    with pytest.raises(ValueError):
        assign_splits(df, "doc_id", {})
    with pytest.raises(ValueError):
        # floats summing to 1000 must be rejected, not silently floored
        assign_splits(df, "doc_id", {"train": 999.5, "val": 0.5})


def test_assign_splits_null_id_raises_in_plan(spark):
    import pytest

    from neo4j_export_tool_spark.functions.sampling import assign_splits

    df = spark.createDataFrame([("a",), (None,)], "doc_id string")
    with pytest.raises(Exception, match="null id"):
        assign_splits(df, "doc_id").collect()

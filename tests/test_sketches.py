"""HLL sketch tests: bit-exact python register twin, mergeability,
duplication/partitioning invariance, estimate accuracy, validation."""

from __future__ import annotations

import hashlib
import math

import pytest

from neo4j_export_tool_spark.operators.sketches import (
    approx_distinct_hll,
    hll_estimate,
    hll_merge,
    hll_registers,
)

HASH_BITS = 60


def _h60(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)


def _py_registers(values, p, salt="hll"):
    m = 1 << p
    regs: dict[int, int] = {}
    for v in values:
        if v is None:
            continue
        h = _h60(f"{salt}:{v}")
        bucket = h % m
        w = h >> p
        rho = (HASH_BITS - p + 1) if w == 0 else (HASH_BITS - p + 1) - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def _spark_registers(spark, values, p, n_parts=None, **kw):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    if n_parts:
        df = df.repartition(n_parts)
    rows = hll_registers(df, "v", p=p, **kw).collect()
    return {r.bucket: r.max_rho for r in rows}


def test_registers_match_python_twin(spark):
    values = [f"item{i}" for i in range(500)] + [None, "item3", "item3"]
    for p in (4, 8, 12):
        assert _spark_registers(spark, values, p) == _py_registers(values, p)


def test_duplication_and_partitioning_invariant(spark):
    values = [f"v{i % 40}" for i in range(400)]  # heavy duplication
    a = _spark_registers(spark, values, 8, n_parts=1)
    b = _spark_registers(spark, values, 8, n_parts=13)
    c = _spark_registers(spark, sorted(set(values)), 8)
    assert a == b == c


def test_merge_equals_sketch_of_union(spark):
    left = [f"a{i}" for i in range(300)]
    right = [f"b{i}" for i in range(300)] + left[:100]
    ldf = spark.createDataFrame([(v,) for v in left], "v string")
    rdf = spark.createDataFrame([(v,) for v in right], "v string")
    merged = {
        r.bucket: r.max_rho
        for r in hll_merge(
            hll_registers(ldf, "v", p=10), hll_registers(rdf, "v", p=10)
        ).collect()
    }
    assert merged == _py_registers(left + right, 10)


def test_estimate_accuracy(spark):
    # p=12 → σ ≈ 1.04/64 ≈ 1.6%; assert within 5σ
    n = 20_000
    df = spark.createDataFrame([(f"doc{i}",) for i in range(n)], "v string")
    est = approx_distinct_hll(df, "v", p=12).collect()[0]
    assert est.estimate == pytest.approx(n, rel=5 * 1.04 / math.sqrt(4096))


def test_small_range_linear_counting(spark):
    # tiny cardinality: linear counting must be near-exact
    df = spark.createDataFrame([(f"x{i}",) for i in range(30)], "v string")
    est = approx_distinct_hll(df, "v", p=12).collect()[0]
    assert est.estimate == pytest.approx(30, abs=2)
    assert est.registers_set <= 30


def test_estimate_deterministic_across_partitionings(spark):
    values = [(f"k{i}",) for i in range(5_000)]
    a = hll_estimate(
        hll_registers(spark.createDataFrame(values, "v string"), "v", p=10),
        p=10,
    ).collect()[0]
    b = hll_estimate(
        hll_registers(
            spark.createDataFrame(values, "v string").repartition(17),
            "v",
            p=10,
        ),
        p=10,
    ).collect()[0]
    assert a.estimate == b.estimate  # exact ==, float bits included


def test_validation(spark):
    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError):
        hll_registers(df, "v", p=3)
    with pytest.raises(ValueError):
        hll_registers(df, "v", p=19)
    with pytest.raises(ValueError):
        hll_merge()

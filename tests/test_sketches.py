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


def test_estimate_p_mismatch_raises_in_plan(spark):
    df = spark.createDataFrame([(f"x{i}",) for i in range(2000)], "v string")
    regs14 = hll_registers(df, "v", p=14)
    with pytest.raises(Exception, match="inconsistent with p"):
        hll_estimate(regs14, p=4).collect()


def test_validation(spark):
    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError):
        hll_registers(df, "v", p=3)
    with pytest.raises(ValueError):
        hll_registers(df, "v", p=19)
    with pytest.raises(ValueError):
        hll_merge()


# ----------------------------------------------------------- count-min


from neo4j_export_tool_spark.operators.sketches import (  # noqa: E402
    cms_counters,
    cms_lookup,
    cms_merge,
)


def _py_cms(values, depth, width, salt="cms"):
    cnt: dict[tuple[int, int], int] = {}
    for v in values:
        if v is None:
            continue
        for i in range(depth):
            cell = (i, _h60(f"{salt}:{i}:{v}") % width)
            cnt[cell] = cnt.get(cell, 0) + 1
    return cnt


def test_cms_counters_match_python_twin(spark):
    values = [f"k{i % 37}" for i in range(300)] + [None]
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = {
        (r.row, r.bucket): r.cnt
        for r in cms_counters(df, "v", depth=3, width=64).collect()
    }
    assert got == _py_cms(values, 3, 64)


def test_cms_lookup_never_underestimates_and_is_exact_when_wide(spark):
    from collections import Counter

    values = [f"k{i % 23}" for i in range(460)]
    true = Counter(values)
    df = spark.createDataFrame([(v,) for v in values], "v string")
    # narrow sketch: est >= true always
    narrow = cms_counters(df, "v", depth=4, width=16)
    probe = spark.createDataFrame([(k,) for k in true], "v string")
    est_n = {
        r.value: r.est
        for r in cms_lookup(narrow, probe, "v", depth=4, width=16).collect()
    }
    assert all(est_n[k] >= c for k, c in true.items())
    # wide sketch: 23 keys in 4096 buckets → collisions vanishingly
    # unlikely with 4 rows; every estimate exact
    wide = cms_counters(df, "v", depth=4, width=4096)
    est_w = {
        r.value: r.est
        for r in cms_lookup(wide, probe, "v", depth=4, width=4096).collect()
    }
    assert est_w == dict(true)


def test_cms_lookup_absent_value_zero_if_no_collisions(spark):
    df = spark.createDataFrame([("a",)], "v string")
    c = cms_counters(df, "v", depth=4, width=4096)
    probe = spark.createDataFrame([("zzz-never-seen",)], "v string")
    got = cms_lookup(c, probe, "v", depth=4, width=4096).collect()
    assert got[0].est == 0


def test_cms_merge_equals_sketch_of_union(spark):
    left = [f"a{i % 7}" for i in range(70)]
    right = [f"b{i % 5}" for i in range(50)] + left[:10]
    ldf = spark.createDataFrame([(v,) for v in left], "v string")
    rdf = spark.createDataFrame([(v,) for v in right], "v string")
    merged = {
        (r.row, r.bucket): r.cnt
        for r in cms_merge(
            cms_counters(ldf, "v", depth=3, width=32),
            cms_counters(rdf, "v", depth=3, width=32),
        ).collect()
    }
    assert merged == _py_cms(left + right, 3, 32)


def test_cms_partitioning_invariant(spark):
    values = [(f"k{i % 11}",) for i in range(220)]
    a = {
        (r.row, r.bucket): r.cnt
        for r in cms_counters(
            spark.createDataFrame(values, "v string"), "v", depth=3, width=32
        ).collect()
    }
    b = {
        (r.row, r.bucket): r.cnt
        for r in cms_counters(
            spark.createDataFrame(values, "v string").repartition(13),
            "v",
            depth=3,
            width=32,
        ).collect()
    }
    assert a == b


def test_cms_validation(spark):
    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError):
        cms_counters(df, "v", depth=0)
    with pytest.raises(ValueError):
        cms_counters(df, "v", width=1)
    with pytest.raises(ValueError):
        cms_merge()


# ------------------------------------------------------- log2 histogram


from neo4j_export_tool_spark.operators.sketches import (  # noqa: E402
    histogram_merge,
    histogram_quantiles,
    log2_histogram,
)


def _py_hist(values):
    h: dict[int, int] = {}
    for v in values:
        iv = int(v)
        b = -1 if iv == 0 else iv.bit_length() - 1
        h[b] = h.get(b, 0) + 1
    return h


def test_hist_matches_python_twin(spark):
    values = [0, 1, 2, 3, 4, 7, 8, 1023, 1024, 5, 5, 0, 2**40]
    df = spark.createDataFrame([(v,) for v in values], "v long")
    got = {r.bucket: r.cnt for r in log2_histogram(df, "v").collect()}
    assert got == _py_hist(values)


def test_hist_doubles_floored_and_merge(spark):
    a = spark.createDataFrame([(0.9,), (1.5,), (2.0,)], "v double")
    b = spark.createDataFrame([(3.99,), (4.0,)], "v double")
    merged = {
        r.bucket: r.cnt
        for r in histogram_merge(
            log2_histogram(a, "v"), log2_histogram(b, "v")
        ).collect()
    }
    assert merged == _py_hist([0, 1, 2, 3, 4])


def test_hist_rejects_negative_and_null_in_plan(spark):
    df = spark.createDataFrame([(1,), (-2,)], "v long")
    with pytest.raises(Exception, match="negative"):
        log2_histogram(df, "v").collect()
    dfn = spark.createDataFrame([(1,), (None,)], "v long")
    with pytest.raises(Exception, match="null or negative"):
        log2_histogram(dfn, "v").collect()


def test_quantile_buckets(spark):
    # 100 values: 50 in bucket 3 ([8,16)), 40 in bucket 6 ([64,128)),
    # 10 in bucket 10 ([1024,2048))
    values = [9] * 50 + [100] * 40 + [2000] * 10
    df = spark.createDataFrame([(v,) for v in values], "v long")
    h = log2_histogram(df, "v")
    got = {
        r.q: (r.bucket, r.lo, r.hi)
        for r in histogram_quantiles(h, [0.5, 0.9, 0.99]).collect()
    }
    assert got[0.5] == (3, 8, 16)      # 50th value is the last of bucket 3
    assert got[0.9] == (6, 64, 128)    # 90th is the last of bucket 6
    assert got[0.99] == (10, 1024, 2048)


def test_quantile_validation_and_partitioning(spark):
    df = spark.createDataFrame([(5,)], "v long")
    h = log2_histogram(df, "v")
    with pytest.raises(ValueError):
        histogram_quantiles(h, [])
    with pytest.raises(ValueError):
        histogram_quantiles(h, [0.0])
    with pytest.raises(ValueError):
        histogram_merge()
    values = [(i % 97 + 1,) for i in range(500)]
    a = {r.bucket: r.cnt for r in log2_histogram(
        spark.createDataFrame(values, "v long"), "v").collect()}
    b = {r.bucket: r.cnt for r in log2_histogram(
        spark.createDataFrame(values, "v long").repartition(13), "v").collect()}
    assert a == b


def test_quantile_top_bucket_hi_clamped(spark):
    # 2^62 lands in bucket 62; hi must clamp to Long.MAX, not overflow
    df = spark.createDataFrame([(1 << 62,)], "v long")
    got = histogram_quantiles(log2_histogram(df, "v"), [1.0]).collect()[0]
    assert got.bucket == 62
    assert got.lo == 1 << 62
    assert got.hi == (1 << 63) - 1


def test_quantile_rejects_truncating_q(spark):
    df = spark.createDataFrame([(5,)], "v long")
    h = log2_histogram(df, "v")
    with pytest.raises(ValueError, match="9 decimal"):
        histogram_quantiles(h, [1 / 3])

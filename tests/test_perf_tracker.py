"""BatchPerformanceTracker trend classification — synthetic timing series
matching the reference's boundaries (``Export/Types.fs:179-208``,
asserted shape per ``PerformanceBaselineTests.fs:96-213``)."""

from __future__ import annotations

from neo4j_export_tool_spark.plans.perf import BatchPerformanceTracker


def feed(durations, sample_every=10):
    t = BatchPerformanceTracker(sample_every=sample_every)
    for d in durations:
        t.record_batch(d)
    return t


def test_insufficient_data_under_three_samples():
    # 29 batches at sample_every=10 → 2 samples
    assert feed([10.0] * 29).performance_trend() == "insufficient_data"
    assert feed([10.0] * 30).performance_trend() == "constant"


def test_constant_trend_keyset_signature():
    # flat timings with jitter within ±20%
    series = [100.0] * 10 + [110.0] * 10 + [95.0] * 10
    assert feed(series).performance_trend() == "constant"


def test_exponential_trend_skip_limit_signature():
    # both first→middle and middle→last ratios > 1.3
    series = [10.0] * 10 + [20.0] * 10 + [40.0] * 10
    assert feed(series).performance_trend() == "exponential"


def test_linear_trend_between_boundaries():
    # first→middle grows 1.35×, middle→last flat → linear
    series = [100.0] * 10 + [135.0] * 10 + [135.0] * 10
    assert feed(series).performance_trend() == "linear"


def test_boundary_ratios_exact():
    # NB: in IEEE float64 abs(1.2 - 1.0) = 0.1999...96 < 0.2, so a ratio of
    # exactly 1.2 still classifies constant — same as the reference's
    # float math; 1.21 is the first clearly-non-constant ratio
    series_12 = [100.0] * 10 + [120.0] * 10 + [120.0] * 20
    assert feed(series_12).performance_trend() == "constant"
    series = [100.0] * 10 + [121.0] * 10 + [121.0] * 20
    assert feed(series).performance_trend() == "linear"
    # ratio exactly 1.3 is NOT > 1.3 → linear, not exponential
    series2 = [100.0] * 10 + [130.0] * 10 + [169.0] * 10
    assert feed(series2).performance_trend() == "linear"


def test_metrics_shape():
    t = feed([10.0, 20.0, 30.0] * 10)
    m = t.metrics()
    assert m["total_batches"] == 30
    assert m["average_batch_time_ms"] == 20.0
    assert m["first_batch_time_ms"] == 10.0
    assert m["last_batch_time_ms"] == 30.0
    assert m["performance_trend"] in {"constant", "linear", "exponential"}
    # 10th batch of the repeating [10,20,30] pattern is series[9] = 10.0
    assert m["sample_timings"][0] == {"batch_number": 10, "time_ms": 10.0}


def test_cc_exposes_round_timings(spark):
    from neo4j_export_tool_spark.operators.components import connected_components

    edges = spark.createDataFrame([(i, i + 1) for i in range(50)], "src long, dst long")
    res = connected_components(edges)
    rt = res.round_timings
    assert rt["strategy"] == "label_propagation"
    assert rt["total_batches"] == res.iterations
    assert len(rt["sample_timings"]) == res.iterations  # sample_every=1

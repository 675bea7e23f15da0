"""As-of and range join tests: closed-form boundary semantics, a DuckDB
native ASOF JOIN twin, a pandas merge_asof twin, deterministic
equal-timestamp resolution, bucket-width independence of the range
join, and the in-plan cost ceiling."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from neo4j_export_tool_spark.operators.temporal import asof_join, range_join_points


def _asof(spark, left, right, **kw):
    l = spark.createDataFrame(left, "k long, ts long, lv long")
    r = spark.createDataFrame(right, "k long, ts long, rv long")
    rows = asof_join(l, r, "k", "ts", ["rv"], **kw).collect()
    return {(x.k, x.ts, x.lv): (x.matched_ts, x.rv) for x in rows}


LEFT = [(i % 5, (i * 13 + 7) % 101, i) for i in range(60)]
RIGHT = [(i % 5, (i * 29 + 3) % 101, 1000 + i) for i in range(40)]
# de-dup (k, ts) on the right so pandas/duckdb twins are unambiguous
RIGHT = list({(k, t): (k, t, v) for k, t, v in RIGHT}.values())


def test_asof_closed_form(spark):
    got = _asof(
        spark,
        [(1, 10, 100), (1, 5, 50), (1, 2, 20), (2, 7, 70)],
        [(1, 10, 1), (1, 3, 2), (2, 99, 3)],
    )
    assert got[(1, 10, 100)] == (10, 1)  # exact-equal ts matches
    assert got[(1, 5, 50)] == (3, 2)
    assert got[(1, 2, 20)] == (None, None)  # nothing at or before
    assert got[(2, 7, 70)] == (None, None)  # right exists only later


def test_asof_tolerance(spark):
    got = _asof(
        spark,
        [(1, 10, 100), (1, 50, 500)],
        [(1, 8, 1)],
        tolerance=5,
    )
    assert got[(1, 10, 100)] == (8, 1)  # within 5
    assert got[(1, 50, 500)] == (None, None)  # 42 ticks stale


def test_asof_equal_ts_right_duplicates_resolve_to_max_payload(spark):
    left = [(1, 10, 100)]
    right = [(1, 10, 7), (1, 10, 9), (1, 10, 3)]
    for parts in (1, 4):
        l = spark.createDataFrame(left, "k long, ts long, lv long").repartition(parts)
        r = spark.createDataFrame(right, "k long, ts long, rv long").repartition(parts)
        rows = asof_join(l, r, "k", "ts", ["rv"]).collect()
        assert [(x.matched_ts, x.rv) for x in rows] == [(10, 9)]


def test_asof_matches_duckdb_native(spark):
    got = _asof(spark, LEFT, RIGHT)
    con = duckdb.connect()
    con.register("l", pd.DataFrame(LEFT, columns=["k", "ts", "lv"]))
    con.register("r", pd.DataFrame(RIGHT, columns=["k", "ts", "rv"]))
    want = {
        (k, ts, lv): (mts, rv)
        for k, ts, lv, mts, rv in con.execute(
            """
            SELECT l.k, l.ts, l.lv, r.ts, r.rv
            FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts
            """
        ).fetchall()
    }
    assert got == want


def test_asof_matches_pandas_merge_asof(spark):
    got = _asof(spark, LEFT, RIGHT, tolerance=20)
    ldf = pd.DataFrame(LEFT, columns=["k", "ts", "lv"]).sort_values("ts", kind="stable")
    rdf = pd.DataFrame(RIGHT, columns=["k", "ts", "rv"]).sort_values("ts", kind="stable")
    m = pd.merge_asof(
        ldf, rdf.rename(columns={"ts": "rts"}), left_on="ts", right_on="rts",
        by="k", direction="backward", tolerance=20,
    )
    want = {
        (int(r.k), int(r.ts), int(r.lv)): (
            None if pd.isna(r.rts) else int(r.rts),
            None if pd.isna(r.rv) else int(r.rv),
        )
        for r in m.itertuples()
    }
    assert got == want


def test_asof_payload_name_collision_raises(spark):
    l = spark.createDataFrame([(1, 1, 1)], "k long, ts long, rv long")
    r = spark.createDataFrame([(1, 1, 1)], "k long, ts long, rv long")
    with pytest.raises(ValueError, match="collide"):
        asof_join(l, r, "k", "ts", ["rv"])


IVALS = [(i % 3, (i * 11) % 50, (i * 11) % 50 + 1 + (i * 7) % 23, i) for i in range(25)]
POINTS = [(i % 3, (i * 17 + 5) % 80, 500 + i) for i in range(50)]


def _range(spark, ivals, points, **kw):
    iv = spark.createDataFrame(ivals, "k long, s long, e long, iid long")
    pt = spark.createDataFrame(points, "k long, ts long, pid long")
    rows = range_join_points(iv, pt, "k", "s", "e", "ts", **kw).collect()
    return {(x.iid, x.pid) for x in rows}


def test_range_half_open_boundaries(spark):
    got = _range(
        spark,
        [(1, 10, 20, 1)],
        [(1, 10, 1), (1, 19, 2), (1, 20, 3), (1, 9, 4), (2, 15, 5)],
        bucket_width=4,
    )
    # start inclusive, end exclusive, key-isolated
    assert got == {(1, 1), (1, 2)}


def test_range_bucket_width_independent(spark):
    results = [
        _range(spark, IVALS, POINTS, bucket_width=w) for w in (1, 7, 1000)
    ]
    assert results[0] == results[1] == results[2]
    con = duckdb.connect()
    con.register("iv", pd.DataFrame(IVALS, columns=["k", "s", "e", "iid"]))
    con.register("pt", pd.DataFrame(POINTS, columns=["k", "ts", "pid"]))
    want = {
        (a, b)
        for a, b in con.execute(
            """
            SELECT iv.iid, pt.pid FROM iv JOIN pt
            ON iv.k = pt.k AND pt.ts >= iv.s AND pt.ts < iv.e
            """
        ).fetchall()
    }
    assert results[0] == want


def test_range_empty_intervals_dropped(spark):
    got = _range(spark, [(1, 10, 10, 1), (1, 12, 11, 2)], [(1, 10, 1)])
    assert got == set()


def test_range_ceiling_raises_in_plan(spark):
    with pytest.raises(Exception, match="max_buckets_per_interval"):
        _range(
            spark,
            [(1, 0, 10_000, 1)],
            [(1, 5, 1)],
            bucket_width=1,
            max_buckets_per_interval=100,
        )


# ------------------------------------------------------- interval overlap


LIV = [(i % 3, (i * 11) % 50, (i * 11) % 50 + 1 + (i * 7) % 23, i) for i in range(25)]
RIV = [(i % 3, (i * 13 + 4) % 60, (i * 13 + 4) % 60 + 1 + (i * 5) % 17, 500 + i) for i in range(30)]


def _overlap(spark, livals, rivals, **kw):
    from neo4j_export_tool_spark.operators.temporal import interval_overlap_join

    lf = spark.createDataFrame(livals, "k long, ls long, le long, lid long")
    rf = spark.createDataFrame(rivals, "k long, rs long, re long, rid long")
    rows = interval_overlap_join(
        lf, rf, "k", "ls", "le", "rs", "re", **kw
    ).collect()
    out = [(x.lid, x.rid) for x in rows]
    assert len(out) == len(set(out)), "canonical-bucket filter must dedupe"
    return set(out)


def test_overlap_half_open_semantics(spark):
    got = _overlap(
        spark,
        [(1, 10, 20, 1)],
        [
            (1, 20, 30, 501),  # touching at 20 → no overlap (half-open)
            (1, 19, 25, 502),  # one-instant overlap [19, 20)
            (1, 0, 10, 503),   # touching at 10 → no overlap
            (1, 12, 14, 504),  # contained
            (1, 0, 100, 505),  # containing
            (2, 12, 14, 506),  # other key
        ],
        bucket_width=4,
    )
    assert got == {(1, 502), (1, 504), (1, 505)}


def test_overlap_bucket_width_independent_and_matches_duckdb(spark):
    results = [
        _overlap(spark, LIV, RIV, bucket_width=w) for w in (1, 7, 1000)
    ]
    assert results[0] == results[1] == results[2]
    con = duckdb.connect()
    con.register("liv", pd.DataFrame(LIV, columns=["k", "ls", "le", "lid"]))
    con.register("riv", pd.DataFrame(RIV, columns=["k", "rs", "re", "rid"]))
    want = {
        (a, b)
        for a, b in con.execute(
            """
            SELECT liv.lid, riv.rid FROM liv JOIN riv
            ON liv.k = riv.k AND liv.ls < riv.re AND riv.rs < liv.le
            """
        ).fetchall()
    }
    assert results[0] == want


def test_overlap_empty_and_collision_validation(spark):
    got = _overlap(spark, [(1, 10, 10, 1)], [(1, 0, 100, 501)])
    assert got == set()
    from neo4j_export_tool_spark.operators.temporal import interval_overlap_join

    lf = spark.createDataFrame([(1, 0, 1, 1)], "k long, s long, e long, lid long")
    rf = spark.createDataFrame([(1, 0, 1, 1)], "k long, s long, e long, rid long")
    with pytest.raises(ValueError, match="collision"):
        interval_overlap_join(lf, rf, "k", "s", "e", "s", "e")
    with pytest.raises(ValueError):
        interval_overlap_join(lf, rf, "k", "s", "e", "s", "e", bucket_width=0)


def test_overlap_ceiling_raises_in_plan(spark):
    with pytest.raises(Exception, match="max_buckets_per_interval"):
        _overlap(
            spark,
            [(1, 0, 10_000, 1)],
            [(1, 5, 6, 501)],
            bucket_width=1,
            max_buckets_per_interval=100,
        )

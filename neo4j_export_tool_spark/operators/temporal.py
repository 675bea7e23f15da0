"""As-of and range joins over event streams.

Two joins Spark's optimizer has no native operator for (the reference
engine has no joins at all beyond its node-hash lookup — SURVEY.md
§2.3), both essential to temporal KG construction: "which was the
latest profile/version as of this event" (as-of) and "which events fall
inside this validity interval" (range).

As-of join — the UNION + window formulation, not a join at all:

    tag left rows 0, right rows 1; union; one shuffle partitioned by
    key, sorted by (ts, tag desc, right-tiebreak); running
    last_value(right payload, ignorenulls) gives every left row the
    most recent right row with right.ts <= left.ts.

One shuffle of |L|+|R| rows, zero candidate explosion, no skew beyond
the key's own — the scale-optimal shape (an inequality join would
otherwise be a cartesian per key).  Rows tie on timestamp: a right row
at exactly left.ts MATCHES (the standard as-of contract); multiple
right rows at the same (key, ts) resolve to a deterministic winner
(max by the right ORDER column, then payload) so output never depends
on shuffle order.

Range join — bucket-expansion equi-join:

    intervals explode into the fixed-width buckets they cover; points
    map to one bucket; equi-join on (key, bucket); exact predicate
    re-filter; per-pair dedup is free because a point lands in exactly
    one bucket.

Bucket width trades fan-out (long intervals explode into many buckets)
against candidate density; ``max_buckets_per_interval`` is the explicit
ceiling against degenerate intervals (raise, never truncate silently).
Both joins are exact; DuckDB twins in tests/test_temporal.py (native
ASOF JOIN + inequality join) pin them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    payload_cols: list[str],
    tolerance: int | None = None,
) -> DataFrame:
    """Left as-of join: every left row + the latest right payload at or
    before its timestamp (NULL payload when none exists).

    ``ts_col`` must be numeric (epoch seconds/micros) in both inputs —
    cast timestamps up front; ``tolerance`` (same unit) drops matches
    older than ``left.ts - tolerance``, the pandas ``merge_asof``
    contract.  Output = all left columns + ``payload_cols`` +
    ``matched_ts``.
    """
    if tolerance is not None and tolerance < 0:
        raise ValueError("tolerance must be >= 0")
    lcols = left.columns
    clash = set(payload_cols) & set(lcols)
    if clash:
        raise ValueError(f"payload columns collide with left columns: {sorted(clash)}")

    # The right row travels as ONE struct so the window fold picks a
    # consistent whole row — per-column last(ignorenulls) would splice
    # fields from different right rows whenever a payload field is NULL.
    r_pay = F.struct(
        F.col(ts_col).cast("long").alias("matched_ts"),
        *[F.col(c) for c in payload_cols],
    )
    r_tag = right.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).cast("long").alias("_ts"),
        F.lit(1).alias("_side"),
        r_pay.alias("_pay"),
    )
    l_tag = left.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).cast("long").alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(r_tag.schema["_pay"].dataType).alias("_pay"),
        F.struct(*lcols).alias("_lrow"),
    )
    r_tag = r_tag.withColumn(
        "_lrow", F.lit(None).cast(l_tag.schema["_lrow"].dataType)
    )
    u = l_tag.unionByName(r_tag)

    # Right rows sort BEFORE the left rows they may serve at equal ts
    # (_side desc); equal-(key, ts) right rows order by the payload
    # struct, so the LAST right row in window order is a unique winner
    # regardless of partitioning.
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_ts"), F.desc("_side"), F.asc("_pay"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    served = u.select(
        "_side",
        "_lrow",
        "_ts",
        F.last("_pay", ignorenulls=True).over(w).alias("_hit"),
    ).where(F.col("_side") == 0)

    if tolerance is not None:
        in_tol = F.col("_hit.matched_ts") >= F.col("_ts") - F.lit(tolerance)
        served = served.withColumn("_hit", F.when(in_tol, F.col("_hit")))
    return served.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in lcols],
        F.col("_hit.matched_ts").alias("matched_ts"),
        *[F.col(f"_hit.{c}").alias(c) for c in payload_cols],
    )


def range_join_points(
    intervals: DataFrame,
    points: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    ts_col: str,
    bucket_width: int = 3600,
    max_buckets_per_interval: int = 100_000,
) -> DataFrame:
    """Inner join: interval rows × point rows with
    ``start <= ts < end`` and equal keys (half-open, the validity-
    interval convention).  All three columns numeric (epoch units).

    Shape: intervals explode into the fixed-width buckets they cover;
    points land in exactly one bucket; equi-join on (key, bucket); the
    exact predicate prunes bucket-edge false candidates.  No dedup agg
    is needed — each (interval, point) pair meets in exactly one bucket.
    Output = all interval columns + all point columns (names must not
    collide, except ``key_col`` which is emitted once).
    """
    if bucket_width < 1:
        raise ValueError("bucket_width must be >= 1")
    shared = (set(intervals.columns) & set(points.columns)) - {key_col}
    if shared:
        raise ValueError(f"column collision between sides: {sorted(shared)}")

    # The ceiling rides INSIDE the exploded expression (assert_true
    # guarding the sequence) — enforced during the same scan that
    # explodes the buckets, unprunable because the result depends on it.
    iv_b = _bucketed(
        intervals, start_col, end_col, bucket_width, max_buckets_per_interval
    )
    # ts must be an integer epoch like the interval bounds (_bucketed):
    # a negative fractional ts truncates toward zero and lands one bucket
    # high, silently missing its interval; nulls stay null (dropped by
    # the inner join, as before)
    _ts_chk = F.assert_true(
        F.col(ts_col).isNull()
        | (F.col(ts_col) == F.col(ts_col).cast("long")),
        F.lit("range_join_points: ts must be integer epochs"),
    )
    pt_b = points.withColumn(
        "_bucket",
        F.when(
            _ts_chk.isNull(),
            F.floor(F.col(ts_col).cast("long") / F.lit(bucket_width)),
        ),
    )
    joined = iv_b.join(pt_b, [key_col, "_bucket"]).where(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("_bucket")


def _bucketed(df: DataFrame, start_col: str, end_col: str,
              bucket_width: int, max_buckets: int) -> DataFrame:
    """Explode valid (end > start) intervals into their covered
    fixed-width buckets, ceiling enforced in-plan (range_join_points
    convention).

    Bounds must be INTEGER epochs, asserted in-plan: the bucket ladder
    works on cast("long")-truncated values while the overlap predicate is
    exact, so a fractional bound (e.g. [5.5, 6.5) vs [6.4, 7.0) at
    bucket_width 1) could land a genuinely overlapping pair in disjoint
    buckets and silently drop it (r6 advice item) — reject instead."""
    n_buckets = (
        F.floor((F.col(end_col).cast("long") - F.lit(1)) / F.lit(bucket_width))
        - F.floor(F.col(start_col).cast("long") / F.lit(bucket_width))
        + F.lit(1)
    )
    chk = F.assert_true(
        (F.col(start_col) == F.col(start_col).cast("long"))
        & (F.col(end_col) == F.col(end_col).cast("long"))
        & (n_buckets <= F.lit(max_buckets)),
        F.lit(
            "interval bounds must be integer epochs (fractional bounds "
            "would truncate out of their bucket and silently drop "
            "overlaps) and cover at most max_buckets_per_interval="
            f"{max_buckets} buckets; widen bucket_width to cut bucket "
            "counts"
        ),
    )
    seq = F.sequence(
        F.floor(F.col(start_col).cast("long") / F.lit(bucket_width)),
        F.floor((F.col(end_col).cast("long") - F.lit(1)) / F.lit(bucket_width)),
    )
    return df.where(F.col(end_col) > F.col(start_col)).select(
        "*",
        F.explode(F.when(chk.isNull(), seq)).alias("_bucket"),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width: int = 3600,
    max_buckets_per_interval: int = 100_000,
) -> DataFrame:
    """Inner join: left interval rows × right interval rows with equal
    keys whose half-open intervals OVERLAP (``l_start < r_end`` and
    ``r_start < l_end``) — the temporal-KG validity-intersection join.
    All four bound columns numeric (epoch units); merely touching
    intervals ([0,5) and [5,9)) do NOT overlap.

    Shape: BOTH sides explode into their covered fixed-width buckets
    and equi-join on (key, bucket).  An overlapping pair shares every
    bucket the intersection covers, so naive expansion would duplicate
    it — instead each pair is kept only in its CANONICAL bucket, the
    one containing ``greatest(l_start, r_start)`` (the intersection's
    first instant, covered by both sides by definition).  Exact
    predicate + canonical-bucket filter, zero dedup aggregation — the
    ``range_join_points`` discipline extended to interval×interval.
    The per-interval bucket ceiling rides in-plan via ``assert_true``
    on both sides.  Output = all left + all right columns (names must
    not collide, except ``key_col`` which is emitted once).
    """
    if bucket_width < 1:
        raise ValueError("bucket_width must be >= 1")
    shared = (set(left.columns) & set(right.columns)) - {key_col}
    if shared:
        raise ValueError(f"column collision between sides: {sorted(shared)}")
    lb = _bucketed(left, l_start, l_end, bucket_width, max_buckets_per_interval)
    rb = _bucketed(right, r_start, r_end, bucket_width, max_buckets_per_interval)
    joined = (
        lb.join(rb, [key_col, "_bucket"])
        .where(
            (F.col(l_start) < F.col(r_end)) & (F.col(r_start) < F.col(l_end))
        )
        .where(
            F.col("_bucket")
            == F.floor(
                F.greatest(
                    F.col(l_start).cast("long"), F.col(r_start).cast("long")
                )
                / F.lit(bucket_width)
            )
        )
    )
    return joined.drop("_bucket")

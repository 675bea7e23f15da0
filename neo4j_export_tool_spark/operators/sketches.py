"""Deterministic mergeable sketches: HyperLogLog (distinct counts)
and count-min (point frequencies).

Exact distinct counts (`groupBy`/`count_distinct`) shuffle every
distinct value; at 10^12 documents a cardinality probe should instead
ship a FIXED-SIZE mergeable register table per partition — that is
HyperLogLog (Flajolet et al. 2007).  Spark's built-in
``approx_count_distinct`` is HLL too, but its registers are opaque and
engine-private: they cannot be stored next to a data card, merged
across engines, or verified.  This implementation keeps the registers
as a first-class (bucket, max_rho) DataFrame in EXACT int64 arithmetic
on the portable 60-bit md5 hash (`functions/similarity.py` — the
repo-wide determinism convention), so an independent python replay
reproduces every register bit-for-bit and sketches built anywhere
merge by a plain ``max``.

Register math, all integer: for h = 60-bit md5 of the value,
``bucket = h mod 2^p`` and ``rho`` = 1 + number of leading zero bits
of the remaining ``60 - p`` bits.  The bit length of the remainder is
computed via ``length(conv(w, 10, 2))`` — a string trick, but exact
for every int64, where ``floor(log2(w))`` through doubles is wrong at
2^k boundaries.  The estimate (the only floats, a pure per-sketch
function of the registers) uses the standard alpha_m bias correction
plus linear counting below 2.5·m — deterministic because the register
sum folds over a bucket-sorted array, never a shuffle-ordered SUM.

Scale shape: one projection + one (bucket) max agg — 2^p rows out,
regardless of input size.  Merging s sketches = union + the same max
agg.  Registers for empty buckets are absent (implicitly 0); the
estimator accounts for them via ``m - |present|``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neo4j_export_tool_spark.functions.similarity import shingle_hash_col

_HASH_BITS = 60


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def register_cols(value, p: int, salt: str):
    """(bucket, rho) register columns for a value expression — THE
    shared HLL register math (also consumed by `operators/anf.py`).

    bucket = low p bits of the 60-bit md5; rho = 1 + leading zeros of
    the remaining bits.  Two exactness traps live here, once:
    ``shiftright`` not ``/`` (double division loses bits above 2^53),
    and bit length via ``length(conv(w, 10, 2))`` (float log2 misrounds
    at 2^k boundaries)."""
    m = 1 << p
    h = shingle_hash_col(F.concat(F.lit(salt + ":"), value.cast("string")))
    w = F.shiftright(h, p)
    bit_len = F.length(F.conv(w, 10, 2))
    rho = F.when(w == 0, F.lit(_HASH_BITS - p + 1)).otherwise(
        F.lit(_HASH_BITS - p + 1) - bit_len
    )
    return (h % F.lit(m)).cast("long"), rho.cast("long")


def estimate_over_regs(sorted_regs, n_set, m: int):
    """HLL size estimate from a bucket-sorted array of (bucket, max_rho)
    structs plus the set-register count — the raw alpha_m correction
    with the linear-counting switch below 2.5·m (shared with
    `operators/anf.py`; the float fold order is the sorted array's, so
    the estimate is a pure function of the registers)."""
    total = F.aggregate(
        sorted_regs,
        F.lit(0.0),
        lambda acc, r: acc + F.pow(F.lit(2.0), -r["max_rho"]),
    )
    zeros = (F.lit(m) - n_set).cast("double")
    raw = F.lit(_alpha(m) * m * m) / (total + zeros)
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    return F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), linear).otherwise(raw)


def hll_registers(
    df: DataFrame, col: str, p: int = 12, salt: str = "hll"
) -> DataFrame:
    """(bucket, max_rho) HLL register table for the values of ``col``
    (nulls ignored; values hashed via their canonical string form).
    ``p`` ∈ [4, 18]: 2^p registers, relative error ≈ 1.04/√(2^p).
    Buckets that saw no value are ABSENT (register 0 by convention).
    Output is a pure function of (value set, p, salt) — independent of
    row order, duplication, and partitioning (max is idempotent).
    """
    if not 4 <= p <= 18:
        raise ValueError("p must be in [4, 18]")
    bucket, rho = register_cols(F.col(col), p, salt)
    return (
        df.where(F.col(col).isNotNull())
        .select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(*register_dfs: DataFrame) -> DataFrame:
    """Merge sketches built with the same (p, salt): union + max.
    The result is bit-identical to sketching the unioned inputs."""
    if not register_dfs:
        raise ValueError("need at least one register table")
    out = register_dfs[0]
    for r in register_dfs[1:]:
        out = out.unionByName(r)
    return out.groupBy("bucket").agg(F.max("max_rho").alias("max_rho"))


def hll_estimate(registers: DataFrame, p: int = 12) -> DataFrame:
    """One-row (estimate double, registers_set long) from a register
    table.  Standard HLL estimator: alpha_m·m²/Σ2^-M_j with linear
    counting below 2.5·m when empty registers exist.  The float sum
    folds over a bucket-sorted register array, so the estimate is a
    deterministic pure function of the registers.
    """
    if not 4 <= p <= 18:
        raise ValueError("p must be in [4, 18]")
    m = 1 << p
    agg = registers.agg(
        F.sort_array(
            F.collect_list(F.struct("bucket", "max_rho"))
        ).alias("_regs")
    ).select(
        F.col("_regs"),
        F.size("_regs").alias("registers_set"),
        F.coalesce(
            F.array_max(F.transform("_regs", lambda r: r["max_rho"])),
            F.lit(0),
        ).alias("_max_rho"),
    )
    # a register table built with a different p would silently produce
    # garbage (registers_set > m → negative zeros); enforce consistency
    # in-plan on the single aggregated row
    chk = F.assert_true(
        (F.col("registers_set") <= F.lit(m))
        & (F.col("_max_rho") <= F.lit(_HASH_BITS - p + 1)),
        F.lit(
            f"hll_estimate: register table inconsistent with p={p} "
            "(built with a different precision?)"
        ),
    )
    est = estimate_over_regs(
        F.col("_regs"),
        # the consistency assert rides inside the used expression
        F.when(chk.isNull(), F.col("registers_set")),
        m,
    )
    return agg.select(est.alias("estimate"), "registers_set")


def approx_distinct_hll(
    df: DataFrame, col: str, p: int = 12, salt: str = "hll"
) -> DataFrame:
    """Convenience: registers + estimate in one call (one agg pipeline,
    2^p intermediate rows)."""
    return hll_estimate(hll_registers(df, col, p=p, salt=salt), p=p)


# ----------------------------------------------------------- count-min


def _cms_cells(col: str, depth: int, width: int, salt: str):
    """array<struct<row, bucket>> — the depth addressed cells of a value
    (row i's hash = 60-bit md5 of salt:i:value)."""
    if depth < 1 or depth > 16:
        raise ValueError("depth must be in [1, 16]")
    if width < 2:
        raise ValueError("width must be >= 2")
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (
                    shingle_hash_col(
                        F.concat(
                            F.lit(f"{salt}:{i}:"), F.col(col).cast("string")
                        )
                    )
                    % F.lit(width)
                ).cast("long").alias("bucket"),
            )
            for i in range(depth)
        ]
    )



def cms_counters(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 2048,
    salt: str = "cms",
) -> DataFrame:
    """(row, bucket, cnt) count-min sketch counters (Cormode &
    Muthukrishnan 2005) for the values of ``col`` (nulls ignored) —
    the fixed-size mergeable FREQUENCY probe: point-lookup estimates
    never underestimate, overestimate by ≤ e·N/width with probability
    1 - e^-depth.  The practical 100 TB use is hot-key detection
    feeding the salting operator without a full groupBy of the key
    column.

    Row i's hash is the 60-bit md5 of ``salt:i:value`` — independent
    salted hashes, the repo-wide determinism convention, so counters
    are exact int64 counts reproducible by a python replay.  Shape:
    one projection exploding each input row into ``depth`` (row,
    bucket) cells + one keyed sum — ≤ depth·width rows out regardless
    of input size.  Merging sketches = union + sum (``cms_merge``).
    Empty cells are absent (count 0).
    """
    cells = _cms_cells(col, depth, width, salt)
    return (
        df.where(F.col(col).isNotNull())
        .select(F.explode(cells).alias("_c"))
        .select(F.col("_c.row").alias("row"), F.col("_c.bucket").alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*counter_dfs: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width, salt):
    union + sum — bit-identical to sketching the unioned inputs."""
    if not counter_dfs:
        raise ValueError("need at least one counter table")
    out = counter_dfs[0]
    for c in counter_dfs[1:]:
        out = out.unionByName(c)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_lookup(
    counters: DataFrame,
    values: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 2048,
    salt: str = "cms",
) -> DataFrame:
    """(value, est) point-frequency estimates for the rows of
    ``values[col]``: est = min over sketch rows of the addressed
    counter (0 if any addressed cell is empty).  est >= true count
    always.  One explode + one equi-join on (row, bucket) + one keyed
    min — the probe set is usually tiny, so AQE broadcasts it.
    """
    cells = _cms_cells(col, depth, width, salt)
    probes = (
        values.where(F.col(col).isNotNull())
        .select(F.col(col).alias("value"), F.explode(cells).alias("_c"))
        .select(
            "value",
            F.col("_c.row").alias("row"),
            F.col("_c.bucket").alias("bucket"),
        )
    )
    return (
        probes.join(counters, ["row", "bucket"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


# ------------------------------------------------------- log2 histogram


def log2_histogram(df: DataFrame, col: str) -> DataFrame:
    """(bucket, cnt) mergeable power-of-two histogram of a NON-NEGATIVE
    numeric column — the fixed-size distribution probe (doc lengths,
    degrees, chunk sizes) completing the sketch family: HLL = distinct,
    CMS = frequency, this = distribution.  Bucket b holds values in
    [2^b, 2^(b+1)); value 0 gets bucket -1.  At most 64 buckets for any
    int64 input — constant-size output, merge = union + sum.

    The bucket is ``length(conv(floor(v), 10, 2)) - 1`` — the exact
    integer bit length (the HLL trick; float log2 misrounds at 2^k
    boundaries, exactly the bucket edges).  Values are floored first,
    so doubles land by their integer part.  Nulls and negatives are
    rejected in-plan via ``assert_true`` (a silently dropped negative
    would skew every quantile).
    """
    v = F.floor(F.col(col)).cast("long")
    chk = F.assert_true(
        F.col(col).isNotNull() & (v >= 0),
        F.lit(f"log2_histogram: null or negative value in {col!r}"),
    )
    bucket = F.when(v == 0, F.lit(-1)).otherwise(
        F.length(F.conv(v, 10, 2)) - F.lit(1)
    )
    return (
        df.select(
            F.when(chk.isNull(), bucket).cast("long").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_merge(*hist_dfs: DataFrame) -> DataFrame:
    """Merge log2 histograms: union + sum — bit-identical to
    histogramming the unioned inputs."""
    if not hist_dfs:
        raise ValueError("need at least one histogram")
    out = hist_dfs[0]
    for h in hist_dfs[1:]:
        out = out.unionByName(h)
    return out.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))


def histogram_quantiles(hist: DataFrame, qs: list[float]) -> DataFrame:
    """(q, bucket, lo, hi) per requested quantile: the power-of-two
    bucket containing the q-th value (rank = ceil(q·total), clamped to
    [1, total]) and its [lo, hi) bounds — 2-approximate quantiles from
    a constant-size sketch, all integer arithmetic (rank via integer
    ceil; no float aggregation anywhere).  Runs on the ≤64-row
    histogram: the sort/window here is bounded, never data-sized.
    """
    if not qs or any(not 0 < q <= 1 for q in qs):
        raise ValueError("quantiles must be in (0, 1]")
    if any(abs(q * 10**9 - round(q * 10**9)) > 1e-3 for q in qs):
        # the rank comparison scales q by 10^9 exactly; a q like 1/3
        # would silently truncate and can pick the previous bucket on
        # large totals — reject instead
        raise ValueError("quantiles must have at most 9 decimal digits")
    from pyspark.sql import Window

    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "bucket",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("total"),
    )
    q_arr = F.array(*[F.lit(float(q)) for q in sorted(set(qs))])
    # integer ceil(q*total) without float rounding hazards at exact
    # multiples: rank = floor((q*total*10^9 + 10^9 - 1) / 10^9) is still
    # float-tainted; instead compare cum/total >= q directly via
    # cross-multiplied integers scaled by 10^9 (q has <= 9 decimals here)
    exploded = cum.select(
        "*", F.explode(q_arr).alias("q")
    ).withColumn(
        "_qscaled", F.round(F.col("q") * F.lit(10**9)).cast("long")
    )
    # decimal(38,0) cross-multiply: cum·10^9 overflows int64 past
    # ~9.2e9 rows — a ceiling a 10^12-row histogram would hit
    hit = exploded.where(
        F.col("cum").cast("decimal(38,0)") * F.lit(10**9)
        >= F.col("_qscaled").cast("decimal(38,0)") * F.col("total")
    )
    pick = Window.partitionBy("q").orderBy("bucket")
    return (
        hit.withColumn("_rn", F.row_number().over(pick))
        .where(F.col("_rn") == 1)
        .select(
            "q",
            "bucket",
            F.when(F.col("bucket") == -1, F.lit(0))
            .otherwise(F.expr("shiftleft(1L, cast(bucket as int))"))
            .cast("long")
            .alias("lo"),
            F.when(F.col("bucket") == -1, F.lit(1))
            # bucket 62 is int64's top bucket: shiftleft(1L, 63)
            # overflows to Long.MIN — clamp hi to Long.MAX
            .when(F.col("bucket") == 62, F.lit((1 << 63) - 1))
            .otherwise(F.expr("shiftleft(1L, cast(bucket as int) + 1)"))
            .cast("long")
            .alias("hi"),
        )
    )

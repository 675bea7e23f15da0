"""Repro probe for the Arrow-writer JIT deoptimization (PLANS.md §12).

A long-only ``mapInPandas`` input stream runs ~7× slower for the rest of
the JVM's life once any pandas lane has streamed a non-bigint input
column.  This probe reproduces each decisive experiment from the round-6
bisection on a bare SparkSession (no repo code in the measured path):

    python tools/probe_arrow_deopt.py poison     # the effect itself
    python tools/probe_arrow_deopt.py variants   # which schemas trigger it
    python tools/probe_arrow_deopt.py split      # in-worker compute vs wait
    python tools/probe_arrow_deopt.py workers    # survives worker replacement
    python tools/probe_arrow_deopt.py c1         # vanishes without C2

Findings (2026-08-17, Spark 4.1.2, local[32]):
  poison    fresh 2.3-2.6 s → post-string 17-18 s, permanent
  variants  long-only input: no effect; string/double input: poisons;
            string OUTPUT only: no effect
  split     numpy compute unchanged; waiting-on-batches 31 s → 460 s
  workers   SIGKILL the pool → 32 fresh PIDs → still 17 s (JVM-side)
  c1        -XX:TieredStopAtLevel=1 → 24.7 s flat, fresh == poisoned
"""

from __future__ import annotations

import os
import signal
import sys
import time


def _session(java_opts: str = ""):
    from pyspark.sql import SparkSession, functions as F

    b = (
        SparkSession.builder.master("local[32]")
        .appName("arrow-deopt-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
    )
    if java_opts:
        b = b.config("spark.driver.extraJavaOptions", java_opts)
    spark = b.getOrCreate()
    # JVM-only warmup: no python lanes, so the Arrow writer stays virgin.
    spark.range(0, 10_000_000).select(F.xxhash64("id")).groupBy().max().collect()
    return spark, F


def _long_lane(spark, tag: str, instrument: bool = False):
    """The victim: a 96M-row long-only mapInPandas reduction."""

    def _plain(batches):
        import numpy as _np
        import pandas as _pd

        acc = 0.0
        for b in batches:
            a = b["id"].to_numpy()
            for _ in range(8):
                acc += float(_np.sqrt((a * 2654435761 % 1000003)).sum())
        yield _pd.DataFrame({"s": [acc]})

    def _instr(batches):
        import numpy as _np
        import os as _os
        import pandas as _pd
        import time as _t

        t0 = _t.time()
        comp = 0.0
        acc = 0.0
        for b in batches:
            a = b["id"].to_numpy()
            c0 = _t.time()
            for _ in range(8):
                acc += float(_np.sqrt((a * 2654435761 % 1000003)).sum())
            comp += _t.time() - c0
        yield _pd.DataFrame(
            {"s": [acc], "comp": [comp], "wait": [_t.time() - t0 - comp],
             "pid": [float(_os.getpid())]}
        )

    t0 = time.time()
    if instrument:
        rows = (
            spark.range(0, 96_000_000, 1, 64)
            .mapInPandas(_instr, schema="s double, comp double, wait double, pid double")
            .collect()
        )
        wall = time.time() - t0
        print(
            f"{tag}: wall={wall:.2f}s comp_sum={sum(r.comp for r in rows):.1f}s "
            f"wait_sum={sum(r.wait for r in rows):.1f}s "
            f"workers={len({int(r.pid) for r in rows})}",
            flush=True,
        )
        return {int(r.pid) for r in rows}
    spark.range(0, 96_000_000, 1, 64).mapInPandas(_plain, schema="s double").groupBy().sum(
        "s"
    ).collect()
    print(f"{tag}: {time.time() - t0:.2f}s", flush=True)
    return set()


def _poison_string(spark, F):
    df = spark.range(0, 64, 1, 2).select("id", F.format_string("s%d", "id").alias("s"))
    df.mapInPandas(lambda it: it, schema="id long, s string").count()


def cmd_poison():
    spark, F = _session()
    _long_lane(spark, "fresh1")
    _long_lane(spark, "fresh2")
    _poison_string(spark, F)
    _long_lane(spark, "poisoned1")
    _long_lane(spark, "poisoned2")
    spark.stop()


def cmd_variants():
    from pyspark.sql import functions as F  # noqa: F401 (per-variant sessions)

    for name in ("long_input", "string_input", "double_input", "string_output"):
        spark, F = _session()
        _long_lane(spark, f"[{name}] fresh1")
        _long_lane(spark, f"[{name}] fresh2")
        if name == "long_input":
            spark.range(0, 64, 1, 2).mapInPandas(lambda it: it, schema="id long").count()
        elif name == "string_input":
            _poison_string(spark, F)
        elif name == "double_input":
            spark.range(0, 64, 1, 2).select(
                F.col("id").cast("double").alias("d")
            ).mapInPandas(lambda it: it, schema="d double").count()
        elif name == "string_output":

            def _o(it):
                import pandas as _pd

                for _ in it:
                    pass
                yield _pd.DataFrame({"s": ["x"]})

            spark.range(0, 64, 1, 2).mapInPandas(_o, schema="s string").count()
        _long_lane(spark, f"[{name}] after")
        spark.stop()


def cmd_split():
    spark, F = _session()
    _long_lane(spark, "fresh", instrument=True)
    _poison_string(spark, F)
    _long_lane(spark, "poisoned", instrument=True)
    spark.stop()


def cmd_workers():
    spark, F = _session()
    _long_lane(spark, "fresh", instrument=True)
    _poison_string(spark, F)
    pids = _long_lane(spark, "poisoned", instrument=True)
    for pid in pids:  # daemon refills the pool with fresh forks
        try:
            os.kill(pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
    time.sleep(2)
    fresh_pids = _long_lane(spark, "post-kill", instrument=True)
    print(f"worker overlap across kill: {len(pids & fresh_pids)}", flush=True)
    spark.stop()


def cmd_c1():
    spark, F = _session(java_opts="-XX:TieredStopAtLevel=1")
    _long_lane(spark, "[c1] fresh1")
    _long_lane(spark, "[c1] fresh2")
    _poison_string(spark, F)
    _long_lane(spark, "[c1] after1")
    _long_lane(spark, "[c1] after2")
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "poison"
    {
        "poison": cmd_poison,
        "variants": cmd_variants,
        "split": cmd_split,
        "workers": cmd_workers,
        "c1": cmd_c1,
    }[cmd]()

#!/usr/bin/env python
"""spark-submit entry point for the FULL correctness gate board.

Round-4 proved the flagship pipeline on the localhost standalone cluster
(`tools/submit_flagship.py`); this runs every ``queries()`` gate against a
real multi-executor master and compares each result to its DuckDB oracle
driver-side — proving no gate depends on single-JVM local-mode locality
(shared PYTHONPATH, driver-local temp dirs visible to executors only
because they share a JVM, etc.).  The package and ``__spark_entry__.py``
ship via ``--py-files``, exactly as the north rule's deployment shape
requires.

Two modes:

- ``--launch`` (run from a plain shell): builds the --py-files zip,
  ensures the standalone master+worker (via bench.ensure_standalone_cluster,
  fixed 2-core executor JVMs), then spark-submits THIS file in sweep mode
  and forwards its JSON verdict.
- sweep mode (inside spark-submit): runs the board, prints ONE JSON line
  {"gates": {name: {rows_match, schema_match, hash_match, ...}}, ...}.

Compare semantics mirror tests/test_entry_contract.py (the local replica
of the driver's gate): columns sorted by name, rows sorted, exact cell
equality — floats bit-identical.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (int, str)):
        return v
    return str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(
        out, key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t)
    )


def run_sweep(master: str | None, sf_dir: str) -> dict:
    import duckdb

    from neo4j_export_tool_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(
        master=master,
        app_name="kg-gates-submit",
        shuffle_partitions=16,
        extra_conf={
            "spark.pyspark.python": sys.executable,
            "spark.executor.cores": "2",
            "spark.executor.memory": "3g",
        },
    )
    # executors must import __spark_entry__-nested closures' module refs;
    # the package zip ships in get_spark, the entry module rides along here
    spark.sparkContext.addPyFile(os.path.join(REPO, "__spark_entry__.py"))

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    oracles = entry_mod.oracle_sql()
    gates: dict[str, dict] = {}
    for name, q in sorted(entry_mod.queries().items()):
        t0 = time.perf_counter()
        rec: dict = {"err": None}
        try:
            sdf = q(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(s_rows)
            if name in oracles:
                res = con.execute(oracles[name])
                d_cols = [d[0] for d in res.description]
                d_rows = res.fetchall()
                rec["oracle_rows"] = len(d_rows)
                rec["rows_match"] = len(s_rows) == len(d_rows)
                rec["schema_match"] = sorted(s_cols) == sorted(d_cols)
                rec["hash_match"] = rec["rows_match"] and rec[
                    "schema_match"
                ] and _normalize(s_rows, s_cols) == _normalize(d_rows, d_cols)
            else:
                # no oracle → nothing was VERIFIED; record that honestly
                # (None, not True) and count it as rows-only below
                rec["rows_match"] = None
                rec["schema_match"] = None
                rec["hash_match"] = None
                rec["rows_only"] = True
        except Exception as exc:  # record, keep sweeping
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
            rec.setdefault("rows_match", False)
            rec.setdefault("schema_match", False)
            rec.setdefault("hash_match", False)
        rec["sec"] = round(time.perf_counter() - t0, 3)
        gates[name] = rec

    sc = spark.sparkContext
    out = {
        "master": sc.master,
        "parallelism": sc.defaultParallelism,
        "sf": sf_dir,
        "n_gates": len(gates),
        "n_green": sum(
            1
            for g in gates.values()
            if g["err"] is None
            and g["rows_match"] is True
            and g["schema_match"] is True
            and g["hash_match"] is True
        ),
        "n_rows_only": sum(
            1 for g in gates.values() if g.get("rows_only") and g["err"] is None
        ),
        "gates": gates,
    }
    spark.stop()
    return out


def launch(sf_dir: str, out_path: str | None) -> None:
    import shutil
    import tempfile

    from bench import ensure_standalone_cluster, stop_standalone_cluster

    spark_home = os.environ.get("SPARK_HOME", "/opt/spark-4.1.2-bin-hadoop3")
    master_url, started = ensure_standalone_cluster(worker_cores=16)
    zip_path = shutil.make_archive(
        os.path.join(tempfile.gettempdir(), f"kg_pkg_gates_{os.getpid()}"),
        "zip",
        root_dir=REPO,
        base_dir="neo4j_export_tool_spark",
    )
    try:
        proc = subprocess.run(
            [
                os.path.join(spark_home, "bin", "spark-submit"),
                "--master", master_url,
                "--py-files", ",".join(
                    [zip_path, os.path.join(REPO, "__spark_entry__.py")]
                ),
                "--conf", f"spark.pyspark.python={sys.executable}",
                "--conf", "spark.executor.cores=2",
                "--conf", "spark.executor.memory=3g",
                "--conf", "spark.cores.max=16",
                os.path.abspath(__file__),
                "--sf-dir", sf_dir,
                "--master-url", master_url,
            ],
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=3600,
        )
    finally:
        if started:
            stop_standalone_cluster()
    line = next(
        (
            ln
            for ln in reversed(proc.stdout.splitlines())
            if ln.startswith("{")
        ),
        None,
    )
    if line is None:
        sys.stderr.write(proc.stdout[-4000:] + "\n" + proc.stderr[-4000:])
        raise SystemExit("spark-submit sweep produced no JSON verdict")
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    print(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--launch", action="store_true",
                    help="ensure cluster + spark-submit this file")
    ap.add_argument("--out", default=None)
    ap.add_argument("--master-url", default=None,
                    help="(sweep mode) standalone master URL")
    args = ap.parse_args()
    if args.launch:
        launch(args.sf_dir, args.out)
        return
    print(json.dumps(run_sweep(args.master_url, args.sf_dir)))


if __name__ == "__main__":
    main()

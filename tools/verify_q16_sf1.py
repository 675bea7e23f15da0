#!/usr/bin/env python
"""Independent sf1 verification of q16 (exact embedding near-dup).

The regular oracle is an all-pairs SQL join — O(n²) list dot products in
DuckDB, fine at ≤5K vectors but hours at sf1's 20K.  This verifier proves
the same statement a different way:

1. blocked numpy float64 GEMM computes every pairwise cosine (minutes of
   BLAS instead of hours of SQL);
2. candidate pairs are taken with an ε-margin below the 0.5 threshold, and
   the margin's validity is asserted: NO pair's cosine may fall within ε
   of the threshold, so GEMM rounding (FMA/reassociation) cannot flip any
   membership decision;
3. every candidate is re-scored with the exact sequential left-associated
   double fold — bit-identical to the engine's codegen verify and to
   DuckDB's list_dot_product (no FMA in either) — giving the exact pair
   set AND exact cosine values;
4. the Spark gate's q16 output must equal that set value-for-value.

Usage: python tools/verify_q16_sf1.py [sf_dir]
Prints one JSON line {"pairs": N, "margin_ok": bool, "exact_match": bool}.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EPS = 1e-6
THRESHOLD = 0.5


def seq_dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch", "sf1")

    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    n = len(ids)
    norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))

    cand: list[tuple[int, int]] = []
    margin_ok = True
    block = 2048
    for i0 in range(0, n, block):
        gi = mat[i0 : i0 + block] @ mat.T  # (b, n) dot products
        ci = gi / (norms[i0 : i0 + block, None] * norms[None, :])
        for bi in range(ci.shape[0]):
            i = i0 + bi
            row = ci[bi, i + 1 :]  # upper triangle only (a < b)
            near = np.flatnonzero(np.abs(row - THRESHOLD) < EPS)
            if len(near):
                margin_ok = False
            hits = np.flatnonzero(row >= THRESHOLD - EPS)
            for j in hits:
                cand.append((i, i + 1 + int(j)))

    # exact sequential re-score of candidates (the canonical math)
    exact = {}
    for i, j in cand:
        c = seq_dot(mat[i], mat[j]) / np.sqrt(
            seq_dot(mat[i], mat[i]) * seq_dot(mat[j], mat[j])
        )
        if c >= THRESHOLD:
            exact[(int(ids[i]), int(ids[j]))] = float(c)

    # Spark gate output
    from neo4j_export_tool_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(master="local[8]", app_name="verify-q16-sf1")
    try:
        got = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in entry_mod.queries()["q16_embedding_neardup"](
                spark, sf_dir
            ).collect()
        }
    finally:
        spark.stop()

    match = got == exact
    print(json.dumps({
        "sf": sf_dir,
        "vectors": n,
        "pairs": len(exact),
        "margin_ok": margin_ok,
        "exact_match": match,
    }))
    if not match:
        extra = set(got) - set(exact)
        missing = set(exact) - set(got)
        print("extra:", list(extra)[:5], "missing:", list(missing)[:5],
              file=sys.stderr)
        for k in list(set(got) & set(exact))[:2000]:
            if got[k] != exact[k]:
                print("value diff:", k, got[k], exact[k], file=sys.stderr)
                break
        sys.exit(1)


if __name__ == "__main__":
    main()

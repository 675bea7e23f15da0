#!/usr/bin/env python
"""Deterministic scale-up of the driver's testdata (default: sf0.1 → 10×).

The driver ships sf0.001/sf0.01/sf0.1; the round-4 stress sweep needs one
more decade.  This tool synthesizes it from sf0.1 by key-shifted
replication — every replica keeps the source's schemas, distributions and
planted structures, while three transforms keep the data from degenerating
at 10×:

- ``documents.text``: each replica r > 0 applies an affine word-vocabulary
  permutation (the corpus vocabulary is closed — 31 words — and 31 is
  prime, so ``idx → (a·idx + b) mod 31`` with a ≠ 0 is a bijection).  This
  PRESERVES the closed vocabulary (q39/q46 oracles stay total) and the
  intra-replica near-duplicate structure (a bijection on words is a
  bijection on shingles), while cross-replica shingle overlap collapses to
  ~zero — so dedup/jaccard outputs scale linearly instead of quadratically
  in the replica count.
- ``embeddings.embedding``: replica r rotates the vector by r positions —
  norms and component distributions survive, cross-replica cosine falls to
  the random-pair band (no planted 10× near-dup explosion).
- integer keys shift by per-table strides chosen to keep every foreign-key
  relationship intact inside a replica and collision-free across replicas
  (and clear of the q27 gate's +100000 planted-twin id offset).

Everything is pure deterministic SQL over the read-only source dir —
same input → same bytes.  Output goes under the repo (default
``.scratch/sf1``), never /root/testdata.

Usage: python tools/make_sf.py [--src /root/testdata/sf0.1] [--out .scratch/sf1]
                               [--factor 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
P = len(VOCAB)  # 31, prime


def word_map_sql(replica: int) -> str:
    """MAP literal for this replica's affine vocabulary permutation."""
    a = (5 * replica + 3) % P or 1  # a ≠ 0 (mod 31) → bijection
    b = (11 * replica) % P
    pairs = ", ".join(
        f"'{w}': '{VOCAB[(a * i + b) % P]}'" for i, w in enumerate(VOCAB)
    )
    return "MAP {" + pairs + "}"


def word_suffix_sql(replica: int) -> str:
    """OPEN-VOCAB transform (round-5): suffix every word per replica
    (``join`` → ``joinr3``) instead of permuting within the closed
    vocabulary.  The vocabulary now GROWS linearly with the factor — the
    web-corpus shape — so shingle document frequencies stay at the
    per-replica (sf0.1) level and q13's stop-shingle prune no longer
    empties the corpus (the closed-vocab artifact VERDICT r4 flagged:
    with 31 words total, EVERY shingle becomes a stop-shingle at 10×).
    Near-dup structure inside a replica is preserved (suffixing is a
    bijection on words, hence on shingles); cross-replica shingle overlap
    is exactly zero."""
    return f"w -> w || 'r{replica}'"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch", "sf1"))
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--open-vocab", action="store_true",
                    help="grow the vocabulary with scale (per-replica word "
                         "suffixing) instead of permuting the closed one")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def src(t: str) -> str:
        return f"read_parquet('{args.src}/{t}.parquet')"

    def emit(t: str, select_per_replica) -> None:
        parts = [select_per_replica(r) for r in range(args.factor)]
        q = " UNION ALL ".join(parts)
        out = os.path.join(args.out, f"{t}.parquet")
        con.execute(f"COPY ({q}) TO '{out}' (FORMAT parquet)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{t}: {n} rows")

    # dimensions stay 1× (shared across replicas, like TPC-H region/nation)
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM {src(t)}) TO "
            f"'{os.path.join(args.out, t + '.parquet')}' (FORMAT parquet)"
        )
        print(f"{t}: copied 1x")

    emit("supplier", lambda r: f"""
        SELECT s_suppkey + {r * 100_000} AS s_suppkey,
               * EXCLUDE (s_suppkey)
        FROM {src('supplier')}""")

    emit("part", lambda r: f"""
        SELECT p_partkey + {r * 1_000_000} AS p_partkey,
               * EXCLUDE (p_partkey)
        FROM {src('part')}""")

    emit("customer", lambda r: f"""
        SELECT c_custkey + {r * 1_000_000} AS c_custkey,
               * EXCLUDE (c_custkey)
        FROM {src('customer')}""")

    emit("orders", lambda r: f"""
        SELECT o_orderkey + {r * 10_000_000} AS o_orderkey,
               o_custkey + {r * 1_000_000} AS o_custkey,
               * EXCLUDE (o_orderkey, o_custkey)
        FROM {src('orders')}""")

    emit("lineitem", lambda r: f"""
        SELECT l_orderkey + {r * 10_000_000} AS l_orderkey,
               l_partkey + {r * 1_000_000} AS l_partkey,
               l_suppkey + {r * 100_000} AS l_suppkey,
               * EXCLUDE (l_orderkey, l_partkey, l_suppkey)
        FROM {src('lineitem')}""")

    emit("events", lambda r: f"""
        SELECT event_id + {r * 10_000_000} AS event_id,
               user_id + {r * 1_000_000} AS user_id,
               * EXCLUDE (event_id, user_id)
        FROM {src('events')}""")

    def docs_select(r: int) -> str:
        if r == 0:
            return f"SELECT * FROM {src('documents')}"
        if args.open_vocab:
            xform = word_suffix_sql(r)
        else:
            xform = f"w -> ({word_map_sql(r)}[w])[1]"
        return f"""
        SELECT doc_id + {r * 1_000_000} AS doc_id,
               list_aggregate(
                 list_transform(string_split(text, ' '), {xform}),
                 'string_agg', ' ') AS text,
               lang, source,
               length(list_aggregate(
                 list_transform(string_split(text, ' '), {xform}),
                 'string_agg', ' ')) AS n_chars
        FROM {src('documents')}"""

    emit("documents", docs_select)

    def emb_select(r: int) -> str:
        if r == 0:
            return f"SELECT * FROM {src('embeddings')}"
        rot = (r % 64) + 1
        return f"""
        SELECT vec_id + {r * 1_000_000} AS vec_id,
               (embedding[{rot + 1}:] || embedding[1:{rot}])::FLOAT[]
                 AS embedding,
               label
        FROM {src('embeddings')}"""

    emit("embeddings", emb_select)


if __name__ == "__main__":
    main()

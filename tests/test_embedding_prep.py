"""End-to-end graph-embedding prep plan test: stage metrics consistent
with the individually verified operators, split totality, determinism."""

from __future__ import annotations

from neo4j_export_tool_spark.plans.embedding_prep import (
    prepare_embedding_corpus,
)


def _mentions(spark):
    rows = []
    concepts = ["spark", "join", "shuffle", "salt", "skew", "agg"]
    for d in range(24):
        for j in range(2 + d % 4):
            rows.append((d, concepts[(d * 3 + j * 5) % len(concepts)]))
    return spark.createDataFrame(rows, "doc_id long, concept string")


def test_end_to_end(spark):
    res = prepare_embedding_corpus(
        _mentions(spark),
        walk_len=5,
        walks_per_node=1,
        min_pair_count=1,
    )
    m = res.metrics
    assert m["n_mentions"] == sum(2 + d % 4 for d in range(24))
    assert m["n_cooccurrence_edges"] > 0
    assert m["n_capped_directed_edges"] <= 2 * m["n_cooccurrence_edges"]
    assert m["n_walks"] > 0 and m["n_pairs"] > 0

    pairs = res.pairs.collect()
    # split labeling is total and exclusive; counts positive
    assert all(r.split in ("train", "val", "test") for r in pairs)
    assert all(r.n >= 1 for r in pairs)
    # collocation table carries finite PMI for every kept pair
    col = res.collocations.collect()
    assert col and all(r.n >= 1 for r in col)


def test_deterministic_across_runs(spark):
    a = prepare_embedding_corpus(
        _mentions(spark), walk_len=4, walks_per_node=1, min_pair_count=1
    )
    b = prepare_embedding_corpus(
        _mentions(spark).repartition(7),
        walk_len=4,
        walks_per_node=1,
        min_pair_count=1,
    )
    pa = sorted((r.center, r.context, r.n, r.split) for r in a.pairs.collect())
    pb = sorted((r.center, r.context, r.n, r.split) for r in b.pairs.collect())
    assert pa == pb
    assert a.metrics == b.metrics

"""Incremental KG maintenance: change detection + delta extraction."""

from __future__ import annotations

from pyspark.sql import functions as F

from neo4j_export_tool_spark.plans.incremental import (
    doc_changes,
    incremental_mention_delta,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_changes_classification(spark):
    old = _docs(spark, [(1, "same"), (2, "before"), (3, "gone")])
    new = _docs(spark, [(1, "same"), (2, "after"), (4, "fresh")])
    got = {r["doc_id"]: r["change"] for r in doc_changes(old, new).collect()}
    # unchanged doc 1 is ABSENT — the incremental property
    assert got == {2: "changed", 3: "removed", 4: "added"}


def test_incremental_delta_ops(spark):
    old = _docs(
        spark,
        [(1, "the hash join wins"), (2, "sort it"), (3, "gone doc")],
    )
    new = _docs(
        spark,
        [
            (1, "the hash join wins"),  # unchanged → no rows
            (2, "merge it"),            # changed → upsert its mentions
            (4, "scan and filter"),     # added → upsert its mentions
        ],
    )
    rows = incremental_mention_delta(old, new).collect()
    ups = {(r["doc_id"], r["concept"]) for r in rows if r["op"] == "upsert"}
    dels = {r["doc_id"] for r in rows if r["op"] == "delete_doc"}
    assert ups == {(2, "merge"), (4, "scan"), (4, "filter")}
    # tombstones: removed doc 3 AND changed doc 2 (cleared before its
    # upserts re-land); added doc 4 has no prior edges → none
    assert dels == {2, 3}
    # upserted rows carry real counts; tombstones carry nulls
    for r in rows:
        if r["op"] == "upsert":
            assert r["n_occurrences"] == 1 and r["first_offset"] is not None
        else:
            assert r["concept"] is None and r["n_occurrences"] is None


def test_delta_extraction_touches_only_delta_docs(spark):
    """The extraction input is the left-semi-joined delta subset — the
    unchanged doc's text must not reach the mention stage."""
    old = _docs(spark, [(1, "hash join everywhere")])
    new = _docs(
        spark, [(1, "hash join everywhere"), (2, "sort and merge")]
    )
    out = incremental_mention_delta(old, new)
    # doc 1's mentions (hash, join) would appear if the full corpus were
    # re-extracted; only doc 2's delta may be present
    assert {r["doc_id"] for r in out.collect()} == {2}


def test_changed_doc_losing_all_mentions_is_tombstoned(spark):
    """A changed doc whose NEW text mentions nothing must still clear its
    old edges — zero upsert rows alone would leave them stale forever."""
    old = _docs(spark, [(1, "hash join everywhere")])
    new = _docs(spark, [(1, "nothing relevant anymore")])
    rows = incremental_mention_delta(old, new).collect()
    assert [(r["doc_id"], r["op"]) for r in rows] == [(1, "delete_doc")]


def test_null_text_presence_semantics(spark):
    """NULL text is a VALUE, not absence: a doc whose text becomes NULL is
    'changed' (tombstone + no upserts), never 'removed'; NULL-on-both-sides
    is unchanged (no rows)."""
    from neo4j_export_tool_spark.plans.incremental import doc_changes

    old = _docs(spark, [(1, "hash it"), (2, None)])
    new = _docs(spark, [(1, None), (2, None)])
    got = {r["doc_id"]: r["change"] for r in doc_changes(old, new).collect()}
    assert got == {1: "changed"}
    rows = incremental_mention_delta(old, new).collect()
    assert [(r["doc_id"], r["op"]) for r in rows] == [(1, "delete_doc")]

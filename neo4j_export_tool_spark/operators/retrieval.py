"""BM25 top-k retrieval over the document corpus (inverted-index join).

KG construction and corpus curation both need "which documents mention
X" ranked sanely: entity-linking candidate recall, decontamination
audits, topical subset selection.  BM25 (Robertson/Okapi, the Lucene
default) is the standard lexical ranker; this is its distributed
formulation as one equi-join on the term key — the inverted index IS
the (term → postings) shuffle layout, never materialized driver-side.

Scoring (Lucene variant, idf always positive):

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    s(q, d) = Σ_{t ∈ q ∩ d}  idf(t) · tf · (k1 + 1)
                             / (tf + k1·(1 − b + b·dl/avgdl))

with tf = term count in d, dl = |d| tokens, avgdl the corpus mean, and
query terms DE-DUPLICATED (set semantics, the Lucene convention).
k1/b arrive as integer percents (k1_pct=120 → 1.2) so configurations
serialize exactly.

Scale shape.  Postings = one explode + (doc, term) count agg; df/avgdl
are keyed aggs off it.  The score join is postings ⋈ query-terms on the
single term key — with a bounded query set it is broadcast; at
query-fleet scale it is the classic shuffle co-partitioned join.  The
per-(query, doc) sum folds a sorted (term asc) array instead of a
shuffle-ordered double SUM, so scores are bit-stable across
partitionings; terms-per-query bounds the collected array.  Top-k per
query is a window over (score desc, doc asc) — deterministic total
order.  ``max_term_df_frac`` optionally drops terms seen in more than
that fraction of documents (stopword pruning — the same explicit
recall/cost trade as the dedup caps; scores then exclude those terms).

Determinism: counts int64-exact; doubles folded in sorted order.  The
DuckDB twin (tests/test_retrieval.py) replays the formula; ln ulp is
the only cross-engine wobble (compared at rel 1e-12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, term, tf, dl): the inverted-index relation, one explode +
    one keyed count, doc length attached via a per-doc window sum (no
    second corpus scan)."""
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    return (
        toks.groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("dl", F.sum("tf").over(Window.partitionBy("doc")))
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    doc_id: str,
    doc_text: str,
    query_id: str,
    query_text: str,
    k: int = 10,
    k1_pct: int = 120,
    b_pct: int = 75,
    max_term_df_frac: float | None = None,
) -> DataFrame:
    """(query, doc, score, rank) — top-k docs per query by BM25.

    Ties broken by doc id asc; rank is 1-based and dense in row order
    (row_number), so the output is a deterministic set.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if k1_pct < 0 or not 0 <= b_pct <= 100:
        raise ValueError("k1_pct must be >= 0 and b_pct in [0, 100]")
    postings = build_postings(docs, doc_id, doc_text)
    postings = postings.localCheckpoint(eager=False)

    stats = postings.select("doc", "dl").distinct().agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    )
    n_docs, avgdl = stats.first()
    if not n_docs:  # empty corpus → empty result, not float(None)
        d_t = next(
            f.dataType.simpleString() for f in docs.schema if f.name == doc_id
        )
        q_t = next(
            f.dataType.simpleString() for f in queries.schema if f.name == query_id
        )
        return docs.sparkSession.createDataFrame(
            [], f"query {q_t}, doc {d_t}, score double, rank int"
        )

    term_df = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    if max_term_df_frac is not None:
        ceiling = max(1, int(max_term_df_frac * n_docs))
        term_df = term_df.where(F.col("df") <= ceiling)

    qterms = queries.select(
        F.col(query_id).alias("query"),
        F.explode(F.array_distinct(F.split(F.col(query_text), " "))).alias(
            "term"
        ),
    )

    k1 = k1_pct / 100.0
    b = b_pct / 100.0
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(float(avgdl))
    )
    per_term = (
        qterms.join(term_df, "term")
        .join(postings, "term")
        .select(
            "query",
            "doc",
            "term",
            (idf * F.col("tf") * F.lit(k1 + 1.0) / norm).alias("ts"),
        )
    )
    scored = per_term.groupBy("query", "doc").agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("term", "ts"))),
                lambda s: s["ts"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("score")
    )
    w = Window.partitionBy("query").orderBy(F.desc("score"), F.asc("doc"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )

"""Bigram language-model perplexity scoring (the CCNet-style quality filter).

The canonical web-corpus quality signal (Wenzek et al., CCNet; GPT-3 /
LLaMA data pipelines) is "perplexity of each document under a language
model trained on trusted text".  This is the distributed version with a
Laplace-smoothed bigram model: train on one corpus, score any corpus,
both as pure DataFrame plans.

Model.  Vocabulary = top ``max_vocab`` tokens by corpus count
(deterministic tie-break count desc, token asc); everything else maps to
``<unk>``.  With V = |vocab| + 1 (the unk symbol):

    P(t_i | t_{i-1}) = (c(t_{i-1}, t_i) + 1) / (c_ctx(t_{i-1}) + V)

where c_ctx(u) = Σ_t c(u, t) (bigram context count; 0 for contexts never
seen in training — smoothing still yields a proper distribution).  A
document's score is the average negative log-probability over its n-1
bigrams (natural log); lower = more natural text.  Documents with < 2
tokens score NULL (no bigram evidence — callers decide the policy).

Tokenization is the repo convention (single-space split of the raw
text), matching ``functions/text.py``.

Scale shape.  Training: one explode + window-lead per doc (one shuffle
keyed by doc) + two keyed int-count aggs; the vocabulary is capped so
its map-side join is a broadcast.  Scoring: the same lead pass, then
equi-joins on (prev, next) against the bigram table and on prev against
the context table — plain shuffle joins on model-sized tables, the
inverted-index shape.  Nothing is ever collected to the driver.

Determinism.  All counts are exact int64 (partitioning-independent).
Log-probs are doubles; the per-doc sum is folded over a sorted array
(``sort_array`` + ``aggregate``), not a shuffle-ordered SQL SUM, so the
double result is bit-stable across partitionings.  Cross-engine the only
wobble is libm ``ln`` ulp — the DuckDB twin (tests/test_lm_score.py)
compares counts exactly and log-scores at rel 1e-12.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

UNK = "<unk>"


class BigramLM(NamedTuple):
    """A trained model: two small-keyed count tables + constants."""

    bigrams: DataFrame  # (prev, next, c) int64
    contexts: DataFrame  # (prev, c_ctx) int64
    vocab: DataFrame  # (term,) — the kept vocabulary, unk excluded
    v_smooth: int  # |vocab| + 1, the Laplace denominator term


def _doc_bigrams(
    docs: DataFrame, id_col: str, text_col: str, vocab: DataFrame
) -> DataFrame:
    """(_doc, _pos, prev, next) bigram stream with OOV mapped to <unk>.

    One explode, one broadcast vocab join, one lead over (doc, pos).
    ``_pos`` (the prev token's position) rides along so scoring can fold
    log-probs in a partitioning-independent order.
    """
    toks = docs.select(
        F.col(id_col).alias("_doc"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("_pos", "_tok"),
    )
    mapped = toks.join(
        F.broadcast(vocab.select(F.col("term").alias("_tok"))).withColumn(
            "_hit", F.lit(True)
        ),
        "_tok",
        "left",
    ).select(
        "_doc",
        "_pos",
        F.when(F.col("_hit"), F.col("_tok")).otherwise(F.lit(UNK)).alias("term"),
    )
    w = Window.partitionBy("_doc").orderBy("_pos")
    return (
        mapped.select(
            "_doc",
            "_pos",
            F.col("term").alias("prev"),
            F.lead("term").over(w).alias("next"),
        )
        .where(F.col("next").isNotNull())
    )


def train_bigram_lm(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    max_vocab: int = 65536,
) -> BigramLM:
    """Count-train the model.  ``max_vocab`` bounds every downstream
    broadcast (the 100 TB ceiling is the model size, not the corpus)."""
    if max_vocab < 1:
        raise ValueError("max_vocab must be >= 1")
    toks = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    # Global top-k via sort+limit (TakeOrderedAndProject: per-partition
    # partial top-k, never a single-task global window), ties broken by
    # token asc — same shape as functions/text.py corpus_vocab.
    vocab = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("term").asc())
        .limit(max_vocab)
        .select("term")
    )
    vocab = vocab.localCheckpoint(eager=False)
    n_vocab = vocab.count()

    big = _doc_bigrams(docs, id_col, text_col, vocab)
    bigrams = big.groupBy("prev", "next").agg(F.count(F.lit(1)).alias("c"))
    contexts = bigrams.groupBy("prev").agg(F.sum("c").alias("c_ctx"))
    return BigramLM(
        bigrams=bigrams.localCheckpoint(eager=False),
        contexts=contexts.localCheckpoint(eager=False),
        vocab=vocab,
        v_smooth=n_vocab + 1,
    )


def score_docs(
    docs: DataFrame, lm: BigramLM, id_col: str, text_col: str
) -> DataFrame:
    """(id, n_bigrams, sum_neg_logprob, avg_neg_logprob) per document.

    avg_neg_logprob is ln-perplexity; NULL when the doc has < 2 tokens.
    The double fold is over a sorted (pos asc) array, so the sum is
    independent of partitioning.
    """
    big = _doc_bigrams(docs, id_col, text_col, lm.vocab)
    scored = (
        big.join(lm.bigrams, ["prev", "next"], "left")
        .join(lm.contexts, ["prev"], "left")
        .select(
            "_doc",
            "_pos",
            (
                -F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1)).cast("double")
                    / (
                        F.coalesce(F.col("c_ctx"), F.lit(0)) + F.lit(lm.v_smooth)
                    ).cast("double")
                )
            ).alias("nlp"),
        )
    )
    per_doc = scored.groupBy("_doc").agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "nlp"))),
                lambda s: s["nlp"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("sum_neg_logprob"),
        F.count(F.lit(1)).alias("n_bigrams"),
    )
    ids = docs.select(F.col(id_col).alias("_doc"))
    return (
        ids.join(per_doc, "_doc", "left")
        .select(
            F.col("_doc").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "sum_neg_logprob",
            (F.col("sum_neg_logprob") / F.col("n_bigrams")).alias(
                "avg_neg_logprob"
            ),
        )
    )

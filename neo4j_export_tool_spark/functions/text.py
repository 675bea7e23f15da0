"""Text-analysis functions for training-data pipelines.

Language ID (stopword-hit heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting (rolling hash).
All are pure column expressions (higher-order functions, regexes) — JVM-side,
whole-stage-codegen'd, and expressible 1:1 in ANSI SQL for oracle checks.

Integer-math policy: ratios are emitted as integer percentages (``100*x/y``
with integer division) so cross-engine comparisons are bit-stable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists (function words; extend per corpus).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is", "was", "for", "in"],
    "fr": ["le", "la", "les", "et", "est", "pour", "dans", "une"],
    "es": ["el", "los", "las", "es", "para", "en", "una", "del"],
    "de": ["der", "die", "das", "und", "ist", "für", "ein", "nicht"],
}

FINGERPRINT_MOD = 1_000_000_007


def _hits(toks: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_scores(text: Column) -> dict[str, Column]:
    toks = F.split(F.lower(text), " ")
    return {lang: _hits(toks, words) for lang, words in LANG_STOPWORDS.items()}


def lang_id_col(text: Column) -> Column:
    """Predicted language = argmax stopword hits; 'und' when all zero.
    Ties broken by language-code order (deterministic)."""
    scores = lang_scores(text)
    langs = sorted(scores)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in reversed(langs):  # earlier lang wins ties → apply in reverse
        best_lang = F.when(scores[lang] >= F.greatest(best_score, F.lit(1)), F.lit(lang)).otherwise(best_lang)
        best_score = F.greatest(best_score, scores[lang])
    return best_lang


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(text, " "))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count: alpha runs + digit runs + single non-space
    punctuation, the classic pre-tokenizer regex."""
    return F.regexp_count(text, F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))


def quality_metrics(text: Column) -> dict[str, Column]:
    """Integer quality metrics: token counts, type-token ratio %, stopword %,
    alpha %, mean token length ×100."""
    toks = F.split(text, " ")
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_chars = F.length(text)
    n_alpha = F.regexp_count(text, F.lit("[A-Za-z]"))
    en = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en, F.lower(t))))
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    # F.floor (not cast): DuckDB's double→int CAST rounds while Spark's
    # truncates; FLOOR agrees everywhere
    return {
        "n_tokens": n_tokens,
        "n_distinct_tokens": n_distinct,
        "n_chars": n_chars,
        "ttr_pct": F.floor(100 * n_distinct / safe_tokens),
        "stopword_pct": F.floor(100 * n_stop / safe_tokens),
        "alpha_pct": F.floor(100 * n_alpha / F.greatest(n_chars, F.lit(1))),
        "mean_token_len_x100": F.floor(100 * (n_chars - (n_tokens - 1)) / safe_tokens),
    }


def repetition_2gram_metrics(text: Column) -> dict[str, Column]:
    """Gopher-style repetition signals, per document, pure column exprs:
    the fraction of word 2-grams that are repeats of an earlier 2-gram
    (integer percent, FLOOR for cross-engine bit-stability).  High values
    flag boilerplate/spam pages a training corpus should drop."""
    from neo4j_export_tool_spark.functions.similarity import (
        tokens_col,
        word_shingles_col,
    )

    toks = tokens_col(text)
    n_tokens = F.size(toks)
    total_2grams = F.greatest(n_tokens - 1, F.lit(0))
    distinct_2grams = F.size(word_shingles_col(toks, 2))
    return {
        "n_tokens": n_tokens,
        "total_2grams": total_2grams,
        "distinct_2grams": distinct_2grams,
        "rep2_pct": F.floor(
            100 * (total_2grams - distinct_2grams)
            / F.greatest(total_2grams, F.lit(1))
        ),
    }


def top_token_counts(df, text_col: str, id_col: str):
    """(id, top_token_count): the count of the most frequent token per doc —
    the other Gopher repetition axis (one word dominating the page).

    Distributed shape: explode → two keyed aggs.  The (doc, token) key is
    high-cardinality and unskewed (a single doc's tokens land together but
    one doc is bounded), so both shuffles partition evenly at any corpus
    size — no per-doc O(n²) higher-order scan."""
    from neo4j_export_tool_spark.functions.similarity import tokens_col

    toks = tokens_col(F.col(text_col))
    per_tok = (
        df.select(F.col(id_col).alias("doc"), F.explode(toks).alias("tok"))
        .groupBy("doc", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return per_tok.groupBy("doc").agg(F.max("c").alias("top_token_count"))


def corpus_vocab(df, text_col: str, k: int = 100):
    """Corpus-level vocabulary: top-k tokens by frequency, ties broken by
    token (deterministic, oracle-comparable).  The global top-k is a
    groupBy + partial top-k per partition (Spark's sort+limit pushes the
    limit into each partition), so the full vocabulary never concentrates
    on one node."""
    from neo4j_export_tool_spark.functions.similarity import tokens_col

    toks = tokens_col(F.col(text_col))
    return (
        df.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(k)
    )


def fingerprint_col(text: Column) -> Column:
    """Rolling polynomial hash over tokens:
    acc ← (acc*31 + ascii(first char) + len(token)) mod 1e9+7.

    Shift-resistant doc fingerprint; exact in any engine (pure integer ops).
    """
    toks = F.split(text, " ")
    vals = F.transform(toks, lambda t: (F.ascii(t) + F.length(t)).cast("long"))
    return F.aggregate(
        vals,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % F.lit(FINGERPRINT_MOD),
    )


def tfidf_keywords(
    df, id_col: str, text_col: str, k: int = 10, min_df: int = 1
):
    """Top-``k`` TF-IDF keywords per document: (doc, token, tf, df,
    tfidf, rank) — the per-document keyword extraction a corpus data
    card / search-indexing stage needs (`corpus_vocab` is the corpus-
    level sibling; BM25 in `operators/retrieval.py` is the query-time
    sibling sharing the same tokenizer).

    ``tfidf = tf · (ln((N+1)/(df+1)) + 1)`` (the smoothed idf of
    sklearn's TfidfVectorizer): tf/df/N are exact ints, the double is a
    per-row function of them — bit-identical across partitionings with
    no float aggregation.  Ties rank by token asc (deterministic).
    ``min_df`` prunes hapax noise BEFORE ranking.  Per-doc ranking is a
    window partitioned by document — bounded by each doc's vocabulary,
    never corpus-wide.  N rides a one-row broadcast crossJoin (the PMI
    convention).
    """
    from pyspark.sql import Window

    from neo4j_export_tool_spark.functions.similarity import tokens_col

    if k < 1:
        raise ValueError("k must be >= 1")
    if min_df < 1:
        raise ValueError("min_df must be >= 1")
    toks = tokens_col(F.col(text_col))
    tf = (
        df.select(F.col(id_col).alias("doc"), F.explode(toks).alias("token"))
        .groupBy("doc", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        # reused by docfreq AND the scored join below — without the
        # lineage cut the tokenize+explode+shuffle runs twice (Catalyst
        # does not CSE across a self-join; the retrieval.py convention)
        .localCheckpoint(eager=False)
    )
    docfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.where(F.col(text_col).isNotNull()).agg(
        F.count(F.lit(1)).alias("_N")
    )
    scored = (
        tf.join(docfreq.where(F.col("df") >= min_df), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc",
            "token",
            "tf",
            "df",
            (
                F.col("tf")
                * (
                    F.log(
                        (F.col("_N") + F.lit(1)).cast("double")
                        / (F.col("df") + F.lit(1)).cast("double")
                    )
                    + F.lit(1.0)
                )
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc").orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )

"""Learned byte-pair encoding: merge-table learning + distributed encode.

A training-data pipeline needs a real tokenizer, not just the regex token
*counter* in ``functions/text.py`` — this module learns a BPE merge table
from a corpus and encodes documents with it, both as Spark-first dataflows:

- ``learn_bpe``: ONE distributed word-frequency aggregation (split →
  explode → groupBy — the only corpus-sized pass), then the classic greedy
  merge loop over the *word-frequency table* on the driver (Sennrich-style:
  pair statistics are exactly computable from word counts, so the loop
  touches vocabulary-sized data, never corpus-sized).  The collect is
  bounded by ``max_words`` + ``min_count`` long-tail pruning — at web scale
  the frequency table of the surviving vocabulary is MBs, not TBs.
- ``encode_bpe``: encodes only the DISTINCT words (vocabulary-bounded
  Arrow-batched kernel), then broadcast-joins the word → token-array map
  back onto the corpus — the corpus-sized pass stays pure column exprs
  (split / explode / join / agg), no per-document Python.
- ``learn_bpe_reference`` / ``encode_word_reference``: pure-Python twins
  (no Spark) used as independent oracles in tests and gate SQL generation.

Determinism: merge selection orders by (count DESC, pair lexicographic
ASC) — ties break identically in the driver loop and the pure twin, so
``learn_bpe == learn_bpe_reference`` exactly, and encode follows the
GPT-2-style lowest-rank-first merge, which reproduces the learned merge
order word-locally.

Reference lineage: the reference tool has no tokenizer (it exports
serialized graphs); this operator extends the engine's training-pipeline
surface (SURVEY.md §6 extras) the same way dedup/decontamination did.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# deterministic seed corpus for the driver gate (q46)
#
# The gate's merge table must be scale-independent (the DuckDB oracle embeds
# the learned word→token map as literals), so learning runs over this fixed
# weighted vocabulary — the generic data-engineering words the synthetic
# documents tables are built from.  The distributed learner still executes
# its full split→explode→groupBy→collect path over it; learning from
# arbitrary corpora at scale is covered by pytest (distributed == pure twin
# on random corpora) since a corpus-dependent merge table cannot have a
# closed-form SQL oracle.
# ---------------------------------------------------------------------------

BPE_SEED_VOCAB: list[str] = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]


def seed_word_counts() -> dict[str, int]:
    """Deterministic word weights for the gate's learning corpus."""
    return {w: 3 + (7 * i) % 13 for i, w in enumerate(BPE_SEED_VOCAB)}


def seed_corpus_lines() -> list[str]:
    """The seed corpus as text lines (one per word, repeated by weight) so
    ``learn_bpe`` exercises its real distributed aggregation path."""
    return [" ".join([w] * n) for w, n in seed_word_counts().items()]


# ---------------------------------------------------------------------------
# pure-Python reference (oracle twin; also the driver-side merge loop)
# ---------------------------------------------------------------------------

def _pair_counts(word_counts: dict[tuple[str, ...], int]) -> Counter:
    pairs: Counter = Counter()
    for sym, n in word_counts.items():
        for i in range(len(sym) - 1):
            pairs[(sym[i], sym[i + 1])] += n
    return pairs


def _merge_word(sym: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(sym):
        if i < len(sym) - 1 and (sym[i], sym[i + 1]) == pair:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def learn_bpe_reference(
    word_counts: dict[str, int], n_merges: int, min_pair_count: int = 2
) -> list[tuple[str, str]]:
    """Greedy BPE merge learning over a word-frequency table.

    Returns up to ``n_merges`` merges in learned order.  Deterministic:
    each step picks the pair with (max count, then lexicographically
    smallest pair); stops early when the best pair occurs fewer than
    ``min_pair_count`` times."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, n in word_counts.items():
        if w:
            vocab[tuple(w)] = vocab.get(tuple(w), 0) + n
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        pair = best[0]
        merges.append(pair)
        vocab = {
            _merge_word(sym, pair): n for sym, n in vocab.items()
        }
    return merges


def encode_word_reference(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """GPT-2-style encode: repeatedly merge the present pair with the
    lowest learned rank until no learned pair remains."""
    sym = list(word)
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


# ---------------------------------------------------------------------------
# distributed learn / encode
# ---------------------------------------------------------------------------

def word_counts_df(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over whitespace-split text — the one corpus-sized
    aggregation in BPE learning (map-side partial agg, one shuffle on the
    word key)."""
    return (
        df.select(
            F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def learn_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_pair_count: int = 2,
    min_count: int = 1,
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn a BPE merge table from a corpus DataFrame.

    The corpus collapses to its word-frequency table distributed-side;
    ``min_count`` prunes the long tail and ``max_words`` bounds the driver
    collect (top-N by (count DESC, word ASC), deterministic under ties).
    The greedy merge loop then runs on the driver over vocabulary-sized
    data — identical math to ``learn_bpe_reference`` by construction."""
    wc = word_counts_df(df, text_col)
    if min_count > 1:
        wc = wc.filter(F.col("count") >= min_count)
    rows = (
        wc.orderBy(F.col("count").desc(), F.col("word"))
        .limit(max_words)
        .collect()
    )
    return learn_bpe_reference(
        {r["word"]: r["count"] for r in rows}, n_merges, min_pair_count
    )


def encode_vocab_df(
    spark_or_df, merges: list[tuple[str, str]], words: DataFrame | None = None
) -> DataFrame:
    """(word, tokens array<string>) for every distinct word in ``words``
    (a one-column DataFrame) — the vocabulary-bounded encode stage.  The
    Arrow-batched kernel runs the reference encode per DISTINCT word; the
    corpus never passes through Python."""
    import pandas as pd

    words_df = words if words is not None else spark_or_df
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def _enc(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "tokens": [
                        encode_word_reference(w, ranks) if isinstance(w, str) else []
                        for w in pdf["word"]
                    ],
                }
            )

    return words_df.select("word").distinct().mapInPandas(
        _enc, schema="word string, tokens array<string>"
    )


def encode_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BPE encoding stats over the corpus.

    Emits ``(id_col, n_tokens, max_word_tokens, head_tokens)`` where
    ``head_tokens`` is the '|'-joined encoding of the document's first
    word.  Plan shape: posexplode the split text (keeps word order),
    broadcast-join the vocabulary encode map, one keyed agg back to
    documents — the scale-safe shape (vocabulary broadcast is bounded by
    ``learn_bpe``'s ``max_words``; corpus side is pure column exprs)."""
    spark = df.sparkSession

    words = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\s+")).alias("pos", "word"),
    ).filter(F.col("word") != "")
    vocab = encode_vocab_df(None, merges, words=words)

    joined = words.join(F.broadcast(vocab), "word")
    return (
        joined.groupBy(id_col)
        .agg(
            F.sum(F.size("tokens")).alias("n_tokens"),
            F.max(F.size("tokens")).alias("max_word_tokens"),
            F.array_join(
                F.min(F.struct("pos", "tokens"))["tokens"], "|"
            ).alias("head_tokens"),
        )
    )

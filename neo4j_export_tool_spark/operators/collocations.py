"""PMI / NPMI collocation scoring over co-occurrence pairs.

The association measure behind word2vec-style phrase detection
(Mikolov et al. 2013's word2phrase) and KG relation-strength scoring:
for a pair event table (one row per observed (a, b) co-occurrence —
e.g. the raw output of ``skipgram_pairs``, or (doc, concept) mention
pairs), PMI(a,b) = ln( p(a,b) / (p(a)·p(b)) ) with probabilities
estimated from the pair counts, and NPMI = PMI / -ln p(a,b) (Bouma
2009), normalized to [-1, 1].

Scale shape: one (a, b) count agg, two marginal aggs over the (much
smaller) pair-count table, two equi-joins back, and ONE single-row
broadcast crossJoin for the corpus total — a scalar, not a data-sized
array (the ``negative_samples`` one-row-array ceiling does not apply
to an O(1) row).  Everything else is per-row arithmetic on exact
int64 counts, so the doubles are a pure per-row function of the
counts — bit-identical across partitionings with no sorted-fold
needed (there is no float aggregation at all).

``min_count`` drops rare pairs AFTER counting; marginals and the
total are computed over the unfiltered counts, so the probabilities
are unbiased by the filter (the word2phrase convention).

NPMI is NULL for a pair with n == N (sole pair type: -ln p = 0); PMI
is still defined there.  Independent python twin in
tests/test_collocations.py (ints exact, floats rel 1e-12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pmi_scores(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    min_count: int = 1,
    count_col: str | None = None,
) -> DataFrame:
    """(a, b, n, n_a, n_b, pmi, npmi) for every distinct pair with
    ``n >= min_count``.  ``n_a``/``n_b`` are the marginal counts of the
    left/right slots over ALL pair events (unfiltered), N their total.
    Null-keyed rows are dropped (a null slot is a non-event).

    ``count_col`` names a pre-aggregated event count per (a, b) row —
    pass it when the caller already holds the frequency table (e.g.
    ``skipgram_pairs(..., with_counts=True)``).  The counts are still
    re-aggregated (a cheap sum over the already-small table, NOT the
    event-level count over the raw pairs), so a caller whose table is
    not truly unique per (a, b) gets correct scores instead of
    per-partial-row garbage; counts must be integers ≥ 1 (asserted
    in-plan).  Scores are identical to feeding the raw events.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    if count_col is None:
        counts = (
            pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
            .where(F.col("a").isNotNull() & F.col("b").isNotNull())
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("n"))
        )
    else:
        # re-aggregate even "pre-aggregated" input: a caller whose table
        # is not truly unique per (a, b) would otherwise get per-row
        # partial n against whole-table marginals — silently wrong
        # PMI/NPMI per duplicate row (r6 advice item).  On an already-
        # unique table the agg is a cheap pass-through; non-positive
        # counts are rejected in-plan (the module's reject convention).
        n_raw = F.col(count_col).cast("long")
        chk = F.assert_true(
            n_raw.isNotNull() & (n_raw >= 1) & (F.col(count_col) == n_raw),
            F.lit("pmi_scores: count_col must hold integers >= 1"),
        )
        counts = (
            pairs.select(
                F.col(a_col).alias("a"),
                F.col(b_col).alias("b"),
                F.when(chk.isNull(), n_raw).alias("n"),
            )
            .where(F.col("a").isNotNull() & F.col("b").isNotNull())
            .groupBy("a", "b")
            .agg(F.sum("n").alias("n"))
        )
    counts = counts.localCheckpoint(
        eager=False
    )  # reused by marginals, total, joins
    n_a = counts.groupBy("a").agg(F.sum("n").alias("n_a"))
    n_b = counts.groupBy("b").agg(F.sum("n").alias("n_b"))
    total = counts.agg(F.sum("n").alias("_N"))
    scored = (
        counts.where(F.col("n") >= min_count)
        .join(n_a, "a")
        .join(n_b, "b")
        .crossJoin(F.broadcast(total))
    )
    ln = lambda c: F.log(c.cast("double"))  # noqa: E731
    pmi = ln(F.col("n")) + ln(F.col("_N")) - ln(F.col("n_a")) - ln(F.col("n_b"))
    neg_ln_p = ln(F.col("_N")) - ln(F.col("n"))
    return scored.select(
        "a",
        "b",
        "n",
        "n_a",
        "n_b",
        pmi.alias("pmi"),
        F.when(neg_ln_p != 0.0, pmi / neg_ln_p).alias("npmi"),
    )

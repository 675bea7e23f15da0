"""KG schema induction: predicate cardinality profiles and type
signatures.

A freshly constructed KG has no ontology; the first schema questions
are per-predicate — is this relation functional? one-to-one? what
entity types does it connect?  (VoID-style dataset statistics / the
property-cardinality analysis of RDF profiling literature.)  Both
operators are pure keyed aggregations over the triple table — exact
integer counts plus per-row double ratios, no float aggregation, so
results are engine/partitioning-independent and DuckDB-twinnable
(tests/test_ontology.py replays both in SQL).

Assertions are deduplicated first (`distinct (s, p, o)`): a triple
asserted twice is still one fact, and repeated assertions would skew
every cardinality ratio.

Scale shape: `predicate_profile` is one distinct + one groupBy with
four count-distinct-style aggs per predicate key (Spark plans
multi-distinct via expand — linear, one shuffle keyed by predicate;
predicate skew is bounded by the KG's own predicate vocabulary).
`type_signatures` adds two (usually broadcast) joins against the node
type table and one signature-keyed count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def predicate_profile(
    triples: DataFrame, s_col: str, p_col: str, o_col: str
) -> DataFrame:
    """One row per predicate: (predicate, n_triples, n_subjects,
    n_objects, subj_functional, obj_functional, cardinality).

    ``subj_functional`` = every subject has exactly one object;
    ``obj_functional`` = every object has exactly one subject;
    ``cardinality`` ∈ {'1:1', '1:N', 'N:1', 'N:M'} reading
    subject→object (``1:N`` = a subject may have many objects, each
    object one subject).  Null-component triples are dropped.
    """
    t = (
        triples.select(
            F.col(s_col).alias("s"),
            F.col(p_col).alias("p"),
            F.col(o_col).alias("o"),
        )
        .where(
            F.col("s").isNotNull()
            & F.col("p").isNotNull()
            & F.col("o").isNotNull()
        )
        .distinct()
    )
    prof = t.groupBy(F.col("p").alias("predicate")).agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct("s").alias("n_subjects"),
        F.countDistinct("o").alias("n_objects"),
    )
    subj_fn = F.col("n_triples") == F.col("n_subjects")
    obj_fn = F.col("n_triples") == F.col("n_objects")
    card = (
        F.when(subj_fn & obj_fn, "1:1")
        .when(subj_fn, "N:1")
        .when(obj_fn, "1:N")
        .otherwise("N:M")
    )
    return prof.select(
        "predicate",
        "n_triples",
        "n_subjects",
        "n_objects",
        subj_fn.alias("subj_functional"),
        obj_fn.alias("obj_functional"),
        card.alias("cardinality"),
    )


def type_signatures(
    triples: DataFrame,
    types: DataFrame,
    s_col: str,
    p_col: str,
    o_col: str,
    node_col: str,
    type_col: str,
    unknown: str = "?",
) -> DataFrame:
    """One row per (subject_type, predicate, object_type) signature:
    (s_type, predicate, o_type, n_triples, share) where ``share`` is
    the signature's fraction of its predicate's deduplicated triples.
    Nodes missing from ``types`` get the ``unknown`` marker; a node
    with several types contributes one signature per type (so a
    predicate's shares can sum past 1 — the standard multi-type
    convention).  Share is a single double division of exact int64s.
    """
    t = (
        triples.select(
            F.col(s_col).alias("s"),
            F.col(p_col).alias("p"),
            F.col(o_col).alias("o"),
        )
        .where(
            F.col("s").isNotNull()
            & F.col("p").isNotNull()
            & F.col("o").isNotNull()
        )
        .distinct()
    )
    ty = types.select(
        F.col(node_col).alias("_n"), F.col(type_col).alias("_t")
    ).distinct()
    typed = (
        t.join(ty.withColumnRenamed("_n", "s").withColumnRenamed("_t", "_st"),
               "s", "left")
        .join(ty.withColumnRenamed("_n", "o").withColumnRenamed("_t", "_ot"),
              "o", "left")
        .select(
            F.coalesce("_st", F.lit(unknown)).alias("s_type"),
            F.col("p").alias("predicate"),
            F.coalesce("_ot", F.lit(unknown)).alias("o_type"),
        )
    )
    sigs = typed.groupBy("s_type", "predicate", "o_type").agg(
        F.count(F.lit(1)).alias("n_triples")
    )
    totals = t.groupBy(F.col("p").alias("predicate")).agg(
        F.count(F.lit(1)).alias("_tot")
    )
    return sigs.join(totals, "predicate").select(
        "s_type",
        "predicate",
        "o_type",
        "n_triples",
        (F.col("n_triples").cast("double") / F.col("_tot")).alias("share"),
    )

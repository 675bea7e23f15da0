"""Graph-embedding corpus plan: KG → skip-gram training set in one call.

Composes the round-6 graph operators into the pipeline a graph-
embedding team runs over a freshly materialized KG (each stage is
individually twin-verified; this plan is the composition —
`plans/corpus_prep.py` is the text sibling):

    mention edges → co-occurrence projection → deterministic neighbor
    cap → node2vec walks → skip-gram pair counts → PMI scores
    → per-mille train/val/test splits

(Corrupted-tail NEGATIVES for triple-embedding training are a separate
surface — ``functions/sampling.py::negative_samples`` over a triple
table; skip-gram training draws its negatives from the pair frequency
table this plan emits.)

Scale shapes inherited from the stages: the projection and cap are one
shuffle each, walks are walk_len rounds of linear joins on the CAPPED
graph (the hub-expansion ceiling `cap_neighbors` documents), the pair
explosion is zero-shuffle and counted ONCE (shared by the split table
and PMI), PMI is two marginal aggs, splits are a pure projection.  Determinism end to end: every stage is hash- or
integer-exact, so the same KG, knobs, and salts produce the same
training set — resume- and engine-independent.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neo4j_export_tool_spark.functions.sampling import assign_splits
from neo4j_export_tool_spark.operators.collocations import pmi_scores
from neo4j_export_tool_spark.operators.triangles import cooccurrence_edges
from neo4j_export_tool_spark.operators.walks import (
    cap_neighbors,
    node2vec_walks,
    skipgram_pairs,
)


@dataclass
class EmbeddingPrepResult:
    pairs: DataFrame       # (center, context, n, split)
    collocations: DataFrame  # (a, b, n, n_a, n_b, pmi, npmi)
    metrics: dict = field(default_factory=dict)


def prepare_embedding_corpus(
    mentions: DataFrame,
    doc_col: str = "doc_id",
    concept_col: str = "concept",
    max_concepts_per_doc: int = 256,
    max_neighbors_per_node: int = 32,
    walk_len: int = 10,
    walks_per_node: int = 2,
    w_return: int = 1,
    w_near: int = 2,
    w_far: int = 4,
    window: int = 2,
    min_pair_count: int = 2,
    splits: dict[str, int] | None = None,
    salt: str = "embed",
) -> EmbeddingPrepResult:
    """Run the full graph-embedding prep; returns the split-labeled
    skip-gram frequency table, the PMI collocation table, and per-stage
    counts (the numbers the training data card reports).

    The co-occurrence projection carries the `max_concepts_per_doc`
    mega-doc guard; the symmetrized graph is neighbor-capped BEFORE
    walking (the hub-expansion ceiling); walks are node2vec-biased with
    integer class weights.  Pairs are aggregated to (center, context,
    n) and split-labeled by the deterministic per-mille bucket of the
    pair key, so growing the corpus never moves a pair between splits.
    """
    edges = cooccurrence_edges(
        mentions, doc_col, concept_col,
        max_concepts_per_doc=max_concepts_per_doc,
    ).localCheckpoint(eager=False)  # shared by the capped-graph build
    # AND the n_cooccurrence_edges metric count — one evaluation, not two
    sym = edges.select("c1", "c2").unionByName(
        edges.select(F.col("c2").alias("c1"), F.col("c1").alias("c2"))
    )
    capped = cap_neighbors(sym, "c1", "c2", max_neighbors_per_node, salt)
    capped = capped.localCheckpoint(eager=False)

    walks = node2vec_walks(
        capped, "c1", "c2",
        walk_len=walk_len, walks_per_node=walks_per_node,
        w_return=w_return, w_near=w_near, w_far=w_far, salt=salt,
    ).localCheckpoint(eager=False)

    counted_all = skipgram_pairs(
        walks, "path", window=window, with_counts=True
    ).localCheckpoint(eager=False)  # shared by the split table AND PMI
    counted = counted_all.where(F.col("n") >= min_pair_count)
    labeled = assign_splits(
        counted.withColumn(
            # separator matters: concat without one would collide
            # ("spark","joinshuffle") with ("sparkjoin","shuffle") into
            # one split bucket - a train/test-leakage channel
            "_pair_key", F.concat_ws("|", "center", "context")
        ),
        "_pair_key",
        splits,
        salt=salt,
    ).drop("_pair_key")

    colloc = pmi_scores(
        counted_all, "center", "context",
        min_count=min_pair_count, count_col="n",
    )

    metrics = {
        "n_mentions": mentions.count(),
        "n_cooccurrence_edges": edges.count(),
        "n_capped_directed_edges": capped.count(),
        "n_walks": walks.count(),
        "n_pairs": labeled.count(),
        "n_collocations": colloc.count(),
    }
    return EmbeddingPrepResult(
        pairs=labeled, collocations=colloc, metrics=metrics
    )

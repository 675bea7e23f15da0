"""Deduplication family for training-data pipelines.

Five tiers, all DataFrame-native:

- ``exact_dedup``       — sha256(content) hash-groupBy.
- ``jaccard_pairs``     — exact word-shingle set-similarity join (the verify
                          kernel; quadratic in the worst case, use on blocked
                          candidates or small partitions).
- ``minhash_lsh_pairs`` — MinHash signatures → LSH band explode → bucket
                          equi-join → exact-Jaccard verification.  The 100 TB
                          path: candidate generation touches only docs that
                          share a band bucket.
- ``simhash_fingerprints`` / ``simhash_pairs`` — 32-bit SimHash + banded
                          Hamming-distance candidate join.
- ``embedding_neardup_pairs`` — cosine near-duplicates over an embedding
                          column (brute force; the ANN module provides the
                          bucketed scale path).

Thresholds are evaluated in INTEGER arithmetic (``100*shared >=
t*(na+nb-shared)``) so results are bit-stable across engines.

Scale notes: the shingle self-join shuffles on shingle hash — frequent
shingles create skew, so ``jaccard_pairs`` drops shingles with document
frequency above ``max_shingle_df`` (stop-shingle pruning, standard in the
distributed set-similarity-join literature — see PAPERS.md: "Set Similarity
Joins on MapReduce: An Experimental Survey", VLDB 2018, and "Scalable and
Robust Set Similarity Join", ICDE 2018 — high-df tokens generate O(df²)
candidate pairs while carrying almost no signal).  LSH bands shuffle on
(band, key), which is uniform by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neo4j_export_tool_spark.functions.similarity import (
    hamming_dist_col,
    simhash_col,
    tokens_col,
    word_shingles_col,
)


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """(content_sha256, canonical_id, n_copies) — canonical = min id."""
    return (
        df.groupBy(F.sha2(F.col(content_col), 256).alias("content_sha256"))
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _shingle_sets(
    df: DataFrame, text_col: str, id_col: str, shingle_n: int
) -> DataFrame:
    from neo4j_export_tool_spark.functions.partitioning import fan_out

    toks = tokens_col(F.col(text_col))
    # The non-empty-set filter expressed on the RAW text, not on the
    # computed shingle column: Catalyst pushes a filter on a computed
    # column below the exchange by substituting the full expression, so
    # the old ``size(shingles) > 0`` form evaluated the entire shingle
    # build twice — once single-threaded on the scan side (measured: the
    # whole corpus shingled inside one map task) and again above.  For
    # word n-grams the set is empty iff the doc has fewer than n tokens
    # (n=1: split() never yields an empty array), so the cheap predicate
    # is exactly equivalent.
    keep = F.col(text_col).isNotNull()
    if shingle_n > 1:
        keep = keep & (F.size(toks) >= shingle_n)
    return fan_out(df.filter(keep), key=id_col).select(
        F.col(id_col).alias("doc"),
        word_shingles_col(toks, shingle_n).alias("shingles"),
    )


def _verify_candidate_pairs(
    candidates: DataFrame, sets: DataFrame, threshold_pct: int,
    use_local_checkpoint: bool = True,
) -> DataFrame:
    """Exact-Jaccard verify of a candidate-pair table against the shingle
    sets: (doc_a, doc_b, shared, n_a, n_b) at the integer threshold.

    No side is FORCED broadcast: candidate volume is workload-dependent
    (LSH band collisions scale superlinearly on self-similar corpora), so
    an unconditional pair-side broadcast would be a driver hazard at
    scale, while the shingle-set side carries size statistics through its
    materialization — the planner broadcasts it only while it actually
    fits and falls back to shuffle joins beyond that, which is the
    correct shape on both ends."""
    sh = sets.select("doc", "shingles")
    half = candidates.join(
        sh.withColumnsRenamed({"doc": "doc_a", "shingles": "sh_a"}), "doc_a"
    )
    scored = (
        half
        .join(sh.withColumnsRenamed({"doc": "doc_b", "shingles": "sh_b"}), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("shared"),
            F.size("sh_a").alias("n_a"),
            F.size("sh_b").alias("n_b"),
        )
        # materialization barrier: without it Catalyst collapses the
        # threshold filter into the join condition and evaluates the
        # array_intersect per pair THREE times (twice in the condition,
        # once in the project) — at 3×10⁵ candidates that tripled the
        # verify stage.  The materialized rows are five scalars per pair.
    )
    scored = _materialize(scored, use_local_checkpoint)
    return scored.filter(
        100 * F.col("shared")
        >= threshold_pct * (F.col("n_a") + F.col("n_b") - F.col("shared"))
    ).select("doc_a", "doc_b", "shared", "n_a", "n_b")



def _materialize(df: DataFrame, use_local_checkpoint: bool) -> DataFrame:
    """Materialize a subplan reused across join branches.  localCheckpoint
    is fastest but its blocks die with an executor; ``False`` falls back to
    a recomputable persist for spot/dynamic-allocation clusters (same knob
    as `connected_components(use_local_checkpoint=...)`)."""
    return df.localCheckpoint(eager=False) if use_local_checkpoint else df.persist()


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold_pct: int = 60,
    shingle_n: int = 3,
    max_shingle_df: int | None = None,
    max_shingle_df_frac: float | None = None,
    use_local_checkpoint: bool = True,
) -> DataFrame:
    """Exact n-gram-shingle Jaccard pairs: (doc_a, doc_b, shared, n_a, n_b)
    with 100*shared >= threshold_pct*(n_a+n_b-shared).  Integer-exact.

    ``max_shingle_df`` prunes stop-shingles (posting rows whose shingle
    appears in more than that many docs) via a left-semi join BEFORE the
    posting self-join — the self-join is O(Σ df²) per shingle, so one hot
    boilerplate shingle ("click here to subscribe") otherwise turns the
    kernel into a quadratic skew bomb at web scale.  Pruning only shrinks
    ``shared`` counts (sizes stay exact), so surviving pairs are a subset.

    ``max_shingle_df_frac`` is the SCALE-SAFE form: the cap as a fraction
    of the corpus document count (resolved as ``max(2, floor(frac·N))``,
    N = one count over the INPUT ``df`` — including docs too short to
    yield a shingle, as "fraction of the corpus" promises).  An
    absolute cap of 20 is always wrong at 10^12 docs — "appears in >0.1%
    of documents" is the boilerplate definition that survives a 100×
    scale-up.  Mutually exclusive with ``max_shingle_df``.

    The shingle-set plan is localCheckpoint'd: sizes, the df counts, and
    BOTH sides of the self-join reuse one materialization instead of
    re-tokenizing the corpus per branch (~5 evaluations otherwise); the
    blocks free themselves when the plan is garbage-collected.
    """
    if max_shingle_df is not None and max_shingle_df_frac is not None:
        raise ValueError(
            "pass max_shingle_df (absolute) or max_shingle_df_frac "
            "(fraction of corpus), not both"
        )
    if max_shingle_df_frac is not None:
        # N = input corpus count (docstring contract), not the set-table
        # count, which silently excludes docs shorter than shingle_n
        max_shingle_df = max(2, int(max_shingle_df_frac * df.count()))
    sets = _materialize(
        _shingle_sets(df, text_col, id_col, shingle_n), use_local_checkpoint
    )
    sizes = sets.select("doc", F.size("shingles").alias("n"))
    posting = sets.select("doc", F.explode("shingles").alias("shingle"))
    if max_shingle_df is not None:
        df_counts = posting.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        posting = posting.join(
            df_counts.filter(F.col("df") <= max_shingle_df).select("shingle"),
            "shingle",
            "left_semi",
        )
        # with df bounded, pair generation per shingle is ≤ df(df-1)/2 —
        # group the (sorted) doc list per shingle and emit i<j pairs with
        # one HOF explode instead of the posting self-join: one fewer
        # exchange and no sort-merge of shingle strings.  ONLY safe under
        # pruning: an unbounded collect_list on a hot shingle is exactly
        # the skew bomb the prune exists to kill.
        lists = (
            posting.groupBy("shingle")
            .agg(F.sort_array(F.collect_list("doc")).alias("docs"))
            .filter(F.size("docs") >= 2)
        )
        pairs = lists.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(0), F.size("docs") - 2),
                        lambda i: F.transform(
                            F.sequence(i + F.lit(1), F.size("docs") - 1),
                            lambda j: F.struct(
                                F.element_at(F.col("docs"), i + 1).alias("doc_a"),
                                F.element_at(F.col("docs"), j + 1).alias("doc_b"),
                            ),
                        ),
                    )
                )
            ).alias("p")
        ).select("p.doc_a", "p.doc_b")
        shared = pairs.groupBy("doc_a", "doc_b").agg(
            F.count(F.lit(1)).alias("shared")
        )
    else:
        a = posting.alias("a")
        b = posting.alias("b")
        shared = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc") < F.col("b.doc")),
            )
            .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("shared"))
        )
    out = (
        shared.join(sizes.withColumnsRenamed({"doc": "doc_a", "n": "n_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc": "doc_b", "n": "n_b"}), "doc_b")
        .filter(
            100 * F.col("shared")
            >= threshold_pct * (F.col("n_a") + F.col("n_b") - F.col("shared"))
        )
    )
    return out.select("doc_a", "doc_b", "shared", "n_a", "n_b")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold_pct: int = 60,
    shingle_n: int = 3,
    k: int = 64,
    bands: int = 32,
    seed: int = 1,
    use_local_checkpoint: bool = True,
    max_bucket_size: int | None = None,
    max_bucket_frac: float | None = None,
) -> DataFrame:
    """MinHash-LSH near-dup pairs over word shingles, exact-verified.

    k=64 / b=32 / r=2: a true pair at Jaccard 0.6 escapes all bands with
    probability (1-0.36)^32 ≈ 6e-7 — effectively recall 1, so the verified
    output equals `jaccard_pairs` at the same threshold while candidate
    generation stays near-linear.
    """
    if max_bucket_frac is not None:
        # resolve the fraction against the INPUT corpus count here, where
        # df is in scope — the set table excludes docs shorter than
        # shingle_n, so its count under-states N on short-doc corpora
        if max_bucket_size is not None:
            raise ValueError(
                "pass max_bucket_size (absolute) or max_bucket_frac "
                "(fraction of corpus), not both"
            )
        max_bucket_size = max(2, int(max_bucket_frac * df.count()))
        max_bucket_frac = None
    sets = _shingle_sets(df, text_col, id_col, shingle_n)
    return minhash_lsh_pairs_from_sets(
        sets, threshold_pct=threshold_pct, k=k, bands=bands, seed=seed,
        use_local_checkpoint=use_local_checkpoint,
        max_bucket_size=max_bucket_size, max_bucket_frac=max_bucket_frac,
    )


def minhash_lsh_pairs_from_sets(
    sets: DataFrame,
    threshold_pct: int = 60,
    k: int = 64,
    bands: int = 32,
    seed: int = 1,
    use_local_checkpoint: bool = True,
    max_bucket_size: int | None = None,
    max_bucket_frac: float | None = None,
) -> DataFrame:
    """MinHash-LSH over a precomputed (doc, shingles array<string>) table —
    the generic entry used for both document near-dup (word shingles) and
    surface-form canonicalization (char shingles).

    Signature stage: shingles are md5-hashed JVM-side (one array
    expression, `hashed_shingles_col`), then the k minima and band keys
    are computed in ONE Arrow-batched numpy kernel — SHUFFLE-FREE (the
    previous explode → 64-min-agg groupBy both shuffled the posting list
    AND carried a plan so large that Catalyst compile time dominated
    small inputs; measured seconds per query regardless of data size).
    The kernel's integer math — min((h·a + b) mod p) over int64, products
    < 2⁶² — and its md5-of-":"-joined-decimal band keys are bit-identical
    to the old expression form, so candidate generation (and therefore
    the verified output) is unchanged.  At 10^12 docs the signature stage
    is now a linear map; only the band-bucket join shuffles.

    ``max_bucket_size`` (default off — the driver gate runs exact): the
    scale knob for hot band buckets, the q13 ``max_shingle_df`` analog.
    A bucket of size m yields m(m-1)/2 candidate pairs (the a<b
    self-join — O(m²) growth); corpora whose shingle
    space saturates (measured: the closed-vocab sf1 stress sweep, where
    band-bucket collisions between NON-near-dups made q14 the one
    super-linear gate at 11×) can cap bucket size and skip the hot
    buckets entirely.  Pairs found only through a skipped bucket are
    lost (a recall trade, like every LSH df-cap); true near-dup pairs
    still surface through any of the other ``bands-1`` bands, so the
    recall loss is bounded by the probability that EVERY band of a pair
    lands hot — small unless the corpus is pathologically self-similar.

    ``max_bucket_frac`` is the SCALE-SAFE form: the cap as a fraction of
    the corpus document count (``max(2, floor(frac·N))``; callers that
    enter through `minhash_lsh_pairs` resolve N from the input corpus
    count, while this generic sets-table entry — which never sees the
    input df — resolves N from the set-table row count, i.e. docs with a
    non-empty shingle set) — an absolute bucket
    cap is always wrong at 10^12 docs, a "no bucket may hold >0.1% of
    the corpus" rule is not.  Mutually exclusive with
    ``max_bucket_size``."""
    from neo4j_export_tool_spark.functions.similarity import (
        MERSENNE_PRIME,
        _lcg,
        hashed_shingles_col,
    )

    rows = k // bands
    rnd = _lcg(seed)
    params = []
    for _ in range(k):
        a = next(rnd) % (MERSENNE_PRIME - 1) + 1
        b = next(rnd) % MERSENNE_PRIME
        params.append((a, b))

    if max_bucket_size is not None and max_bucket_frac is not None:
        raise ValueError(
            "pass max_bucket_size (absolute) or max_bucket_frac "
            "(fraction of corpus), not both"
        )
    # the shingle-set plan feeds the signature kernel AND both verify
    # joins; materialize it once (blocks freed when the plan is GC'd)
    sets = _materialize(sets, use_local_checkpoint)
    if max_bucket_frac is not None:
        max_bucket_size = max(2, int(max_bucket_frac * sets.count()))

    import hashlib
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    id_type = next(
        f.dataType.simpleString() for f in sets.schema if f.name == "doc"
    )
    A = np.array([a for a, _ in params], dtype=np.int64)
    B = np.array([b for _, b in params], dtype=np.int64)

    def band_keys(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            docs_out: list = []
            bands_out: list = []
            keys_out: list = []
            for doc, hs in zip(pdf["doc"], pdf["hs"]):
                if hs is None or not len(hs):
                    continue
                h = np.asarray(hs, dtype=np.int64)
                sig = ((h[:, None] * A[None, :]) + B[None, :]) % MERSENNE_PRIME
                m = sig.min(axis=0)
                for band in range(bands):
                    key = hashlib.md5(
                        ":".join(
                            str(int(m[band * rows + r])) for r in range(rows)
                        ).encode()
                    ).hexdigest()
                    docs_out.append(doc)
                    bands_out.append(band)
                    keys_out.append(key)
            yield pd.DataFrame(
                {"doc": docs_out, "band": bands_out, "key": keys_out}
            )

    banded = sets.select(
        "doc", hashed_shingles_col(F.col("shingles")).alias("hs")
    ).mapInPandas(band_keys, schema=f"doc {id_type}, band int, key string")
    # the band table self-joins: materialize so the signature kernel runs
    # once, not once per join side
    banded = _materialize(banded, use_local_checkpoint)

    if max_bucket_size is not None:
        # drop hot buckets BEFORE the self-join — the m² pair blowup never
        # materializes; one extra keyed agg + left-semi, both on the
        # already-materialized band table
        small = (
            banded.groupBy("band", "key")
            .count()
            .filter(F.col("count") <= max_bucket_size)
            .select("band", "key")
        )
        banded = banded.join(small, ["band", "key"], "left_semi")

    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )

    # exact verification on the candidate set only (pair side = build side)
    return _verify_candidate_pairs(
        candidates, sets, threshold_pct, use_local_checkpoint
    )


def simhash_fingerprints(
    df: DataFrame, text_col: str, id_col: str, bits: int = 32
) -> DataFrame:
    """(doc, simhash) fingerprints — bit-exact in any engine."""
    return df.select(
        F.col(id_col).alias("doc"),
        simhash_col(tokens_col(F.col(text_col)), bits=bits).alias("simhash"),
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    bits: int = 32,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Candidate generation: split the fingerprint into ``bands`` bit-blocks;
    by pigeonhole any pair within ``max_hamming < bands`` shares at least one
    exact block → equi-join per block, then verify the true distance.
    """
    fps = simhash_fingerprints(df, text_col, id_col, bits=bits)
    block_bits = bits // bands
    mask = (1 << block_bits) - 1
    blocks = fps.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("simhash"), i * block_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    a = blocks.alias("a")
    b = blocks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            hamming_dist_col(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def _infer_dim(df: DataFrame, vec_col: str) -> int | None:
    """Vector dimension from the first NON-NULL vector; None on empty/
    all-null input (callers return an empty result then)."""
    row = (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.size(F.col(vec_col)).alias("d"))
        .first()
    )
    return int(row["d"]) if row is not None else None


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    min_cosine: float = 0.95,
    dim: int | None = None,
    strategy: str = "blocked",
    rows_per_block: int = 4096,
    use_local_checkpoint: bool = True,
) -> DataFrame:
    """Exact cosine near-dup pairs over ALL vector pairs.

    ``strategy="blocked"`` (default): block-matrix filter-then-verify.
    Vectors pack into row blocks; every unordered block pair is one task
    running an Arrow-batched numpy GEMM (BLAS — orders of magnitude faster
    than per-pair expressions) as a PREFILTER with an epsilon-widened
    threshold, then the few surviving candidates recompute the cosine with
    sequential left-associated double accumulation — bit-identical to the
    codegen/DuckDB formula, so the output is EXACT, not approximate.
    Still O(n²) flops by definition of the exact baseline (the scale path
    is `operators.ann.hyperplane_lsh_pairs`), but the quadratic part runs
    at GEMM speed and distributes as B(B+1)/2 independent block tasks.

    ``strategy="codegen"``: the all-pairs join with a fixed-dim unrolled
    dot (kept for cross-checking; same bits, ~50× slower).
    """
    if strategy == "codegen":
        return _embedding_neardup_pairs_codegen(df, vec_col, id_col, min_cosine, dim)

    import math

    import numpy as np
    import pandas as pd

    dim = dim or _infer_dim(df, vec_col)
    id_type = next(f.dataType.simpleString() for f in df.schema if f.name == id_col)
    n = df.count()
    n_blocks = max(1, math.ceil(n / rows_per_block))
    base = df.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("blk"),
        F.col(id_col).alias("id"),
        # match the codegen path's semantics exactly: null vectors and
        # vectors shorter than the inferred dim produce null terms there
        # (→ null cosine → filtered); longer vectors are read only up to
        # dim.  Filter + slice reproduces that: drop short/null, truncate
        # long.
        F.slice(F.col(vec_col).cast("array<double>"), 1, dim).alias("v"),
    ).filter(F.col(vec_col).isNotNull() & (F.size(vec_col) >= dim))

    pack_schema = f"blk int, ids array<{id_type}>, mat binary, nrows int, ndim int"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # deterministic within-block row order: the block table feeds BOTH
        # sides of a self-join, and each side re-evaluates the groupBy —
        # without a canonical order the diagonal-block triu(k=1) dedup
        # would see different row positions per side (pairs silently
        # dropped or duplicated under nondeterministic shuffle-fetch order)
        pdf = pdf.sort_values("id", kind="mergesort")
        mat = np.array([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
        return pd.DataFrame(
            {
                "blk": [int(pdf["blk"].iloc[0])],
                "ids": [list(pdf["id"])],
                "mat": [mat.tobytes()],
                "nrows": [mat.shape[0]],
                "ndim": [mat.shape[1]],
            }
        )

    # materialize once: feeds both join sides (and the pack groupBy is the
    # expensive part); blocks free when the plan is GC'd
    blocks = _materialize(
        base.groupBy("blk").applyInPandas(pack, schema=pack_schema),
        use_local_checkpoint,
    )
    a = blocks.select(
        F.col("blk").alias("blk_a"), F.col("ids").alias("ids_a"),
        F.col("mat").alias("mat_a"), F.col("nrows").alias("n_a"),
        F.col("ndim").alias("d_a"),
    )
    b = blocks.select(
        F.col("blk").alias("blk_b"), F.col("ids").alias("ids_b"),
        F.col("mat").alias("mat_b"), F.col("nrows").alias("n_b"),
        F.col("ndim").alias("d_b"),
    )
    pairs = a.join(b, F.col("blk_a") <= F.col("blk_b"))
    eps = 1e-6  # >> float64 GEMM error for any realistic dim; false
    # positives only cost an exact recheck

    def _exact_cos(va: np.ndarray, vb: np.ndarray) -> float:
        # sequential left-associated double ops — bit-identical to the
        # unrolled codegen expression AND DuckDB list_dot_product
        dot = va[0] * vb[0]
        na = va[0] * va[0]
        nb = vb[0] * vb[0]
        for i in range(1, va.shape[0]):
            dot = dot + va[i] * vb[i]
            na = na + va[i] * va[i]
            nb = nb + vb[i] * vb[i]
        return dot / math.sqrt(na * nb)

    def gemm_verify(batches):
        for pdf in batches:
            out_a, out_b, out_c = [], [], []
            for row in pdf.itertuples(index=False):
                A = np.frombuffer(row.mat_a, dtype=np.float64).reshape(
                    row.n_a, row.d_a
                )
                B = np.frombuffer(row.mat_b, dtype=np.float64).reshape(
                    row.n_b, row.d_b
                )
                ids_a, ids_b = list(row.ids_a), list(row.ids_b)
                with np.errstate(divide="ignore", invalid="ignore"):
                    sims = (A @ B.T) / np.sqrt(
                        np.outer((A * A).sum(axis=1), (B * B).sum(axis=1))
                    )
                if row.blk_a == row.blk_b:
                    cand = np.argwhere(
                        np.triu(sims >= min_cosine - eps, k=1)
                    )
                else:
                    cand = np.argwhere(sims >= min_cosine - eps)
                for i, j in cand:
                    ia, ib = ids_a[i], ids_b[j]
                    if ia == ib:
                        continue
                    if ib < ia:
                        ia, ib = ib, ia
                    c = _exact_cos(A[i], B[j])
                    if c >= min_cosine:
                        out_a.append(ia)
                        out_b.append(ib)
                        out_c.append(c)
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "cosine": out_c})

    return pairs.mapInPandas(
        gemm_verify, schema=f"id_a {id_type}, id_b {id_type}, cosine double"
    )


def _embedding_neardup_pairs_codegen(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    min_cosine: float = 0.95,
    dim: int | None = None,
) -> DataFrame:
    """All-pairs join with fixed-dim unrolled dots (the pre-GEMM exact
    baseline; norms precomputed per vector before the pair join)."""
    from neo4j_export_tool_spark.functions.similarity import dot_col, norm_sq_col

    dim = dim or _infer_dim(df, vec_col)
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        norm_sq_col(F.col(vec_col), dim).alias("nsq"),
    )
    a = base.select(
        F.col("id").alias("id_a"), F.col("v").alias("v_a"), F.col("nsq").alias("nsq_a")
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("v").alias("v_b"), F.col("nsq").alias("nsq_b")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            dot_col(F.col("v_a"), F.col("v_b"), dim)
            / F.sqrt(F.col("nsq_a") * F.col("nsq_b")),
        )
        .filter(F.col("cosine") >= min_cosine)
        .select("id_a", "id_b", "cosine")
    )


def duplicated_ngram_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 20,
    min_docs: int = 2,
    max_gram_df: int | None = None,
    max_gram_df_frac: float | None = None,
) -> DataFrame:
    """Exact substring-level dedup: every position of every word n-gram
    that occurs in ≥ ``min_docs`` DISTINCT documents →
    (doc, pos, gram) — the actionable span list for cut-duplicated-text
    training-data hygiene (Lee et al., "Deduplicating Training Data
    Makes Language Models Better": exact duplicated substrings, here
    bounded to token n-grams so the dataflow stays one explode + one
    keyed agg instead of a distributed suffix array).

    Scale shape: the posting build is a pure column-expression transform
    (split → slice windows → posexplode, no Python); the hot-gram table
    is one groupBy (count distinct docs) and the span fan-back a
    broadcast-friendly semi-join on the gram key.  Output is linear in
    the corpus (every row is an actual position).  ``max_gram_df`` /
    ``max_gram_df_frac`` (mutually exclusive; same contract as the
    jaccard/minhash caps) additionally DROP grams above a document
    frequency — boilerplate so common it is better handled by a
    boilerplate filter than by span surgery; at 10^12 docs use the
    fractional form.
    """
    if max_gram_df is not None and max_gram_df_frac is not None:
        raise ValueError(
            "pass max_gram_df (absolute) or max_gram_df_frac "
            "(fraction of corpus), not both"
        )
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.split(F.col(text_col), " ").alias("t"),
    )
    if max_gram_df_frac is not None:
        max_gram_df = max(min_docs, int(max_gram_df_frac * toks.count()))
    grams = (
        toks.filter(F.size("t") >= n)
        .select(
            "doc",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - (n - 1)),
                    lambda i: F.array_join(F.slice(F.col("t"), i, n), " "),
                )
            ).alias("pos", "gram"),
        )
    )
    df_counts = grams.groupBy("gram").agg(
        F.count_distinct("doc").alias("n_docs")
    )
    hot = df_counts.filter(F.col("n_docs") >= min_docs)
    if max_gram_df is not None:
        hot = hot.filter(F.col("n_docs") <= max_gram_df)
    out = grams.join(hot.select("gram"), "gram", "left_semi")
    return out.select("doc", "pos", "gram")


def jaccard_pairs_prefix(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold_pct: int = 60,
    shingle_n: int = 3,
    use_local_checkpoint: bool = True,
) -> DataFrame:
    """EXACT Jaccard pairs via PPJoin-style prefix filtering — the
    100 TB exact path that needs NO recall-trading cap.

    Positional prefix principle (Chaudhuri et al. SSJoin / Xiao et al.
    PPJoin, see PAPERS.md set-similarity-join survey): order every
    shingle set by one GLOBAL total order and keep only each set's
    first ``|A| - ceil(t·|A|) + 1`` shingles; any pair with Jaccard ≥ t
    must collide inside those prefixes, so generating candidates from
    prefix postings alone loses nothing.  We order by (document
    frequency asc, shingle asc) — rare-first, the order that makes hot
    boilerplate shingles land in the prefix of almost no document — and
    verify candidates exactly with ``array_intersect`` over the full
    sets (the q14 verify kernel), so the output EQUALS the unpruned
    ``jaccard_pairs`` bit-for-bit (pytest-pinned; gate q55 runs the
    same unpruned DuckDB oracle as q14).

    vs the ``max_shingle_df`` cap: the cap is subset/prune (boilerplate-
    only pairs are dropped BY DESIGN); the prefix filter is exact.  It
    pays two more linear shuffles (df join + per-doc rank window); at
    web scale the candidate cut (prefix is ~(1-t/(1+t)) of each set,
    hot shingles excluded from almost all prefixes) dwarfs that cost.
    Prefix length uses exact integer ceil: ``n - (t·n + 99) div 100 + 1``.
    """
    from pyspark.sql import Window

    sets = _materialize(
        _shingle_sets(df, text_col, id_col, shingle_n), use_local_checkpoint
    )
    sizes = sets.select("doc", F.size("shingles").alias("n"))
    posting = sets.select("doc", F.explode("shingles").alias("shingle"))
    dfc = posting.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    # the prefix table feeds BOTH sides of the candidate self-join —
    # materialize it, or the whole build (posting explode, df agg+join,
    # per-doc rank window) is evaluated once per side (measured: the r7
    # plan audit showed the entire subtree duplicated, ~2× the lane)
    prefix = _materialize(
        posting.join(dfc, "shingle")
        .join(sizes, "doc")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc").orderBy("df", "shingle")
            ),
        )
        .filter(
            F.col("rk")
            <= F.col("n")
            - F.expr(f"(({threshold_pct} * n) + 99) div 100")
            + F.lit(1)
        )
        .select("doc", "shingle", "n", "rk"),
        use_local_checkpoint,
    )
    a = prefix.alias("a")
    b = prefix.alias("b")
    # Length + positional filters (the rest of the PPJoin toolkit), both
    # provably recall-free at the threshold t = threshold_pct/100:
    # J ≥ t forces shared ≥ t·max(n_a, n_b) (since shared ≤ min side),
    # so 100·min(n_a,n_b) ≥ t·max(n_a,n_b) — the LENGTH filter.  And for
    # the globally-smallest common shingle w of a true pair (which must
    # sit inside BOTH prefixes — if it were past A's prefix, A's whole
    # prefix would be non-shared and shared ≤ ⌈t·n_a⌉−1 < t·n_a, a
    # contradiction), no common shingle precedes w, so
    # shared ≤ 1 + min(n_a−rk_a, n_b−rk_b) at w's collision — the
    # POSITIONAL filter.  Filtering EVERY collision with these bounds
    # keeps the w-collision of every true pair, so candidates remain a
    # superset of the answer; measured: they cut the candidate volume
    # ~3× on the driver corpus before the expensive exact verify.
    candidates = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc") < F.col("b.doc"))
            # length filter: 100·min ≥ t·max
            & (
                100 * F.least(F.col("a.n"), F.col("b.n"))
                >= threshold_pct * F.greatest(F.col("a.n"), F.col("b.n"))
            )
            # positional filter: ubound ≥ ceil(t(n_a+n_b)/(100+t))
            & (
                (100 + threshold_pct)
                * (
                    F.least(
                        F.col("a.n") - F.col("a.rk"),
                        F.col("b.n") - F.col("b.rk"),
                    )
                    + 1
                )
                >= threshold_pct * (F.col("a.n") + F.col("b.n"))
            ),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    return _verify_candidate_pairs(
        candidates, sets, threshold_pct, use_local_checkpoint
    )

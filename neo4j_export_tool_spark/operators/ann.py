"""Approximate-nearest-neighbor search over an embedding column.

- ``brute_force_topk``   — exact cosine top-k (baseline / verify kernel):
  broadcast the query set, score every (query, item) pair JVM-side,
  ``row_number`` window for the top-k.  Linear per query; right answer.
- ``hyperplane_lsh_pairs`` / ``ivf_topk`` — the scale paths: random-
  hyperplane sign buckets (cosine LSH) and a coarse-quantizer IVF built
  with a deterministic k-means (computed in DataFrames, no MLlib dep),
  probing only the nearest ``n_probe`` cells.

Rank determinism: ties broken by item id, so results are reproducible and
oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from neo4j_export_tool_spark.functions.similarity import (
    as_double_array,
    cosine_col,
    dot_col,
)


def brute_force_topk(
    items: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    exclude_self: bool = True,
    dim: int | None = None,
) -> DataFrame:
    """(query_id, rank, item_id, cosine) — exact top-k by cosine.

    ``queries`` is expected to be small (broadcast); items can be any size.
    Norms precomputed per side; fixed-dim unrolled dot stays in codegen.
    """
    from neo4j_export_tool_spark.functions.similarity import norm_sq_col
    from neo4j_export_tool_spark.operators.dedup import _infer_dim

    dim = dim or _infer_dim(items, vec_col)
    if dim is None:  # empty / all-null items → empty result, not a crash
        id_type = next(
            f.dataType.simpleString() for f in items.schema if f.name == id_col
        )
        return queries.sparkSession.createDataFrame(
            [], f"query_id {id_type}, rank int, item_id {id_type}, cosine double"
        )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            norm_sq_col(F.col(vec_col), dim).alias("q_nsq"),
        )
    )
    from neo4j_export_tool_spark.functions.partitioning import fan_out

    # the per-item unrolled dot products are the lane's whole cost — an
    # under-split items scan would run them on one core (guide §2.5)
    it = fan_out(items, key=id_col).select(
        F.col(id_col).alias("item_id"),
        F.col(vec_col).alias("i_vec"),
        norm_sq_col(F.col(vec_col), dim).alias("i_nsq"),
    )
    scored = q.crossJoin(it)
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("item_id"))
    scored = scored.withColumn(
        "cosine",
        dot_col(F.col("q_vec"), F.col("i_vec"), dim)
        / F.sqrt(F.col("q_nsq") * F.col("i_nsq")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("item_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "item_id", "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes (LCG; signs only
    matter)."""
    state = seed * 2654435761 % (1 << 32)
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (1 << 31)
            row.append((state / (1 << 30)) - 1.0)  # [-1, 1)
        planes.append(row)
    return planes


def hyperplane_signature(
    df: DataFrame, vec_col: str, n_planes: int, dim: int, seed: int = 7
) -> DataFrame:
    """Add a ``bucket`` column: sign-pattern int over random hyperplanes.

    Column-expression form (kept for single-table callers/tests); the
    multi-table LSH uses `_signature_table` — a single numpy-GEMM
    mapInPandas — because n_tables×n_planes dot expressions make Catalyst
    optimization time, not data compute, the dominant cost."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0)
    v = as_double_array(F.col(vec_col))
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        d = dot_col(v, plane)
        bucket = bucket + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return df.withColumn("bucket", bucket)


def _signature_table(
    sig: DataFrame, n_planes: int, n_tables: int, dim: int, seed: int = 7
) -> DataFrame:
    """(id, v) → (id, v, bucket_0..bucket_{T-1}) via ONE Arrow-batched
    numpy GEMM: V(n×d) @ planes(d×T·P) → signs → per-table bucket ints.

    Bucket assignment only partitions the candidate space — every emitted
    pair is re-verified with the exact JVM cosine — so the GEMM's sign
    evaluation needs no bit-parity with the column-expression form.  The
    win: the 4×8 unrolled dot expressions made Catalyst optimization time
    (seconds per query, constant at any scale) dominate a trivial compute;
    the GEMM is microseconds per batch and scales linearly."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    id_type = next(
        f.dataType.simpleString() for f in sig.schema if f.name == "id"
    )
    planes = np.array(
        [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)],
        dtype=np.float64,
    )  # (T, P, D)
    flat = planes.reshape(n_tables * n_planes, dim).T  # (D, T·P)
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    def sign_buckets(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # drop wrong-length vectors instead of letting a ragged batch
            # turn `mat` into an object array and crash the GEMM — a
            # malformed row could never survive the exact verify anyway
            # (its out-of-range dot is null under the expression form)
            ok = pdf["v"].map(lambda v: v is not None and len(v) == dim)
            pdf = pdf[ok]
            if not len(pdf):
                continue
            mat = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf["v"]]
            )  # (n, D)
            bits = (mat @ flat > 0).astype(np.int64)
            buckets = bits.reshape(len(pdf), n_tables, n_planes) @ weights
            out = {"id": pdf["id"].values, "v": pdf["v"].values}
            for t in range(n_tables):
                out[f"bucket_{t}"] = buckets[:, t]
            yield pd.DataFrame(out)

    bucket_ddl = ", ".join(f"bucket_{t} long" for t in range(n_tables))
    return sig.mapInPandas(
        sign_buckets, schema=f"id {id_type}, v array<double>, {bucket_ddl}"
    )


def hyperplane_lsh_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    min_cosine: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Cosine near-dup pairs via multi-table hyperplane LSH + exact verify.

    Each table buckets on an independent sign pattern; candidates = pairs
    sharing a bucket in ANY table (union), verified with the exact cosine.
    Shuffle key is (table, bucket) — uniform for centered data.

    Plan shape: ALL tables' bucket ids plus the squared norm are computed
    in ONE pass over the vectors and localCheckpoint'd — each table's
    self-join (two sides) and the verify joins would otherwise re-evaluate
    the n_tables×n_planes×dim unrolled sign expressions per branch.  The
    verify cosine is the fixed-dim unrolled codegen form (the dim-less HOF
    ``aggregate`` falls back to interpreted eval, ~10× slower in joins).
    """
    from neo4j_export_tool_spark.functions.similarity import norm_sq_col
    from neo4j_export_tool_spark.operators.dedup import _infer_dim

    dim = dim or _infer_dim(df, vec_col)
    if dim is None:  # empty / all-null input → empty result, not a crash
        id_type = next(
            f.dataType.simpleString() for f in df.schema if f.name == id_col
        )
        return df.sparkSession.createDataFrame(
            [], f"id_a {id_type}, id_b {id_type}, cosine double"
        )
    from neo4j_export_tool_spark.functions.partitioning import fan_out

    sig = fan_out(df, key=id_col).select(
        F.col(id_col).alias("id"), as_double_array(F.col(vec_col)).alias("v")
    ).filter(F.col("v").isNotNull())
    sig = _signature_table(sig, n_planes, n_tables, dim, seed=7)
    # nsq stays a JVM fixed-dim unrolled expression: it feeds the EXACT
    # verify cosine, which must stay bit-identical to the oracle's
    # list_dot_product formula (the GEMM is candidate-selection only)
    sig = sig.withColumn("nsq", norm_sq_col(F.col("v"), dim)).localCheckpoint(
        eager=False
    )

    # one (table, bucket) posting per row per table → ONE self-join on the
    # composite key instead of n_tables joins + union
    posting = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("t"), F.col(f"bucket_{t}").alias("bk")
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("id", F.col("tb.t").alias("t"), F.col("tb.bk").alias("bk"))
    a = posting.select(F.col("id").alias("id_a"), "t", "bk")
    b = posting.select(F.col("id").alias("id_b"), "t", "bk")
    cand = (
        a.join(b, ["t", "bk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    side = sig.select("id", "v", "nsq")
    # NB: unlike the dedup verify, NEITHER side is forced broadcast here —
    # full-table LSH candidate sets routinely exceed the vector table
    # (bucket collisions scale with n²/buckets), so a forced pair-side
    # broadcast would be a driver hazard at scale; the planner/AQE picks.
    scored = (
        cand.join(
            side.withColumnsRenamed({"id": "id_a", "v": "v_a", "nsq": "nsq_a"}),
            "id_a",
        )
        .join(
            side.withColumnsRenamed({"id": "id_b", "v": "v_b", "nsq": "nsq_b"}),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            (
                dot_col(F.col("v_a"), F.col("v_b"), dim)
                / F.sqrt(F.col("nsq_a") * F.col("nsq_b"))
            ).alias("cosine"),
        )
        # materialization barrier: the threshold filter would otherwise
        # collapse into the join condition and re-evaluate the unrolled
        # 64-term dot per candidate (the dedup-verify F2.3 shape)
        .localCheckpoint(eager=False)
    )
    return scored.filter(F.col("cosine") >= min_cosine).select(
        "id_a", "id_b", "cosine"
    )


def ivf_topk(
    items: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    n_iters: int = 3,
    seed: int = 11,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k.

    Coarse quantizer: deterministic Lloyd k-means over the items, computed
    with DataFrame aggs (centroids collected to the driver each round —
    n_cells×dim doubles, trivially small).  Items are assigned to their
    nearest cell; each query probes its ``n_probe`` nearest cells only.
    At 100 TB the cell assignment is the partition key (write bucketed by
    cell), so a probe touches n_probe/n_cells of the data.

    Cell assignment is an Arrow-batched numpy GEMM over the whole batch
    (round 6): the centroids are a driver-side list shipped in the UDF
    closure, so per-row argmax is ``V @ C.T`` + argmax — ZERO Exchange,
    one `mapInPandas` pass, BLAS throughput.  (The previous crossJoin +
    per-item ``row_number`` window expanded the corpus n_cells× and
    shuffled the expansion once per k-means round — the whole cost of
    IVF build at scale.)  Each k-means round now also folds its per-cell
    partial sums INSIDE the same pass (one output row per cell per
    batch), so a round shuffles ~n_cells×n_partitions tiny rows instead
    of the corpus; partials are merged driver-side in sorted
    (cell, partition, chunk) order, making the centroid arithmetic
    order-deterministic — stronger than the old ``F.avg`` whose merge
    order floated with task completion.

    Assignment is candidate SELECTION only — the returned cosines still
    come from the exact sequential-double `cosine_col` verify below, the
    same GEMM-candidates/exact-verify split `embedding_neardup_pairs`
    uses — so engine-exactness of the scoring never rests on BLAS
    summation order.  Ties rank like the old window (d desc, cell asc —
    argmax/stable argsort take the first maximum) and zero-norm
    centroids score as +inf like the old NaN-first desc sort.
    """
    import numpy as np

    item_id_t = next(
        f.dataType.simpleString() for f in items.schema if f.name == id_col
    )
    query_id_t = next(
        f.dataType.simpleString() for f in queries.schema if f.name == id_col
    )
    base = items.select(F.col(id_col).alias("item_id"), as_double_array(F.col(vec_col)).alias("v"))
    # the zero-shuffle assignment removed the parallelism the old window
    # shuffle provided by accident — spread the (often single-file) scan
    # once, up front, instead of n_cells×-expanding and re-shuffling the
    # corpus every k-means round
    base = base.repartition(items.sparkSession.sparkContext.defaultParallelism)
    base = base.persist()
    # init: deterministic sample — lowest ids spread by modular stride
    first = [
        r["v"]
        for r in base.orderBy(F.crc32(F.col("item_id").cast("string")) % 997, "item_id")
        .limit(n_cells)
        .collect()
    ]
    if not first:
        base.unpersist()
        return items.sparkSession.createDataFrame(
            [],
            f"query_id {query_id_t}, rank int, item_id {item_id_t}, cosine double",
        )
    # fewer items than requested cells → shrink the quantizer
    n_cells = min(n_cells, len(first))
    n_probe = min(n_probe, n_cells)
    first = first[:n_cells]
    centroids = first
    dim = len(first[0])

    def _scores_fn(cents: list):
        """(batch_matrix) -> per-cell score matrix.  Dividing by the item
        norm is skipped: it is a positive per-row constant, so argmax and
        the full cell ordering are unchanged; zero-norm centroids map to
        +inf so they rank first, like NaN under the old desc sort."""
        C = np.asarray(cents, dtype=np.float64)
        Cn = np.sqrt((C * C).sum(axis=1))

        def scores(V: np.ndarray) -> np.ndarray:
            with np.errstate(divide="ignore", invalid="ignore"):
                S = (V @ C.T) / Cn
            return np.where(np.isnan(S), np.inf, S)

        return scores

    partial_schema = "pid int, seq int, cell int, cnt long, s array<double>"

    def _kmeans_partials(cents: list):
        scores = _scores_fn(cents)

        def fn(batches):
            import pandas as pd
            from pyspark import TaskContext

            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx is not None else 0
            seq = 0
            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.stack(pdf["v"].to_numpy())
                cell = scores(V).argmax(axis=1)
                rows = []
                for c in np.unique(cell):
                    sel = V[cell == c]
                    rows.append(
                        (pid, seq, int(c), len(sel), sel.sum(axis=0).tolist())
                    )
                seq += 1
                yield pd.DataFrame(
                    rows, columns=["pid", "seq", "cell", "cnt", "s"]
                )

        return fn

    for _ in range(n_iters):
        partials = base.mapInPandas(
            _kmeans_partials(centroids), partial_schema
        ).collect()
        # deterministic merge order: (cell, partition, chunk)
        sums: dict[int, np.ndarray] = {}
        cnts: dict[int, int] = {}
        for r in sorted(partials, key=lambda r: (r["cell"], r["pid"], r["seq"])):
            c = r["cell"]
            if c not in sums:
                sums[c] = np.zeros(dim)
                cnts[c] = 0
            sums[c] = sums[c] + np.asarray(r["s"])
            cnts[c] += r["cnt"]
        centroids = [
            (sums[i] / cnts[i]).tolist() if cnts.get(i) else centroids[i]
            for i in range(n_cells)
        ]

    def _assign_items(cents: list):
        scores = _scores_fn(cents)

        def fn(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.stack(pdf["v"].to_numpy())
                out = pdf.rename(columns={"v": "i_vec"})
                out["cell"] = scores(V).argmax(axis=1).astype("int32")
                yield out

        return fn

    items_cells = base.mapInPandas(
        _assign_items(centroids),
        f"item_id {item_id_t}, i_vec array<double>, cell int",
    )
    q = queries.select(F.col(id_col).alias("query_id"), as_double_array(F.col(vec_col)).alias("q_vec"))

    def _assign_probes(cents: list, probes: int):
        scores = _scores_fn(cents)

        def fn(batches):
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.stack(pdf["q_vec"].to_numpy())
                # stable argsort of -S: d desc, then cell asc on ties —
                # the old window's ordering
                order = np.argsort(-scores(V), axis=1, kind="stable")[:, :probes]
                yield pd.DataFrame(
                    {
                        "query_id": pdf["query_id"].to_numpy().repeat(probes),
                        "q_vec": pdf["q_vec"].to_numpy().repeat(probes),
                        "cell": order.reshape(-1).astype("int32"),
                    }
                )

        return fn

    q_cells = q.mapInPandas(
        _assign_probes(centroids, n_probe),
        f"query_id {query_id_t}, q_vec array<double>, cell int",
    )
    scored = q_cells.join(items_cells, "cell")
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("item_id"))
    scored = scored.withColumn("cosine", cosine_col(F.col("q_vec"), F.col("i_vec")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("item_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "item_id", "cosine")
    )
    base.unpersist()
    return out

"""Passage chunking: fixed-token windows with overlap, stable chunk ids.

The standard pre-training / RAG corpus step between document hygiene and
tokenization: split each document into ``chunk_tokens``-token windows
advancing by ``chunk_tokens - overlap``, carrying provenance (doc, index,
token offset) and a content-derived stable id so re-runs and incremental
updates address the same chunk the same way.

Scale shape: one pure-column-expression projection — split, a windows
transform over ``sequence``, one ``posexplode``; no shuffle, no Python.
At 10^12 documents this is a linear map that pipelines into whatever
writes the chunk table (partition by whatever the write needs, not this
operator).

Reference parity: the reference exports whole records
(`/root/reference/Neo4jExport/Serialization.fs` writes documents 1:1);
chunking is part of the beyond-the-reference training-data surface
(SURVEY.md §6 / task brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """(doc, chunk_idx, tok_start, n_tokens, chunk_text, chunk_sha256).

    Windows start every ``chunk_tokens - overlap`` tokens; the last chunk
    may be shorter (never empty).  All arithmetic is integer so the
    layout is bit-stable across engines:
    ``n_chunks = 1 + max(0, ceil((n_tok - chunk_tokens) / stride))``.
    Empty texts yield no rows.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    # filter the STRING, not the token array: split('', ' ') is [''] (size
    # 1), which would emit a phantom empty chunk for empty documents
    toks = df.filter(
        F.col(text_col).isNotNull() & (F.col(text_col) != "")
    ).select(
        F.col(id_col).alias("doc"),
        F.split(F.col(text_col), " ").alias("t"),
    )
    n = F.size("t")
    # ceil((n - chunk)/stride) via (n - chunk + stride-1) div stride —
    # SQL integer division, so the layout is categorically integer-exact
    # (no double quotient anywhere, matching the q50 oracle's //)
    extra = F.greatest(
        F.lit(0),
        F.expr(
            f"(size(t) - {chunk_tokens} + {stride - 1}) div {stride}"
        ).cast("int"),
    )
    out = toks.select(
        "doc",
        "t",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), extra),
                lambda k: k * stride,
            )
        ).alias("chunk_idx", "tok_start"),
    ).select(
        "doc",
        "chunk_idx",
        "tok_start",
        F.least(
            F.lit(chunk_tokens), F.size("t") - F.col("tok_start")
        ).alias("n_tokens"),
        F.array_join(
            F.slice(F.col("t"), F.col("tok_start") + 1, chunk_tokens), " "
        ).alias("chunk_text"),
    )
    return out.withColumn(
        "chunk_sha256",
        F.sha2(
            F.concat_ws(
                ":", F.col("doc").cast("string"), F.col("chunk_idx"),
                F.col("chunk_text"),
            ),
            256,
        ),
    )

"""Entity linking: mention surface → KB candidate scoring → top-1.

Spark shape (SURVEY.md §2.3 J2): candidate generation uses a blocking key
(normalized first token) so the join is an equi-join, not a cross join;
scoring is vectorized character-trigram TF-IDF cosine in an Arrow pandas
UDF; top-1 per mention via ``row_number``.

Scale shape (10⁸-name KB, 10⁸+ distinct surfaces):
- the IDF table is computed DISTRIBUTED — KB names explode into trigrams in
  Arrow batches, a groupBy counts document frequencies, and only the
  (trigram → df) map is collected (bounded by the trigram vocabulary,
  ~10⁵ entries, independent of KB size); KB rows never hit the driver.
- NO broadcast hints: the candidate join and the per-mention fan-back join
  are plain equi-joins — AQE broadcasts small sides at runtime and
  skew-splits hot keys, so a gazetteer-sized KB still gets a broadcast
  while a 10⁸-row KB gets a sort-merge join, without OOM risk baked into
  the plan (round-1 verdict items #2/#3).

Head-entity skew: a handful of surfaces ("USA"-class heads) dominate web
text.  The scoring join is mention×candidate, so a head surface key would
concentrate in one task — ``link_mentions`` therefore scores DISTINCT
(surface, candidate) pairs only (the classic distinct-then-rejoin trick:
dedup first, score once per distinct surface, fan back by join).  The
per-mention fan-back join is on the surface string, salted by Spark's AQE
skew split if a single surface still dominates.
"""

from __future__ import annotations

import math
import re
from collections.abc import Iterator, Mapping

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _trigrams(s: str) -> set[str]:
    s = f"  {s.lower()} "
    return {s[i : i + 3] for i in range(len(s) - 2)}


def _block_key(col):
    """Blocking key: lower-cased first alphanumeric token."""
    return F.lower(F.regexp_extract(col, r"[A-Za-z0-9]+", 0))


def trigram_cosine(a: str, b: str) -> float:
    """Character-trigram cosine (binary weights)."""
    ta, tb = _trigrams(a), _trigrams(b)
    if not ta or not tb:
        return 0.0
    return len(ta & tb) / math.sqrt(len(ta) * len(tb))


def _sorted_trigram_sum(trigrams, idf: Mapping[str, float], default: float) -> float:
    """Sum of squared IDF weights in SORTED trigram order — Python set
    iteration order is hash-seed-dependent (varies across executor
    processes), and float addition is not associative, so an unsorted sum
    would make link scores differ in the last ulp between runs and could
    flip top-1 ties."""
    out = 0.0
    for t in sorted(trigrams):
        w = idf.get(t, default)
        out += w * w
    return out


def build_idf(names: list[str]) -> dict[str, float]:
    """Smoothed IDF per trigram over the KB name corpus:
    idf(t) = ln((1+N)/(1+df(t))) + 1 (sklearn-style smoothing).
    Driver-side kernel — use `kb_trigram_idf` for a DataFrame KB."""
    n = len(names)
    df: dict[str, int] = {}
    for name in names:
        for t in _trigrams(name):
            df[t] = df.get(t, 0) + 1
    return {t: math.log((1 + n) / (1 + d)) + 1.0 for t, d in df.items()}


def kb_trigram_idf(kb: DataFrame, kb_name_col: str = "name") -> dict[str, float]:
    """Distributed twin of `build_idf`: trigram document frequencies via
    Arrow-batched explode + groupBy count; the collect is bounded by the
    trigram VOCABULARY (~10⁵), never by KB size.  Trigram extraction runs
    the same Python `_trigrams` kernel as the scorer, so keys match exactly
    (JVM lower() differs from str.lower() on some unicode)."""

    def tri(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[str | None] = []
            for name in pdf[kb_name_col]:
                out.extend(_trigrams(name))  # set per name → document freq
                out.append(None)  # one sentinel per KB row → N rides the
                # same job (null never collides with a real trigram)
            yield pd.DataFrame({"t": out}, dtype="object")

    counts = (
        kb.select(kb_name_col)
        .filter(F.col(kb_name_col).isNotNull())  # null names carry no signal
        .mapInPandas(tri, schema="t string")
        .groupBy("t")
        .count()
        .collect()
    )
    n = next((r["count"] for r in counts if r["t"] is None), 0)
    return {
        r["t"]: math.log((1 + n) / (1 + r["count"])) + 1.0
        for r in counts
        if r["t"] is not None
    }


def tfidf_trigram_cosine(a: str, b: str, idf: Mapping[str, float]) -> float:
    """IDF-weighted character-trigram cosine: shared boilerplate trigrams
    ("Inc", "Ltd", " Co") carry little weight; distinctive name trigrams
    dominate — the TF-IDF scoring the north star specifies for candidate
    ranking (binary TF; surfaces are short)."""
    ta, tb = _trigrams(a), _trigrams(b)
    if not ta or not tb:
        return 0.0
    default = 1.0
    num = _sorted_trigram_sum(ta & tb, idf, default)
    na = math.sqrt(_sorted_trigram_sum(ta, idf, default))
    nb = math.sqrt(_sorted_trigram_sum(tb, idf, default))
    if na == 0.0 or nb == 0.0:
        return 0.0
    return num / (na * nb)


def link_mentions(
    mentions: DataFrame,
    kb: DataFrame,
    surface_col: str = "surface",
    kb_id_col: str = "kb_id",
    kb_name_col: str = "name",
    min_score: float = 0.5,
    use_idf: bool = True,
) -> DataFrame:
    """Attach (kb_id, link_score) to each mention row.

    ``kb``: (kb_id, name[, aliases...]).  Candidates share a blocking key
    with the surface; ties broken by kb_id for determinism.  Scoring is
    IDF-weighted trigram cosine by default (``use_idf=False`` falls back to
    binary weights); the IDF table is computed distributed
    (`kb_trigram_idf`) and only the trigram-vocabulary-sized map ships in
    the scorer closure — KB rows never collect to the driver.
    """
    distinct_surfaces = mentions.select(F.col(surface_col).alias("surface")).distinct()
    kb_cand = kb.select(
        F.col(kb_id_col).alias("kb_id"),
        F.col(kb_name_col).alias("kb_name"),
        _block_key(F.col(kb_name_col)).alias("block"),
    )
    # no broadcast hint: AQE broadcasts a small KB at runtime and
    # skew-splits hot blocking keys on a big one
    cands = distinct_surfaces.withColumn("block", _block_key(F.col("surface"))).join(
        kb_cand, "block"
    )
    idf = kb_trigram_idf(kb, kb_name_col) if use_idf else None

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            if idf is not None:
                pdf["link_score"] = [
                    tfidf_trigram_cosine(s, n, idf)
                    for s, n in zip(pdf["surface"], pdf["kb_name"])
                ]
            else:
                pdf["link_score"] = [
                    trigram_cosine(s, n)
                    for s, n in zip(pdf["surface"], pdf["kb_name"])
                ]
            yield pdf[["surface", "kb_id", "kb_name", "link_score"]]

    scored = cands.mapInPandas(
        score, schema="surface string, kb_id string, kb_name string, link_score double"
    )
    w = Window.partitionBy("surface").orderBy(
        F.col("link_score").desc(), F.col("kb_id").asc()
    )
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("link_score") >= min_score))
        .select("surface", "kb_id", F.col("kb_name").alias("linked_name"), "link_score")
    )
    # fan-back on the surface key WITHOUT a broadcast hint: `best` is
    # distinct-surfaces-sized (10⁸+ on web text) — AQE broadcasts it only
    # when it is actually small (round-1 verdict item #3)
    return mentions.join(
        best, mentions[surface_col] == best["surface"], "left"
    ).drop(best["surface"])


def kb_from_gazetteer(spark, gazetteer: dict[str, tuple[str, str]]) -> DataFrame:
    """KB table from a surface→(label, canonical) gazetteer: one row per
    canonical entity."""
    rows = sorted({(canon, label) for (label, canon) in gazetteer.values()})
    return spark.createDataFrame(
        [(f"kb:{label}:{canon}", canon, label) for canon, label in rows],
        "kb_id string, name string, label string",
    )

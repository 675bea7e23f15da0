"""Corpus synthesis + extraction invariants.

- byte-identical extracted text per url (the north-rule per-row invariant)
- Aho-Corasick correctness on adversarial cases
- triple extraction P/R >= 0.95 vs the planted oracle set
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from neo4j_export_tool_spark.operators.extract import extract_text, extract_text_udf
from neo4j_export_tool_spark.operators.mentions import (
    AhoCorasick,
    build_relation_patterns,
    detect_mentions,
    extract_triples,
)
from neo4j_export_tool_spark.sources.synth import (
    GAZETTEER,
    ORGS,
    PERSONS,
    PLACES,
    RELATION_TEMPLATES,
    generate_pages,
    pages_spark_df,
)


def test_generator_deterministic():
    p1, t1 = generate_pages(50, seed=7)
    p2, t2 = generate_pages(50, seed=7)
    pd.testing.assert_frame_equal(p1, p2)
    pd.testing.assert_frame_equal(t1, t2)
    p3, _ = generate_pages(50, seed=8)
    assert not p1["html"].equals(p3["html"])


def test_extract_text_byte_identical_pure():
    pages, _ = generate_pages(200, seed=42)
    for _, row in pages.iterrows():
        assert extract_text(row["html"]) == row["text"], row["url"]


def test_extract_text_byte_identical_spark(spark):
    df = pages_spark_df(spark, 300, seed=42, partitions=4)
    mismatches = (
        df.withColumn("extracted", extract_text_udf(F.col("html")))
        .filter(F.col("extracted") != F.col("text"))
        .count()
    )
    assert mismatches == 0


def test_ahocorasick_basics():
    ac = AhoCorasick(["he", "she", "his", "hers", "Acme", "Acme Corp"])
    found = {m[2] for m in ac.find("she sells hers")}
    assert "she" in found and "hers" in found
    # word boundary: "he" inside "she"/"hers" must not match standalone
    assert all(m[2] != "his" for m in ac.find("this"))
    # longest-leftmost preference
    matches = ac.find("Acme Corp announced")
    assert matches[0][2] == "Acme Corp"


def test_mention_detection(spark):
    df = pages_spark_df(spark, 150, seed=42, partitions=4)
    mentions = detect_mentions(df, GAZETTEER).toPandas()
    assert len(mentions) > 0
    # every detected surface is a real gazetteer entry at the right offset
    pages, _ = generate_pages(150, seed=42)
    text_by_url = dict(zip(pages["url"], pages["text"]))
    for _, m in mentions.sample(min(200, len(mentions)), random_state=0).iterrows():
        assert text_by_url[m["url"]][m["start"] : m["end"]] == m["surface"]


@pytest.fixture(scope="module")
def surfaces_by_label():
    return {
        "Person": [s for aliases in PERSONS.values() for s in aliases],
        "Organization": [s for aliases in ORGS.values() for s in aliases],
        "Place": [s for aliases in PLACES.values() for s in aliases],
    }


def test_distributed_generator_deterministic_and_extractable(spark):
    from neo4j_export_tool_spark.sources.synth import pages_spark_distributed

    df1 = pages_spark_distributed(spark, 200, seed=9, partitions=4)
    df2 = pages_spark_distributed(spark, 200, seed=9, partitions=8)
    rows1 = {r["url"]: r["text"] for r in df1.collect()}
    rows2 = {r["url"]: r["text"] for r in df2.collect()}
    assert rows1 == rows2  # partitioning must not affect content
    mismatches = (
        df1.withColumn("extracted", extract_text_udf(F.col("html")))
        .filter(F.col("extracted") != F.col("text"))
        .count()
    )
    assert mismatches == 0


def test_triple_extraction_precision_recall(spark, surfaces_by_label):
    n = 400
    df = pages_spark_df(spark, n, seed=42, partitions=4)
    patterns = build_relation_patterns(RELATION_TEMPLATES, surfaces_by_label)
    got = extract_triples(df, patterns).toPandas()
    _, oracle = generate_pages(n, seed=42)

    got_set = set(zip(got["url"], got["subj_surface"], got["pred"], got["obj_surface"]))
    want_set = set(
        zip(oracle["url"], oracle["subj_surface"], oracle["pred"], oracle["obj_surface"])
    )
    tp = len(got_set & want_set)
    precision = tp / max(len(got_set), 1)
    recall = tp / max(len(want_set), 1)
    assert precision >= 0.95, f"precision {precision:.3f}"
    assert recall >= 0.95, f"recall {recall:.3f}"

"""Unit tests for the round-3 training-pipeline operators: PII scrubbing,
repetition metrics, corpus vocabulary, benchmark decontamination."""

from __future__ import annotations

from pyspark.sql import functions as F

from neo4j_export_tool_spark.functions.scrub import pii_scrub, redact_pii_col
from neo4j_export_tool_spark.functions.text import (
    corpus_vocab,
    repetition_2gram_metrics,
    top_token_counts,
)
from neo4j_export_tool_spark.operators.decontaminate import decontaminate


def _one(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    cols = pii_scrub(F.col("text"))
    return df.select(*[c.alias(n) for n, c in cols.items()]).collect()[0]


def test_pii_redaction_kinds(spark):
    r = _one(
        spark,
        "mail a.b+c@sub.example.org, host 192.168.0.1, call 555-123-4567 now",
    )
    assert r["text_redacted"] == "mail <EMAIL>, host <IP>, call <PHONE> now"
    assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (1, 1, 1)


def test_pii_no_false_positives(spark):
    r = _one(spark, "version 1.2 of part 12-34 shipped to example.com today")
    # bare domain (no local part), short dotted version, short dashed id:
    # none match
    assert r["text_redacted"].startswith("version 1.2 of part 12-34")
    assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (0, 0, 0)


def test_pii_email_vs_ip_ordering(spark):
    # a numeric-host address: local part + host redact as one email when the
    # TLD is alphabetic; with a numeric host the IP rule takes the host
    df = spark.createDataFrame([("ping user@10.1.2.3 done",)], "text string")
    out = df.select(redact_pii_col(F.col("text")).alias("t")).collect()[0]["t"]
    assert out == "ping user@<IP> done"


def test_repetition_metrics_closed_form(spark):
    # "a b a b a" → 4 2-grams ("a b","b a","a b","b a"), 2 distinct → 50%
    df = spark.createDataFrame([("a b a b a",)], "text string")
    m = repetition_2gram_metrics(F.col("text"))
    r = df.select(*[c.alias(n) for n, c in m.items()]).collect()[0]
    assert r["n_tokens"] == 5
    assert r["total_2grams"] == 4
    assert r["distinct_2grams"] == 2
    assert r["rep2_pct"] == 50


def test_repetition_single_token(spark):
    df = spark.createDataFrame([("word",)], "text string")
    m = repetition_2gram_metrics(F.col("text"))
    r = df.select(*[c.alias(n) for n, c in m.items()]).collect()[0]
    assert r["total_2grams"] == 0 and r["distinct_2grams"] == 0
    assert r["rep2_pct"] == 0


def test_top_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "x y x z x"), (2, "a b")], "doc_id long, text string"
    )
    rows = {
        r["doc"]: r["top_token_count"]
        for r in top_token_counts(df, "text", "doc_id").collect()
    }
    assert rows == {1: 3, 2: 1}


def test_corpus_vocab_order_and_ties(spark):
    df = spark.createDataFrame(
        [("b a b",), ("c a",)], "text string"
    )
    rows = [(r["token"], r["n"]) for r in corpus_vocab(df, "text", k=3).collect()]
    # a and b tie at 2 → token order breaks the tie deterministically
    assert rows == [("a", 2), ("b", 2), ("c", 1)]


def test_decontaminate_overlap_counts(spark):
    eval_docs = spark.createDataFrame(
        [(100, "one two three four five six")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            # shares the 5-grams "one..five" and "two..six"
            (1, "zz one two three four five six yy"),
            # shuffled words, no shared 5-gram
            (2, "six five four three two one"),
            # too short for any 5-gram
            (3, "one two"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["n_eval_shingles"]
        for r in decontaminate(docs, eval_docs, shingle_n=5).collect()
    }
    assert rows == {1: 2}


def test_pii_patterns_match_python_re(spark):
    """The PII patterns are claimed to live in the Java-regex ∩ RE2 common
    subset; cross-check a third dialect (Python re) over adversarial
    inputs — if all three agree, the oracle-parity claim rests on the
    pattern subset, not on luck."""
    import re as _re

    from neo4j_export_tool_spark.functions.scrub import PII_PATTERNS

    samples = [
        "a@b.co x@y.z 1.2.3.4 999-999-9999",
        "no pii at all, just 1.2 and 12-34-5678",
        "edge: a.b-c_d%e+f@host-name.sub.example.travel!",
        "ip-ish 999.999.999.999 and 1.2.3.4.5 chains",
        "phones 555-000-0000,123-456-7890. done",
        "tight:a@b.cc|1.1.1.1|111-222-3333|end",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "text string")
    from pyspark.sql import functions as F

    got = (
        df.select(
            "text",
            *[
                F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0)).alias(kind)
                for kind, pat, _ in PII_PATTERNS
            ],
        )
        .collect()
    )
    for row in got:
        for kind, pat, _ in PII_PATTERNS:
            assert row[kind] == _re.findall(pat, row["text"]), (
                kind,
                row["text"],
            )

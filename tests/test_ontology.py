"""Schema-induction tests: cardinality closed forms, DuckDB twins for
both operators, multi-type and unknown-type semantics."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from neo4j_export_tool_spark.operators.ontology import (
    predicate_profile,
    type_signatures,
)

TRIPLES = (
    # born_in: every person one city, cities shared → N:1
    [("p1", "born_in", "c1"), ("p2", "born_in", "c1"), ("p3", "born_in", "c2")]
    # capital_of: bijective → 1:1 (with a duplicate assertion)
    + [("c1", "capital_of", "k1"), ("c2", "capital_of", "k2"),
       ("c1", "capital_of", "k1")]
    # has_child: one parent many children, one child one parent → 1:N
    + [("p1", "has_child", "p4"), ("p1", "has_child", "p5")]
    # knows: many-many → N:M
    + [("p1", "knows", "p2"), ("p1", "knows", "p3"), ("p2", "knows", "p3"),
       ("p3", "knows", "p2"), (None, "knows", "p1"), ("p1", None, "p2")]
)

TYPES = [
    ("p1", "Person"), ("p2", "Person"), ("p3", "Person"),
    ("p4", "Person"), ("p5", "Person"),
    ("c1", "City"), ("c2", "City"),
    ("k1", "Country"), ("k2", "Country"),
    ("c1", "Capital"),  # multi-type node
]


def _spark_profile(spark):
    df = spark.createDataFrame(TRIPLES, "s string, p string, o string")
    rows = predicate_profile(df, "s", "p", "o").collect()
    return {r.predicate: r for r in rows}


def test_cardinality_classes(spark):
    got = _spark_profile(spark)
    assert got["born_in"].cardinality == "N:1"
    assert got["capital_of"].cardinality == "1:1"
    assert got["has_child"].cardinality == "1:N"
    assert got["knows"].cardinality == "N:M"
    # duplicate capital_of assertion deduplicated
    assert got["capital_of"].n_triples == 2
    assert got["born_in"].subj_functional and not got["born_in"].obj_functional
    # null-component triples dropped
    assert got["knows"].n_triples == 4


def test_profile_matches_duckdb(spark):
    got = {
        (r.predicate, r.n_triples, r.n_subjects, r.n_objects, r.cardinality)
        for r in _spark_profile(spark).values()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(TRIPLES, columns=["s", "p", "o"]))
    want = set(
        con.execute(
            """
            WITH d AS (
              SELECT DISTINCT s, p, o FROM t
              WHERE s IS NOT NULL AND p IS NOT NULL AND o IS NOT NULL
            ), a AS (
              SELECT p AS predicate, count(*) AS n_triples,
                     count(DISTINCT s) AS n_subjects,
                     count(DISTINCT o) AS n_objects
              FROM d GROUP BY p
            )
            SELECT predicate, n_triples, n_subjects, n_objects,
              CASE WHEN n_triples = n_subjects AND n_triples = n_objects
                     THEN '1:1'
                   WHEN n_triples = n_subjects THEN 'N:1'
                   WHEN n_triples = n_objects THEN '1:N'
                   ELSE 'N:M' END
            FROM a
            """
        ).fetchall()
    )
    assert got == want


def test_type_signatures(spark):
    tdf = spark.createDataFrame(TRIPLES, "s string, p string, o string")
    ydf = spark.createDataFrame(TYPES, "n string, ty string")
    rows = type_signatures(
        tdf, ydf, "s", "p", "o", "n", "ty"
    ).collect()
    got = {
        (r.s_type, r.predicate, r.o_type): (r.n_triples, r.share)
        for r in rows
    }
    # born_in: 3 triples, all Person→City
    assert got[("Person", "born_in", "City")] == (3, pytest.approx(1.0))
    # capital_of subject c1 is City AND Capital → two signatures
    assert got[("City", "capital_of", "Country")][0] == 2
    assert got[("Capital", "capital_of", "Country")] == (
        1,
        pytest.approx(0.5),
    )


def test_unknown_type_marker(spark):
    tdf = spark.createDataFrame(
        [("x", "rel", "p1")], "s string, p string, o string"
    )
    ydf = spark.createDataFrame(TYPES, "n string, ty string")
    rows = type_signatures(tdf, ydf, "s", "p", "o", "n", "ty").collect()
    assert {(r.s_type, r.o_type) for r in rows} == {("?", "Person")}


def test_signatures_match_duckdb(spark):
    tdf = spark.createDataFrame(TRIPLES, "s string, p string, o string")
    ydf = spark.createDataFrame(TYPES, "n string, ty string")
    got = {
        (r.s_type, r.predicate, r.o_type, r.n_triples, r.share)
        for r in type_signatures(tdf, ydf, "s", "p", "o", "n", "ty").collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(TRIPLES, columns=["s", "p", "o"]))
    con.register("y", pd.DataFrame(TYPES, columns=["n", "ty"]))
    want = set(
        con.execute(
            """
            WITH d AS (
              SELECT DISTINCT s, p, o FROM t
              WHERE s IS NOT NULL AND p IS NOT NULL AND o IS NOT NULL
            ), typed AS (
              SELECT coalesce(ys.ty, '?') AS s_type, d.p AS predicate,
                     coalesce(yo.ty, '?') AS o_type
              FROM d
              LEFT JOIN (SELECT DISTINCT n, ty FROM y) ys ON d.s = ys.n
              LEFT JOIN (SELECT DISTINCT n, ty FROM y) yo ON d.o = yo.n
            ), sigs AS (
              SELECT s_type, predicate, o_type, count(*) AS n_triples
              FROM typed GROUP BY ALL
            ), tot AS (
              SELECT p AS predicate, count(*) AS tot FROM d GROUP BY p
            )
            SELECT s.s_type, s.predicate, s.o_type, s.n_triples,
                   s.n_triples::double / tot.tot
            FROM sigs s JOIN tot USING (predicate)
            """
        ).fetchall()
    )
    assert got == want

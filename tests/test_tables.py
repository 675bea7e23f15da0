"""Bucketed graph tables: persistence + shuffle-free co-located J1 join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_export_tool_spark.plans.flagship import documents_kg
from neo4j_export_tool_spark.sources.tables import (
    colocated_hash_join,
    save_graph_tables,
)


@pytest.fixture(scope="module")
def graph_tables(spark, sf_dir):
    nodes, hashed = documents_kg(spark, sf_dir)
    edges = hashed.select(
        "element_id", "label", "start_element_id", "end_element_id",
        "canonical_props", "identity_hash",
    )
    return save_graph_tables(spark, nodes, edges, prefix="t_kg", n_buckets=8)


def test_tables_round_trip(spark, graph_tables):
    nodes_table, edges_table = graph_tables
    n = spark.table(nodes_table).count()
    e = spark.table(edges_table).count()
    assert n > 0 and e > 0
    # partition pruning on edge label: the scan should read one partition
    one_label = spark.table(edges_table).filter(F.col("label") == "MENTIONS")
    assert one_label.count() == e  # flagship has a single rel type


def test_colocated_join_elides_shuffle(spark, graph_tables):
    """At 100 TB the node dimension outgrows broadcast; with broadcast off
    (simulating that), bucketing must give a shuffle-free SortMergeJoin."""
    nodes_table, edges_table = graph_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_hash_join(spark, nodes_table, edges_table)
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan
        # bucketed-by-join-key on both sides → no Exchange feeding the join
        assert "Exchange hashpartitioning" not in plan
        # and the join result is correct: every edge resolved
        unresolved = joined.filter(
            F.col("start_node_content_hash").rlike("^doc:")
        ).count()
        assert unresolved == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_iceberg_path_probed_and_ddl_spec(spark):
    """No Iceberg jar in this container: the probe must say so, the writeTo
    path must refuse with a pointer to the parquet twin, and the emitted
    production DDL must carry the same layout contract (bucket transform on
    the join key, label identity partition)."""
    from neo4j_export_tool_spark.sources.tables import (
        iceberg_available,
        iceberg_graph_ddl,
        save_graph_tables_iceberg,
    )

    assert iceberg_available(spark) is False
    ddl = iceberg_graph_ddl(prefix="kg", n_buckets=16)
    assert "USING iceberg" in ddl["kg_nodes"]
    assert "bucket(16, element_id)" in ddl["kg_nodes"]
    assert "PARTITIONED BY (label, bucket(16, start_element_id))" in ddl["kg_edges"]

    import pytest as _pytest

    df = spark.range(1).selectExpr("cast(id as string) element_id")
    with _pytest.raises(NotImplementedError, match="Iceberg runtime"):
        save_graph_tables_iceberg(spark, df, df)

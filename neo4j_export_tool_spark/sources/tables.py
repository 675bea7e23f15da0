"""Table catalog: partitioned/bucketed graph-table persistence.

The reference exports to one JSONL file; this engine also materializes
``nodes``/``edges`` as analytical tables (the S11 target).  Iceberg is the
production catalog (SURVEY.md §2.1 S11); this container has no Iceberg
runtime jar, so the implementation targets the Spark-managed table layer
(``saveAsTable``), which carries the two layout features that matter at
100 TB and translate 1:1 to Iceberg's partition/sort specs:

- **partitioning** by a low-cardinality column (e.g. edge label) →
  partition pruning for per-relationship-type scans;
- **bucketing** by the join key (element_id) → the J1 node-hash lookup join
  becomes a shuffle-free zipped join between co-located buckets (at 10^12
  docs the edges⋈nodes shuffle is THE dominant cost once the node dimension
  outgrows broadcast).

``bucketed_join_ready`` verifies the physical plan actually elides the
exchange — the property a refactor must not regress.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog/runtime is on the classpath."""
    try:
        # py4j package access is lazy — force real classloading
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Schema")
        return True
    except Exception:
        return False


def iceberg_graph_ddl(prefix: str = "kg", n_buckets: int = 16) -> dict[str, str]:
    """The production Iceberg specs these managed tables translate to,
     1:1 (partition transform `bucket(N, col)` replaces Spark bucketing;
    `label` identity partition replaces partitionBy).  Emitted as DDL so
    the layout contract is explicit and testable without the runtime jar."""
    return {
        f"{prefix}_nodes": (
            f"CREATE TABLE {prefix}_nodes (\n"
            "  element_id string, labels array<string>,\n"
            "  properties_json string, canonical_props string,\n"
            "  content_hash string)\n"
            "USING iceberg\n"
            f"PARTITIONED BY (bucket({n_buckets}, element_id))\n"
            "TBLPROPERTIES ('write.distribution-mode'='hash')"
        ),
        f"{prefix}_edges": (
            f"CREATE TABLE {prefix}_edges (\n"
            "  element_id string, label string,\n"
            "  start_element_id string, end_element_id string,\n"
            "  start_node_content_hash string, end_node_content_hash string,\n"
            "  properties_json string)\n"
            "USING iceberg\n"
            f"PARTITIONED BY (label, bucket({n_buckets}, start_element_id))\n"
            "TBLPROPERTIES ('write.distribution-mode'='hash')"
        ),
    }


def save_graph_tables_iceberg(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    prefix: str = "kg",
    n_buckets: int = 16,
) -> tuple[str, str]:
    """Iceberg writeTo path (requires the runtime jar; probed at call time).
    Partition transforms mirror `save_graph_tables`' bucket/partition
    layout; snapshot ids become the stage-ledger fingerprints."""
    if not iceberg_available(spark):
        raise NotImplementedError(
            "no Iceberg runtime on the classpath — use save_graph_tables "
            "(bucketed managed parquet, identical layout semantics); the "
            "target DDL is iceberg_graph_ddl()"
        )
    from pyspark.sql import functions as F

    nodes_table = f"{prefix}_nodes"
    edges_table = f"{prefix}_edges"
    (
        nodes.writeTo(nodes_table)
        .partitionedBy(F.bucket(n_buckets, F.col("element_id")))
        .createOrReplace()
    )
    (
        edges.writeTo(edges_table)
        .partitionedBy(F.col("label"), F.bucket(n_buckets, F.col("start_element_id")))
        .createOrReplace()
    )
    return nodes_table, edges_table


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    n_buckets: int = 16,
    partition_by: str | None = None,
    sort_by: str | None = None,
) -> None:
    """Persist as a bucketed (optionally partitioned) managed table."""
    spark = df.sparkSession
    # overwrite of a managed table can trip LOCATION_ALREADY_EXISTS when a
    # prior run left the directory behind — drop cleanly first
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = df.write.mode("overwrite").format("parquet")
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer = writer.bucketBy(n_buckets, bucket_by)
    writer = writer.sortBy(sort_by or bucket_by)
    writer.saveAsTable(table)


def save_graph_tables(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    prefix: str = "kg",
    n_buckets: int = 16,
) -> tuple[str, str]:
    """Materialize the graph: nodes bucketed by element_id; edges bucketed by
    start_element_id and partitioned by label (relationship type)."""
    nodes_table = f"{prefix}_nodes"
    edges_table = f"{prefix}_edges"
    save_bucketed(nodes, nodes_table, bucket_by="element_id", n_buckets=n_buckets)
    save_bucketed(
        edges,
        edges_table,
        bucket_by="start_element_id",
        n_buckets=n_buckets,
        partition_by="label",
    )
    return nodes_table, edges_table


def colocated_hash_join(
    spark: SparkSession, nodes_table: str, edges_table: str
) -> DataFrame:
    """J1 over bucketed tables: equal bucket counts on the join key let
    Spark zip buckets without a shuffle (SortMergeJoin with no Exchange)."""
    from pyspark.sql import functions as F

    nodes = spark.table(nodes_table).select(
        F.col("element_id").alias("_nid"), F.col("content_hash").alias("_nhash")
    )
    edges = spark.table(edges_table)
    return (
        edges.join(nodes, edges["start_element_id"] == nodes["_nid"], "left")
        .withColumn(
            "start_node_content_hash", F.coalesce("_nhash", "start_element_id")
        )
        .drop("_nid", "_nhash")
    )

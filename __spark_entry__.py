"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG construction (documents → Aho-Corasick
mention detection → MENTIONS edges → content-hash identities → J1 hash join)
at sf0.001.  ``queries()`` exposes one entry per implemented operator from
SURVEY.md §2 (plus the training-data-pipeline extras); ``oracle_sql()`` gives
the DuckDB-equivalent ANSI SQL for each.

Exactness conventions (so the driver's value-hash compare is bit-stable):
- money aggregates use integer-cent math (``round(x*100)`` → bigint sums)
  and a single final division — identical in Spark and DuckDB;
- timestamps are emitted as formatted strings;
- every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_SMOKE = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# entry: flagship KG construction
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: hashed MENTIONS edges of the documents knowledge graph."""
    from neo4j_export_tool_spark.plans.flagship import flagship_edges

    return flagship_edges(spark, SF_SMOKE)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style aggregation (SURVEY §2.4 A1/A2 analog), integer-cent math."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("sum_qty_c"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "sum_base_price_c"
            ),
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * (100 - F.round(F.col("l_discount") * 100).cast("long"))
            ).alias("sum_disc_price_c4"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _q02_keyset_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset-paginated scan (SURVEY §2.1 S1 / §2.2 P3): WHERE id > cursor
    ORDER BY id LIMIT batch."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") > 100)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
        .limit(50)
    )


def _q03_per_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label stats fold (SURVEY §2.4 A2): record_count + bytes per label."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("record_count"),
            F.sum("n_chars").alias("bytes_written"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("lang", "source")
    )


def _q04_error_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error dedup aggregation (SURVEY §2.4 A4): group by (type, message
    prefix), keep count + first occurrence."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.col("event_type").alias("error_type"),
            F.substring(F.col("props"), 1, 20).alias("message_prefix"),
        )
        .agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.min("event_id").alias("first_event_id"),
        )
        .orderBy("error_type", "message_prefix")
    )


def _q05_truncate_marker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncate-with-ellipsis (SURVEY §2.6 F6): span-slice to maxLen-3 + '...'."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.when(
            F.length("text") > 100,
            F.concat(F.substring("text", 1, 97), F.lit("...")),
        )
        .otherwise(F.col("text"))
        .alias("text_truncated"),
        (F.length("text") > 100).alias("was_truncated"),
    ).orderBy("doc_id")


def _q06_node_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NET_node_content_hash (SURVEY §1.4/F4): sha256 over 'node:' + sorted
    labels + ':' + canonical JSON — computed JVM-side."""
    from neo4j_export_tool_spark.plans.flagship import document_nodes, load_documents

    nodes = document_nodes(load_documents(spark, sf_dir))
    return nodes.select("element_id", "canonical_props", "content_hash").orderBy(
        "element_id"
    )


def _q07_rel_identity_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NET_rel_identity_hash + J1 node-hash lookup join (SURVEY §2.3 J1):
    MENTIONS edges with identity hash and start/end node content hashes."""
    from neo4j_export_tool_spark.plans.flagship import documents_kg

    _, hashed = documents_kg(spark, sf_dir)
    return hashed.select(
        F.col("start_element_id"),
        F.col("end_element_id"),
        F.col("element_id").alias("rel_identity_hash"),
        "start_node_content_hash",
        "end_node_content_hash",
    ).orderBy("start_element_id", "end_element_id")


def _q08_kg_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gazetteer mention detection (SURVEY §2.8, mapInPandas Aho-Corasick):
    per-(doc, concept) occurrence counts + first char offset."""
    from neo4j_export_tool_spark.plans.flagship import doc_mentions, load_documents

    m = doc_mentions(load_documents(spark, sf_dir))
    return m.select("doc_id", "concept", "n_occurrences", "first_offset").orderBy(
        "doc_id", "concept"
    )


def _q09_global_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global count source (SURVEY §2.1 S4 / §2.4 A1)."""
    docs = _t(spark, sf_dir, "documents").agg(F.count(F.lit(1)).alias("n_documents"))
    ev = _t(spark, sf_dir, "events").agg(F.count(F.lit(1)).alias("n_events"))
    li = _t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_lineitems"))
    return docs.crossJoin(ev).crossJoin(li)


def _q10_distinct_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct label collection (SURVEY §2.4 A3 / §2.5 D2): sorted '+'-joined
    label set, the hash-input composition."""
    docs = _t(spark, sf_dir, "documents")
    return docs.agg(
        F.array_join(F.array_sort(F.collect_set("lang")), "+").alias("labels_joined"),
        F.countDistinct("lang").alias("label_count"),
    )


def _q11_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash (training-pipeline op): canonical doc per
    sha256(text) group."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.sha2(F.col("text"), 256).alias("text_sha256"))
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .orderBy("text_sha256")
    )


def _q12_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (training-pipeline op): whitespace tokens + distinct."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    ).orderBy("doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_pricing_summary": _q01_pricing_summary,
        "q02_keyset_scan": _q02_keyset_scan,
        "q03_per_label_stats": _q03_per_label_stats,
        "q04_error_dedup": _q04_error_dedup,
        "q05_truncate_marker": _q05_truncate_marker,
        "q06_node_content_hash": _q06_node_content_hash,
        "q07_rel_identity_hash": _q07_rel_identity_hash,
        "q08_kg_mentions": _q08_kg_mentions,
        "q09_global_counts": _q09_global_counts,
        "q10_distinct_labels": _q10_distinct_labels,
        "q11_dedup_exact": _q11_dedup_exact,
        "q12_token_stats": _q12_token_stats,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect-compatible ANSI SQL)
# ---------------------------------------------------------------------------

_CONCEPT_LIST = (
    "'agg','batch','column','data','filter','group','hash','join','key',"
    "'line','merge','order','part','query','row','scan','sort','spark',"
    "'stream','table','value','vector','window'"
)

_MENTIONS_CTE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), m AS (
  SELECT doc_id, tok AS concept, count(*) AS n_occurrences
  FROM toks WHERE tok IN ({_CONCEPT_LIST})
  GROUP BY doc_id, tok
), mentions AS (
  SELECT m.doc_id, m.concept, m.n_occurrences,
         instr(' ' || d.text || ' ', ' ' || m.concept || ' ') - 1 AS first_offset
  FROM m JOIN documents d USING (doc_id)
)
"""

_DOC_NODE_HASH = (
    "sha256('node:Document:{\"doc_id\":' || doc_id || ',\"lang\":\"' || lang"
    " || '\",\"n_chars\":' || n_chars || ',\"source\":\"' || source || '\"}')"
)

_CONCEPT_NODE_HASH = "sha256('node:Concept:{\"name\":\"' || concept || '\"}')"


def oracle_sql() -> dict[str, str]:
    return {
        "q01_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sum_qty_c,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sum_base_price_c,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS sum_disc_price_c4,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q02_keyset_scan": """
            SELECT doc_id, lang, source FROM documents
            WHERE doc_id > 100 ORDER BY doc_id LIMIT 50
        """,
        "q03_per_label_stats": """
            SELECT lang, source, count(*) AS record_count,
                   sum(n_chars) AS bytes_written,
                   min(doc_id) AS first_doc, max(doc_id) AS last_doc
            FROM documents GROUP BY lang, source ORDER BY lang, source
        """,
        "q04_error_dedup": """
            SELECT event_type AS error_type,
                   substring(props, 1, 20) AS message_prefix,
                   count(*) AS occurrences,
                   min(event_id) AS first_event_id
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q05_truncate_marker": """
            SELECT doc_id,
                   CASE WHEN length(text) > 100
                        THEN substring(text, 1, 97) || '...'
                        ELSE text END AS text_truncated,
                   length(text) > 100 AS was_truncated
            FROM documents ORDER BY doc_id
        """,
        "q06_node_content_hash": f"""
            SELECT 'doc:' || doc_id AS element_id,
                   '{{"doc_id":' || doc_id || ',"lang":"' || lang ||
                   '","n_chars":' || n_chars || ',"source":"' || source ||
                   '"}}' AS canonical_props,
                   {_DOC_NODE_HASH} AS content_hash
            FROM documents ORDER BY element_id
        """,
        "q07_rel_identity_hash": f"""
            {_MENTIONS_CTE}
            SELECT 'doc:' || mentions.doc_id AS start_element_id,
                   'concept:' || concept AS end_element_id,
                   sha256('rel:MENTIONS:doc:' || mentions.doc_id || ':concept:' || concept ||
                          ':{{"first_offset":' || first_offset ||
                          ',"n_occurrences":' || n_occurrences || '}}') AS rel_identity_hash,
                   {_DOC_NODE_HASH} AS start_node_content_hash,
                   {_CONCEPT_NODE_HASH} AS end_node_content_hash
            FROM mentions JOIN documents USING (doc_id)
            ORDER BY start_element_id, end_element_id
        """,
        "q08_kg_mentions": f"""
            {_MENTIONS_CTE}
            SELECT doc_id, concept, n_occurrences, first_offset
            FROM mentions ORDER BY doc_id, concept
        """,
        "q09_global_counts": """
            SELECT (SELECT count(*) FROM documents) AS n_documents,
                   (SELECT count(*) FROM events) AS n_events,
                   (SELECT count(*) FROM lineitem) AS n_lineitems
        """,
        "q10_distinct_labels": """
            SELECT string_agg(DISTINCT lang, '+' ORDER BY lang) AS labels_joined,
                   count(DISTINCT lang) AS label_count
            FROM documents
        """,
        "q11_dedup_exact": """
            SELECT sha256(text) AS text_sha256,
                   min(doc_id) AS canonical_doc_id,
                   count(*) AS n_copies
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        "q12_token_stats": """
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens
            FROM documents ORDER BY doc_id
        """,
    }

"""JSONL export sink — round-trips the reference tool's file format.

File layout (reference ``Core/Types.fs:347-370``, ``docs/Metadata.md:42-49``):
line 1 = metadata object, then node records, then relationship records, then
error/warning records; the metadata's ``export_metadata.format`` carries the
start line of each section.

Record schemas (reference ``Core/RecordTypes.fs:29-60``):
- node: ``{type, element_id, NET_node_content_hash?, export_id, labels,
  properties}``
- relationship: ``{type, element_id, NET_rel_identity_hash?, export_id,
  label, start_element_id, end_element_id, start_node_content_hash?,
  end_node_content_hash?, properties}``
- error/warning: ``{type, timestamp, message, [line, details, element_id]}``

Where the reference reserves a padded metadata placeholder and seeks back
(``Workflow/Workflow.fs:100-152``, ``Workflow/MetadataWriter.fs:32-224``),
Spark lets us compute the global counters first (they're cheap aggregates)
and write the metadata line once, up front — no seek, no padding needed,
same bytes-on-disk contract.

Two write modes:
- ``single_file=True`` — exact reference layout in one file; data lines are
  streamed driver-side via ``toLocalIterator`` (constant driver memory, the
  same bound the reference's streaming write gives a single process).
- ``single_file=False`` — the 100 TB path: per-section line files written by
  executors (``df.write.text``) + a ``_metadata.json``; assembly into one
  file is a concat any object store can do server-side.

Record serialization runs in Arrow-vectorized ``mapInPandas`` (the property
bag goes through the §1.3 encoding contract), with per-label record/byte
stats collected as a DataFrame aggregation (reference A2 per-label stats,
``Export/Core.fs:277-313``; multi-label nodes split bytes evenly across
labels, unlabeled nodes count under ``_unlabeled``).
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid
from collections.abc import Iterator
from dataclasses import dataclass, field
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neo4j_export_tool_spark import FORMAT_VERSION, PRODUCER_NAME, __version__
from neo4j_export_tool_spark.functions.encoding import dumps, encode_properties


# ---------------------------------------------------------------------------
# record serialization (Arrow-vectorized)
# ---------------------------------------------------------------------------

def _props_from_row(row: Any) -> dict[str, Any]:
    """Decode one properties cell: either a pre-serialized JSON string
    (heterogeneous union path) or an Arrow-decoded struct dict (TYPED path —
    keeps real datetimes/bytes/NaN so the §1.3 encoding contract applies to
    the actual values, not their to_json stringification)."""
    if row is None:
        return {}
    if isinstance(row, str):
        return json.loads(row) if row else {}
    if isinstance(row, dict):
        return {k: v for k, v in row.items() if k != "_empty"}
    # pyspark Row / namedtuple-ish
    return {k: v for k, v in row.asDict(recursive=True).items() if k != "_empty"}


def _serialize_nodes(nodes: DataFrame, export_id: str, hashed_ids: bool) -> DataFrame:
    """nodes(element_id, labels, properties_json | properties, content_hash)
    → (line, labels)."""
    props_col = "properties_json" if "properties_json" in nodes.columns else "properties"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lines = []
            for eid, labels, props, chash in zip(
                pdf["element_id"], pdf["labels"], pdf[props_col], pdf["content_hash"]
            ):
                rec: dict[str, Any] = {"type": "node", "element_id": eid}
                if hashed_ids:
                    rec["NET_node_content_hash"] = chash
                rec["export_id"] = export_id
                rec["labels"] = list(labels)
                rec["properties"] = encode_properties(_props_from_row(props))
                lines.append(dumps(rec))
            yield pd.DataFrame({"line": lines, "labels": pdf["labels"]})

    return nodes.select(
        "element_id", "labels", props_col, "content_hash"
    ).mapInPandas(run, schema="line string, labels array<string>")


def _serialize_rels(edges: DataFrame, export_id: str, hashed_ids: bool) -> DataFrame:
    """edges(element_id, label, start/end ids, start/end hashes,
    properties_json | properties) → (line, label)."""
    props_col = "properties_json" if "properties_json" in edges.columns else "properties"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lines = []
            for row in pdf.itertuples(index=False):
                rec: dict[str, Any] = {
                    "type": "relationship",
                    "element_id": row.element_id,
                }
                if hashed_ids:
                    rec["NET_rel_identity_hash"] = row.element_id
                rec["export_id"] = export_id
                rec["label"] = row.label
                rec["start_element_id"] = row.start_element_id
                rec["end_element_id"] = row.end_element_id
                if hashed_ids:
                    rec["start_node_content_hash"] = row.start_node_content_hash
                    rec["end_node_content_hash"] = row.end_node_content_hash
                rec["properties"] = encode_properties(
                    _props_from_row(getattr(row, props_col))
                )
                lines.append(dumps(rec))
            yield pd.DataFrame({"line": lines, "label": pdf["label"]})

    return edges.mapInPandas(run, schema="line string, label string")


def _label_stats_nodes(serialized: DataFrame) -> list[dict[str, Any]]:
    """Per-label record/byte stats; multi-label bytes split evenly (A2)."""
    bytes_col = (F.length("line") + 1).cast("double")
    normalized = serialized.select(
        F.when(
            F.col("labels").isNull() | (F.size("labels") == 0),
            F.array(F.lit("_unlabeled")),
        )
        .otherwise(F.col("labels"))
        .alias("labels"),
        bytes_col.alias("line_bytes"),
    )
    exploded = normalized.select(
        F.explode("labels").alias("label"),
        (F.col("line_bytes") / F.size("labels")).alias("bytes_share"),
    )
    rows = (
        exploded.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("record_count"),
            F.sum("bytes_share").alias("bytes_written"),
        )
        .orderBy("label")
        .collect()
    )
    return [
        {
            "label": r["label"] if r["label"] is not None else "_unlabeled",
            "record_count": r["record_count"],
            "bytes_written": int(r["bytes_written"]),
        }
        for r in rows
    ]


def _label_stats_rels(serialized: DataFrame) -> list[dict[str, Any]]:
    rows = (
        serialized.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("record_count"),
            F.sum(F.length("line") + 1).alias("bytes_written"),
        )
        .orderBy("label")
        .collect()
    )
    return [
        {
            "label": r["label"],
            "record_count": r["record_count"],
            "bytes_written": int(r["bytes_written"]),
        }
        for r in rows
    ]


# ---------------------------------------------------------------------------
# metadata line
# ---------------------------------------------------------------------------

def generate_filename(
    db_name: str, node_count: int, rel_count: int, export_id: str, ts: time.struct_time
) -> str:
    """``{db(≤20 alnum)}_{yyyyMMddTHHmmssZ}_{N}n_{M}r_{exportId[:8]}.jsonl``
    (reference ``Configuration/Configuration.fs:35-72``)."""
    safe_db = re.sub(r"[^A-Za-z0-9]", "", db_name)[:20] or "db"
    stamp = time.strftime("%Y%m%dT%H%M%SZ", ts)
    return f"{safe_db}_{stamp}_{node_count}n_{rel_count}r_{export_id[:8]}.jsonl"


def build_metadata(
    *,
    export_id: str,
    db_name: str,
    node_count: int,
    rel_count: int,
    labels: list[str],
    rel_types: list[str],
    node_stats: list[dict[str, Any]],
    rel_stats: list[dict[str, Any]],
    error_count: int,
    warning_count: int,
    duration_seconds: float,
    timestamp_utc: str,
) -> dict[str, Any]:
    node_start = 2
    rel_start = node_start + node_count
    error_start = rel_start + rel_count
    warning_start = error_start + error_count
    return {
        "format_version": FORMAT_VERSION,
        "export_metadata": {
            "export_id": export_id,
            "export_timestamp_utc": timestamp_utc,
            "export_mode": "spark_dataframe_parallel",
            "format": {
                "type": "jsonl",
                "metadata_line": 1,
                "node_start_line": node_start,
                "relationship_start_line": rel_start,
                "error_start_line": error_start,
                "warning_start_line": warning_start,
            },
        },
        "producer": {
            "name": PRODUCER_NAME,
            "version": __version__,
            "runtime": "pyspark",
        },
        "source_system": {
            "type": "spark_kg_pipeline",
            "database": {"name": db_name},
        },
        "database_statistics": {
            "nodeCount": node_count,
            "relCount": rel_count,
            "labelCount": len(labels),
            "relTypeCount": len(rel_types),
        },
        "database_schema": {
            "labels": sorted(labels),
            "relationshipTypes": sorted(rel_types),
        },
        "environment": {"spark": True},
        "security": {"auth": "n/a"},
        "export_manifest": {
            "total_export_duration_seconds": round(duration_seconds, 6),
            "file_statistics": node_stats + rel_stats,
        },
        "error_summary": {
            "total_errors": error_count,
            "total_warnings": warning_count,
        },
        "supported_record_types": ["node", "relationship", "error", "warning"],
        "compatibility": {"min_reader_version": "1.0.0"},
        "compression": {"algorithm": "none"},
        "pagination_performance": {
            "strategy": "partition_parallel",
            "note": "keyset pagination replaced by partition-parallel scan",
        },
        "_reserved": "",
    }


@dataclass
class ExportResult:
    path: str
    export_id: str
    node_count: int
    rel_count: int
    metadata: dict[str, Any]
    error_count: int = 0
    warning_count: int = 0
    files: list[str] = field(default_factory=list)


# ---------------------------------------------------------------------------
# export driver
# ---------------------------------------------------------------------------

def export_jsonl(
    nodes: DataFrame,
    edges: DataFrame,
    out_dir: str,
    db_name: str = "graph",
    export_id: str | None = None,
    hashed_ids: bool = True,
    errors: list[dict[str, Any]] | None = None,
    warnings: list[dict[str, Any]] | None = None,
    single_file: bool = True,
    sort_lines: bool = True,
) -> ExportResult:
    """Export nodes/edges DataFrames to the reference JSONL format.

    ``nodes``: (element_id, labels, properties_json, content_hash) — the
    `nodes_union` projection.  ``edges``: the `attach_node_hashes` output
    with ``properties_json`` (use `with_properties_json`).

    ``hashed_ids=False`` omits every hash field (reference
    ``N4JET_ENABLE_HASHED_IDS=false``, ``GraphElements.fs:140-141,179-197``).
    """
    t0 = time.perf_counter()
    export_id = export_id or str(uuid.uuid4())
    started = time.gmtime()
    timestamp_utc = time.strftime("%Y-%m-%dT%H:%M:%SZ", started)

    node_lines = _serialize_nodes(nodes, export_id, hashed_ids)
    rel_lines = _serialize_rels(edges, export_id, hashed_ids)
    if sort_lines:
        node_lines = node_lines.orderBy("line")
        rel_lines = rel_lines.orderBy("line")
    node_lines = node_lines.persist()
    rel_lines = rel_lines.persist()

    try:
        node_stats = _label_stats_nodes(node_lines)
        rel_stats = _label_stats_rels(rel_lines)
        # per-label stats double-count multi-label nodes; the true count is
        # the line count
        node_count = node_lines.count()
        rel_count = rel_lines.count()
        labels = [s["label"] for s in node_stats]
        rel_types = [s["label"] for s in rel_stats]

        err_records = [
            {"type": "error", **e} for e in (errors or [])
        ]
        warn_records = [
            {"type": "warning", **w} for w in (warnings or [])
        ]

        metadata = build_metadata(
            export_id=export_id,
            db_name=db_name,
            node_count=node_count,
            rel_count=rel_count,
            labels=labels,
            rel_types=rel_types,
            node_stats=node_stats,
            rel_stats=rel_stats,
            error_count=len(err_records),
            warning_count=len(warn_records),
            duration_seconds=0.0,  # patched below
            timestamp_utc=timestamp_utc,
        )

        os.makedirs(out_dir, exist_ok=True)
        filename = generate_filename(db_name, node_count, rel_count, export_id, started)
        final_path = os.path.join(out_dir, filename)

        if single_file:
            # executors write each section in parallel (orderBy → range-
            # partitioned, so part files in name order ARE globally sorted);
            # the driver then bulk-concatenates file streams — constant
            # memory, no per-row Py4J traffic — and atomically renames
            # (reference Export/Core.fs:437-462)
            import glob
            import shutil

            tmp_path = final_path + ".tmp"
            sections_dir = os.path.join(out_dir, f"_sections_{export_id[:8]}")
            nodes_txt = os.path.join(sections_dir, "nodes")
            rels_txt = os.path.join(sections_dir, "rels")
            node_lines.select("line").write.mode("overwrite").text(nodes_txt)
            rel_lines.select("line").write.mode("overwrite").text(rels_txt)
            metadata["export_manifest"]["total_export_duration_seconds"] = round(
                time.perf_counter() - t0, 6
            )
            with open(tmp_path, "w", encoding="utf-8") as f:
                f.write(dumps(metadata) + "\n")
                for section in (nodes_txt, rels_txt):
                    for part in sorted(glob.glob(os.path.join(section, "part-*"))):
                        with open(part, encoding="utf-8") as pf:
                            shutil.copyfileobj(pf, f, 1 << 20)
                for rec in err_records + warn_records:
                    f.write(dumps(rec) + "\n")
            os.replace(tmp_path, final_path)
            shutil.rmtree(sections_dir, ignore_errors=True)
            files = [final_path]
        else:
            # scale path: executor-written line files per section
            nodes_dir = os.path.join(out_dir, "nodes")
            rels_dir = os.path.join(out_dir, "relationships")
            node_lines.select("line").write.mode("overwrite").text(nodes_dir)
            rel_lines.select("line").write.mode("overwrite").text(rels_dir)
            metadata["export_manifest"]["total_export_duration_seconds"] = round(
                time.perf_counter() - t0, 6
            )
            meta_path = os.path.join(out_dir, "_metadata.json")
            with open(meta_path, "w", encoding="utf-8") as f:
                f.write(dumps(metadata) + "\n")
            final_path = out_dir
            files = [meta_path, nodes_dir, rels_dir]

        return ExportResult(
            path=final_path,
            export_id=export_id,
            node_count=node_count,
            rel_count=rel_count,
            metadata=metadata,
            error_count=len(err_records),
            warning_count=len(warn_records),
            files=files,
        )
    finally:
        node_lines.unpersist()
        rel_lines.unpersist()


def with_properties_json(edges: DataFrame) -> DataFrame:
    """Edge projection for the sink: struct properties → JSON string."""
    return edges.select(
        "element_id",
        "label",
        "start_element_id",
        "end_element_id",
        "start_node_content_hash",
        "end_node_content_hash",
        F.to_json("properties").alias("properties_json"),
    )

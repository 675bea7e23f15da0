"""JSONL export READER — loads a reference-format export back into
nodes/edges DataFrames (the import half of the round trip).

Accepts both layouts the sink produces (and the reference tool's own
output, which is the single-file layout):

- single file: line 1 metadata, then node / relationship / error / warning
  records (``Core/Types.fs:347-370``);
- dir mode: ``_metadata.json`` + ``nodes/`` + ``relationships/`` line files.

Parsing is JVM-side (``from_json`` with explicit record schemas; the
open-ended ``properties`` object stays a JSON string — the same
heterogeneous-bag representation ``nodes_union`` uses), so imports scale
like any text scan: no Python in the row path, predicate pushdown on the
record ``type`` discriminator.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NODE_SCHEMA = (
    "type string, element_id string, NET_node_content_hash string, "
    "export_id string, labels array<string>"
)
REL_SCHEMA = (
    "type string, element_id string, NET_rel_identity_hash string, "
    "export_id string, label string, start_element_id string, "
    "end_element_id string, start_node_content_hash string, "
    "end_node_content_hash string"
)


@dataclass
class ImportedExport:
    metadata: dict[str, Any]
    nodes: DataFrame  # (element_id, labels, properties_json, content_hash)
    edges: DataFrame  # (element_id, label, start/end ids+hashes, properties_json)
    errors: DataFrame  # raw error/warning records (line string)


# decompressed .zst scratch dirs: must outlive the lazy DataFrames built
# over them, so they are reclaimed at interpreter exit, not per-call
_ZST_SCRATCH_DIRS: list[str] = []


def _cleanup_zst_scratch() -> None:
    import shutil

    while _ZST_SCRATCH_DIRS:
        shutil.rmtree(_ZST_SCRATCH_DIRS.pop(), ignore_errors=True)


def _materialize_zst(spark: SparkSession, path: str) -> str:
    """Decompress a ``.zst`` export to a plain temp file the text reader
    can scan.  Decompression runs JVM-side (zstd-jni ``ZstdInputStream`` →
    ``Files.copy``), no Py4J byte traffic.  The temp file must outlive the
    lazy DataFrames built over it, so cleanup is deferred to interpreter
    exit (atexit) rather than per-call — bounding the leak the scratch
    copy would otherwise be on long-lived hosts."""
    import atexit
    import tempfile

    scratch = tempfile.mkdtemp(prefix="jsonl-zst-")
    if not _ZST_SCRATCH_DIRS:
        atexit.register(_cleanup_zst_scratch)
    _ZST_SCRATCH_DIRS.append(scratch)
    out = os.path.join(scratch, os.path.basename(path)[: -len(".zst")])
    jvm = spark.sparkContext._jvm
    fis = jvm.java.io.FileInputStream(path)
    try:
        zis = jvm.com.github.luben.zstd.ZstdInputStream(fis)
    except Exception:
        fis.close()  # constructor failure must not leak the JVM handle
        raise
    try:
        jvm.java.nio.file.Files.copy(
            zis,
            jvm.java.io.File(out).toPath(),
            spark.sparkContext._gateway.new_array(
                jvm.java.nio.file.CopyOption, 0
            ),
        )
    finally:
        zis.close()
    return out


def _lines_df(spark: SparkSession, path: str) -> DataFrame:
    if os.path.isdir(path):
        sections = [
            os.path.join(path, d)
            for d in ("nodes", "relationships")
            if os.path.isdir(os.path.join(path, d))
        ]
        return spark.read.text(sections)
    df = spark.read.text(path)
    # drop the metadata line (the only line with format_version at top level)
    return df.filter(
        F.get_json_object("value", "$.format_version").isNull()
    )


def _read_metadata(path: str) -> dict[str, Any]:
    meta_path = (
        os.path.join(path, "_metadata.json") if os.path.isdir(path) else path
    )
    if meta_path.endswith(".gz"):
        import gzip

        with gzip.open(meta_path, "rt", encoding="utf-8") as f:
            return json.loads(f.readline())
    with open(meta_path, encoding="utf-8") as f:
        return json.loads(f.readline())


def read_jsonl_export(spark: SparkSession, path: str) -> ImportedExport:
    """Load an export (file or directory) back into DataFrames.

    ``properties`` is re-emitted as the raw JSON object string
    (``properties_json``) — byte-identical to what the sink wrote, so a
    re-export round-trips exactly.
    """
    if path.endswith(".zst"):
        path = _materialize_zst(spark, path)
    metadata = _read_metadata(path)
    lines = _lines_df(spark, path)
    kind = F.get_json_object("value", "$.type")

    node_lines = lines.filter(kind == "node")
    nodes = node_lines.select(
        F.from_json("value", NODE_SCHEMA).alias("r"),
        F.get_json_object("value", "$.properties").alias("properties_json"),
    ).select(
        F.col("r.element_id").alias("element_id"),
        F.col("r.labels").alias("labels"),
        "properties_json",
        F.col("r.NET_node_content_hash").alias("content_hash"),
    )

    rel_lines = lines.filter(kind == "relationship")
    edges = rel_lines.select(
        F.from_json("value", REL_SCHEMA).alias("r"),
        F.get_json_object("value", "$.properties").alias("properties_json"),
    ).select(
        F.col("r.element_id").alias("element_id"),
        F.col("r.label").alias("label"),
        F.col("r.start_element_id").alias("start_element_id"),
        F.col("r.end_element_id").alias("end_element_id"),
        F.col("r.start_node_content_hash").alias("start_node_content_hash"),
        F.col("r.end_node_content_hash").alias("end_node_content_hash"),
        "properties_json",
    )

    errors = lines.filter(kind.isin("error", "warning")).select(
        F.col("value").alias("line")
    )
    return ImportedExport(metadata=metadata, nodes=nodes, edges=edges, errors=errors)

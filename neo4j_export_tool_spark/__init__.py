"""neo4j_export_tool_spark — a PySpark-native knowledge-graph construction engine.

A brand-new engine (NOT a port) with the query/data-processing capabilities of
the reference exporter ``vic-ffm/neo4j-export-tool`` (an F# streaming Neo4j →
JSONL dumper).  The reference defines the *output data model* (node /
relationship JSONL records, metadata line), the *type-serialization contract*
(NaN→"NaN", truncation markers, base64 binaries, ISO temporals) and the *ID
algebra* (SHA-256 content hashes over canonical JSON); this package supplies a
distributed Spark DataFrame dataflow: Arrow-vectorized pandas UDFs for
extraction, broadcast/sort-merge joins instead of the reference's in-memory
node-id map, MinHash-LSH similarity joins, iterative connected components with
checkpointing, and salted repartitioning for skew.

Layout
------
- ``functions/``  scalar kernel: canonical JSON + hash algebra, value
  encoding contract, text analysis, similarity primitives.
- ``sources/``    corpus synthesis, table catalog, JSONL sink.
- ``operators/``  mention detection, entity linking, dedup family,
  ANN search, connected components, multimodal plumbing.
- ``plans/``      end-to-end pipelines (stage ledger, resumability).
- ``streaming/``  Structured Streaming analogs of the batch operators.
"""

__version__ = "0.1.0"

PRODUCER_NAME = "neo4j_export_tool_spark"
FORMAT_VERSION = "1.0.0"

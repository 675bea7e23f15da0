"""End-to-end KG construction over web pages, with a resumable stage ledger.

The north-star dataflow (SURVEY.md §3 'Spark lifecycle equivalent'):

    pages ─extract──► text ─mentions──► mentions ─link──► linked
                         └─triples──► triples ──────────────┤
    surfaces ─LSH+CC──► canonical map ──────────────────────┤
                                                            ▼
                nodes / edges (+content hashes, J1 join) ──► parquet + JSONL

Every stage is (parquet in) → (parquet out + metrics); a completed stage is
recorded in the ledger (``_ledger/<stage>.json`` next to the stage output)
and skipped on re-run — the checkpoint/resume capability the reference lists
as future work (``docs/Improvements.md:158``) and the north rule requires.
Stage outputs are content-addressed by an input fingerprint PLUS digests of
the configs the stage's upstream closure consumes (gazetteer, relation
templates, canonicalization threshold), so a resumed run with different
input or pipeline config invalidates the affected stages instead of
silently reusing them.

Metrics per stage: row count, wall seconds, per-partition row counts —
written into the ledger entry (the Spark analog of the reference's per-label
stats + batch-timing trackers, ``Export/Types.fs:140-216``).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neo4j_export_tool_spark.operators.canonicalize import canonicalize_surfaces
from neo4j_export_tool_spark.operators.extract import extract_text_udf
from neo4j_export_tool_spark.operators.graph import (
    attach_node_hashes,
    edges_from,
    nodes_from,
    nodes_union,
)
from neo4j_export_tool_spark.operators.linking import kb_from_gazetteer, link_mentions
from neo4j_export_tool_spark.operators.mentions import (
    build_relation_patterns,
    detect_mentions,
    extract_triples,
)


# ---------------------------------------------------------------------------
# stage ledger
# ---------------------------------------------------------------------------

@dataclass
class StageLedger:
    """Records completed stages: output path + metrics + input fingerprint."""

    work_dir: str

    def _entry_path(self, stage: str) -> str:
        return os.path.join(self.work_dir, "_ledger", f"{stage}.json")

    def output_path(self, stage: str) -> str:
        return os.path.join(self.work_dir, "stages", stage)

    def read(self, stage: str) -> dict[str, Any] | None:
        try:
            with open(self._entry_path(stage), encoding="utf-8") as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def is_done(self, stage: str, fingerprint: str) -> bool:
        entry = self.read(stage)
        return bool(
            entry
            and entry.get("fingerprint") == fingerprint
            and os.path.exists(os.path.join(self.output_path(stage), "_SUCCESS"))
        )

    def mark_done(self, stage: str, fingerprint: str, metrics: dict[str, Any]) -> None:
        os.makedirs(os.path.dirname(self._entry_path(stage)), exist_ok=True)
        with open(self._entry_path(stage), "w", encoding="utf-8") as f:
            json.dump({"fingerprint": fingerprint, "metrics": metrics}, f, indent=1)

    def invalidate(self, stage: str) -> None:
        try:
            os.remove(self._entry_path(stage))
        except FileNotFoundError:
            pass


def _partition_counts(df: DataFrame) -> list[int]:
    rows = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .orderBy("pid")
        .collect()
    )
    return [r["count"] for r in rows]


@dataclass
class PipelineResult:
    work_dir: str
    stages_run: list[str] = field(default_factory=list)
    stages_skipped: list[str] = field(default_factory=list)
    metrics: dict[str, dict[str, Any]] = field(default_factory=dict)
    # BatchPerformanceTracker.metrics() over the stage wall times — the
    # reference's pagination_performance analog (Export/Types.fs:140-216)
    performance: dict[str, Any] | None = None


class PagesPipeline:
    """Configurable KG pipeline over a pages table
    (url, warc_ts, html, text, lang)."""

    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        gazetteer: dict[str, tuple[str, str]],
        relation_templates: list[tuple[str, str, str, str]],
        surfaces_by_label: dict[str, list[str]],
        resume: bool = True,
    ):
        self.spark = spark
        self.work_dir = work_dir
        self.gazetteer = gazetteer
        self.templates = relation_templates
        self.surfaces_by_label = surfaces_by_label
        self.resume = resume
        self.ledger = StageLedger(work_dir)
        self.result = PipelineResult(work_dir)
        # config digests folded into stage fingerprints: a resumed run with
        # a changed gazetteer/templates/thresholds must invalidate the
        # stages that consumed them, not silently reuse stale parquet
        import hashlib

        def digest(obj: Any) -> str:
            return hashlib.sha256(
                json.dumps(obj, sort_keys=True, default=str).encode()
            ).hexdigest()[:16]

        self._gaz_digest = digest(sorted(self.gazetteer.items()))
        self._tpl_digest = digest(
            [sorted(map(list, self.templates)),
             {k: sorted(v) for k, v in self.surfaces_by_label.items()}]
        )

    def _stage_fp(self, base_fp: str, *digests: str) -> str:
        """Input fingerprint + the digests of every config the stage (or its
        upstream closure) consumes."""
        return "+".join([base_fp, *digests])

    # -- stage runner -------------------------------------------------------

    def _run_stage(
        self,
        stage: str,
        fingerprint: str,
        compute: Callable[[], DataFrame],
        partition_by: str | None = None,
    ) -> DataFrame:
        out = self.ledger.output_path(stage)
        if self.resume and self.ledger.is_done(stage, fingerprint):
            self.result.stages_skipped.append(stage)
            return self.spark.read.parquet(out)
        t0 = time.perf_counter()
        df = compute()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(out)
        materialized = self.spark.read.parquet(out)
        metrics = {
            "rows": materialized.count(),
            "seconds": round(time.perf_counter() - t0, 3),
            "partition_rows": _partition_counts(materialized),
        }
        self.ledger.mark_done(stage, fingerprint, metrics)
        self.result.stages_run.append(stage)
        self.result.metrics[stage] = metrics
        return materialized

    # -- stages ---------------------------------------------------------------

    def run(self, pages: DataFrame, fingerprint: str) -> PipelineResult:
        """Run all stages. ``fingerprint``: identifies the input snapshot
        (e.g. corpus size + seed, or an Iceberg snapshot id)."""
        fp = fingerprint
        gaz, tpl = self._gaz_digest, self._tpl_digest
        canon_threshold = 40

        extracted = self._run_stage(
            "extract",
            self._stage_fp(fp),
            lambda: pages.select(
                "url",
                "warc_ts",
                "lang",
                extract_text_udf(F.col("html")).alias("text"),
            ),
        )

        mentions = self._run_stage(
            "mentions",
            self._stage_fp(fp, gaz),
            lambda: detect_mentions(extracted, self.gazetteer),
        )

        triples = self._run_stage(
            "triples",
            self._stage_fp(fp, tpl),
            lambda: extract_triples(
                extracted,
                build_relation_patterns(self.templates, self.surfaces_by_label),
            ),
        )

        canonical_map = self._run_stage(
            "canonicalize",
            self._stage_fp(fp, gaz, f"threshold={canon_threshold}"),
            lambda: canonicalize_surfaces(
                mentions.select("surface"), threshold_pct=canon_threshold
            ),
        )

        linked = self._run_stage(
            "link",
            self._stage_fp(fp, gaz),
            lambda: link_mentions(
                mentions, kb_from_gazetteer(self.spark, self.gazetteer)
            ).select(
                "url", "surface", "label", "canonical", "start", "end",
                "kb_id", "linked_name", "link_score",
            ),
        )

        nodes = self._run_stage(
            "nodes", self._stage_fp(fp, gaz), lambda: self._build_nodes(linked)
        )
        edges = self._run_stage(
            "edges",
            self._stage_fp(fp, gaz, tpl),
            lambda: self._build_edges(triples, linked, nodes),
        )
        self._export_stage(nodes, edges, self._stage_fp(fp, gaz, tpl))

        # classify the run's stage-timing trend (constant/linear/exponential,
        # reference Export/Types.fs:179-208); stages are this engine's
        # "batches", so sample_every=1
        from neo4j_export_tool_spark.plans.perf import BatchPerformanceTracker

        tracker = BatchPerformanceTracker(strategy="stage_ledger", sample_every=1)
        for stage in self.result.stages_run:
            tracker.record_batch(
                self.result.metrics.get(stage, {}).get("seconds", 0.0) * 1000.0
            )
        self.result.performance = tracker.metrics()
        return self.result

    def _export_stage(self, nodes: DataFrame, edges: DataFrame, fp: str) -> None:
        """JSONL export as a ledger stage (reference-format file)."""
        from neo4j_export_tool_spark.sources.jsonl_sink import export_jsonl

        stage = "export"
        out = self.ledger.output_path(stage)
        if self.resume and self.ledger.is_done(stage, fp):
            self.result.stages_skipped.append(stage)
            return
        t0 = time.perf_counter()
        res = export_jsonl(nodes, edges, out, db_name="pages_kg")
        # the sink writes its own file; add a _SUCCESS marker for the ledger
        open(os.path.join(out, "_SUCCESS"), "w").close()
        metrics = {
            "rows": res.node_count + res.rel_count,
            "seconds": round(time.perf_counter() - t0, 3),
            "partition_rows": [res.node_count, res.rel_count],
            "file": res.path,
        }
        self.ledger.mark_done(stage, fp, metrics)
        self.result.stages_run.append(stage)
        self.result.metrics[stage] = metrics

    # -- graph materialization ------------------------------------------------

    def _entity_nodes(self, linked: DataFrame) -> DataFrame:
        """One node per linked canonical entity (label from the gazetteer)."""
        ents = (
            linked.filter(F.col("kb_id").isNotNull())
            .select(
                F.col("linked_name").alias("name"), F.col("label").alias("ent_label")
            )
            .distinct()
        )
        return nodes_from(
            ents,
            labels=F.array(F.col("ent_label")),
            element_id=F.concat(F.lit("entity:"), F.col("ent_label"), F.lit(":"), F.col("name")),
            props={"name": F.col("name")},
        )

    def _build_nodes(self, linked: DataFrame) -> DataFrame:
        return nodes_union(self._entity_nodes(linked))

    def _build_edges(
        self, triples: DataFrame, linked: DataFrame, nodes: DataFrame
    ) -> DataFrame:
        """Triples → entity-to-entity edges with provenance properties.

        Surface forms resolve to canonical entities through the linked
        mentions (a broadcast-sized distinct surface → entity map).
        """
        # no broadcast hint: the surface→entity map is distinct-surface-sized
        # (unbounded on web text) — AQE broadcasts it at runtime only when
        # it is actually small (round-1 verdict item #3)
        surf_map = (
            linked.filter(F.col("kb_id").isNotNull())
            .select(
                F.col("surface"),
                F.col("label").alias("ent_label"),
                F.col("linked_name").alias("entity"),
            )
            .distinct()
        )
        resolved = (
            triples.join(
                surf_map.withColumnsRenamed(
                    {"surface": "subj_surface", "ent_label": "s_label", "entity": "s_entity"}
                ),
                "subj_surface",
            )
            .join(
                surf_map.withColumnsRenamed(
                    {"surface": "obj_surface", "ent_label": "o_label", "entity": "o_entity"}
                ),
                "obj_surface",
            )
        )
        edges = edges_from(
            resolved,
            rel_type=F.upper(F.col("pred")),
            start_element_id=F.concat(
                F.lit("entity:"), F.col("s_label"), F.lit(":"), F.col("s_entity")
            ),
            end_element_id=F.concat(
                F.lit("entity:"), F.col("o_label"), F.lit(":"), F.col("o_entity")
            ),
            props={
                "source_url": F.col("url"),
                "char_start": F.col("char_start"),
            },
        )
        from neo4j_export_tool_spark.sources.jsonl_sink import with_properties_json

        return with_properties_json(
            attach_node_hashes(edges, nodes, broadcast_nodes=True)
        )

"""Flagship DAG runner: parse → enrich → window/score → route → sinks,
with checkpoint manifest, resume, and per-partition lineage + metrics
(north rule: "resumable from checkpoint with per-partition lineage +
metrics").

Every stage materializes a complete parquet table under ``workdir``;
a JSON manifest records (stage, input_fingerprint, rows, wall_s,
status).  Resume = skip stages whose manifest entry is ``done`` with a
matching input fingerprint and whose output still exists — the parquet
snapshot plays the role Iceberg snapshots would on a cluster
(SURVEY.md §4.6).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas, scorer
from ..operators import enrich as enrich_op
from ..operators import fit as fit_op
from ..operators import parse as parse_op
from ..operators import route as route_op
from ..operators import windows as win_op


def _fingerprint(path: str) -> str:
    """Cheap content fingerprint of a parquet dir: relative names + sizes."""
    acc = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(root, f)
            acc.append(f"{os.path.relpath(p, path)}:{os.path.getsize(p)}")
    import hashlib
    return hashlib.md5("|".join(sorted(acc)).encode()).hexdigest()


@dataclass
class Manifest:
    path: str
    entries: dict = field(default_factory=dict)

    @classmethod
    def load(cls, path: str) -> "Manifest":
        m = cls(path=path)
        if os.path.exists(path):
            with open(path) as f:
                m.entries = json.load(f)
        return m

    def save(self):
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.entries, f, indent=1)
        os.replace(tmp, self.path)

    def is_done(self, stage: str, fp: str) -> bool:
        e = self.entries.get(stage)
        return bool(e and e.get("status") == "done" and e.get("input_fp") == fp)

    def mark(self, stage: str, fp: str, rows: int, wall_s: float):
        self.entries[stage] = {"status": "done", "input_fp": fp,
                               "rows": rows, "wall_s": round(wall_s, 3)}
        self.save()


class PipelineRunner:
    STAGES = ["fit", "parse", "enrich", "score", "route"]

    def __init__(self, spark: SparkSession, pages_path: str, workdir: str,
                 run_id: str | None = None, fit_sample: float | None = None):
        self.spark = spark
        self.pages_path = pages_path
        self.workdir = workdir
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.fit_sample = fit_sample
        os.makedirs(workdir, exist_ok=True)
        self.manifest = Manifest.load(os.path.join(workdir, "manifest.json"))
        self.executed: list[str] = []   # stages actually run (not resumed)

    # -- lineage ----------------------------------------------------------
    def _lineage(self, stage: str, out_path: str) -> int:
        """Per-partition lineage rows for the stage's materialized output.
        Returns the stage's TOTAL row count summed from the (tiny)
        per-partition aggregation — the single read of the stage output
        (r2 verdict item 4: stages used to re-scan their output a second
        time just for the manifest row count)."""
        df = self.spark.read.parquet(out_path)
        lin = (df.groupBy(F.spark_partition_id().alias("partition_id"))
               .agg(F.count("*").alias("rows"))
               .toPandas())
        lin["stage"] = stage
        lin["run_id"] = self.run_id
        (self.spark.createDataFrame(
            lin[["stage", "partition_id", "rows", "run_id"]],
            schema="stage string, partition_id int, rows long, run_id string")
         .coalesce(1)
         .write.mode("append").parquet(os.path.join(self.workdir, "lineage")))
        return int(lin["rows"].sum())

    def _stage(self, name: str, fp: str, build, out_name: str | None = None):
        out = os.path.join(self.workdir, out_name or name)
        if self.manifest.is_done(name, fp) and os.path.exists(out):
            return out
        t0 = time.time()
        build(out)
        rows = self._lineage(name, out)
        self.manifest.mark(name, fp, rows, time.time() - t0)
        self.executed.append(name)
        return out

    # -- stages -----------------------------------------------------------
    def run(self) -> dict:
        pages_fp = _fingerprint(self.pages_path)
        pages = self.spark.read.parquet(self.pages_path)

        # fit: frozen catalog snapshot
        def _fit(out):
            cat = fit_op.fit_catalog(pages, sample_fraction=self.fit_sample)
            fit_op.write_catalog(self.spark, cat, out)
        cat_path = self._stage("fit", pages_fp, _fit, "catalog")
        catalog_rows = fit_op.read_catalog(self.spark, cat_path)
        num_classes = len(catalog_rows)

        # parse: map-side only; html pruned by column selection
        def _parse(out):
            parsed = parse_op.parse_pages(pages, catalog_rows)
            parsed.write.mode("overwrite").parquet(out)
        parse_fp = pages_fp + ":" + _fingerprint(cat_path)
        parsed_path = self._stage("parse", parse_fp, _parse, "parsed")

        # enrich: broadcast joins only
        def _enrich(out):
            parsed = self.spark.read.parquet(parsed_path)
            enrich_op.enrich(parsed, catalog_rows) \
                .write.mode("overwrite").parquet(out)
        enr_fp = _fingerprint(parsed_path)
        enriched_path = self._stage("enrich", enr_fp, _enrich, "enriched")

        # windows + frozen scorer (shuffle #1: by host)
        def _score(out):
            parsed = self.spark.read.parquet(parsed_path)
            win_op.window_score_grouped(parse_op.matched(parsed), num_classes,
                                        host_lookup=parsed) \
                .write.mode("overwrite").parquet(out)
        scored_path = self._stage("score", enr_fp, _score, "scored")

        # route: severity + fan-out sinks + per-sink counts (shuffle #2)
        def _route(out):
            scored = self.spark.read.parquet(scored_path)
            routed = route_op.with_severity(scored)
            route_op.write_sinks(routed, out)
            counts = route_op.sink_counts(self.spark.read.parquet(out))
            counts.toPandas().to_json(
                os.path.join(self.workdir, "sink_counts.json"), orient="records")
        routed_path = self._stage("route", _fingerprint(scored_path), _route, "routed")

        with open(os.path.join(self.workdir, "sink_counts.json")) as f:
            counts = json.load(f)
        return {
            "run_id": self.run_id,
            "catalog_path": cat_path, "parsed_path": parsed_path,
            "enriched_path": enriched_path, "scored_path": scored_path,
            "routed_path": routed_path,
            "num_classes": num_classes,
            "sink_counts": counts,
            "executed": list(self.executed),
        }

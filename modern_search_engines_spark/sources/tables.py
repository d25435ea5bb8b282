"""Staged table materialization with crash-safe commits, per-stage
lineage + row/byte metrics, and resume (north rule: "resumable from
per-partition checkpoints with lineage + row-count/byte metrics emitted
per stage").

The reference's persistence pattern is temp-file + atomic rename
(DocumentIndex.py:172-183, Crawler.py:87-102, SURVEY.md S7/S8). The Spark
re-expression: each stage writes parquet into ``<name>.tmp`` and is
atomically renamed to ``<name>`` only after the job succeeds, then a
``_MANIFEST.json`` records row count (captured in the SAME job via the
``Observation`` API — no second pass), byte size, schema, lineage (input
stage fingerprints) and wall time. A re-run skips every stage whose
manifest is complete and whose lineage matches — the anti-join-on-completed-
partitions resume of SURVEY.md §4. On a real cluster the rename commit is
replaced by an Iceberg snapshot commit; the manifest logic is unchanged.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

MANIFEST = "_MANIFEST.json"


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


class StageWriter:
    """Materializes named stages under ``base_dir`` with resume."""

    def __init__(self, spark: SparkSession, base_dir: str,
                 verbose: bool = True):
        self.spark = spark
        self.base_dir = base_dir
        self.verbose = verbose
        os.makedirs(base_dir, exist_ok=True)

    def _paths(self, name: str) -> tuple[str, str, str]:
        final = os.path.join(self.base_dir, name)
        return final, final + ".tmp", os.path.join(final, MANIFEST)

    def manifest(self, name: str) -> dict | None:
        _, _, mpath = self._paths(name)
        if os.path.exists(mpath):
            with open(mpath) as f:
                return json.load(f)
        return None

    def is_complete(self, name: str, lineage: dict | None = None) -> bool:
        m = self.manifest(name)
        if m is None or m.get("status") != "complete":
            return False
        if lineage is not None and m.get("lineage") != lineage:
            return False
        return True

    def lineage_of(self, *names: str) -> dict:
        """Fingerprint of upstream stages for lineage validation."""
        out = {}
        for n in names:
            m = self.manifest(n) or {}
            out[n] = {"rows": m.get("rows"), "commit_id": m.get("commit_id")}
        return out

    def write_stage(self, df: DataFrame, name: str,
                    partition_by: list[str] | None = None,
                    sort_within: list[str] | None = None,
                    inputs: tuple[str, ...] = ()) -> DataFrame:
        """Write (or resume) one stage; returns the stage read back from
        disk so downstream plans scan the materialized table (a real
        shuffle/lineage barrier, like the reference's per-stage pickles)."""
        final, tmp, mpath = self._paths(name)
        lineage = self.lineage_of(*inputs)
        if self.is_complete(name, lineage if inputs else None):
            if self.verbose:
                print(f"[stage {name}] resume: complete, skipping")
            return self.spark.read.parquet(final)

        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(final, ignore_errors=True)

        if partition_by:
            # co-locate each partition value on one task before the
            # partitioned write — otherwise every shuffle partition opens a
            # file in every partition dir (64 tasks x 64 buckets = 4096
            # tiny files; measured 4-8x slowdown on the downstream scan)
            df = df.repartition(*partition_by)
        if sort_within:
            df = df.sortWithinPartitions(*sort_within)
        obs = Observation(f"{name}-{uuid.uuid4().hex[:8]}")
        df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        t0 = time.time()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        elapsed = time.time() - t0
        rows = obs.get["rows"]

        os.rename(tmp, final)  # atomic commit (reference S7 pattern)
        m = {
            "name": name,
            "status": "complete",
            "commit_id": uuid.uuid4().hex,
            "rows": rows,
            "bytes": _dir_bytes(final),
            "seconds": round(elapsed, 3),
            "schema": df.schema.simpleString(),
            "partition_by": partition_by or [],
            "lineage": lineage,
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        with open(mpath, "w") as f:
            json.dump(m, f, indent=1)
        if self.verbose:
            print(f"[stage {name}] {rows} rows, {m['bytes']} bytes, "
                  f"{elapsed:.1f}s")
        return self.spark.read.parquet(final)

    def metrics(self) -> list[dict]:
        """All stage manifests (the lineage/metrics report)."""
        out = []
        for name in sorted(os.listdir(self.base_dir)):
            m = self.manifest(name)
            if m:
                out.append(m)
        return out


def read_queries_tsv(spark: SparkSession, path: str) -> list[tuple[str, str]]:
    """TSV query-file scan ``qid\\tquery`` (batch_retrieve.py:23-27, S9)."""
    df = (spark.read.option("sep", "\t")
          .schema("qid string, query string").csv(path))
    return [(r["qid"], (r["query"] or "").strip()) for r in df.collect()]

"""Checkpointed table IO: snapshot-committed stage outputs with resume.

The north rule asks for Iceberg tables with checkpoint-resumable stage
boundaries. No Iceberg runtime jar ships in this sandbox, so ``TableIO``
implements the same *semantics* behind one seam — swap in Iceberg
(``spark.table`` / ``MERGE INTO``) on a real cluster without touching
callers:

- each stage write is a **snapshot directory** + an atomic manifest update
  (write temp manifest, ``os.replace``) — a stage is either fully committed
  or absent;
- a stage keyed by (name, fingerprint) that is already committed is
  **skipped on re-run** and its snapshot is read back (idempotent resume;
  deterministic ids make output content-stable across runs);
- ``upsert`` = MERGE-by-key emulation: new rows win over existing on key
  collision, everything else is unioned.

Lineage + metrics: every commit appends a lineage row and per-partition row
counts to sidecar tables (``_lineage``, ``_metrics``), per the north rule.
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class TableIO:
    def __init__(self, spark: SparkSession, root: str, defer_metrics: bool = True):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._manifest_path = os.path.join(root, "_manifest.json")
        # deferred mode batches all stages' metrics into ONE Spark job at
        # flush() instead of one job per stage (10 stages = 10 job launches
        # of pure overhead otherwise)
        self.defer_metrics = defer_metrics
        self._pending: list[tuple[str, str, str, float]] = []  # (name, fp, path, sec)
        # stage writes may be submitted from concurrent driver threads
        # (independent stages overlap); manifest read-modify-write is locked
        self._lock = threading.Lock()

    # -- manifest ----------------------------------------------------------
    def _load_manifest(self) -> dict:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return {"tables": {}}

    def _commit_manifest(self, manifest: dict) -> None:
        tmp = self._manifest_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path)

    # -- stage commit / resume --------------------------------------------
    def is_committed(self, name: str, fingerprint: str) -> bool:
        t = self._load_manifest()["tables"].get(name)
        return bool(t) and t.get("fingerprint") == fingerprint

    def write_stage(
        self,
        df: DataFrame,
        name: str,
        fingerprint: str,
        partition_by: list[str] | None = None,
        sort_by: list[str] | None = None,
    ) -> DataFrame:
        """Commit ``df`` as the snapshot for stage ``name`` unless an
        identical (name, fingerprint) snapshot exists; return the committed
        table (always read back from storage — later stages see exactly what
        was committed).

        ``partition_by``: hive-style directory partitioning — use for LOW-
        cardinality, small-output tables (dynamic-partition writes sort every
        task and fan out files; measured 3× write cost on a 7M-row table).
        ``sort_by``: cluster rows by the column(s) within each task instead —
        parquet row-group min/max stats then give filter skipping without the
        partitioned-write cost (the Iceberg write-sort-order analog).
        """
        if self.is_committed(name, fingerprint):
            return self.read(name)

        snap = os.path.join(self.root, name, f"snap-{uuid.uuid4().hex[:12]}")
        if sort_by:
            df = df.sortWithinPartitions(*sort_by)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        t0 = time.time()
        writer.parquet(snap)

        committed = self.spark.read.parquet(snap)
        if self.defer_metrics:
            with self._lock:
                self._pending.append((name, fingerprint, snap, time.time() - t0))
        else:
            self._append_metrics(name, fingerprint, committed, time.time() - t0)

        with self._lock:
            manifest = self._load_manifest()
            manifest["tables"][name] = {
                "path": snap,
                "fingerprint": fingerprint,
                "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
            self._commit_manifest(manifest)
        return committed

    def commit_union(self, name: str, members: list[str], fingerprint: str) -> DataFrame:
        """Commit ``name`` as the UNION of already-committed tables without
        rewriting a byte — the Iceberg-append analog (a snapshot is a list of
        member paths in the manifest). At 10¹²-doc scale rewriting the edge
        table to append cross-edges would be the single largest IO cost in
        the pipeline; this makes it a metadata operation."""
        if self.is_committed(name, fingerprint):
            return self.read(name)
        manifest = self._load_manifest()
        paths = []
        for m in members:
            t = manifest["tables"][m]
            paths.extend(t["paths"] if "paths" in t else [t["path"]])
        manifest["tables"][name] = {
            "paths": paths,
            "fingerprint": fingerprint,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        # members' metrics were already recorded at their own commits
        self._commit_manifest(manifest)
        return self.read(name)

    def read(self, name: str) -> DataFrame:
        t = self._load_manifest()["tables"].get(name)
        if not t:
            raise FileNotFoundError(f"table {name!r} not committed under {self.root}")
        if "paths" in t:
            df = self.spark.read.parquet(t["paths"][0])
            for p in t["paths"][1:]:
                df = df.unionByName(self.spark.read.parquet(p), allowMissingColumns=True)
            return df
        return self.spark.read.parquet(t["path"])

    def upsert(self, df: DataFrame, name: str, key: list[str], fingerprint: str) -> DataFrame:
        """MERGE-emulation: new rows replace existing rows with the same key."""
        manifest = self._load_manifest()
        if name in manifest["tables"]:
            existing = self.read(name)
            merged = df.unionByName(existing.join(df.select(key), key, "left_anti"))
        else:
            merged = df
        return self.write_stage(merged, name, fingerprint)

    def append_rows(
        self, df: DataFrame, name: str, key: list[str], fingerprint: str
    ) -> DataFrame:
        """First-wins incremental MERGE, append-only: write ONLY the delta
        (rows of ``df`` whose key is not yet in the table — existing rows
        win, the reference's first-insertion semantics) as a new snapshot
        and add it to the table's member-path list. Per batch, IO is
        O(delta), never O(table) — the Iceberg MERGE-on-read append analog.
        A batch fingerprint already committed is skipped (idempotent
        re-runs). Returns the full table after the append."""
        if self.is_committed(f"{name}@{fingerprint}", fingerprint):
            return self.read(name)
        with self._lock:
            manifest = self._load_manifest()
            t = manifest["tables"].get(name)
            prior_paths = (t.get("paths") or [t["path"]]) if t else []
        delta = df.dropDuplicates(key)
        if prior_paths:
            existing = self.spark.read.parquet(prior_paths[0])
            for p in prior_paths[1:]:
                existing = existing.unionByName(self.spark.read.parquet(p))
            delta = delta.join(existing.select(*key), key, "left_anti")

        snap = os.path.join(self.root, name, f"snap-{uuid.uuid4().hex[:12]}")
        t0 = time.time()
        delta.write.mode("overwrite").parquet(snap)
        with self._lock:
            manifest = self._load_manifest()
            manifest["tables"][name] = {
                "paths": prior_paths + [snap],
                "fingerprint": fingerprint,
                "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
            # marker entry records that this batch's delta is committed
            manifest["tables"][f"{name}@{fingerprint}"] = {
                "path": snap,
                "fingerprint": fingerprint,
                "committed_at": manifest["tables"][name]["committed_at"],
            }
            self._commit_manifest(manifest)
            self._pending.append((name, fingerprint, snap, time.time() - t0))
        return self.read(name)

    def compact(self, name: str, fingerprint: str) -> DataFrame:
        """Rewrite a multi-snapshot (delta-appended) table into ONE snapshot
        — the Iceberg rewrite_data_files maintenance analog. Run when the
        member-path list grows enough that per-read union planning and
        small-file overhead matter (e.g. every N ingest batches); contents
        are unchanged (content equality is test-pinned)."""
        t = self._load_manifest()["tables"].get(name)
        if not t:
            raise FileNotFoundError(f"table {name!r} not committed under {self.root}")
        if "paths" not in t or len(t["paths"]) <= 1:
            return self.read(name)
        df = self.read(name)
        snap = os.path.join(self.root, name, f"snap-{uuid.uuid4().hex[:12]}")
        df.write.mode("overwrite").parquet(snap)
        with self._lock:
            manifest = self._load_manifest()
            manifest["tables"][name] = {
                "paths": [snap],
                "fingerprint": fingerprint,
                "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
            self._commit_manifest(manifest)
        return self.read(name)

    # -- lineage + metrics ---------------------------------------------------
    def flush_metrics(self) -> None:
        """Emit all deferred per-partition metrics in ONE job + one lineage
        append. No-op when nothing is pending."""
        if not self._pending:
            return
        per_stage = None
        for name, fp, snap, _ in self._pending:
            df = (
                self.spark.read.parquet(snap)
                .groupBy(F.spark_partition_id().alias("partition_id"))
                .agg(F.count(F.lit(1)).alias("rows"))
                .withColumn("stage", F.lit(name))
                .withColumn("fingerprint", F.lit(fp))
            )
            per_stage = df if per_stage is None else per_stage.unionByName(df)
        per_stage.write.mode("append").parquet(os.path.join(self.root, "_metrics"))

        lineage = self.spark.createDataFrame(
            [(n, fp, float(sec)) for n, fp, _, sec in self._pending],
            "stage string, fingerprint string, elapsed_sec double",
        ).withColumn("committed_at", F.current_timestamp())
        lineage.write.mode("append").parquet(os.path.join(self.root, "_lineage"))
        self._pending = []

    def _append_metrics(
        self, name: str, fingerprint: str, committed: DataFrame, elapsed: float
    ) -> None:
        per_part = (
            committed.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .withColumn("stage", F.lit(name))
            .withColumn("fingerprint", F.lit(fingerprint))
        )
        mpath = os.path.join(self.root, "_metrics")
        per_part.write.mode("append").parquet(mpath)

        lineage = self.spark.createDataFrame(
            [(name, fingerprint, float(elapsed))],
            "stage string, fingerprint string, elapsed_sec double",
        ).withColumn("committed_at", F.current_timestamp())
        lineage.write.mode("append").parquet(os.path.join(self.root, "_lineage"))

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, "_metrics"))

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, "_lineage"))

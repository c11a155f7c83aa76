"""Stage checkpointing with per-partition lineage and a metrics table.

North-rule contract: "resumable from checkpoint with per-partition lineage +
metrics". Each pipeline stage writes its output as a parquet table plus a
``_manifest.json`` sidecar recording

- the stage name, its declared input stages, and a config fingerprint,
- per-partition lineage: for every output file-partition the row count and
  an order-insensitive xor content hash (so a resumed run can prove the
  checkpoint it read equals what the stage originally produced),
- wall-clock seconds and total rows.

A stage is resumed (skipped) when its ``_SUCCESS`` marker and manifest exist
AND the manifest's config fingerprint matches the current run — a config
change invalidates downstream checkpoints automatically. Every run appends a
row to the ``_metrics`` parquet table (stage, rows, partitions, seconds,
resumed, fingerprint), the queryable run history the north rule asks for.

The layout is deliberately plain parquet + JSON: on a real cluster the same
class pointed at an Iceberg/S3 path keeps working (parquet-on-object-store);
nothing here depends on a local filesystem beyond what Spark's writers
already require.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def _fingerprint(obj) -> str:
    return hashlib.sha256(repr(obj).encode()).hexdigest()[:16]


def partition_lineage(df: DataFrame) -> list[dict]:
    """Per-partition (rows, xor-hash) of a materialized table — one job.

    The hash xors a 64-bit hash of every row's canonical string, so it is
    insensitive to row order within the partition but pins the exact
    multiset of rows... xor of per-row hashes is multiplicity-blind for even
    counts, so the row count rides alongside it; together they pin count +
    set, which is exact for the distinct-row outputs all stages produce.
    """
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in df.columns]
    rows = (
        df.select(
            F.spark_partition_id().alias("pid"),
            F.xxhash64(F.concat_ws("\x1f", *cols)).alias("h"),
        )
        .groupBy("pid")
        .agg(F.count("*").alias("rows"), F.expr("bit_xor(h)").alias("xor_hash"))
        .collect()
    )
    return [
        {"partition": int(r["pid"]), "rows": int(r["rows"]), "xor_hash": int(r["xor_hash"])}
        for r in sorted(rows, key=lambda r: r["pid"])
    ]


class StageCheckpointer:
    """Run-or-resume executor for named pipeline stages (see module doc)."""

    def __init__(self, spark: SparkSession, root: str | None,
                 config_fingerprint: str | dict | None = None):
        self.spark = spark
        self.root = root
        self.fingerprint = (
            config_fingerprint if isinstance(config_fingerprint, str)
            else _fingerprint(config_fingerprint)
        )
        self.runs: list[dict] = []

    # -- paths ---------------------------------------------------------------
    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}_manifest.json")

    # -- core ----------------------------------------------------------------
    def run(self, name: str, fn: Callable[[], DataFrame],
            inputs: tuple[str, ...] = ()) -> DataFrame:
        """Execute stage ``name`` or read its valid checkpoint back."""
        if self.root is None:
            return fn()
        path = self._path(name)
        manifest = self._read_manifest(name)
        if (
            manifest is not None
            and manifest.get("fingerprint") == self.fingerprint
            and os.path.exists(os.path.join(path, "_SUCCESS"))
        ):
            log.info("stage %s: resuming from checkpoint %s", name, path)
            df = self.spark.read.parquet(path)
            self._record(name, manifest["rows"], len(manifest["partitions"]),
                         0.0, resumed=True)
            return df
        t0 = time.time()
        fn().write.mode("overwrite").parquet(path)
        df = self.spark.read.parquet(path)
        lineage = partition_lineage(df)
        seconds = round(time.time() - t0, 3)
        man = {
            "stage": name,
            "inputs": list(inputs),
            "fingerprint": self.fingerprint,
            "rows": sum(p["rows"] for p in lineage),
            "partitions": lineage,
            "seconds": seconds,
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        with open(self._manifest_path(name), "w") as f:
            json.dump(man, f, indent=1)
        self._record(name, man["rows"], len(lineage), seconds, resumed=False)
        return df

    def verify(self, name: str) -> bool:
        """Re-hash a checkpoint and compare against its recorded lineage."""
        manifest = self._read_manifest(name)
        if manifest is None:
            return False
        df = self.spark.read.parquet(self._path(name))
        # partition ids can differ on re-read; compare the multiset of
        # (rows, xor_hash) pairs, which is partition-order independent
        now = sorted((p["rows"], p["xor_hash"]) for p in partition_lineage(df))
        then = sorted((p["rows"], p["xor_hash"]) for p in manifest["partitions"])
        return now == then

    def invalidate(self, name: str) -> None:
        import shutil

        p = self._path(name)
        if os.path.exists(p):
            shutil.rmtree(p)
        m = self._manifest_path(name)
        if os.path.exists(m):
            os.remove(m)

    # -- metrics ---------------------------------------------------------------
    def _record(self, stage: str, rows: int, partitions: int, seconds: float,
                resumed: bool) -> None:
        row = {"stage": stage, "rows": rows, "partitions": partitions,
               "seconds": seconds, "resumed": resumed,
               "fingerprint": self.fingerprint}
        self.runs.append(row)
        self.spark.createDataFrame(
            [(stage, rows, partitions, float(seconds), resumed, self.fingerprint)],
            "stage string, rows long, partitions int, seconds double, "
            "resumed boolean, fingerprint string",
        ).write.mode("append").parquet(os.path.join(self.root, "_metrics"))

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, "_metrics"))

    def _read_manifest(self, name: str) -> dict | None:
        p = self._manifest_path(name)
        if not os.path.exists(p):
            return None
        try:
            with open(p) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return None

"""Stage checkpointing with per-partition lineage and a metrics table.

North-rule contract: "resumable from checkpoint with per-partition lineage +
metrics". Each pipeline stage writes its output as a parquet table plus a
``_manifest.json`` sidecar recording

- the stage name, its declared input stages, and a config fingerprint,
- per-partition lineage: for every output file-partition the row count plus
  an order-insensitive (xor, sum) pair over per-row 64-bit content hashes —
  xor alone is multiplicity-blind for even repeat counts, the modular sum
  alone can be forged by compensating rows; together with the count they pin
  the exact multiset of rows for any partition content, duplicates included,
- wall-clock seconds and total rows.

A stage is resumed (skipped) when its ``_SUCCESS`` marker and manifest exist
AND the manifest's config fingerprint matches the current run — a config
change invalidates downstream checkpoints automatically. Every run appends a
row to the ``_metrics`` parquet table (stage, rows, partitions, seconds,
resumed, fingerprint), the queryable run history the north rule asks for.

All sidecar/marker IO goes through the Hadoop FileSystem API resolved from
the path's scheme (``spark._jvm``), so a checkpoint root on ``s3a://``,
``hdfs://`` or any other Hadoop-supported store behaves exactly like a local
path: resume detection, manifest read/write and invalidate() all work there.
"""

from __future__ import annotations

import hashlib
import json
import logging
import posixpath
import time
from collections.abc import Callable

from py4j.protocol import Py4JJavaError

from ..operators.cache import release_cached

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

_SUM_MOD = 1 << 64  # lineage sum-hash modulus


def _fingerprint(obj) -> str:
    return hashlib.sha256(repr(obj).encode()).hexdigest()[:16]


# -- Hadoop FileSystem helpers (scheme-aware: file://, hdfs://, s3a://, ...) --

def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def _fs_exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs(spark, path)
    return bool(fs.exists(p))


def _fs_read_text(spark: SparkSession, path: str) -> str:
    fs, p = _fs(spark, path)
    stream = fs.open(p)
    try:
        data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return bytes(data).decode("utf-8")


def _fs_write_text(spark: SparkSession, path: str, text: str) -> None:
    fs, p = _fs(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _fs_delete(spark: SparkSession, path: str) -> None:
    fs, p = _fs(spark, path)
    if fs.exists(p):
        fs.delete(p, True)


def partition_lineage(df: DataFrame) -> list[dict]:
    """Per-partition (rows, xor_hash, sum_hash) of a materialized table.

    One job: every row is hashed (xxhash64 over its canonical string), then
    per partition we take the row count, the bit-xor and the mod-2^64 sum of
    the hashes. Each aggregate is order-insensitive; jointly they are
    multiset-exact in practice (xor pins the odd-multiplicity set, sum pins
    weighted content, count pins cardinality) — duplicate-bearing outputs are
    covered, unlike xor alone. The sum rides a decimal accumulator because
    ANSI mode (Spark 4 default) would overflow a BIGINT sum of 64-bit hashes.
    """
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in df.columns]
    rows = (
        df.select(
            F.spark_partition_id().alias("pid"),
            F.xxhash64(F.concat_ws("\x1f", *cols)).alias("h"),
        )
        .groupBy("pid")
        .agg(
            F.count("*").alias("rows"),
            F.expr("bit_xor(h)").alias("xor_hash"),
            F.sum(F.col("h").cast("decimal(38,0)")).alias("sum_hash"),
        )
        .collect()
    )
    return [
        {
            "partition": int(r["pid"]),
            "rows": int(r["rows"]),
            "xor_hash": int(r["xor_hash"]),
            "sum_hash": int(r["sum_hash"]) % _SUM_MOD,
        }
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
        return posixpath.join(self.root, name)

    def _manifest_path(self, name: str) -> str:
        return posixpath.join(self.root, f"{name}_manifest.json")

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
            and _fs_exists(self.spark, posixpath.join(path, "_SUCCESS"))
        ):
            log.info("stage %s: resuming from checkpoint %s", name, path)
            df = self.spark.read.parquet(path)
            self._record(name, manifest["rows"], len(manifest["partitions"]),
                         0.0, resumed=True)
            return df
        t0 = time.time()
        fn().write.mode("overwrite").parquet(path)
        release_cached()  # stage output is on disk; drop operator caches
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
        _fs_write_text(self.spark, self._manifest_path(name), json.dumps(man, indent=1))
        self._record(name, man["rows"], len(lineage), seconds, resumed=False)
        return df

    def verify(self, name: str) -> bool:
        """Re-hash a checkpoint and compare against its recorded lineage."""
        manifest = self._read_manifest(name)
        if manifest is None:
            return False
        df = self.spark.read.parquet(self._path(name))
        # partition ids can differ on re-read; compare the multiset of
        # (rows, xor_hash, sum_hash) triples, which is partition-order
        # independent (older manifests without sum_hash compare on the rest)
        def key(p):
            return (p["rows"], p["xor_hash"], p.get("sum_hash", 0))

        then = sorted(key(p) for p in manifest["partitions"])
        has_sum = all("sum_hash" in p for p in manifest["partitions"])
        now = [
            (p["rows"], p["xor_hash"], p["sum_hash"] if has_sum else 0)
            for p in partition_lineage(df)
        ]
        return sorted(now) == then

    def invalidate(self, name: str) -> None:
        _fs_delete(self.spark, self._path(name))
        _fs_delete(self.spark, self._manifest_path(name))

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
        ).write.mode("append").parquet(posixpath.join(self.root, "_metrics"))

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(posixpath.join(self.root, "_metrics"))

    def _read_manifest(self, name: str) -> dict | None:
        p = self._manifest_path(name)
        try:
            if not _fs_exists(self.spark, p):
                return None
            raw = _fs_read_text(self.spark, p)
        except Py4JJavaError as e:  # FS-level IO failure (auth, missing class)
            log.warning("checkpoint manifest %s unreadable, stage will rerun: %s",
                        p, e)
            return None
        try:
            return json.loads(raw)
        except (json.JSONDecodeError, UnicodeDecodeError) as e:  # corrupt
            log.warning("checkpoint manifest %s corrupt, stage will rerun: %s",
                        p, e)
            return None

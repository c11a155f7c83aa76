"""Table catalog shim: Iceberg when available, parquet paths otherwise.

The north-star deployment reads Common-Crawl-style page tables from Iceberg
(snapshot isolation gives the resumability story real transactional
checkpoints). This sandbox has no Iceberg runtime jar, so the shim keeps the
call sites deployment-ready without depending on it:

- ``load_table(spark, ref)``: ``"iceberg:<catalog.db.table>"`` loads through
  the Iceberg catalog (``spark.read.format("iceberg")`` — requires the
  runtime jar + catalog conf on the cluster); any other ref is a parquet
  path/glob. A bare table name resolves against ``$EBSJ_DATA_DIR``.
- ``write_table(df, ref, mode)``: symmetric writer; Iceberg refs use
  ``writeTo`` (append/createOrReplace), parquet refs use the path writer.
- ``snapshot_id(spark, ref)``: Iceberg snapshot id for lineage manifests
  (None on parquet — the per-partition xor lineage in plans.checkpoint
  covers reproducibility there).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

ICEBERG_PREFIX = "iceberg:"


def _is_iceberg(ref: str) -> bool:
    return ref.startswith(ICEBERG_PREFIX)


def load_table(spark: SparkSession, ref: str) -> DataFrame:
    """Load a table by reference (see module doc)."""
    if _is_iceberg(ref):
        return spark.read.format("iceberg").load(ref[len(ICEBERG_PREFIX):])
    if "/" not in ref and not ref.endswith(".parquet"):
        base = os.environ.get("EBSJ_DATA_DIR", ".")
        ref = os.path.join(base, f"{ref}.parquet")
    return spark.read.parquet(ref)


def write_table(df: DataFrame, ref: str, mode: str = "append") -> None:
    """Write a table by reference; mode in {append, overwrite}."""
    if _is_iceberg(ref):
        name = ref[len(ICEBERG_PREFIX):]
        writer = df.writeTo(name)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    df.write.mode(mode if mode != "append" else "append").parquet(ref)


def snapshot_id(spark: SparkSession, ref: str) -> int | None:
    """Current Iceberg snapshot id (lineage pin); None for parquet refs."""
    if not _is_iceberg(ref):
        return None
    name = ref[len(ICEBERG_PREFIX):]
    row = (
        spark.sql(f"SELECT snapshot_id FROM {name}.snapshots "
                  "ORDER BY committed_at DESC LIMIT 1").first()
    )
    return None if row is None else int(row["snapshot_id"])

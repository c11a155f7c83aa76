"""Catalog shim: parquet path resolution + round trip (Iceberg path is
cluster-only; the ref syntax is covered by unit dispatch checks)."""

import os

from entityblockingbysimilarityjoins_spark.sources.catalog import (
    ICEBERG_PREFIX,
    _is_iceberg,
    load_table,
    snapshot_id,
    write_table,
)


def test_parquet_roundtrip(spark, tmp_path):
    df = spark.range(50).withColumnRenamed("id", "x")
    ref = str(tmp_path / "t.parquet")
    write_table(df, ref, mode="overwrite")
    back = load_table(spark, ref)
    assert back.count() == 50
    assert snapshot_id(spark, ref) is None


def test_bare_name_resolves_against_data_dir(spark, tmp_path, monkeypatch):
    df = spark.range(7)
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    monkeypatch.setenv("EBSJ_DATA_DIR", str(tmp_path))
    assert load_table(spark, "events").count() == 7


def test_iceberg_ref_dispatch():
    assert _is_iceberg(f"{ICEBERG_PREFIX}cat.db.pages")
    assert not _is_iceberg("/data/pages.parquet")
    assert not _is_iceberg("pages")

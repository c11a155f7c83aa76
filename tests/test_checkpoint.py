"""Resumability: stage checkpoints, per-partition lineage, metrics table."""

import json
import os

from pyspark.sql import functions as F

from entityblockingbysimilarityjoins_spark.plans.checkpoint import (
    StageCheckpointer,
    partition_lineage,
)
from entityblockingbysimilarityjoins_spark.plans.pipeline import (
    PipelineConfig,
    run_pipeline,
)
from entityblockingbysimilarityjoins_spark.sources.pages import (
    generate_gold,
    generate_pages,
)


def _df(spark, n=100):
    return spark.range(n).withColumn("v", F.col("id") * 2)


def test_run_writes_manifest_and_metrics(spark, tmp_path):
    root = str(tmp_path / "ck")
    os.makedirs(root)
    ck = StageCheckpointer(spark, root, config_fingerprint={"x": 1})
    out = ck.run("stage_a", lambda: _df(spark), inputs=())
    assert out.count() == 100
    man = json.load(open(os.path.join(root, "stage_a_manifest.json")))
    assert man["rows"] == 100
    assert sum(p["rows"] for p in man["partitions"]) == 100
    assert all("xor_hash" in p for p in man["partitions"])
    m = ck.metrics().collect()
    assert len(m) == 1 and not m[0]["resumed"]


def test_resume_skips_and_verifies(spark, tmp_path):
    root = str(tmp_path / "ck")
    os.makedirs(root)
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return _df(spark)

    ck = StageCheckpointer(spark, root, config_fingerprint="f1")
    a1 = ck.run("s", build).collect()
    ck2 = StageCheckpointer(spark, root, config_fingerprint="f1")
    a2 = ck2.run("s", build).collect()
    assert calls["n"] == 1  # second run resumed
    assert sorted(map(tuple, a1)) == sorted(map(tuple, a2))
    assert ck2.verify("s")
    rows = ck2.metrics().orderBy("resumed").collect()
    assert [r["resumed"] for r in rows] == [False, True]


def test_config_change_invalidates(spark, tmp_path):
    root = str(tmp_path / "ck")
    os.makedirs(root)
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return _df(spark)

    StageCheckpointer(spark, root, config_fingerprint="f1").run("s", build)
    StageCheckpointer(spark, root, config_fingerprint="f2").run("s", build)
    assert calls["n"] == 2  # fingerprint mismatch -> recompute


def test_lineage_detects_corruption(spark, tmp_path):
    root = str(tmp_path / "ck")
    os.makedirs(root)
    ck = StageCheckpointer(spark, root, config_fingerprint="f")
    ck.run("s", lambda: _df(spark))
    # corrupt: overwrite the parquet with different data, keep the manifest
    _df(spark, 90).write.mode("overwrite").parquet(os.path.join(root, "s"))
    assert not ck.verify("s")


def test_pipeline_kill_resume_identical(spark, tmp_path):
    """Kill/resume contract: a rerun over an existing checkpoint dir
    reproduces identical clusters without recomputing completed stages."""
    root = str(tmp_path / "pipe")
    pages = generate_pages(spark, 120, seed=1).persist()
    gold = generate_gold(spark, 120, seed=1)
    cfg = PipelineConfig(checkpoint_dir=root, n_random_negatives=200)
    r1 = run_pipeline(spark, pages, gold, cfg)
    c1 = sorted(map(tuple, r1["clusters"].collect()))
    # simulate a crash after blocking: later stages' outputs vanish
    import shutil

    for stage in ("match_res", "clusters"):
        p = os.path.join(root, stage)
        if os.path.exists(p):
            shutil.rmtree(p)
        mp = os.path.join(root, f"{stage}_manifest.json")
        if os.path.exists(mp):
            os.remove(mp)
    r2 = run_pipeline(spark, pages, gold, cfg)
    c2 = sorted(map(tuple, r2["clusters"].collect()))
    assert c1 == c2
    # metrics table: sample_res and blk_res were resumed at least once
    ck = StageCheckpointer(spark, root, config_fingerprint=repr(cfg))
    resumed = {r["stage"] for r in ck.metrics().filter(F.col("resumed")).collect()}
    assert {"sample_res", "blk_res"} <= resumed


def test_partition_lineage_shape(spark):
    lin = partition_lineage(_df(spark).repartition(4))
    assert sum(p["rows"] for p in lin) == 100
    assert len({p["partition"] for p in lin}) == len(lin)

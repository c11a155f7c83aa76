"""Pin the minhash stage's scaling bottleneck (BENCH/BASELINE.md evidence).

Splits minhash_lsh_pairs into its three physical phases and times each at the
given parallelism on the same deterministic corpus:

  1. group:   tokenize + groupBy(token set) + persist      (shuffle-bound)
  2. sigs:    xxhash64 transform + numpy minhash signatures (Arrow/numpy)
  3. join:    banded bucket join + length filter + exact verify + expansion

Usage: SPARK_GRAFT_CPUS=4 python scripts/minhash_stage_probe.py [n_entities]
Prints one JSON line; run at 4 and 16 to get per-phase scaling efficiency.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from entityblockingbysimilarityjoins_spark.functions.tokenize import tokens_wspace
from entityblockingbysimilarityjoins_spark.operators.dedup import (
    minhash_lsh_pairs,
    minhash_signature,
)
from entityblockingbysimilarityjoins_spark.session import get_spark
from entityblockingbysimilarityjoins_spark.sources.pages import generate_pages


def main() -> None:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    num_perm, bands = 128, 16
    spark = get_spark(app_name=f"mh-probe-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus,
                      extra_conf={
                          "spark.driver.extraJavaOptions":
                              f"-XX:+UseParallelGC -XX:ParallelGCThreads={max(cpus, 2)} "
                              "-Djava.net.preferIPv6Addresses=false",
                      })
    spark.sparkContext.setLogLevel("ERROR")
    pages = generate_pages(spark, n_entities, seed=42).persist()
    pages.count()
    toks = pages.select("url", tokens_wspace(F.col("text")).alias("tokens"))

    t0 = time.time()
    base = (
        toks.filter(F.size("tokens") > 0)
        .groupBy("tokens")
        .agg(F.collect_list("url").alias("members"), F.min("url").alias("gid"))
        .persist()
    )
    n_groups = base.count()
    t_group = round(time.time() - t0, 2)

    t0 = time.time()
    sig = base.withColumn("__h", F.transform("tokens", lambda t: F.xxhash64(t))) \
              .withColumn("__sig", minhash_signature(F.col("__h"), num_perm, 1)) \
              .select("gid", F.size("tokens").alias("len"), "__sig").persist()
    sig.count()
    t_sigs = round(time.time() - t0, 2)

    t0 = time.time()
    r = num_perm // bands
    bands_df = sig.select(
        "gid", "len",
        F.posexplode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda i: F.xxhash64(F.slice("__sig", i * r + 1, r).cast("string")),
        )).alias("band", "bh"),
    )
    par = spark.sparkContext.defaultParallelism
    l = bands_df.withColumnsRenamed({"gid": "gid1", "len": "len1"}).repartition(2 * par)
    rr = bands_df.withColumnsRenamed({"gid": "gid2", "len": "len2"})
    cand = (
        l.join(rr, ["band", "bh"]).filter(F.col("gid1") < F.col("gid2"))
        .filter(F.least("len1", "len2")
                >= F.ceil(F.lit(0.9) * F.greatest("len1", "len2") - F.lit(1e-9)))
        .select("gid1", "gid2").dropDuplicates(["gid1", "gid2"])
    )
    n_cand = cand.count()
    t_join = round(time.time() - t0, 2)

    t0 = time.time()
    n_pairs = minhash_lsh_pairs(toks, "url", "tokens", threshold=0.9,
                                num_perm=num_perm, bands=bands).count()
    t_full = round(time.time() - t0, 2)

    print(json.dumps({
        "cpus": cpus, "n_entities": n_entities, "n_groups": n_groups,
        "n_band_candidates": n_cand, "n_pairs": n_pairs,
        "t_group": t_group, "t_sigs": t_sigs, "t_join": t_join,
        "t_full": t_full,
    }))
    spark.stop()


if __name__ == "__main__":
    main()

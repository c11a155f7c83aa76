"""Adversarial probe for the LSH band-bucket overflow valve (VERDICT r3 #2).

Corpus: n docs sharing one large template plus one private token each — the
worst case for banded MinHash (every band bucket of the template-dominated
signature holds ~all n rows, so the banded join emits ~bands * n^2 candidate
rows before verification). The valve (``max_band_bucket``) drops oversized
buckets entirely, bounding the join input at the cost of the pairs that only
collide there (logged recall caveat).

Usage: python scripts/band_valve_probe.py [n_docs] [cap]
Prints one JSON line: bucket-size stats, candidate/pair counts and wall time
with the valve off vs on.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from entityblockingbysimilarityjoins_spark.functions.tokenize import tokens_wspace
from entityblockingbysimilarityjoins_spark.operators.cache import release_cached
from entityblockingbysimilarityjoins_spark.operators.dedup import minhash_lsh_pairs
from entityblockingbysimilarityjoins_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark(app_name="band-valve-probe", master="local[8]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    base = " ".join(f"tmpl{i}" for i in range(60))
    df = spark.createDataFrame(
        [(i, f"{base} uniq{i}") for i in range(n)], ["rid", "s"]
    ).withColumn("tokens", tokens_wspace("s")).persist()
    df.count()

    out: dict = {"n_docs": n, "cap": cap}
    for label, kw in (("valve_off", {}), ("valve_on", {"max_band_bucket": cap})):
        t0 = time.time()
        pairs = minhash_lsh_pairs(df, "rid", "tokens", threshold=0.9, **kw).count()
        release_cached()
        out[label] = {"pairs": pairs, "sec": round(time.time() - t0, 2)}
    # bucket-size distribution for the record (reuses the operator's banding
    # parameters: 256 perms / 32 bands over xxhash64 token hashes)
    r = 256 // 32
    sizes = (
        df.groupBy("tokens").agg(F.min("rid").alias("gid"))
        .withColumn("__h", F.transform("tokens", lambda t: F.xxhash64(t)))
        .withColumn("__sig", __import__(
            "entityblockingbysimilarityjoins_spark.operators.dedup",
            fromlist=["minhash_signature"]).minhash_signature(F.col("__h"), 256, 1))
        .select(F.posexplode(F.transform(
            F.sequence(F.lit(0), F.lit(31)),
            lambda i: F.xxhash64(F.slice("__sig", i * r + 1, r).cast("string")),
        )).alias("band", "bh"))
        .groupBy("band", "bh").count()
        .agg(F.max("count").alias("max"), F.expr("percentile(count, 0.99)").alias("p99"),
             F.count("*").alias("n_buckets")).first()
    )
    out["bucket_sizes"] = {"max": sizes["max"], "p99": float(sizes["p99"]),
                           "n_buckets": sizes["n_buckets"]}
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

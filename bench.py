"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": dir, "pairs_per_sec": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E
from entityblockingbysimilarityjoins_spark.operators.cache import release_cached
from entityblockingbysimilarityjoins_spark.session import get_spark

#: benchmarked subset (the expensive, representative operators)
BENCH_QUERIES = [
    "set_join_jaccard",
    "set_join_cosine",
    "overlap_join",
    "edit_distance_join",
    "absolute_norm_join",
    "block_union",
    "topk_ta",
    "connected_components",
    "minhash_dedup",
    "simhash_dedup",
    "ngram_dedup",
    "embedding_neardup",
    "ann_topk",
    "text_stats",
    # round-2 additions
    "weighted_jaccard_join",
    "set_join_rs",
    "ann_lsh_topk",
    "down_sample",
    # round-3 additions: the matcher stack end-to-end + bulk string scoring
    "feature_matrix",
    "rf_predict",
    "rule_topk",
    "value_grouping",
    "string_sim_bulk",
    "embedding_neardup_lsh",
    # round-4: the composed block->features->predict->cluster chain
    "pipeline_match_res",
    "knn_filter",
    # round-4: scoring-scale regime (10^6 pairs at sf0.1) for the numpy
    # JW/ME batch path and the native 17-column feature matrix
    "string_sim_bulk_1m",
    "feature_matrix_1m",
    # round-4: IC-aware feature matrix + the V7 rematch second round
    "ic_features",
    "rematch_res",
    # round-5: rolling-hash winnowing fingerprint (codegen-native HOFs)
    "winnow_fingerprint",
    # round-5: IVF-Flat ANN scale path (broadcast centroids, cell buckets)
    "ann_ivf_topk",
]

#: queries whose rows == scored pairs; bench reports pairs/sec for these
SCORING_QUERIES = ("string_sim_bulk_1m", "feature_matrix_1m")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="ebsj-bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")

    qs = E.queries()
    # untimed warmup: session/codegen/parquet-footer costs otherwise land on
    # whichever query happens to run first
    for t in ("documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    # reps protocol (round-5): run each query REPS times and report the best
    # rep as the headline number, with every raw rep in the JSON. Round-over-
    # round deltas should only be believed when they reproduce across reps —
    # r4's set_join_cosine "+65%" was pure run-order noise that needed manual
    # re-timing to adjudicate. Cache teardown happens OUTSIDE the timed
    # window so cache-heavy queries aren't penalized asymmetrically.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    timings: dict[str, float] = {}
    raw_reps: dict[str, list[float]] = {}
    scoring_rates: dict[str, float] = {}
    candidate_pairs = 0
    t_all = time.time()
    for name in BENCH_QUERIES:
        raws = []
        for _ in range(reps):
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            raws.append(round(time.time() - t0, 3))
            release_cached()  # untimed: drop operator-internal persisted intermediates
        raw_reps[name] = raws
        timings[name] = min(raws)
        if name == "set_join_jaccard":
            candidate_pairs = n
        if name in SCORING_QUERIES and timings[name] > 0:
            scoring_rates[name] = round(n / timings[name], 1)
    total = round(sum(timings.values()), 3)
    wall = round(time.time() - t_all, 3)

    out = {
        "metric": "headline_query_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "reps": reps,
        "raw_reps": raw_reps,
        "wall_sec": wall,
        "sf": sf_dir,
        "cpus": cpus,
        "blocking_pairs_per_sec": round(candidate_pairs / timings["set_join_jaccard"], 1)
        if timings.get("set_join_jaccard") else None,
        "scoring_pairs_per_sec": scoring_rates,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""spark-submit entry point: end-to-end EM pipeline over synthetic pages.

Launched by ``scripts/submit.sh`` via ``spark-submit --py-files`` (the
north-rule launch contract). Generates the deterministic Common-Crawl-style
pages corpus, runs sample -> train -> block -> match -> cluster with stage
checkpoints, prints one JSON line of metrics.

    spark-submit --master local[8] --py-files /tmp/ebsj_spark.zip \
        scripts/run_pipeline.py --n-entities 800 --checkpoint-dir /tmp/ckpt
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-entities", type=int, default=800)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--tune", action="store_true")
    ap.add_argument("--use-value-matcher", action="store_true")
    args = ap.parse_args()

    # import after spark-submit has placed the --py-files zip on sys.path
    from pyspark.sql import SparkSession

    from entityblockingbysimilarityjoins_spark.plans.pipeline import (
        PipelineConfig,
        audit_text_identity,
        run_pipeline,
    )
    from entityblockingbysimilarityjoins_spark.sources.pages import (
        generate_gold,
        generate_pages,
    )

    spark = SparkSession.builder.appName("ebsj-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    pages = generate_pages(spark, args.n_entities, args.seed).persist()
    gold = generate_gold(spark, args.n_entities, args.seed)
    cfg = PipelineConfig(checkpoint_dir=args.checkpoint_dir, tune=args.tune,
                         use_value_matcher=args.use_value_matcher)
    result = run_pipeline(spark, pages, gold, cfg)
    ok = audit_text_identity(pages, result["records"])
    out = {
        "metrics": result["metrics"],
        "text_byte_identity": bool(ok),
        "n_pages": pages.count(),
        "seconds": round(time.time() - t0, 3),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

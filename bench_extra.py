"""Optimization-round measurement harness (guide §1.4/§1.5) — NOT the frozen
driver bench. Isolates declared queries with the noop sink so the computation
is timed without the count()-pruning caveat, labels jobs, and can dump
``explain("formatted")`` plans to files.

Usage:
  python bench_extra.py time  q1 [q2 ...]     # noop-sink timing, best of N reps
  python bench_extra.py count q1 [q2 ...]     # bench.py-identical .count() timing
  python bench_extra.py plan  out_dir q1 ...  # write <out_dir>/<q>.txt plans
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS, BENCH_EXTRA_REPS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E
from entityblockingbysimilarityjoins_spark.operators.cache import release_cached
from entityblockingbysimilarityjoins_spark.session import get_spark


def main() -> None:
    mode = sys.argv[1]
    args = sys.argv[2:]
    out_dir = None
    if mode == "plan":
        out_dir, args = args[0], args[1:]
        os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("BENCH_EXTRA_REPS", "2"))
    spark = get_spark(app_name="ebsj-bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    for t in ("documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    for name in args:
        fn = qs[name]
        if mode == "plan":
            df = fn(spark, sf_dir)
            df.collect()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            release_cached()
            with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
                f.write(plan)
            print(f"{name}: plan -> {out_dir}/{name}.txt")
            continue
        raws = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{i}")
            t0 = time.time()
            if mode == "time":
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            else:
                fn(spark, sf_dir).count()
            raws.append(round(time.time() - t0, 3))
            release_cached()
        print(f"{name}: best={min(raws)} reps={raws}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Emulate the driver's correctness gate: run every queries() entry on Spark
and its oracle_sql() on DuckDB at sf0.01, compare row counts + sorted values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")
import __spark_entry__ as E  # noqa: E402
from entityblockingbysimilarityjoins_spark.operators.cache import release_cached  # noqa: E402
from entityblockingbysimilarityjoins_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir).toPandas()
        release_cached()  # mirror bench.py: don't accumulate 43 queries' intermediates
        if name not in oracles:
            print(f"{name}: rows={len(sdf)} (rows-only check, no oracle)")
            continue
        odf = con.execute(oracles[name]).df()
        status = []
        if len(sdf) != len(odf):
            status.append(f"ROWCOUNT {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            status.append(f"SCHEMA {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if not status:
            cols = sorted(sdf.columns)
            a = sdf[cols].sort_values(cols).reset_index(drop=True)
            b = odf[cols].sort_values(cols).reset_index(drop=True)
            b = b.astype(a.dtypes.to_dict())
            if not a.equals(b):
                diff = (a != b) & ~(a.isna() & b.isna())
                status.append(f"VALUES ({int(diff.any(axis=1).sum())} differing rows)")
        print(f"{name}: rows={len(sdf)} {'OK' if not status else 'MISMATCH: ' + '; '.join(status)}")
        failures += bool(status)
    spark.stop()
    return failures


if __name__ == "__main__":
    raise SystemExit(main())

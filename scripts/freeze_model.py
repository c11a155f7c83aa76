"""Train and freeze the seeded random-forest artifact used by the rf_predict
driver query (M2 evidence).

Trains the numpy CART forest (matcher/random_forest.py) on the sf0.01
documents table: candidate pairs = 8-char-text-head blocks, labels = 16-char
head equality, features = the shared ``doc_features()`` preset. Deterministic
(seeded) — rerunning reproduces the identical JSON. The artifact is committed
at ``entityblockingbysimilarityjoins_spark/data/frozen_rf.json`` so predict
(Spark) and the SQL oracle (DuckDB CASE trees) evaluate the same model.

Usage: python scripts/freeze_model.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, ".")
import __spark_entry__ as E  # noqa: E402
from entityblockingbysimilarityjoins_spark.matcher.features import (  # noqa: E402
    extract_features,
)
from entityblockingbysimilarityjoins_spark.matcher.persist import (  # noqa: E402
    packaged_model_path,
    save_model,
)
from entityblockingbysimilarityjoins_spark.matcher.random_forest import (  # noqa: E402
    RandomForestMatcher,
)
from entityblockingbysimilarityjoins_spark.session import get_spark  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = E._pairs_only(spark, sf_dir)
    h = docs.select("doc_id", F.substring("text", 1, 16).alias("h16"))
    labeled = (
        pairs.join(h.withColumnsRenamed({"doc_id": "id1", "h16": "h1"}), "id1")
        .join(h.withColumnsRenamed({"doc_id": "id2", "h16": "h2"}), "id2")
        .select("id1", "id2", (F.col("h1") == F.col("h2")).cast("int").alias("label"))
    )
    feats = E.doc_features()
    fm = extract_features(labeled, docs, "doc_id", feats,
                          keep_cols=("label",)).toPandas()
    fm = fm.sort_values(["id1", "id2"]).reset_index(drop=True)  # stable row order
    names = [f.name for f in feats]
    X = fm[names].to_numpy(dtype=np.float64)
    y = fm["label"].to_numpy(dtype=np.int64)
    model = RandomForestMatcher(n_trees=10, max_depth=8, random_state=0).fit(
        X, y, feature_names=names)
    out = packaged_model_path()
    os.makedirs(os.path.dirname(out), exist_ok=True)
    save_model(model, out)
    proba = model.predict_proba(X)
    print(f"trained on {len(y)} pairs ({int(y.sum())} pos); "
          f"train acc {(model.predict(X) == y).mean():.4f}; "
          f"proba range [{proba.min():.4f}, {proba.max():.4f}]; wrote {out}")


if __name__ == "__main__":
    main()

"""Sampling operators for training-set construction (SURVEY §2.7, P1/P2/P4).

- ``down_sample``: Falcon-style down-sampler
  (``/root/reference/cpp/sampler/sampler_impl.cc:50-219``): take ``n/y``
  random probe rows; for each, keep the top ``y/2`` partner rows by
  shared-token count plus ``y - y/2`` random partners; dedupe. DataFrame
  re-expression: token explode join -> groupBy count -> row_number window,
  plus a seeded random sample — all shuffle-native.
- ``cluster_sample_self``: Jaccard join at a cluster threshold, connected
  components, one representative pair per cluster edge, capped random subset
  (``cpp/sampler/sample.cc:10-110``).
- ``build_training_sample``: Megallen-style labeled sample_res (FIXTURES F3):
  low-threshold candidates labeled by the gold graph + seeded random
  negatives, balanced-ish (random_forest.py:132-175 conventions).

Determinism: all randomness is ``rand(seed)`` / ``shuffle``-free; sampling
uses hash-ordered ``row_number`` so results are partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .connected_components import connected_components
from .set_join import set_similarity_self_join


def down_sample(
    df_probe: DataFrame,
    df_part: DataFrame,
    id_col: str,
    tokens_col: str,
    n_probe: int,
    y: int = 10,
    seed: int = 0,
) -> DataFrame:
    """P1: (id1=probe, id2=partner) pairs — top-y/2 by shared tokens + random."""
    probe = (
        df_probe.select(F.col(id_col).alias("id1"), F.col(tokens_col).alias("t1"))
        .withColumn("__r", F.hash(F.col("id1"), F.lit(seed)))
        .orderBy("__r")
        .limit(n_probe)
        .drop("__r")
        .persist()
    )
    part = df_part.select(F.col(id_col).alias("id2"), F.col(tokens_col).alias("t2"))
    shared = (
        probe.select("id1", F.explode("t1").alias("tok"))
        .join(part.select("id2", F.explode("t2").alias("tok")), "tok")
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("shared"))
    )
    w = Window.partitionBy("id1").orderBy(F.desc("shared"), F.asc("id2"))
    top = shared.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= y // 2
    ).select("id1", "id2")
    wr = Window.partitionBy("id1").orderBy(F.hash("id1", "id2", F.lit(seed)))
    rand = (
        probe.select("id1")
        .crossJoin(part.select("id2"))
        .withColumn("__rn", F.row_number().over(wr))
        .filter(F.col("__rn") <= y - y // 2)
        .select("id1", "id2")
    )
    return top.unionByName(rand).dropDuplicates(["id1", "id2"])


def cluster_sample_self(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    tau: float = 0.6,
    max_pairs: int = 100_000,
    seed: int = 0,
) -> DataFrame:
    """P4: representative intra-cluster pairs from a Jaccard join + CC."""
    edges = set_similarity_self_join(df, id_col, tokens_col, "jac", tau).select("id1", "id2")
    comp = connected_components(edges)
    with_c = (
        edges.join(comp.withColumnsRenamed({"node": "id1", "component": "c"}), "id1")
    )
    # one representative edge per (component, id1), then capped seeded sample
    w = Window.partitionBy("c", "id1").orderBy("id2")
    reps = with_c.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    wo = Window.orderBy(F.hash("id1", "id2", F.lit(seed)))
    return (
        reps.select("id1", "id2")
        .withColumn("__rn", F.row_number().over(wo))
        .filter(F.col("__rn") <= max_pairs)
        .drop("__rn")
    )


def build_training_sample(
    df: DataFrame,
    gold: DataFrame,
    id_col: str,
    tokens_col: str,
    candidate_threshold: float = 0.4,
    n_random_negatives: int = 2000,
    seed: int = 0,
) -> DataFrame:
    """F3 sample_res: (id1, id2, label) — candidates + random pairs, gold-labeled."""
    cand = set_similarity_self_join(
        df, id_col, tokens_col, "jac", candidate_threshold
    ).select("id1", "id2")
    slim = df.select(F.col(id_col).alias("rid"))

    # random negatives: zip two independent seeded samples (never a cross join)
    def indexed_sample(s: int, out: str) -> DataFrame:
        k = slim.orderBy(F.hash("rid", F.lit(s))).limit(n_random_negatives)
        w = Window.orderBy(F.hash("rid", F.lit(s)))  # k rows only — cheap
        return k.select(F.col("rid").alias(out), F.row_number().over(w).alias("__i"))

    rand_pairs = (
        indexed_sample(seed, "a").join(indexed_sample(seed + 1, "b"), "__i")
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("id1"), F.greatest("a", "b").alias("id2"))
    )
    pairs = cand.unionByName(rand_pairs).dropDuplicates(["id1", "id2"])
    g = gold.select("id1", "id2").withColumn("label", F.lit(1))
    return pairs.join(g, ["id1", "id2"], "left").fillna({"label": 0})

"""Interchangeable-value grouping + IC-aware rematch + cluster expansion
(SURVEY §2.10, V2/V3/V5/V7/V8).

Reference semantics re-expressed:

- value pairs come from *matched* record pairs whose attribute values differ
  (``value_matcher/doc2vec.py:290-326``: the matcher's positives supply the
  value pairs to test);
- pairs with embedding cosine >= tau become edges; DSU/graph closure groups
  them (we use the distributed connected-components operator); each group's
  representative is its minimum value (deterministic);
- ``normalize_values`` rewrites an attribute to group representatives (V5,
  ``interchangeable.py:17-67``) so re-extracted features treat interchangeable
  values as equal;
- ``rematch_negatives`` (V7, ``matcher/match.py:135-166``): re-extract
  features for the matcher's negatives over the normalized table, re-predict,
  append recovered positives;
- ``cluster_pairs_ic`` (V8, ``interchangeable.py:70-158``): entity clusters =
  connected components over matched pairs plus interchangeable-value edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.connected_components import connected_components
from .embed import cosine_sim, hashed_embedding


def value_pairs_from_matches(
    matches: DataFrame, records: DataFrame, id_col: str, attr: str
) -> DataFrame:
    """(v1, v2) distinct differing value pairs among matched record pairs."""
    r = records.select(F.col(id_col), F.col(attr))
    return (
        matches.join(r.withColumnsRenamed({id_col: "id1", attr: "v1"}), "id1")
        .join(r.withColumnsRenamed({id_col: "id2", attr: "v2"}), "id2")
        .filter(F.col("v1").isNotNull() & F.col("v2").isNotNull())
        .filter((F.col("v1") != F.col("v2")) & (F.col("v1") != "") & (F.col("v2") != ""))
        .select(F.least("v1", "v2").alias("v1"), F.greatest("v1", "v2").alias("v2"))
        .distinct()
    )


def group_values(
    value_pairs: DataFrame, tau: float = 0.8, dim: int = 64, seed: int = 0
) -> DataFrame:
    """V2+V3: cosine-label value pairs, group by connectivity.

    Returns (value, representative) for every value in some group
    (representative = min value of the group, deterministic)."""
    scored = value_pairs.withColumn(
        "cos", cosine_sim(hashed_embedding(F.col("v1"), dim, seed),
                          hashed_embedding(F.col("v2"), dim, seed))
    )
    edges = scored.filter(F.col("cos") >= tau).select("v1", "v2")
    comp = connected_components(edges, "v1", "v2")
    return comp.select(F.col("node").alias("value"), F.col("component").alias("representative"))


def normalize_values(
    records: DataFrame, attr: str, groups: DataFrame, out_col: str | None = None
) -> DataFrame:
    """V5: rewrite ``attr`` to its group representative (identity if ungrouped)."""
    out_col = out_col or attr
    g = F.broadcast(groups.withColumnsRenamed({"value": attr, "representative": "__rep"}))
    return (
        records.join(g, attr, "left")
        .withColumn(out_col, F.coalesce(F.col("__rep"), F.col(attr)))
        .drop("__rep")
    )


def cluster_pairs_ic(
    matches: DataFrame,
    records: DataFrame,
    id_col: str,
    groups_per_attr: dict[str, DataFrame],
) -> DataFrame:
    """V8: connected components over match edges ∪ same-IC-group record edges.

    Two records whose attribute values share an IC group are linked (the
    reference expands the match graph with IC cliques of the representative
    attribute; a hub node per (attr, representative) realizes the clique
    without materializing O(k^2) edges)."""
    edges = matches.select(
        F.col("id1").cast("string").alias("u"), F.col("id2").cast("string").alias("v")
    )
    for attr, groups in groups_per_attr.items():
        g = F.broadcast(groups.withColumnsRenamed({"value": attr}))
        hub = (
            records.select(F.col(id_col), F.col(attr))
            .join(g, attr)
            .select(
                F.col(id_col).cast("string").alias("u"),
                F.concat(F.lit(f"__ic_{attr}__"), F.col("representative")).alias("v"),
            )
        )
        edges = edges.unionByName(hub)
    comp = connected_components(edges, "u", "v")
    recs = comp.filter(~F.col("node").startswith("__ic_"))
    # component label may be a hub node; remap to min record id per component
    rep = recs.groupBy("component").agg(F.min("node").alias("rep"))
    return recs.join(rep, "component").select(
        F.col("node"), F.col("rep").alias("component")
    )


def rematch_negatives(
    predicted: DataFrame,
    records: DataFrame,
    id_col: str,
    features: list,
    model,
    groups_per_attr: dict[str, DataFrame],
    threshold: float = 0.5,
) -> DataFrame:
    """V7: re-score the matcher's negatives with IC-normalized attributes;
    returns the full match set (original positives ∪ recovered negatives)."""
    from ..matcher.features import extract_features
    from ..matcher.random_forest import apply_matcher

    norm = records
    for attr, groups in groups_per_attr.items():
        norm = normalize_values(norm, attr, groups)
    negatives = predicted.filter(~F.col("match")).select("id1", "id2")
    neg_feats = extract_features(negatives, norm, id_col, features)
    rescored = apply_matcher(neg_feats, model, threshold=threshold)
    recovered = rescored.filter(F.col("match")).select("id1", "id2")
    return predicted.filter(F.col("match")).select("id1", "id2").unionByName(recovered)

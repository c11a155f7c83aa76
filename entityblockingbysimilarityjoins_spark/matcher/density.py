"""Per-rule quality estimation + rule-weighted ranking (SURVEY M4 + K2).

``estimate_rule_density`` re-expresses ``SimJoinBlocker::estimateDensity``
(``/root/reference/cpp/blocker/simjoin_blocker.cc:383-537``): evaluate every
blocking rule alone on the labeled sample, compute its F1, and normalize the
F1s into rule weights. ``score_pairs_by_rules`` then ranks candidate pairs by
the weight-blended similarity values — the reference's
``topKviaAllSimilarityScores`` (``cpp/topk/topk.cc:1053-1523``), computed as
plain score columns + distributed top-K.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import sim as S
from ..functions.tokenize import tokenizer
from ..sources.rules import Rule


def _rule_value(rule: Rule, l: Column, r: Column) -> Column:
    """Similarity value of a single rule on a pair of raw attribute values."""
    if rule.tok:
        fn = tokenizer(rule.tok, rule.tok_settings)
        tl, tr = fn(l), fn(r)
        key = {"overlap": "overlap"}.get(rule.sim, rule.sim)
        return S.SET_SIMS[key](tl, tr)
    if rule.sim == "lev":
        return S.lev_dist(l.cast("string"), r.cast("string"))
    if rule.sim == "exm":
        return S.exact_match(l.cast("string"), r.cast("string"))
    if rule.sim == "anm":
        return S.absolute_norm(l, r)
    raise ValueError(rule.sim)


def _rule_passes(rule: Rule, value: Column) -> Column:
    if rule.sign == "+":
        return value >= rule.threshold
    return value <= rule.threshold


def rule_value_columns(rules: list[Rule]) -> list[tuple[str, Column]]:
    return [
        (f"rule_{i}", _rule_value(r, F.col(f"l_{r.attr}"), F.col(f"r_{r.attr}")))
        for i, r in enumerate(rules)
    ]


def estimate_rule_density(
    labeled_pairs: DataFrame,
    records: DataFrame,
    id_col: str,
    rules: list[Rule],
) -> list[float]:
    """Normalized per-rule F1 weights on a labeled (id1, id2, label) sample."""
    from .features import attach_pair_payload

    attrs = sorted({r.attr for r in rules})
    payload = attach_pair_payload(labeled_pairs.select("id1", "id2", "label"),
                                  records, id_col, attrs)
    aggs = []
    for i, r in enumerate(rules):
        hit = _rule_passes(r, _rule_value(r, F.col(f"l_{r.attr}"), F.col(f"r_{r.attr}")))
        aggs += [
            F.sum((hit & (F.col("label") == 1)).cast("int")).alias(f"tp_{i}"),
            F.sum(hit.cast("int")).alias(f"pp_{i}"),
        ]
    aggs.append(F.sum((F.col("label") == 1).cast("int")).alias("pos"))
    row = payload.agg(*aggs).collect()[0]
    pos = row["pos"] or 0
    f1s = []
    for i in range(len(rules)):
        tp, pp = row[f"tp_{i}"] or 0, row[f"pp_{i}"] or 0
        prec = tp / pp if pp else 0.0
        rec = tp / pos if pos else 0.0
        f1s.append(2 * prec * rec / (prec + rec) if prec + rec else 0.0)
    total = sum(f1s)
    return [f / total if total else 1.0 / len(rules) for f in f1s]


def score_pairs_by_rules(
    pairs: DataFrame,
    records: DataFrame,
    id_col: str,
    rules: list[Rule],
    weights: list[float],
    score_col: str = "score",
) -> DataFrame:
    """K2: pairs + weighted-sum-of-rule-similarities score column.

    lev rules contribute as lev_sim-style (inverted) via 1/(1+dist) so higher
    is always better in the blend."""
    from .features import attach_pair_payload

    attrs = sorted({r.attr for r in rules})
    payload = attach_pair_payload(pairs, records, id_col, attrs)
    score = F.lit(0.0)
    for (_, val), r, w in zip(rule_value_columns(rules), rules, weights):
        contrib = F.lit(1.0) / (F.lit(1.0) + val) if r.sim == "lev" else val
        score = score + F.lit(float(w)) * contrib
    return payload.select("id1", "id2", score.alias(score_col))

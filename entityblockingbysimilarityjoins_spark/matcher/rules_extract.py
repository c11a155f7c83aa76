"""Blocking-rule extraction from the trained forest (SURVEY §2.9 M3).

Re-expresses the reference's tripartite-graph + move-strategy extraction
(``simjoin_entitymatching/blocker/graph.py:41-196``,
``blocker/extract_formula.py:72-511``) with the same **coverage contract**:
for every tree and every decision path ending in a *match* leaf, the emitted
rule set contains a condition implied by that path — so any pair the forest
could predict as a match passes at least one blocking rule (recall-safety of
the blocker, README.md:6-8).

Walk (sklearn array layout, same arrays graph.py:115-139 reads):
- going right at node (f, thr) asserts ``X[f] > thr``  -> '+' condition,
- going left  asserts ``X[f] <= thr``                  -> '-' condition.

Joinable conditions (the only ones a similarity join can enforce):
- '+' on jac/cos/dice          -> set-similarity join at threshold thr
- '+' on overlap               -> overlap join at c = floor(thr) + 1
- '+' on exact_match           -> exact join (thr in (0,1))
- '+' on abs_norm              -> absolute-norm join at thr
- '-' on lev_dist              -> edit-distance join at d = floor(thr)

Per match-path we keep ONE joinable condition (the most selective by a fixed
preference order); per (feature, sign) we then keep the **loosest** threshold
across paths (min for '+', max for '-') — the analogue of the reference's
``update_range_rule_node`` threshold propagation (graph.py:314-342). A path
with no joinable condition is reported (coverage hole) — the caller can widen
the feature set or add a manual fallback rule.
"""

from __future__ import annotations

import logging
import math
from dataclasses import dataclass

import numpy as np

from ..sources.rules import Rule
from .features import Feature
from .random_forest import _LEAF, RandomForestMatcher, Tree

log = logging.getLogger(__name__)

#: family tiers; within tier 0 (set sims, thresholds all in [0,1]) the pick
#: prefers the highest threshold = the most selective join (smallest prefix)
_SIM_PREFERENCE = {"jac": 0, "cos": 0, "dice": 0, "overlap": 1, "lev_dist": 2,
                   "exact_match": 3, "abs_norm": 4}


@dataclass(frozen=True)
class _Cond:
    feature_idx: int
    sign: str        # '+' (value > thr) or '-' (value <= thr)
    threshold: float


def _match_paths(tree: Tree) -> list[list[_Cond]]:
    """All root->leaf condition lists whose leaf majority class is 1."""
    paths: list[list[_Cond]] = []

    def walk(node: int, conds: list[_Cond]):
        if tree.feature[node] == _LEAF:
            v = tree.value[node]
            if v[1] > v[0]:
                paths.append(list(conds))
            return
        f, thr = int(tree.feature[node]), float(tree.threshold[node])
        walk(int(tree.children_left[node]), conds + [_Cond(f, "-", thr)])
        walk(int(tree.children_right[node]), conds + [_Cond(f, "+", thr)])

    walk(0, [])
    return paths


def _joinable(cond: _Cond, feat: Feature) -> bool:
    if cond.sign == "+":
        return feat.sim in ("jac", "cos", "dice", "overlap", "exact_match", "abs_norm")
    return feat.sim == "lev_dist"


def _pick(conds: list[_Cond], features: list[Feature]) -> _Cond | None:
    usable = [c for c in conds if _joinable(c, features[c.feature_idx])]
    if not usable:
        return None
    return min(
        usable,
        key=lambda c: (
            _SIM_PREFERENCE[features[c.feature_idx].sim],
            -c.threshold if c.sign == "+" else c.threshold,
        ),
    )


def _to_rule(cond: _Cond, feat: Feature) -> Rule:
    if cond.sign == "+":
        if feat.sim == "overlap":
            return Rule(feat.attr, "overlap", feat.tok, feat.tok_settings,
                        float(math.floor(cond.threshold) + 1), "+")
        sim = {"exact_match": "exm", "abs_norm": "anm"}.get(feat.sim, feat.sim)
        return Rule(feat.attr, sim, feat.tok, feat.tok_settings,
                    float(cond.threshold), "+")
    # '-' on lev_dist: distance <= floor(thr)
    return Rule(feat.attr, "lev", None, None, float(math.floor(cond.threshold)), "-")


def extract_blocking_rules(
    model: RandomForestMatcher,
    features: list[Feature],
) -> tuple[list[Rule], int]:
    """-> (rules, uncovered_paths). uncovered_paths==0 means full recall cover."""
    picked: dict[tuple, Rule] = {}
    uncovered = 0
    for tree in model.trees:
        for path in _match_paths(tree):
            cond = _pick(path, features)
            if cond is None:
                uncovered += 1
                continue
            rule = _to_rule(cond, features[cond.feature_idx])
            key = (rule.attr, rule.sim, rule.tok, rule.tok_settings, rule.sign)
            prev = picked.get(key)
            if prev is None:
                picked[key] = rule
            elif rule.sign == "+" and rule.threshold < prev.threshold:
                picked[key] = rule           # loosest wins ('+': min threshold)
            elif rule.sign == "-" and rule.threshold > prev.threshold:
                picked[key] = rule           # loosest wins ('-': max threshold)
    if uncovered:
        log.warning("rule extraction: %d match paths had no joinable condition "
                    "(blocking recall not guaranteed for them)", uncovered)
    return sorted(picked.values(), key=lambda r: (r.attr, r.sim, str(r.tok))), uncovered

"""Similarity functions over token-set arrays and strings (SURVEY.md §2.3).

Join-time semantics (reference ``cpp/common/simfunc.cc``): operate on deduped
sorted token arrays; empty inputs yield 0 (pairs with empty attrs never join).
Feature-time NaN-on-empty semantics live in ``matcher/features.py``.

All functions here are **native Column expressions** — they stay inside
whole-stage codegen (``array_intersect``/``size``/``levenshtein`` are JVM
intrinsics), no Python in the hot path. Weighted (IDF) variants take a
token-id -> idf mapping produced by ``functions.dictionary``.

Formulas (simfunc.cc line refs):
- jaccard = o / (|a|+|b|-o)                    (:127)
- cosine  = o / sqrt(|a|*|b|)   (set cosine)   (:165)
- dice    = 2o / (|a|+|b|)                     (:209)
- overlap_coeff = o / min(|a|,|b|)             (:247)
- lev_sim = 1 - lev / max(len)                 (:285)
- exact_match = 1.0 if equal else 0.0          (:292)
- absolute_norm = 1 - |a-b| / max(a,b)         (:297)
- weighted jaccard = W∩ / (wa + wb - W∩)       (setjoin.h:250-258)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def overlap(a: Column, b: Column) -> Column:
    return F.size(F.array_intersect(a, b)).cast("double")


def jaccard(a: Column, b: Column) -> Column:
    o = overlap(a, b)
    denom = F.size(a) + F.size(b) - o
    return F.when(denom > 0, o / denom).otherwise(F.lit(0.0))


def cosine(a: Column, b: Column) -> Column:
    o = overlap(a, b)
    denom = F.sqrt(F.size(a).cast("double") * F.size(b).cast("double"))
    return F.when(denom > 0, o / denom).otherwise(F.lit(0.0))


def dice(a: Column, b: Column) -> Column:
    o = overlap(a, b)
    denom = (F.size(a) + F.size(b)).cast("double")
    return F.when(denom > 0, F.lit(2.0) * o / denom).otherwise(F.lit(0.0))


def overlap_coeff(a: Column, b: Column) -> Column:
    o = overlap(a, b)
    denom = F.least(F.size(a), F.size(b)).cast("double")
    return F.when(denom > 0, o / denom).otherwise(F.lit(0.0))


def lev_dist(a: Column, b: Column) -> Column:
    return F.levenshtein(a, b).cast("double")


def lev_sim(a: Column, b: Column) -> Column:
    mx = F.greatest(F.length(a), F.length(b)).cast("double")
    return F.when(mx > 0, F.lit(1.0) - F.levenshtein(a, b) / mx).otherwise(F.lit(1.0))


def exact_match(a: Column, b: Column) -> Column:
    return F.when(a == b, F.lit(1.0)).otherwise(F.lit(0.0))


def absolute_norm(a: Column, b: Column) -> Column:
    """Numeric relative similarity; inputs are string-typed numerics (simfunc.cc:297)."""
    x, y = a.try_cast("double"), b.try_cast("double")
    mx = F.greatest(F.abs(x), F.abs(y))
    return (
        F.when(x.isNull() | y.isNull(), F.lit(0.0))
        .when((x == 0) & (y == 0), F.lit(1.0))
        .when(mx > 0, F.lit(1.0) - F.abs(x - y) / mx)
        .otherwise(F.lit(0.0))
    )


# ---- IDF-weighted variants ------------------------------------------------
# idf_arr: an array<double> Column indexed by token id (token ids are dense
# 0..V-1 by construction), typically F.lit(broadcast list) or a map column.

def _idf_sum(tokens: Column, idf_arr: Column) -> Column:
    return F.aggregate(tokens, F.lit(0.0), lambda acc, t: acc + F.element_at(idf_arr, t + 1))


def weighted_overlap(a: Column, b: Column, idf_arr: Column) -> Column:
    return _idf_sum(F.array_intersect(a, b), idf_arr)


def weighted_jaccard(a: Column, b: Column, idf_arr: Column, wa: Column, wb: Column) -> Column:
    wo = weighted_overlap(a, b, idf_arr)
    denom = wa + wb - wo
    return F.when(denom > 0, wo / denom).otherwise(F.lit(0.0))


def weighted_cosine(a: Column, b: Column, idf_arr: Column, wa: Column, wb: Column) -> Column:
    wo = weighted_overlap(a, b, idf_arr)
    denom = F.sqrt(wa * wb)
    return F.when(denom > 0, wo / denom).otherwise(F.lit(0.0))


def weighted_dice(a: Column, b: Column, idf_arr: Column, wa: Column, wb: Column) -> Column:
    wo = weighted_overlap(a, b, idf_arr)
    denom = wa + wb
    return F.when(denom > 0, F.lit(2.0) * wo / denom).otherwise(F.lit(0.0))


#: dispatch table for the set-similarity family (sim name -> Column fn)
SET_SIMS = {
    "jac": jaccard,
    "cos": cosine,
    "dice": dice,
    "overlap": overlap,
    "overlap_coeff": overlap_coeff,
}

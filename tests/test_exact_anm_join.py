"""Exact-match and absolute-norm joins vs brute-force oracles."""

from __future__ import annotations

import itertools
import random

import pytest

from entityblockingbysimilarityjoins_spark.operators.exact_join import (
    absolute_norm_rs_join,
    absolute_norm_self_join,
    exact_rs_join,
    exact_self_join,
)


def test_exact_self_join(spark):
    rows = [(0, "a"), (1, "b"), (2, "a"), (3, ""), (4, None), (5, "a"), (6, "B")]
    df = spark.createDataFrame(rows, "rid int, v string")
    got = {(r["id1"], r["id2"]) for r in exact_self_join(df, "rid", "v").collect()}
    assert got == {(0, 2), (0, 5), (2, 5)}


def test_exact_rs_join(spark):
    r = spark.createDataFrame([(0, "x"), (1, "y")], "rid int, v string")
    s = spark.createDataFrame([(10, "y"), (11, "z"), (12, "y")], "rid int, v string")
    got = {(x["id1"], x["id2"]) for x in exact_rs_join(r, s, "rid", "v").collect()}
    assert got == {(1, 10), (1, 12)}


def _anm(a: float, b: float) -> float:
    if a == 0 and b == 0:
        return 1.0
    mx = max(abs(a), abs(b))
    return 1.0 - abs(a - b) / mx if mx > 0 else 0.0


@pytest.mark.parametrize("t", [0.5, 0.9, 0.95])
def test_anm_self_join(spark, t):
    rng = random.Random(41)
    vals = [round(rng.uniform(0, 200), 2) for _ in range(80)] + [0.0, 0.0, 1e-3, 5e-4]
    rows = [(i, str(v)) for i, v in enumerate(vals)]
    want = {(i, j) for i, j in itertools.combinations(range(len(vals)), 2)
            if _anm(vals[i], vals[j]) >= t}
    df = spark.createDataFrame(rows, "rid int, v string")
    got = {(r["id1"], r["id2"])
           for r in absolute_norm_self_join(df, "rid", "v", threshold=t).collect()}
    assert got == want


def test_anm_rs_join(spark):
    vals_r = [1.0, 10.0, 100.0, 0.0]
    vals_s = [0.95, 9.0, 200.0, 0.0, 101.0]
    t = 0.9
    want = {(i, j) for i in range(len(vals_r)) for j in range(len(vals_s))
            if _anm(vals_r[i], vals_s[j]) >= t}
    r = spark.createDataFrame([(i, str(v)) for i, v in enumerate(vals_r)], "rid int, v string")
    s = spark.createDataFrame([(i, str(v)) for i, v in enumerate(vals_s)], "rid int, v string")
    got = {(x["id1"], x["id2"])
           for x in absolute_norm_rs_join(r, s, "rid", "v", threshold=t).collect()}
    assert got == want

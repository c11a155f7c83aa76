"""Top-K ranking: deterministic order, exact scores vs hand computation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from entityblockingbysimilarityjoins_spark.functions.tokenize import tokens_wspace
from entityblockingbysimilarityjoins_spark.operators.topk import cap_pairs, topk_via_ta


def _setup(spark):
    rows = [(0, "a b c d"), (1, "a b c d"), (2, "a b c x"), (3, "p q r s"), (4, "p q")]
    toks = spark.createDataFrame(rows, ["rid", "s"]).withColumn("tokens", tokens_wspace("s"))
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (3, 4)], ["id1", "id2"]
    )
    return toks, pairs


def test_topk_scores_and_order(spark):
    toks, pairs = _setup(spark)
    res = topk_via_ta(pairs, toks, k=3).collect()
    # scores: (0,1)=4.0; (3,4)=0.5+2/sqrt(8)+2/3+1.0≈2.874; (0,2)=0.6+0.75+0.75+0.75=2.85
    assert [(r["id1"], r["id2"]) for r in res] == [(0, 1), (3, 4), (0, 2)]
    assert res[0]["score"] == pytest.approx(4.0)  # identical sets: 1+1+1+1
    assert res[1]["score"] == pytest.approx(0.5 + 2 / math.sqrt(8) + 2 / 3 + 1.0)
    assert res[2]["score"] == pytest.approx(3 / 5 + 3 / 4 + 3 / 4 + 3 / 4)


def test_topk_tiebreak_deterministic(spark):
    toks = spark.createDataFrame(
        [(i, "a b") for i in range(6)], ["rid", "s"]
    ).withColumn("tokens", tokens_wspace("s"))
    pairs = spark.createDataFrame(
        [(i, j) for i in range(6) for j in range(i + 1, 6)], ["id1", "id2"]
    )
    res = topk_via_ta(pairs, toks, k=4).collect()
    assert [(r["id1"], r["id2"]) for r in res] == [(0, 1), (0, 2), (0, 3), (0, 4)]


def test_cap_pairs_noop_below_cap(spark):
    toks, pairs = _setup(spark)
    assert cap_pairs(pairs, toks, 10).count() == 4
    capped = cap_pairs(pairs, toks, 2)
    assert {(r["id1"], r["id2"]) for r in capped.collect()} == {(0, 1), (3, 4)}

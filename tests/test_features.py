"""Feature extraction: py_em NaN-on-empty semantics + exact values."""

from __future__ import annotations

import math

import pytest

from entityblockingbysimilarityjoins_spark.matcher.features import (
    Feature,
    extract_features,
    generate_features,
    infer_attr_types,
)


def _records(spark):
    return spark.createDataFrame(
        [
            (0, "spark entity match", "12.5"),
            (1, "spark entity batch", "12.5"),
            (2, "", "25.0"),
            (3, None, None),
        ],
        ["rid", "title", "price"],
    )


def _pairs(spark):
    return spark.createDataFrame([(0, 1), (0, 2), (0, 3)], ["id1", "id2"])


def test_feature_values_and_nan_semantics(spark):
    feats = [
        Feature("title", "jac", "dlm"),
        Feature("title", "lev_dist"),
        Feature("title", "exact_match"),
        Feature("price", "abs_norm"),
    ]
    rows = {(r["id1"], r["id2"]): r for r in
            extract_features(_pairs(spark), _records(spark), "rid", feats).collect()}
    r01 = rows[(0, 1)]
    assert r01["title_title_jac_dlm_dlm"] == pytest.approx(2 / 4)
    assert r01["title_title_lev_dist"] == pytest.approx(1.0)  # match -> batch
    assert r01["title_title_exact_match"] == 0.0
    assert r01["price_price_abs_norm"] == pytest.approx(1.0)
    # empty / null attr -> NULL feature (NaN), not 0
    r02, r03 = rows[(0, 2)], rows[(0, 3)]
    for r in (r02, r03):
        assert r["title_title_jac_dlm_dlm"] is None
        assert r["title_title_lev_dist"] is None
        assert r["title_title_exact_match"] is None
    assert r03["price_price_abs_norm"] is None


def test_infer_attr_types_and_generate(spark):
    df = spark.createDataFrame(
        [("one two three four five six seven", "ab", "1.5"),
         ("one two three four five six seven eight", "cd", "2.5")],
        ["body", "code", "price"],
    )
    types = infer_attr_types(df, ["body", "code", "price"])
    assert types == {"body": "str_bt_5w_10w", "code": "str_eq_1w", "price": "numeric"}
    feats = generate_features(types)
    names = {f.name for f in feats}
    assert "body_body_jac_dlm_dlm" in names
    assert "price_price_abs_norm" in names
    assert "code_code_lev_dist" in names

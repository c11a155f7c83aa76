"""IC-max feature semantics (cal_feature.cc:37-317) + RF grid-search tuning."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from entityblockingbysimilarityjoins_spark.matcher.features import Feature
from entityblockingbysimilarityjoins_spark.matcher.random_forest import tune_matcher
from entityblockingbysimilarityjoins_spark.value_matcher.interchangeable import (
    extract_features_ic,
)


@pytest.fixture()
def ic_setup(spark):
    # IC group: {"tv set", "television"} (rep = min = "television"... min("tv set",
    # "television") = "television" lexically? 'te' < 'tv' so rep = "television")
    records = spark.createDataFrame(
        [(1, "tv set"), (2, "television"), (3, "radio x"), (4, "tv set")],
        ["rid", "name"],
    )
    groups = spark.createDataFrame(
        [("tv set", "television"), ("television", "television")],
        ["value", "representative"],
    )
    return records, {"name": groups}


def test_ic_same_group_scores_one(spark, ic_setup):
    records, groups = ic_setup
    pairs = spark.createDataFrame([(1, 2)], ["id1", "id2"])  # tv set vs television
    feats = [Feature("name", "jac", "dlm", None), Feature("name", "exact_match")]
    row = extract_features_ic(pairs, records, "rid", feats, groups).first()
    assert row[feats[0].name] == 1.0
    assert row[feats[1].name] == 1.0


def test_ic_max_over_members(spark, ic_setup):
    records, groups = ic_setup
    # 3 (radio x, ungrouped) vs 1 (tv set, grouped with television):
    # jac_dlm = max(jac({radio,x},{tv,set}), jac({radio,x},{television})) = 0
    # lev = MIN over members (cal_feature.cc:76-80)
    pairs = spark.createDataFrame([(3, 1)], ["id1", "id2"])
    feats = [Feature("name", "jac", "dlm", None), Feature("name", "lev_dist")]
    row = extract_features_ic(pairs, records, "rid", feats, groups).first()
    assert row[feats[0].name] == 0.0

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    assert row[feats[1].name] == min(lev("radio x", "tv set"), lev("radio x", "television"))


def test_ic_max_improves_over_plain(spark):
    # pair whose values differ but one side's IC group contains a near match
    records = spark.createDataFrame(
        [(1, "acme fast blender"), (2, "acme quick blender")], ["rid", "name"]
    )
    groups = spark.createDataFrame(
        [("acme quick blender", "acme fast blender"),
         ("acme fast blender", "acme fast blender")],
        ["value", "representative"],
    )
    pairs = spark.createDataFrame([(1, 2)], ["id1", "id2"])
    feats = [Feature("name", "jac", "dlm", None)]
    row = extract_features_ic(pairs, records, "rid", feats, {"name": groups}).first()
    assert row[feats[0].name] == 1.0  # same IC group


def test_ic_nan_on_empty(spark, ic_setup):
    records = spark.createDataFrame([(1, "a b"), (2, None)], ["rid", "name"])
    pairs = spark.createDataFrame([(1, 2)], ["id1", "id2"])
    feats = [Feature("name", "jac", "dlm", None)]
    row = extract_features_ic(pairs, records, "rid", feats, {}).first()
    assert row[feats[0].name] is None


def test_tune_matcher_separable():
    rng = np.random.default_rng(3)
    X = rng.random((300, 4))
    y = (X[:, 1] > 0.5).astype(int)
    m = tune_matcher(X, y, feature_names=[f"f{i}" for i in range(4)], cv=5)
    acc = float((m.predict(X) == y).mean())
    assert acc >= 0.97
    assert m.feature_names == ["f0", "f1", "f2", "f3"]


def test_tune_matcher_deterministic():
    rng = np.random.default_rng(4)
    X = rng.random((120, 3))
    y = ((X[:, 0] + X[:, 2]) > 1.0).astype(int)
    m1 = tune_matcher(X, y, cv=3)
    m2 = tune_matcher(X, y, cv=3)
    assert m1.max_depth == m2.max_depth
    assert m1.min_samples_leaf == m2.min_samples_leaf
    assert np.allclose(m1.predict_proba(X), m2.predict_proba(X))

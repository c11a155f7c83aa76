"""numpy RandomForest: determinism, separability, rule extraction coverage."""

from __future__ import annotations

import numpy as np
import pytest

from entityblockingbysimilarityjoins_spark.matcher.features import Feature
from entityblockingbysimilarityjoins_spark.matcher.random_forest import (
    RandomForestMatcher,
)
from entityblockingbysimilarityjoins_spark.matcher.rules_extract import (
    extract_blocking_rules,
)


def _toy(n=400, seed=1):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 2, n)
    # feature 0: separable sim; feature 1: noise; feature 2: lev_dist-like
    f0 = np.where(y == 1, rng.uniform(0.7, 1.0, n), rng.uniform(0.0, 0.5, n))
    f1 = rng.uniform(0, 1, n)
    f2 = np.where(y == 1, rng.uniform(0, 2, n), rng.uniform(4, 9, n))
    X = np.column_stack([f0, f1, f2])
    return X, y


def test_rf_learns_separable():
    X, y = _toy()
    m = RandomForestMatcher(n_trees=8, max_depth=6, random_state=0).fit(X, y)
    assert (m.predict(X) == y).mean() >= 0.99


def test_rf_deterministic():
    X, y = _toy()
    p1 = RandomForestMatcher(random_state=3).fit(X, y).predict_proba(X)
    p2 = RandomForestMatcher(random_state=3).fit(X, y).predict_proba(X)
    assert np.array_equal(p1, p2)


def test_rf_nan_imputed():
    X, y = _toy()
    Xn = X.copy()
    Xn[::7, 0] = np.nan
    m = RandomForestMatcher(random_state=0).fit(Xn, y)
    assert np.isfinite(m.predict_proba(Xn)).all()


def test_rule_extraction_covers_paths():
    X, y = _toy()
    feats = [
        Feature("title", "jac", "dlm"),
        Feature("title", "cos", "qgm", 3),
        Feature("title", "lev_dist"),
    ]
    m = RandomForestMatcher(n_trees=6, max_depth=4, random_state=0).fit(
        X, y, feature_names=[f.name for f in feats])
    rules, uncovered = extract_blocking_rules(m, feats)
    assert rules, "expected at least one rule"
    assert uncovered == 0
    # every rule must be joinable & sensibly typed
    for r in rules:
        assert r.sim in ("jac", "cos", "dice", "overlap", "lev", "exm", "anm")
        if r.sim == "lev":
            assert r.sign == "-"


def test_rule_extraction_loosest_threshold_wins():
    # forest of 2 identical stumps with different thresholds on one feature
    from entityblockingbysimilarityjoins_spark.matcher.random_forest import Tree

    def stump(thr):
        return Tree(
            feature=np.array([0, -1, -1]),
            threshold=np.array([thr, 0.0, 0.0]),
            children_left=np.array([1, -1, -1]),
            children_right=np.array([2, -1, -1]),
            value=np.array([[5.0, 5.0], [5.0, 0.0], [0.0, 5.0]]),
        )

    feats = [Feature("title", "jac", "dlm")]
    m = RandomForestMatcher(feature_names=[feats[0].name])
    m.trees = [stump(0.8), stump(0.6)]
    rules, unc = extract_blocking_rules(m, feats)
    assert unc == 0
    assert len(rules) == 1 and rules[0].threshold == pytest.approx(0.6)


def test_active_learning_trainer():
    """M1 active loop: seeded, deterministic, learns the separable concept."""
    import numpy as np

    from entityblockingbysimilarityjoins_spark.matcher.random_forest import (
        train_model_active,
    )

    rng = np.random.default_rng(0)
    X = rng.random((1500, 6))
    y = ((X[:, 0] + 2 * X[:, 3]) > 1.5).astype(np.int64)
    m1 = train_model_active(X, y, feature_names=[f"f{i}" for i in range(6)],
                            n_trees=8, sample_size=60, seed=1)
    m2 = train_model_active(X, y, feature_names=[f"f{i}" for i in range(6)],
                            n_trees=8, sample_size=60, seed=1)
    acc = (m1.predict(X) == y).mean()
    assert acc >= 0.9
    # determinism: identical tree arrays
    assert all(
        np.array_equal(a.threshold, b.threshold)
        and np.array_equal(a.feature, b.feature)
        for a, b in zip(m1.trees, m2.trees)
    )

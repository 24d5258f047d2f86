"""Trainer tests: class weights, convergence on separable data, threshold
sweep, AUC vs hand-computed values, model round-trip."""

import numpy as np
import pytest

from entity_resolution_pipeline_ray.config import ClassifierConfig
from entity_resolution_pipeline_ray.functions.similarity import sigmoid
from entity_resolution_pipeline_ray.stages.training import (
    class_weights,
    evaluate,
    roc_auc,
    threshold_sweep,
    train_logistic,
    train_test_split,
)
from entity_resolution_pipeline_ray.state.model import LRModel


def test_class_weights_balanced():
    y = np.array([1.0, 1.0, 0.0, 0.0, 0.0, 0.0])
    w = class_weights(y)
    # n/(2*n_pos)=6/4, n/(2*n_neg)=6/8
    assert w[0] == pytest.approx(1.5) and w[2] == pytest.approx(0.75)
    # weighted mass equal per class
    assert w[y > 0.5].sum() == pytest.approx(w[y <= 0.5].sum())


def test_train_separable():
    rng = np.random.RandomState(0)
    n = 2000
    X = rng.randn(n, 3)
    y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(np.float64)
    w, b = train_logistic(X, y, ClassifierConfig(max_iterations=200))
    p = sigmoid(X @ w + b)
    m = evaluate(y, p, 0.5)
    assert m["f1"] > 0.95 and m["auc"] > 0.99
    assert w[0] > abs(w[2])  # informative feature dominates noise


def test_split_deterministic():
    X = np.arange(100, dtype=np.float64).reshape(-1, 1)
    y = (np.arange(100) % 2).astype(np.float64)
    a = train_test_split(X, y, 0.7, 42)
    b = train_test_split(X, y, 0.7, 42)
    assert (a[0] == b[0]).all() and len(a[0]) == 70 and len(a[2]) == 30


def test_roc_auc_hand_values():
    y = np.array([0, 0, 1, 1], dtype=np.float64)
    p = np.array([0.1, 0.4, 0.35, 0.8])
    # sklearn value for this classic example is 0.75
    assert roc_auc(y, p) == pytest.approx(0.75)
    assert roc_auc(y, np.array([0.2, 0.2, 0.9, 0.9])) == 1.0
    assert roc_auc(np.array([1.0, 1.0]), np.array([0.1, 0.2])) == 0.5  # degenerate


def test_threshold_sweep_picks_best_f1():
    y = np.array([0, 0, 0, 1, 1, 1], dtype=np.float64)
    p = np.array([0.05, 0.15, 0.45, 0.55, 0.85, 0.95])
    best = threshold_sweep(y, p)
    assert best["f1"] == 1.0 and 0.45 < best["threshold"] <= 0.55


def test_model_json_roundtrip(tmp_path):
    m = LRModel(["a", "b"], np.array([1.5, -2.0]), 0.25, threshold=0.7, metrics={"f1": 0.99})
    path = str(tmp_path / "model.json")
    m.save(path)
    m2 = LRModel.load(path)
    assert m2.feature_names == ["a", "b"]
    assert (m2.weights == m.weights).all() and m2.bias == 0.25 and m2.threshold == 0.7
    X = np.array([[1.0, 1.0]])
    assert m.predict_proba(X)[0] == m2.predict_proba(X)[0]


def test_rfecv_selects_informative_features():
    """G4: CV'd recursive elimination keeps the signal features and drops noise
    (reference analog: sklearn RFECV, batch_parallel_feature_engineering.py:969-1048)."""
    import numpy as np

    from entity_resolution_pipeline_ray.config import ClassifierConfig
    from entity_resolution_pipeline_ray.stages.training import rfecv_select

    rng = np.random.RandomState(0)
    n, d = 3000, 6
    X = rng.randn(n, d)
    # y depends only on features 0 and 1
    logits = 3.0 * X[:, 0] - 2.5 * X[:, 1]
    y = (logits + 0.3 * rng.randn(n) > 0).astype(np.float64)
    ccfg = ClassifierConfig(max_iterations=40, decision_threshold=0.5)
    cols = rfecv_select(X, y, ccfg, step=1, cv_folds=3)
    assert 0 in cols and 1 in cols, cols
    assert len(cols) <= 4, cols  # most noise features eliminated


def test_rfecv_in_train_matcher_keeps_f1_gate():
    import dataclasses

    from entity_resolution_pipeline_ray.config import DEFAULT_CONFIG, FeatureConfig
    from entity_resolution_pipeline_ray.pipelines.er import pairwise_f1_against_gold, run_er_on_spec
    from entity_resolution_pipeline_ray.sources.pages import PagesSpec, labeled_pairs_table

    spec = PagesSpec(num_pages=300, num_shards=2)
    cfg = dataclasses.replace(DEFAULT_CONFIG, features=FeatureConfig(rfecv=True, rfe_cv_folds=2))
    res = run_er_on_spec(spec, cfg)
    assert 1 <= len(res["model"].feature_names) <= 10
    m = pairwise_f1_against_gold(res["clusters"], labeled_pairs_table(spec))
    assert m["f1"] >= 0.99, m

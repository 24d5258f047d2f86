"""Feature selection (G5), prefilter rules (G6), standardization (A8)."""

import dataclasses

import numpy as np
import pytest

from entity_resolution_pipeline_ray.config import DEFAULT_CONFIG, ERConfig, FeatureConfig, PrefilterConfig
from entity_resolution_pipeline_ray.stages.scoring import FEATURE_NAMES, apply_model, select_feature_names
from entity_resolution_pipeline_ray.state.model import LRModel


def test_select_wildcards():
    f = FeatureConfig(include=("title_*", "minhash_jaccard"), exclude=("title_lev",))
    sel = select_feature_names(f)
    assert "minhash_jaccard" in sel and "title_jw" in sel
    assert "title_lev" not in sel and "tfidf_cosine" not in sel
    assert select_feature_names(FeatureConfig()) == list(FEATURE_NAMES)
    with pytest.raises(ValueError):
        select_feature_names(FeatureConfig(include=("nope_*",)))


def _model(names, weights, **kw):
    return LRModel(feature_names=list(names), weights=np.asarray(weights, dtype=np.float64), bias=0.0, **kw)


def test_apply_model_selects_columns():
    # model over only minhash_jaccard; X_full carries all features
    m = _model(["minhash_jaccard"], [10.0])
    X = np.zeros((2, len(FEATURE_NAMES)))
    X[0, FEATURE_NAMES.index("minhash_jaccard")] = 1.0
    p = apply_model(X, m)
    assert p[0] > 0.99 and p[1] == 0.5


def test_prefilter_rules_force_probs():
    m = _model(["tfidf_cosine"], [0.0])  # model is uninformative -> prob 0.5
    X = np.zeros((3, len(FEATURE_NAMES)))
    X[0, FEATURE_NAMES.index("minhash_jaccard")] = 0.99  # rule: high sketch
    X[1, FEATURE_NAMES.index("minhash_jaccard")] = 0.001  # rule: low sketch + low jw
    X[2, FEATURE_NAMES.index("minhash_jaccard")] = 0.6
    X[2, FEATURE_NAMES.index("title_exact")] = 1.0  # rule: exact title + decent sketch
    pf = PrefilterConfig(enabled=True)
    p = apply_model(X, m, pf)
    assert p[0] == 1.0 and p[1] == 0.0 and p[2] == 1.0
    # disabled -> untouched
    p2 = apply_model(X, m, PrefilterConfig(enabled=False))
    assert (p2 == 0.5).all()


def test_join_plan_matches_broadcast_plan():
    """The at-scale join plan (pairs ⋈ doc_features twice, payloads packed to
    binary for Acero) must produce identical features to the broadcast plan.
    Forced via broadcast_threshold_rows=0 — this path is never taken at test
    scale otherwise (round-1 shipped it with list-typed payloads Acero
    rejects; this pins the fix)."""
    from entity_resolution_pipeline_ray.sources.pages import PagesSpec, pages_dataset
    from entity_resolution_pipeline_ray.stages.blocking import candidate_pairs, emit_block_keys
    from entity_resolution_pipeline_ray.stages.extract import extract_docs
    from entity_resolution_pipeline_ray.stages.scoring import score_pairs
    from entity_resolution_pipeline_ray.stages.signatures import compute_doc_features

    cfg = DEFAULT_CONFIG
    spec = PagesSpec(num_pages=300, num_shards=2)
    docs = extract_docs(pages_dataset(spec)).materialize()
    feats = compute_doc_features(docs, cfg.minhash, cfg.tfidf, concurrency=2, batch_size=256).materialize()
    pairs = candidate_pairs(
        emit_block_keys(feats, cfg.minhash, cfg.blocking), cfg.blocking, num_partitions=4
    ).materialize()
    bcast = score_pairs(pairs, feats, None, cfg).to_pandas()
    cfg_join = dataclasses.replace(
        cfg, execution=dataclasses.replace(cfg.execution, broadcast_threshold_rows=0)
    )
    joined = score_pairs(pairs, feats, None, cfg_join).to_pandas()
    key = ["left_id", "right_id"]
    b = bcast.sort_values(key).reset_index(drop=True)
    j = joined.sort_values(key).reset_index(drop=True)
    assert len(b) == len(j) and len(b) > 0
    for c in b.columns:
        if c in key:
            assert (b[c].to_numpy() == j[c].to_numpy()).all()
        else:
            np.testing.assert_allclose(b[c].to_numpy(), j[c].to_numpy(), rtol=1e-6, err_msg=c)


def test_standardized_training_still_accurate():
    from entity_resolution_pipeline_ray.pipelines.er import pairwise_f1_against_gold, run_er_on_spec
    from entity_resolution_pipeline_ray.sources.pages import PagesSpec, labeled_pairs_table

    spec = PagesSpec(num_pages=400, num_shards=2)
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        features=FeatureConfig(standardize=True, exclude=("prod_sketch_cos",)),
    )
    res = run_er_on_spec(spec, cfg)
    assert res["model"].scaler_mean is not None
    assert "prod_sketch_cos" not in res["model"].feature_names
    m = pairwise_f1_against_gold(res["clusters"], labeled_pairs_table(spec))
    assert m["f1"] >= 0.99
    imp = res["model"].feature_importance()
    assert abs(sum(imp.values()) - 1.0) < 1e-9

"""User-extension surface (extension.py): stage registry composition and
registered pair features flowing through featurization, training, the model
and scoring (SURVEY §2.11)."""

import numpy as np
import pyarrow as pa

from entity_resolution_pipeline_ray import extension as X


def test_stage_registry_composes_in_order(ray_session):
    import ray.data as rd

    calls = []

    def stage_a(ds, ctx):
        calls.append("a")
        return ds.map_batches(
            lambda t: pa.table({"x": pa.array([v * 2 for v in t["x"].to_pylist()])}),
            batch_format="pyarrow",
        )

    def stage_b(ds, ctx):
        calls.append("b")
        return ds.map_batches(
            lambda t: pa.table({"x": pa.array([v + 1 for v in t["x"].to_pylist()])}),
            batch_format="pyarrow",
        )

    X.register_stage("t_double", stage_a)
    X.register_stage("t_inc", stage_b)
    try:
        ds = rd.from_items([{"x": 1}, {"x": 2}])
        out = sorted(X.build_pipeline(ds, ["t_double", "t_inc"]).to_pandas()["x"])
        assert out == [3, 5]  # (x*2)+1, so order was respected
        assert calls == ["a", "b"]
        out2 = sorted(X.build_pipeline(ds, ["t_inc", "t_double"]).to_pandas()["x"])
        assert out2 == [4, 6]  # (x+1)*2
    finally:
        X.unregister_stage("t_double")
        X.unregister_stage("t_inc")


def test_builtin_stages_registered():
    assert "extract" in X.STAGES and "doc_features" in X.STAGES


def test_registered_pair_feature_flows_to_model_and_scores(ray_session):
    from entity_resolution_pipeline_ray.config import DEFAULT_CONFIG
    from entity_resolution_pipeline_ray.pipelines.er import run_er_on_spec
    from entity_resolution_pipeline_ray.sources.pages import PagesSpec
    from entity_resolution_pipeline_ray.stages import scoring

    def tc_absdiff(left, right):
        a = np.asarray(left["token_count"], dtype=np.float64)
        b = np.asarray(right["token_count"], dtype=np.float64)
        return np.abs(a - b) / np.maximum(a + b, 1.0)

    base_len = len(scoring.FEATURE_NAMES)
    X.register_pair_feature("tc_absdiff", tc_absdiff)
    try:
        assert scoring.FEATURE_NAMES[-1] == "tc_absdiff"
        res = run_er_on_spec(PagesSpec(num_pages=300, num_shards=2), DEFAULT_CONFIG)
        # the feature column came out of the (worker-side) scorer...
        assert "feat_tc_absdiff" in res["scores"].schema().names
        # ...and training saw it (default FeatureConfig includes everything)
        assert "tc_absdiff" in res["model"].feature_names
        vals = res["scores"].to_pandas()["feat_tc_absdiff"].to_numpy()
        assert ((vals >= 0.0) & (vals <= 1.0)).all() and len(vals) > 0
    finally:
        X.unregister_pair_feature("tc_absdiff")
    assert len(scoring.FEATURE_NAMES) == base_len


def test_register_duplicate_feature_rejected():
    import pytest

    with pytest.raises(ValueError):
        X.register_pair_feature("title_jw", lambda l, r: 0)

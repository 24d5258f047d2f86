"""Resume test (SURVEY §5 implication: kill after stage N, re-run, outputs
identical): run the checkpointed pipeline partially, then resume to completion,
and compare with a clean full run."""

import json
import os

import pytest

from entity_resolution_pipeline_ray.config import DEFAULT_CONFIG
from entity_resolution_pipeline_ray.pipelines.er import run_er_pipeline_checkpointed
from entity_resolution_pipeline_ray.sources.pages import PagesSpec, labeled_pairs_table, pages_dataset


@pytest.fixture(scope="module")
def spec():
    return PagesSpec(num_pages=300, num_shards=2)


def _clusters_map(res):
    df = res["clusters"].to_pandas()
    return dict(zip(df["doc_id"].astype("int64"), df["cluster_id"].astype("int64")))


def test_kill_and_resume_identical(tmp_path_factory, spec):
    wd_a = str(tmp_path_factory.mktemp("full"))
    wd_b = str(tmp_path_factory.mktemp("resumed"))
    lp = labeled_pairs_table(spec)

    # clean full run
    full, resumed_full = run_er_pipeline_checkpointed(pages_dataset(spec), lp, wd_a, DEFAULT_CONFIG)
    assert not any(resumed_full.values())  # nothing was resumed

    # "killed" run: stops after doc_features
    partial, _ = run_er_pipeline_checkpointed(pages_dataset(spec), lp, wd_b, DEFAULT_CONFIG, stop_after="doc_features")
    assert "clusters" not in partial

    # mtime snapshot of completed stage data to prove it is NOT recomputed
    docs_manifest = os.path.join(wd_b, "docs", "manifest.json")
    mtime_before = os.path.getmtime(docs_manifest)

    # resume to completion
    res, resumed = run_er_pipeline_checkpointed(pages_dataset(spec), lp, wd_b, DEFAULT_CONFIG)
    assert resumed["docs"] and resumed["doc_features"]
    assert not resumed["clusters"]
    assert os.path.getmtime(docs_manifest) == mtime_before

    # identical final assignment
    assert _clusters_map(res) == _clusters_map(full)


def test_manifest_lineage_contents(tmp_path_factory, spec):
    wd = str(tmp_path_factory.mktemp("lineage"))
    lp = labeled_pairs_table(spec)
    run_er_pipeline_checkpointed(pages_dataset(spec), lp, wd, DEFAULT_CONFIG)
    with open(os.path.join(wd, "scores", "manifest.json")) as f:
        man = json.load(f)
    assert man["status"] == "complete"
    assert man["rows"] == sum(p["rows"] for p in man["partitions"])
    assert all(p["bytes"] > 0 for p in man["partitions"])
    hist = man["metrics"]["score_hist"]
    assert len(hist) == 10 and sum(hist) == man["rows"]
    # the persisted parquet is the dataset consumed downstream
    import ray.data as rd

    assert rd.read_parquet(os.path.join(wd, "scores", "data")).count() == man["rows"]


def test_corrupt_manifest_forces_recompute(tmp_path_factory, spec):
    wd = str(tmp_path_factory.mktemp("corrupt"))
    lp = labeled_pairs_table(spec)
    run_er_pipeline_checkpointed(pages_dataset(spec), lp, wd, DEFAULT_CONFIG, stop_after="docs")
    # truncate the manifest mid-write (simulated crash during manifest write)
    mp = os.path.join(wd, "docs", "manifest.json")
    with open(mp, "w") as f:
        f.write('{"status": "comp')
    res, resumed = run_er_pipeline_checkpointed(pages_dataset(spec), lp, wd, DEFAULT_CONFIG, stop_after="docs")
    assert not resumed["docs"]  # recomputed, not trusted
    with open(mp) as f:
        assert json.load(f)["status"] == "complete"

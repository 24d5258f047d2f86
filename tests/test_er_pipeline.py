"""End-to-end ER pipeline: the pairwise-F1 >= 0.99 quality gate (BASELINE.md
targets; reference metrics analog /root/reference/output/reports/classification_metrics_summary.md)."""

import numpy as np
import pytest

from entity_resolution_pipeline_ray.config import DEFAULT_CONFIG
from entity_resolution_pipeline_ray.pipelines.er import (
    pairwise_f1_against_gold,
    run_er_on_spec,
)
from entity_resolution_pipeline_ray.sources.pages import PagesSpec, labeled_pairs_table


@pytest.fixture(scope="module")
def er_result():
    spec = PagesSpec(num_pages=1200, num_shards=4)
    res = run_er_on_spec(spec, DEFAULT_CONFIG)
    return spec, res


def test_pairwise_f1_gate(er_result):
    spec, res = er_result
    gold = labeled_pairs_table(spec)
    m = pairwise_f1_against_gold(res["clusters"], gold)
    assert m["f1"] >= 0.99, m
    assert m["precision"] >= 0.99, m
    assert m["recall"] >= 0.99, m


def test_model_quality(er_result):
    _, res = er_result
    t = res["model"].metrics["test"]
    assert t["f1"] >= 0.99 and t["auc"] >= 0.999


def test_every_doc_clustered_exactly_once(er_result):
    _, res = er_result
    cl = res["clusters"].to_pandas()
    assert cl["doc_id"].is_unique
    assert len(cl) == res["docs"].count()
    # cluster representative is the min doc id of its members (deterministic)
    grp = cl.groupby("cluster_id")["doc_id"].min()
    assert (grp.index.to_numpy() == grp.to_numpy()).all()


def test_scores_schema(er_result):
    _, res = er_result
    sc = res["scores"].schema()
    names = set(sc.names)
    assert {"left_id", "right_id", "prob", "match"} <= names
    assert any(n.startswith("feat_") for n in names)

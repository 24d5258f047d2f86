"""End-to-end ER pipeline: the pairwise-F1 >= 0.99 quality gate (BASELINE.md
targets; reference metrics analog /root/reference/output/reports/classification_metrics_summary.md)."""

import numpy as np
import pytest

from entity_resolution_pipeline_ray.config import DEFAULT_CONFIG
from entity_resolution_pipeline_ray.pipelines.er import (
    pairwise_f1_against_gold,
    run_er_on_spec,
    run_er_pipeline,
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


def test_interned_signatures_identical_to_direct():
    """String interning (signatures once per unique text, fan-out by content
    hash) must be invisible in the output; the auto gate must engage on a
    duplicate-rich corpus and stay off on a mostly-unique one."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from entity_resolution_pipeline_ray.config import DEFAULT_CONFIG as cfg
    from entity_resolution_pipeline_ray.sources.pages import PagesSpec, pages_dataset
    from entity_resolution_pipeline_ray.stages.extract import extract_docs
    from entity_resolution_pipeline_ray.stages.signatures import (
        compute_doc_features,
        estimate_duplicate_fraction,
    )

    docs = extract_docs(pages_dataset(PagesSpec(num_pages=200, num_shards=2))).materialize()
    # duplicate-rich corpus: every text appears ~3x under distinct doc ids
    base = docs.to_pandas()
    dup = pa.Table.from_pandas(
        __import__("pandas").concat(
            [base, base.assign(doc_id=base.doc_id + 1_000_000), base.assign(doc_id=base.doc_id + 2_000_000)]
        ),
        preserve_index=False,
    )
    dup_ds = rd.from_arrow(dup).materialize()

    frac = estimate_duplicate_fraction(dup_ds, dup.num_rows)
    assert frac > 0.5, frac
    # below k distinct values the sketch is exact — compare to ground truth
    frac_uniq = estimate_duplicate_fraction(docs, docs.count())
    true_uniq = 1.0 - base["text"].fillna("").nunique() / len(base)
    assert abs(frac_uniq - true_uniq) < 1e-9, (frac_uniq, true_uniq)

    direct = compute_doc_features(dup_ds, cfg.minhash, cfg.tfidf, intern="never").to_pandas()
    interned = compute_doc_features(dup_ds, cfg.minhash, cfg.tfidf, intern="always").to_pandas()
    d = direct.sort_values("doc_id").reset_index(drop=True)
    i = interned.sort_values("doc_id").reset_index(drop=True)
    assert len(d) == len(i) == dup.num_rows
    for c in ["doc_id", "url", "title", "domain", "token_count"]:
        assert (d[c].to_numpy() == i[c].to_numpy()).all(), c
    for c in ["minhash_sig", "tfidf_idx", "tfidf_val"]:
        for a, b in zip(d[c], i[c]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=c)


def test_streaming_path_matches_materialized(er_result):
    """materialize_intermediate=False is the 100-TB configuration (no full
    pinning of docs/doc_features; stages re-execute upstream reads and the
    executor streams).  It must produce the same clusters as the default
    pinned path on the same corpus."""
    from entity_resolution_pipeline_ray.sources.pages import pages_dataset

    spec, res = er_result
    stream = run_er_pipeline(
        pages_dataset(spec), labeled_pairs_table(spec), DEFAULT_CONFIG,
        materialize_intermediate=False,
    )
    a = res["clusters"].to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = stream["clusters"].to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (a["doc_id"].to_numpy() == b["doc_id"].to_numpy()).all()
    assert (a["cluster_id"].to_numpy() == b["cluster_id"].to_numpy()).all()


def test_at_scale_plan_composition_matches_default(er_result):
    """The full 100-TB configuration in ONE run — no intermediate pinning
    (materialize_intermediate=False), join-plan scoring forced
    (broadcast_threshold_rows=0: pairs ⋈ packed doc payloads twice instead of
    a ray.put side table), and distributed min-label-propagation clustering
    forced (driver_edge_threshold=0: no driver union-find) — must produce
    clusters identical to the default small-scale plans.  The pieces are
    pinned individually elsewhere; this pins their composition, which is the
    plan an actual multi-node run executes."""
    import dataclasses

    from entity_resolution_pipeline_ray.sources.pages import pages_dataset

    spec, res = er_result
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        execution=dataclasses.replace(DEFAULT_CONFIG.execution, broadcast_threshold_rows=0),
        clustering=dataclasses.replace(DEFAULT_CONFIG.clustering, driver_edge_threshold=0),
    )
    at_scale = run_er_pipeline(
        pages_dataset(spec), labeled_pairs_table(spec), cfg,
        materialize_intermediate=False,
    )
    a = res["clusters"].to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = at_scale["clusters"].to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(a) == len(b) > 0
    assert (a["doc_id"].to_numpy() == b["doc_id"].to_numpy()).all()
    assert (a["cluster_id"].to_numpy() == b["cluster_id"].to_numpy()).all()

"""Reporting aggregates (A9/A12/A13, S7) and input readers (S1/S2)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd


@pytest.fixture(scope="module")
def er_small():
    from entity_resolution_pipeline_ray.config import DEFAULT_CONFIG
    from entity_resolution_pipeline_ray.pipelines.er import pairwise_f1_against_gold, run_er_on_spec
    from entity_resolution_pipeline_ray.sources.pages import PagesSpec, labeled_pairs_table

    spec = PagesSpec(num_pages=300, num_shards=2)
    res = run_er_on_spec(spec, DEFAULT_CONFIG)
    gold = labeled_pairs_table(spec)
    return res, pairwise_f1_against_gold(res["clusters"], gold)


def test_cluster_report(er_small):
    from entity_resolution_pipeline_ray.pipelines.reporting import cluster_report

    res, _ = er_small
    rep = cluster_report(res["clusters"])
    assert rep["n_docs"] == 300
    assert 0 < rep["n_clusters"] <= 300
    assert rep["min_size"] >= 1 and rep["max_size"] >= rep["min_size"]
    assert sum(rep["size_histogram"].values()) == rep["n_clusters"]
    assert len(rep["top_clusters"]) <= 10
    sizes = [c["size"] for c in rep["top_clusters"]]
    assert sizes == sorted(sizes, reverse=True)


def test_full_report_and_sinks(er_small, tmp_path):
    from entity_resolution_pipeline_ray.pipelines.reporting import er_report, render_markdown, save_report

    res, pw = er_small
    rep = er_report(res, pw)
    md = render_markdown(rep)
    assert "# Entity Resolution Run Report" in md and "Feature importance" in md
    jp, mp = str(tmp_path / "r.json"), str(tmp_path / "r.md")
    figs = save_report(rep, jp, mp, figures_dir=str(tmp_path / "figures"))
    assert os.path.getsize(jp) > 0 and os.path.getsize(mp) > 0
    imp = rep["model"]["feature_importance"]
    assert abs(sum(imp.values()) - 1.0) < 1e-9
    # figures: the full ER report carries every figure input (S7 parity with
    # the reference's figures/ dir, /root/reference/src/reporting.py:56-108)
    names = {os.path.basename(p) for p in figs}
    assert {
        "feature_importance.svg",
        "feature_weights.svg",
        "feature_separation.svg",
        "test_confusion_matrix.svg",
        "confidence_by_correctness.svg",
        "cluster_sizes.svg",
    } <= names
    for p in figs:
        svg = open(p).read()
        assert svg.startswith("<svg") and svg.rstrip().endswith("</svg>")


def test_feature_stats_by_label():
    from entity_resolution_pipeline_ray.pipelines.reporting import feature_stats_by_label

    df = pd.DataFrame(
        {
            "feat_a": [1.0, 2.0, 3.0, 4.0],
            "feat_b": [0.0, 0.0, 1.0, 1.0],
            "match": [True, True, False, False],
        }
    )
    out = feature_stats_by_label(df)
    assert set(out["group"]) == {"overall", "match", "non_match"}
    row = out[(out["feature"] == "a") & (out["group"] == "match")].iloc[0]
    assert row["mean"] == 1.5 and row["min"] == 1.0 and row["max"] == 2.0


def test_read_pages_parquet_and_csv(tmp_path):
    from entity_resolution_pipeline_ray.sources.readers import read_pages

    df = pd.DataFrame({"url": ["u1", "u2"], "text": ["a", "b"], "lang": ["en", "de"]})
    pdir = tmp_path / "pq"
    pdir.mkdir()
    pq.write_table(pa.Table.from_pandas(df), str(pdir / "part0.parquet"))
    ds = read_pages(str(pdir), columns=["url", "text"])
    assert ds.count() == 2 and set(ds.schema().names) == {"url", "text"}

    cdir = tmp_path / "csv" / "nested"
    cdir.mkdir(parents=True)
    df.to_csv(str(cdir / "a.csv"), index=False)
    ds2 = read_pages(str(tmp_path / "csv"))
    assert ds2.count() == 2 and "lang" in ds2.schema().names


def test_read_pages_jsonl(tmp_path):
    from entity_resolution_pipeline_ray.sources.readers import read_pages

    jdir = tmp_path / "jl" / "shard0"
    jdir.mkdir(parents=True)
    (jdir / "docs.jsonl").write_text(
        '{"url": "u1", "text": "a", "lang": "en"}\n{"url": "u2", "text": "b", "lang": "de"}\n'
    )
    ds = read_pages(str(tmp_path / "jl"))
    assert ds.count() == 2 and set(ds.schema().names) == {"url", "text", "lang"}
    ds2 = read_pages(str(jdir / "docs.jsonl"), columns=["url", "text"])
    assert ds2.count() == 2 and set(ds2.schema().names) == {"url", "text"}


def test_read_labeled_pairs_variants(tmp_path):
    from entity_resolution_pipeline_ray.sources.readers import read_labeled_pairs

    # reference-style csv: left,right,match with string 'true'
    p = tmp_path / "gt.csv"
    p.write_text("left,right,match\nb,a,true\nc,d,false\n")
    t = read_labeled_pairs(str(p))
    assert t.column_names == ["left_url", "right_url", "match"]
    assert t["left_url"].to_pylist() == ["a", "c"]  # canonicalized
    assert t["match"].to_pylist() == [True, False]

    # parquet with bool column
    pqp = tmp_path / "gt.parquet"
    pq.write_table(
        pa.table({"left_url": ["x"], "right_url": ["y"], "match": [True]}), str(pqp)
    )
    t2 = read_labeled_pairs(str(pqp))
    assert t2["match"].to_pylist() == [True]

    bad = tmp_path / "bad.csv"
    bad.write_text("a,b\n1,2\n")
    with pytest.raises(ValueError):
        read_labeled_pairs(str(bad))

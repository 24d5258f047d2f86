"""Incremental append (er_incremental_append): a new crawl shard joins a
finished checkpointed run — only the new docs are extracted/featurized (with
the base run's pinned vocab + model), candidate pairs come only from blocks
touching new docs, and the final clusters equal a from-scratch run over the
union with the same pinned artifacts."""

import os

import numpy as np
import pyarrow as pa
import pytest

from entity_resolution_pipeline_ray.config import DEFAULT_CONFIG
from entity_resolution_pipeline_ray.functions.hashing import md5_u64
from entity_resolution_pipeline_ray.pipelines.er import (
    _load_vocab,
    er_incremental_append,
    run_er_pipeline_checkpointed,
)
from entity_resolution_pipeline_ray.sources.pages import (
    PagesSpec,
    labeled_pairs_table,
    shard_pages_table,
)


@pytest.fixture(scope="module")
def corpus():
    spec = PagesSpec(num_pages=300, num_shards=2)
    pages = pa.concat_tables([shard_pages_table(spec, s) for s in range(spec.num_shards)])
    urls = pages["url"].to_pylist()
    # ~25% of pages land in the append shard, spread across planted clusters
    # (url hash, not position), so new↔old cross-epoch pairs MUST be found
    is_new = np.array([md5_u64(u) % 4 == 0 for u in urls])
    base, append = pages.filter(pa.array(~is_new)), pages.filter(pa.array(is_new))
    lp = labeled_pairs_table(spec)
    base_urls = set(base["url"].to_pylist())
    lp_mask = [
        (l in base_urls) and (r in base_urls)
        for l, r in zip(lp["left_url"].to_pylist(), lp["right_url"].to_pylist())
    ]
    lp_base = lp.filter(pa.array(lp_mask))
    return spec, pages, base, append, lp_base


def _cluster_map(ds):
    df = ds.to_pandas()
    return dict(zip(df["doc_id"].astype("int64"), df["cluster_id"].astype("int64")))


def test_incremental_append_equals_pinned_full_run(ray_session, corpus, tmp_path_factory):
    import ray.data as rd

    from entity_resolution_pipeline_ray.pipelines.er import (
        candidate_pairs,
        cluster_labels,
        compute_doc_features,
        edges_from_scores,
        emit_block_keys,
        extract_docs,
        score_pairs,
    )
    from entity_resolution_pipeline_ray.state.model import LRModel

    spec, pages, base, append, lp_base = corpus
    cfg = DEFAULT_CONFIG
    wd = str(tmp_path_factory.mktemp("base_run"))

    run_er_pipeline_checkpointed(rd.from_arrow(base), lp_base, wd, cfg)
    assert os.path.exists(os.path.join(wd, "vocab.json"))

    inc = er_incremental_append(wd, rd.from_arrow(append), cfg)
    assert inc["n_new_docs"] == append.num_rows
    assert inc["n_new_pairs"] > 0
    got = _cluster_map(inc["clusters"])

    # from-scratch reference over the union with the SAME pinned vocab/model
    vocab = _load_vocab(os.path.join(wd, "vocab.json"))
    model = LRModel.load(os.path.join(wd, "model.json"))
    feats = compute_doc_features(
        extract_docs(rd.from_arrow(pages)), cfg.minhash, cfg.tfidf, vocab=vocab
    ).materialize()
    pairs = candidate_pairs(
        emit_block_keys(feats, cfg.minhash, cfg.blocking),
        cfg.blocking,
        num_partitions=4,
    )
    scores = score_pairs(pairs, feats, model, cfg)
    ref_clusters = cluster_labels(
        edges_from_scores(scores, cfg.clustering.min_edge_weight),
        feats.select_columns(["doc_id"]),
        cfg.clustering,
        num_partitions=4,
    )
    ref = _cluster_map(ref_clusters)

    assert got == ref

    # cross-epoch merging really happened: at least one final cluster holds
    # docs from BOTH epochs
    from entity_resolution_pipeline_ray.functions.hashing import doc_id_for_urls

    new_ids = set(int(i) for i in doc_id_for_urls(append["url"].to_pylist()))
    by_cluster: dict[int, set] = {}
    for d, c in got.items():
        by_cluster.setdefault(c, set()).add(d in new_ids)
    assert any(flags == {True, False} for flags in by_cluster.values())

    # the in-place epoch update is readable state: a SECOND (empty) append
    # loads the updated clusters checkpoint
    again = er_incremental_append(wd, rd.from_arrow(append.slice(0, 0)), cfg)
    assert again["n_new_docs"] == 0
    assert _cluster_map(again["clusters"]) == ref


def test_incremental_out_workdir_keeps_base_epoch(ray_session, corpus, tmp_path_factory):
    import ray.data as rd

    from entity_resolution_pipeline_ray.state.manifest import StageCheckpoint

    spec, pages, base, append, lp_base = corpus
    cfg = DEFAULT_CONFIG
    wd = str(tmp_path_factory.mktemp("base_run2"))
    out = str(tmp_path_factory.mktemp("epoch2"))

    run_er_pipeline_checkpointed(rd.from_arrow(base), lp_base, wd, cfg)
    base_rows = StageCheckpoint(wd, "doc_features").manifest()["rows"]

    # legacy-workdir backfill: vocab.json missing -> rebuilt deterministically
    # from the docs checkpoint before the append
    os.remove(os.path.join(wd, "vocab.json"))
    inc = er_incremental_append(wd, rd.from_arrow(append), cfg, out_workdir=out)
    assert os.path.exists(os.path.join(wd, "vocab.json"))
    # base epoch untouched, new epoch holds the union
    assert StageCheckpoint(wd, "doc_features").manifest()["rows"] == base_rows
    assert StageCheckpoint(out, "doc_features").manifest()["rows"] == base_rows + append.num_rows
    assert os.path.exists(os.path.join(out, "vocab.json"))
    assert StageCheckpoint(out, "clusters").manifest()["metrics"]["epoch_appended_docs"] == append.num_rows

    # empty append with out_workdir: a COMPLETE epoch dir is still produced
    out2 = out + "_empty"
    again = er_incremental_append(out, rd.from_arrow(append.slice(0, 0)), cfg, out_workdir=out2)
    assert again["n_new_docs"] == 0
    assert StageCheckpoint(out2, "doc_features").manifest()["rows"] == base_rows + append.num_rows
    assert os.path.exists(os.path.join(out2, "vocab.json"))


def _pinned_from_scratch(pages, wd, cfg):
    """From-scratch clusters over ``pages`` with the vocab/model pinned in
    ``wd`` — the exactness reference every epoch chain must reproduce."""
    import ray.data as rd

    from entity_resolution_pipeline_ray.pipelines.er import (
        candidate_pairs,
        cluster_labels,
        compute_doc_features,
        edges_from_scores,
        emit_block_keys,
        extract_docs,
        score_pairs,
    )
    from entity_resolution_pipeline_ray.state.model import LRModel

    vocab = _load_vocab(os.path.join(wd, "vocab.json"))
    model = LRModel.load(os.path.join(wd, "model.json"))
    feats = compute_doc_features(
        extract_docs(rd.from_arrow(pages)), cfg.minhash, cfg.tfidf, vocab=vocab
    ).materialize()
    pairs = candidate_pairs(
        emit_block_keys(feats, cfg.minhash, cfg.blocking), cfg.blocking, num_partitions=4
    )
    scores = score_pairs(pairs, feats, model, cfg)
    return _cluster_map(
        cluster_labels(
            edges_from_scores(scores, cfg.clustering.min_edge_weight),
            feats.select_columns(["doc_id"]),
            cfg.clustering,
            num_partitions=4,
        )
    )


def test_incremental_three_epoch_chain_equals_from_scratch(ray_session, corpus, tmp_path_factory):
    """base → +shard1 → +shard2 via out_workdir chaining: the final epoch's
    clusters equal ONE from-scratch run over all pages with the base epoch's
    pinned vocab/model — the operational daily-WARC pattern, exact across
    arbitrarily long chains because per-doc signatures are deterministic."""
    import ray.data as rd

    spec, pages, base, append, lp_base = corpus
    cfg = DEFAULT_CONFIG
    urls = append["url"].to_pylist()
    # split the append set into two epoch shards by url hash; the append set
    # is md5%4==0, so %2 would select everything — %8 splits it into {0} / {4}
    first = np.array([md5_u64(u) % 8 == 0 for u in urls])
    shard1, shard2 = append.filter(pa.array(first)), append.filter(pa.array(~first))
    assert shard1.num_rows > 0 and shard2.num_rows > 0

    wd0 = str(tmp_path_factory.mktemp("chain_base"))
    wd1 = str(tmp_path_factory.mktemp("chain_epoch1"))
    wd2 = str(tmp_path_factory.mktemp("chain_epoch2"))
    run_er_pipeline_checkpointed(rd.from_arrow(base), lp_base, wd0, cfg)
    inc1 = er_incremental_append(wd0, rd.from_arrow(shard1), cfg, out_workdir=wd1)
    assert inc1["n_new_docs"] == shard1.num_rows
    inc2 = er_incremental_append(wd1, rd.from_arrow(shard2), cfg, out_workdir=wd2)
    assert inc2["n_new_docs"] == shard2.num_rows

    got = _cluster_map(inc2["clusters"])
    assert got == _pinned_from_scratch(pages, wd0, cfg)


def test_incremental_recrawl_guard_drops_duplicate_urls(ray_session, corpus, tmp_path_factory):
    """An append shard containing RE-CRAWLED urls (already in the base epoch —
    the normal daily-crawl case) must not accumulate duplicate doc_id rows:
    first-crawl-wins, and the result equals appending only the genuinely new
    pages."""
    import ray.data as rd

    from entity_resolution_pipeline_ray.state.manifest import StageCheckpoint

    spec, pages, base, append, lp_base = corpus
    cfg = DEFAULT_CONFIG
    wd = str(tmp_path_factory.mktemp("recrawl_base"))
    run_er_pipeline_checkpointed(rd.from_arrow(base), lp_base, wd, cfg)

    # the appended shard re-crawls a third of the BASE corpus
    recrawled = base.slice(0, base.num_rows // 3)
    dirty = pa.concat_tables([append, recrawled])
    out = str(tmp_path_factory.mktemp("recrawl_epoch"))
    inc = er_incremental_append(wd, rd.from_arrow(dirty), cfg, out_workdir=out)

    # only the genuinely new docs were appended; no doc_id appears twice
    assert inc["n_new_docs"] == append.num_rows
    feats_rows = StageCheckpoint(out, "doc_features").manifest()["rows"]
    assert feats_rows == base.num_rows + append.num_rows
    df = inc["clusters"].to_pandas()
    assert df["doc_id"].is_unique

    # and the clusters equal a CLEAN append of the new pages alone
    clean_out = str(tmp_path_factory.mktemp("recrawl_clean"))
    clean = er_incremental_append(wd, rd.from_arrow(append), cfg, out_workdir=clean_out)
    assert _cluster_map(inc["clusters"]) == _cluster_map(clean["clusters"])

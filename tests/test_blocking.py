"""Blocking stage tests: recall on planted duplicates, hot-block pair caps,
pair canonicalization."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from entity_resolution_pipeline_ray.config import BlockingConfig, MinHashConfig, TfidfConfig
from entity_resolution_pipeline_ray.functions.hashing import doc_id_for_urls
from entity_resolution_pipeline_ray.sources.pages import PagesSpec, labeled_pairs_table, pages_dataset
from entity_resolution_pipeline_ray.stages.blocking import candidate_pairs, emit_block_keys, hot_block_strides
from entity_resolution_pipeline_ray.stages.extract import extract_docs
from entity_resolution_pipeline_ray.stages.signatures import compute_doc_features


def test_blocking_recall_on_planted_clusters():
    spec = PagesSpec(num_pages=400, num_shards=2)
    docs = extract_docs(pages_dataset(spec)).materialize()
    feats = compute_doc_features(docs, MinHashConfig(), TfidfConfig(), with_tfidf=False).materialize()
    blocks = emit_block_keys(feats, MinHashConfig(), BlockingConfig())
    pairs = candidate_pairs(blocks, BlockingConfig(), num_partitions=2).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(pairs["left_id"], pairs["right_id"])}

    lp = labeled_pairs_table(spec)
    li = doc_id_for_urls(lp["left_url"].to_pylist())
    ri = doc_id_for_urls(lp["right_url"].to_pylist())
    matches = lp["match"].to_pylist()
    pos = [(min(int(a), int(b)), max(int(a), int(b))) for a, b, m in zip(li, ri, matches) if m]
    recall = sum(p in got for p in pos) / len(pos)
    assert recall >= 0.98, f"blocking recall {recall}"
    # canonical ordering, no dups
    assert (pairs["left_id"] < pairs["right_id"]).all()
    assert not pairs.duplicated(["left_id", "right_id"]).any()


def test_hot_block_cap():
    # one giant block of 1000 docs + one small block
    n = 1000
    ids = np.arange(1, n + 1, dtype=np.int64) * 7
    blocks = pa.table(
        {
            "block_key": pa.array([123] * n + [456, 456], type=pa.int64()),
            "doc_id": pa.array(list(ids) + [5, 9], type=pa.int64()),
        }
    )
    ds = rd.from_arrow(blocks)
    cfg = BlockingConfig(max_block_size=50)
    strides = hot_block_strides(ds, 50)
    assert 123 in strides and strides[123] == 20 and 456 not in strides
    pairs = candidate_pairs(ds, cfg, num_partitions=2).to_pandas()
    # capped: kept docs ~ n/stride -> pairs ~ C(kept,2), far below C(1000,2)
    big_pairs = pairs[(pairs["left_id"] != 5) | (pairs["right_id"] != 9)]
    assert len(big_pairs) < 0.02 * (n * (n - 1) / 2)
    # the small block survives untrimmed
    assert ((pairs["left_id"] == 5) & (pairs["right_id"] == 9)).any()


def test_empty_text_docs_emit_no_band_keys():
    docs = rd.from_items(
        [
            {"doc_id": 1, "url": "u1", "title": "", "domain": "d", "text": "", "lang": None,
             "warc_ts": 0},
            {"doc_id": 2, "url": "u2", "title": "T", "domain": "d", "text": "hello world one two three", "lang": "en",
             "warc_ts": 0},
        ]
    )
    feats = compute_doc_features(docs, MinHashConfig(), TfidfConfig(), with_tfidf=False)
    blocks = emit_block_keys(feats, MinHashConfig(), BlockingConfig(use_title_key=True)).to_pandas()
    # doc 1: no bands (empty sig), no title key (empty title)
    assert 1 not in set(blocks["doc_id"])
    assert (blocks["doc_id"] == 2).sum() == MinHashConfig().num_bands + 1


def test_sorted_group_pairs_matches_bruteforce_across_boundaries():
    """Groups that straddle sorted-block boundaries (incl. one hot group wider
    than any single sorted block) must enumerate exactly the brute-force pair
    set — the head-run handoff in sorted_group_pairs is what's under test."""
    import collections
    import itertools

    from entity_resolution_pipeline_ray.stages.blocking import sorted_group_pairs

    rng = np.random.RandomState(0)
    keys = np.concatenate([rng.randint(0, 300, size=2000), np.full(1200, 7)])
    ids = np.arange(len(keys), dtype=np.int64)
    rng.shuffle(ids)
    tbl = pa.table({"block_key": pa.array(keys.astype(np.int64)), "doc_id": pa.array(ids)})
    got_t = sorted_group_pairs(rd.from_arrow(tbl).repartition(7)).to_pandas()
    got = set(zip(got_t["left_id"], got_t["right_id"]))

    groups = collections.defaultdict(list)
    for k, i in zip(keys, ids):
        groups[int(k)].append(int(i))
    exp = set()
    for lst in groups.values():
        exp.update(itertools.combinations(sorted(lst), 2))
    assert got == exp

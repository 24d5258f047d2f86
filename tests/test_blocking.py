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


def test_census_plans_pinned_equal():
    """Dual-plan discipline: the distributed sorted-groups census and the
    driver pandas census must produce identical stride maps AND identical
    candidate pair sets (the 100-TB plan is the same computation)."""
    rng = np.random.default_rng(7)
    n = 5000
    # power-law-ish key skew: a few hot keys + a long tail, multi-block input
    keys = np.concatenate(
        [
            np.full(900, 11, dtype=np.int64),
            np.full(300, 22, dtype=np.int64),
            rng.integers(1000, 3000, size=n, dtype=np.int64),
        ]
    )
    ids = rng.permutation(len(keys)).astype(np.int64) * 13 + 1
    tbl = pa.table({"block_key": pa.array(keys), "doc_id": pa.array(ids)})
    ds = rd.from_arrow(tbl).repartition(8)

    s_driver = hot_block_strides(ds, 100, census="driver")
    s_dist = hot_block_strides(ds, 100, census="distributed")
    assert s_driver == s_dist and 11 in s_driver and 22 in s_driver

    cfg = BlockingConfig(max_block_size=100)
    p_driver = candidate_pairs(ds, cfg, num_partitions=2, census="driver").to_pandas()
    p_dist = candidate_pairs(ds, cfg, num_partitions=2, census="distributed").to_pandas()
    a = {(int(l), int(r)) for l, r in zip(p_driver["left_id"], p_driver["right_id"])}
    b = {(int(l), int(r)) for l, r in zip(p_dist["left_id"], p_dist["right_id"])}
    assert a == b and len(a) > 0


def test_census_empty_input_both_plans():
    empty = pa.table(
        {"block_key": pa.array([], type=pa.int64()), "doc_id": pa.array([], type=pa.int64())}
    )
    ds = rd.from_arrow(empty)
    assert hot_block_strides(ds, 10, census="driver") == {}
    assert hot_block_strides(ds, 10, census="distributed") == {}


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


def test_sorted_group_pairs_pair_fn_fused():
    """pair_fn runs inside each enumeration task and replaces the raw id-pair
    output; the fused result must equal mapping the unfused pairs through the
    same function (the minhash fused-verify contract)."""
    from entity_resolution_pipeline_ray.stages.blocking import sorted_group_pairs

    rng = np.random.RandomState(3)
    keys = np.concatenate([rng.randint(0, 50, size=400), np.full(80, 9)])
    ids = np.arange(len(keys), dtype=np.int64)
    rng.shuffle(ids)
    tbl = pa.table({"block_key": pa.array(keys.astype(np.int64)), "doc_id": pa.array(ids)})

    def keep_even_sum(left, right):
        left = np.asarray(left, dtype=np.int64)
        right = np.asarray(right, dtype=np.int64)
        m = (left + right) % 2 == 0
        return pa.table(
            {
                "left_id": pa.array(left[m], type=pa.int64()),
                "right_id": pa.array(right[m], type=pa.int64()),
                "s": pa.array(left[m] + right[m], type=pa.int64()),
            }
        )

    ds = rd.from_arrow(tbl).repartition(5)
    fused = sorted_group_pairs(ds, pair_fn=keep_even_sum).to_pandas()
    raw = sorted_group_pairs(ds).to_pandas()
    exp = raw[(raw["left_id"] + raw["right_id"]) % 2 == 0].copy()
    exp["s"] = exp["left_id"] + exp["right_id"]
    key = ["left_id", "right_id"]
    f = fused.sort_values(key).reset_index(drop=True)
    e = exp.sort_values(key).reset_index(drop=True)
    assert len(f) == len(e) > 0
    assert (f[key + ["s"]].to_numpy() == e[key + ["s"]].to_numpy()).all()


def test_memo_dataset_caches_and_invalidates(ray_session):
    from entity_resolution_pipeline_ray.rayops import clear_dataset_memo, memo_dataset

    calls = []

    def build():
        calls.append(1)
        return rd.from_arrow(pa.table({"x": pa.array([1, 2, 3], type=pa.int64())}))

    clear_dataset_memo()
    a = memo_dataset(("t_memo", "k"), build)
    b = memo_dataset(("t_memo", "k"), build)
    assert len(calls) == 1 and a is b and b.count() == 3
    clear_dataset_memo()
    memo_dataset(("t_memo", "k"), build)
    assert len(calls) == 2


def test_map_sorted_groups_matches_pandas_groupby(ray_session):
    """map_sorted_groups must see every group exactly once and complete, no
    matter how groups straddle sorted-block boundaries (incl. one giant key
    spanning several blocks)."""
    import pandas as pd

    from entity_resolution_pipeline_ray.rayops import map_sorted_groups

    rng = np.random.RandomState(11)
    keys = np.concatenate([rng.randint(0, 40, size=600), np.full(500, 7)])
    vals = rng.randint(0, 1000, size=len(keys))
    tbl = pa.table({"k": pa.array(keys.astype(np.int64)), "v": pa.array(vals.astype(np.int64))})

    def summarize(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"k": pa.array([], type=pa.int64()),
                             "s": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        k = g["k"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], len(k)]
        return pa.table({"k": pa.array(k[starts], type=pa.int64()),
                         "s": pa.array([int(v[s:e].sum()) for s, e in zip(starts, ends)], type=pa.int64()),
                         "n": pa.array((ends - starts).astype(np.int64), type=pa.int64())})

    empty = summarize(tbl.slice(0, 0))
    got = (
        map_sorted_groups(rd.from_arrow(tbl).repartition(9), "k", summarize, empty)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    exp = (
        pd.DataFrame({"k": keys, "v": vals}).groupby("k", as_index=False)
        .agg(s=("v", "sum"), n=("v", "size")).sort_values("k").reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["k"].to_numpy() == exp["k"].to_numpy()).all()
    assert (got["s"].to_numpy() == exp["s"].to_numpy()).all()
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()
    # empty input keeps the schema (check the Dataset schema — an empty
    # Dataset's to_pandas() drops columns, a known Ray quirk)
    e = map_sorted_groups(rd.from_arrow(tbl.slice(0, 0)), "k", summarize, empty)
    assert e.schema().names == ["k", "s", "n"] and e.count() == 0


def test_sorted_group_pairs_multiset_mode(ray_session):
    """unique=False keeps one pair row per co-occurrence (the co-occurrence
    counting contract); unique=True collapses to the pair set."""
    import ray.data as rd

    from entity_resolution_pipeline_ray.stages.blocking import sorted_group_pairs

    # two groups both containing docs (1, 2): the pair (1,2) occurs twice
    t = pa.table(
        {"block_key": pa.array([10, 10, 20, 20, 20], type=pa.int64()),
         "doc_id": pa.array([1, 2, 1, 2, 3], type=pa.int64())}
    )
    ds = rd.from_arrow(t).repartition(3)
    multi = sorted_group_pairs(ds, unique=False).to_pandas()
    assert len(multi) == 1 + 3  # C(2,2 choose)=1 + C(3,2)=3
    assert ((multi["left_id"] == 1) & (multi["right_id"] == 2)).sum() == 2
    # unique=True is the IN-TASK combiner (global dedup is distinct_pairs'
    # job downstream): the pair set is right, cross-task dups may remain
    uniq = sorted_group_pairs(ds).to_pandas()
    assert set(zip(uniq["left_id"], uniq["right_id"])) == {(1, 2), (1, 3), (2, 3)}


def test_web_skew_torture_end_to_end(ray_session, tmp_path, monkeypatch):
    """Realistic web skew: ONE template dominates ~30% of the corpus (600 docs,
    over the fuzzy-dedup 500-doc block cap).  Asserts the three 100-TB blocking
    guarantees together (SURVEY §7.6 "Skew" — previously exercised only on
    uniform synthetic data):

    (a) the ``auto`` census bails to the distributed plan once its
        driver-state bound is exceeded (forced tiny here),
    (b) enumerated distinct pairs respect the per-block pair budget implied by
        the hot-block strides,
    (c) docs whose blocks are all under cap cluster EXACTLY as in an
        unstrided run — the budget is local to the hot blocks.
    """
    import pyarrow.parquet as pq

    from entity_resolution_pipeline_ray.config import ClusteringConfig
    from entity_resolution_pipeline_ray.pipelines import dedup as D
    from entity_resolution_pipeline_ray.stages import blocking as B
    from entity_resolution_pipeline_ray.stages.clustering import propagate_labels

    n, hot_n = 1200, 600
    rng = np.random.RandomState(11)
    template = " ".join(f"hotword{j}" for j in range(120))
    bg_words = np.array([f"bg{j}" for j in range(800)])
    texts = [f"{template} tail{i} uniq{i}" for i in range(hot_n)] + [
        " ".join(rng.choice(bg_words, size=60)) for _ in range(n - hot_n)
    ]
    # uniform int64 ids (the stride rule keeps ids % stride == 0, so id bits
    # must be hash-uniform — multiplicative hashing mirrors real doc_id hashes)
    ids = (
        ((np.arange(n, dtype=np.uint64) + np.uint64(1)) * np.uint64(0x9E3779B97F4A7C15))
        >> np.uint64(2)
    ).astype(np.int64)
    docs = pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts)})
    sf_dir = str(tmp_path)
    pq.write_table(docs, f"{sf_dir}/documents.parquet")

    # (a) force the auto census to bail to the distributed plan
    bails = []
    real_distributed = B._hot_from_distributed
    monkeypatch.setattr(B, "DRIVER_CENSUS_MAX_ROWS", 10)
    monkeypatch.setattr(
        B, "_hot_from_distributed", lambda *a, **k: (bails.append(1), real_distributed(*a, **k))[1]
    )

    out = D.dedup_apply_fuzzy(sf_dir, threshold=0.6).to_pandas()
    assert bails, "auto census did not bail to the distributed plan"
    assert len(out) == n and out["doc_id"].is_unique

    # rebuild the block stream to inspect strides/budgets directly
    cfg = MinHashConfig()
    sketches = D._doc_sketches(rd.from_arrow(docs), cfg).materialize()
    blocks = D._minhash_band_blocks(sketches, cfg).materialize()
    bdf = blocks.to_pandas()
    strides = B.hot_block_strides(blocks, 500, census="distributed")
    assert strides, "skew corpus produced no over-cap block"
    # auto (bailing) and distributed censuses agree exactly
    assert B.hot_block_strides(blocks, 500, census="auto") == strides

    # (b) distinct enumerated pairs <= sum over blocks of C(kept_b, 2)
    raw = B.candidate_pairs(blocks, BlockingConfig(max_block_size=500), num_partitions=4).to_pandas()
    budget = 0
    for k, grp in bdf.groupby("block_key")["doc_id"]:
        s = strides.get(int(k), 1)
        kept = int((grp.to_numpy() % s == 0).sum())
        budget += kept * (kept - 1) // 2
    uncapped_bound = sum(
        len(g) * (len(g) - 1) // 2 for _, g in bdf.groupby("block_key")["doc_id"]
    )
    assert len(raw) <= budget
    assert len(raw) < 0.5 * uncapped_bound, "capping did not reduce the pair count"

    # (c) under-cap docs cluster identically to the unstrided run
    uncapped = B.candidate_pairs(blocks, BlockingConfig(max_block_size=1 << 40), num_partitions=4)

    def to_edges(p):
        return p.map_batches(
            lambda t: pa.table({"src": t["left_id"], "dst": t["right_id"]}), batch_format="pyarrow"
        )

    ids_ds = rd.from_arrow(docs.select(["doc_id"]))
    capped_cl = propagate_labels(
        to_edges(rd.from_arrow(pa.Table.from_pandas(raw))), ids_ds, ClusteringConfig()
    ).to_pandas()
    uncapped_cl = propagate_labels(to_edges(uncapped), ids_ds, ClusteringConfig()).to_pandas()
    hot_keys = set(strides)
    hot_doc_ids = set(bdf[bdf["block_key"].isin(hot_keys)]["doc_id"].tolist())
    cm = {
        int(d): int(c)
        for d, c in zip(capped_cl["doc_id"], capped_cl["cluster_id"])
        if int(d) not in hot_doc_ids
    }
    um = {
        int(d): int(c)
        for d, c in zip(uncapped_cl["doc_id"], uncapped_cl["cluster_id"])
        if int(d) not in hot_doc_ids
    }
    assert cm == um and len(cm) > 0

"""Training-data sampling operators (pipelines/sampling.py) and the
distributed per-key head-K kernel (rayops.head_k_per_key)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from entity_resolution_pipeline_ray.rayops import head_k_per_key


def _expected_head_k(df: pd.DataFrame, key: str, order: str, k: int) -> pd.DataFrame:
    return (
        df.sort_values([key, order])
        .groupby(key, sort=True)
        .head(k)
        .sort_values([key, order])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("num_blocks", [1, 3, 7, 16])
def test_head_k_per_key_matches_pandas(ray_session, num_blocks):
    rng = np.random.default_rng(7)
    # skewed keys: one hot key far larger than any block, several tiny ones —
    # forces key runs to straddle (and fully span) sorted-block boundaries
    keys = np.concatenate(
        [np.full(500, "hot"), rng.choice(["a", "b", "c", "d"], size=120)]
    )
    order = rng.permutation(len(keys)).astype(np.int64)
    df = pd.DataFrame({"k": keys, "o": order, "payload": order * 3})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(num_blocks)
    got = (
        head_k_per_key(ds, "k", "o", 25)
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    exp = _expected_head_k(df, "k", "o", 25)
    pd.testing.assert_frame_equal(got[["k", "o", "payload"]], exp[["k", "o", "payload"]])


def test_head_k_per_key_k_larger_than_groups(ray_session):
    df = pd.DataFrame({"k": ["a", "a", "b"], "o": [2, 1, 5]})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = head_k_per_key(ds, "k", "o", 10).to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    assert len(got) == 3


def test_stratified_sample_is_deterministic_and_rate_shaped(ray_session):
    from entity_resolution_pipeline_ray.pipelines.sampling import (
        SAMPLE_RATES,
        q_stratified_sample,
    )

    sf = "/root/testdata/sf0.001"
    a = q_stratified_sample(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = q_stratified_sample(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # each kept doc's source rate must exceed its hash bucket — spot invariant
    from entity_resolution_pipeline_ray.functions.hashing import md5_u64
    from entity_resolution_pipeline_ray.pipelines.sampling import SAMPLE_RATE_DEFAULT

    for doc_id, src in zip(a["doc_id"][:200], a["source"][:200]):
        rate = SAMPLE_RATES.get(src, SAMPLE_RATE_DEFAULT)
        assert md5_u64(str(int(doc_id))) % 100 < rate


def test_lang_quantiles_match_numpy(ray_session):
    from entity_resolution_pipeline_ray.pipelines.sampling import q_lang_quantiles

    sf = "/root/testdata/sf0.001"
    got = q_lang_quantiles(sf).sort_values("lang").reset_index(drop=True)
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["lang", "n_chars"])
    for _, row in got.iterrows():
        vals = np.sort(docs.loc[docs["lang"] == row["lang"], "n_chars"].to_numpy())
        assert row["n_docs"] == len(vals)
        for q, col in ((0.5, "p50_chars"), (0.9, "p90_chars"), (0.99, "p99_chars")):
            assert row[col] == vals[max(int(np.ceil(len(vals) * q)) - 1, 0)]


def test_head_k_per_key_descending_topk(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {"k": rng.choice(["a", "b", "c"], 300), "v": rng.random(300),
         "id": np.arange(300, dtype=np.int64)}
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(5)
    got = (
        head_k_per_key(ds, "k", ["v", "id"], 4, descending=[True, False])
        .to_pandas()
        .sort_values(["k", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    exp = (
        df.sort_values(["k", "v", "id"], ascending=[True, False, True])
        .groupby("k")
        .head(4)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "v", "id"]], exp[["k", "v", "id"]])


# --------------------------------------------------- distributed prefix sum


@pytest.mark.parametrize("num_blocks", [1, 3, 16])
def test_exclusive_prefix_sum_matches_numpy(ray_session, num_blocks):
    from entity_resolution_pipeline_ray.rayops import exclusive_prefix_sum

    rng = np.random.default_rng(11)
    n = 400
    ids = rng.permutation(n).astype(np.int64)
    vals = rng.integers(0, 50, size=n).astype(np.int64)
    ds = rd.from_arrow(pa.table({"i": ids, "v": vals})).repartition(num_blocks)
    got = exclusive_prefix_sum(ds, "i", "v", "prev").to_pandas().sort_values("i")
    order = np.argsort(ids, kind="stable")
    exp = np.cumsum(vals[order]) - vals[order]
    assert np.array_equal(got["prev"].to_numpy(), exp)
    assert np.array_equal(got["v"].to_numpy(), vals[order])


def test_exclusive_prefix_sum_empty(ray_session):
    from entity_resolution_pipeline_ray.rayops import exclusive_prefix_sum

    ds = rd.from_arrow(pa.table({"i": pa.array([], type=pa.int64()), "v": pa.array([], type=pa.int64())}))
    out = exclusive_prefix_sum(ds, "i", "v", "prev")
    assert out.count() == 0
    # schema contract survives the zero-block path: out_col is present
    assert "prev" in out.schema().names


def _write_docs(tmp_path, rows: dict, langs=None):
    import pyarrow.parquet as pq

    langs = langs or ["en"] * len(rows)
    t = pa.table(
        {"doc_id": list(rows), "text": list(rows.values()), "lang": langs,
         "source": ["s"] * len(rows), "n_chars": [len(v) for v in rows.values()]}
    )
    pq.write_table(t, tmp_path / "documents.parquet")


def test_pack_sequences_greedy_boundaries(ray_session, tmp_path):
    from entity_resolution_pipeline_ray.pipelines.sampling import PACK_BUDGET, p_pack_sequences

    # doc i has 997*(i+1) % 1500 + 1 tokens (irregular, budget-straddling
    # sizes); shard = floor(prev_cum / budget)
    rows = {i: " ".join(["tok"] * (997 * (i + 1) % 1500 + 1)) for i in range(40)}
    _write_docs(tmp_path, rows)
    got = p_pack_sequences(str(tmp_path)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    n = np.array([len(rows[i].split()) for i in sorted(rows)], dtype=np.int64)
    prev = np.cumsum(n) - n
    assert np.array_equal(got["n_tokens"].to_numpy(), n)
    assert np.array_equal(got["shard_id"].to_numpy(), prev // PACK_BUDGET)
    # shards are contiguous in doc order and non-decreasing
    assert (np.diff(got["shard_id"].to_numpy()) >= 0).all()


def test_lang_balance_downsamples_to_min(ray_session, tmp_path):
    from entity_resolution_pipeline_ray.functions.hashing import md5_u64
    from entity_resolution_pipeline_ray.pipelines.sampling import p_lang_balance

    rows = {i: f"text {i}" for i in range(120)}
    # null langs form their own ''-keyed group (the null-consistent spec)
    langs = ["en"] * 80 + ["fr"] * 30 + ["de"] * 5 + [None] * 5
    _write_docs(tmp_path, rows, langs)
    got = p_lang_balance(str(tmp_path)).to_pandas()
    counts = {"en": 80, "fr": 30, "de": 5, "": 5}
    exp = {
        i for i, l in zip(sorted(rows), langs)
        if md5_u64(str(i)) % counts[l or ""] < 5
    }
    assert set(got["doc_id"]) == exp
    # the kept-set expectation: each lang keeps ~min_count docs (exact-count
    # equality is not guaranteed by hash-mod, but the minimum groups keep all)
    assert (got["lang"] == "de").sum() == 5
    assert (got["lang"] == "").sum() == 5


def test_importance_weights_favor_target_domain(tmp_path):
    """DSIR known-answer: on a corpus where the target domain (source='src0')
    uses a disjoint vocabulary, target docs must get strictly higher log
    importance weights than off-domain docs of the same length."""
    from entity_resolution_pipeline_ray.pipelines.sampling import p_importance_weights

    tgt_text = "alpha beta gamma delta alpha beta"
    raw_text = "omega sigma theta kappa omega sigma"
    docs = pa.table(
        {
            "doc_id": pa.array(range(12), type=pa.int64()),
            "text": pa.array([tgt_text if i % 3 == 0 else raw_text for i in range(12)]),
            "source": pa.array(["src0" if i % 3 == 0 else "src1" for i in range(12)]),
        }
    )
    import pyarrow.parquet as pq

    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = p_importance_weights(str(tmp_path)).to_pandas().set_index("doc_id")
    tgt = out.loc[[i for i in range(12) if i % 3 == 0], "log_weight"]
    rest = out.loc[[i for i in range(12) if i % 3 != 0], "log_weight"]
    assert tgt.min() > rest.max()


def test_temperature_mix_shape(ray_session, tmp_path):
    """alpha=0.5 rebalance: the rarest source keeps everything; kept counts
    track sqrt(c_min * c_s) within hash-mod noise."""
    from entity_resolution_pipeline_ray.pipelines.sampling import p_temperature_mix

    rows = {i: f"text {i}" for i in range(900)}
    langs = ["en"] * 900
    import pyarrow.parquet as pq

    t = pa.table(
        {"doc_id": pa.array(sorted(rows), type=pa.int64()),
         "text": [rows[i] for i in sorted(rows)], "lang": langs,
         "source": ["big"] * 800 + ["small"] * 100, "n_chars": [7] * 900}
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = p_temperature_mix(str(tmp_path)).to_pandas()
    kept = out[out["keep"]].groupby("source").size()
    assert kept["small"] == 100  # rarest kept whole
    expected_big = np.sqrt(100 * 800)  # ~283
    assert abs(kept["big"] - expected_big) < 60


@pytest.mark.parametrize("num_blocks", [1, 4, 9])
def test_kth_by_sort_matches_numpy(ray_session, num_blocks):
    from entity_resolution_pipeline_ray.rayops import kth_by_sort

    rng = np.random.default_rng(5)
    vals = np.round(rng.normal(size=501), 6)
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(num_blocks)
    s = np.sort(vals)
    ks = [0, 166, 333, 500]
    got = kth_by_sort(ds, "v", ks)
    assert got == [s[k] for k in ks]
    with pytest.raises(IndexError):
        kth_by_sort(ds, "v", [501])


# ------------------------------------------- segmented (keyed) prefix sum


@pytest.mark.parametrize("num_blocks", [1, 3, 16])
def test_keyed_exclusive_prefix_sum_matches_pandas(ray_session, num_blocks):
    from entity_resolution_pipeline_ray.rayops import keyed_exclusive_prefix_sum

    rng = np.random.default_rng(7)
    n = 500
    keys = rng.integers(0, 4, size=n).astype(np.int64)  # few keys → span blocks
    ids = rng.permutation(n).astype(np.int64)
    vals = rng.integers(0, 50, size=n).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": keys, "i": ids, "v": vals})).repartition(num_blocks)
    got = (
        keyed_exclusive_prefix_sum(ds, "k", "i", "v", "prev")
        .to_pandas()
        .sort_values(["k", "i"])
        .reset_index(drop=True)
    )
    exp = (
        pd.DataFrame({"k": keys, "i": ids, "v": vals})
        .sort_values(["k", "i"])
        .reset_index(drop=True)
    )
    exp["prev"] = exp.groupby("k")["v"].cumsum() - exp["v"]
    assert np.array_equal(got["prev"].to_numpy(), exp["prev"].to_numpy())
    assert np.array_equal(got["v"].to_numpy(), exp["v"].to_numpy())


def test_keyed_exclusive_prefix_sum_empty(ray_session):
    from entity_resolution_pipeline_ray.rayops import keyed_exclusive_prefix_sum

    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([], type=pa.int64()),
                "i": pa.array([], type=pa.int64()),
                "v": pa.array([], type=pa.int64()),
            }
        )
    )
    out = keyed_exclusive_prefix_sum(ds, "k", "i", "v", "prev")
    assert out.count() == 0
    assert "prev" in out.schema().names


def test_seeded_shuffle_is_permutation_and_seed_sensitive(ray_session, tmp_path):
    """shuffle_pos is a 1..N permutation, reproducible for a seed, and a
    different seed yields a different order (with overwhelming probability
    for 200 docs)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 200
    pq.write_table(
        pa.table({"doc_id": pa.array(range(n), type=pa.int64())}),
        tmp_path / "documents.parquet")
    from entity_resolution_pipeline_ray.pipelines.sampling import p_seeded_shuffle

    a = p_seeded_shuffle(str(tmp_path), seed=42).to_pandas().sort_values("doc_id")
    b = p_seeded_shuffle(str(tmp_path), seed=42).to_pandas().sort_values("doc_id")
    c = p_seeded_shuffle(str(tmp_path), seed=7).to_pandas().sort_values("doc_id")
    assert sorted(a["shuffle_pos"]) == list(range(1, n + 1))
    assert (a["shuffle_pos"].to_numpy() == b["shuffle_pos"].to_numpy()).all()
    assert (a["shuffle_pos"].to_numpy() != c["shuffle_pos"].to_numpy()).any()


def test_seeded_shuffle_empty_keeps_schema(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"doc_id": pa.array([], type=pa.int64())}), tmp_path / "documents.parquet")
    from entity_resolution_pipeline_ray.pipelines.sampling import p_seeded_shuffle

    out = p_seeded_shuffle(str(tmp_path)).to_pandas()
    assert list(out.columns) == ["doc_id", "shuffle_pos"] and out.empty

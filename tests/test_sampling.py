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

"""Deduplication suite over the ``documents`` table — the training-data-pipeline
operators layered on the same engine primitives as the ER flagship:

- exact dedup (hash-partition + per-group min) — reference A3
  (/root/reference/src/batch_parallel_preprocessing.py:280)
- MinHash+LSH near-dup (shingle → minhash → band → bucket groupby → verify)
- SimHash near-dup (bucket by hash prefix, verify by Hamming distance)
- n-gram Jaccard near-dup (exact verification inside candidate blocks)
- embedding-cosine near-dup (block by random-hyperplane LSH or brute-force)

Each returns a Dataset/table shaped for the driver's oracle comparison where
SQL can express the op; the sketch-based ops are rows-only checks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Count, Min

from ..config import BlockingConfig, MinHashConfig
from ..functions.hashing import MinHasher, band_keys, hamming64, simhash64, stable_u64
from ..functions.text import word_shingles, word_tokens
from ..stages.blocking import candidate_pairs


def _docs(sf_dir: str, columns=("doc_id", "text")):
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


# ----------------------------------------------------------------- sketch emission


def _doc_sketches(docs_ds, minhash_cfg: MinHashConfig):
    """(doc_id, minhash_sig) rows — stateless vectorized map."""

    def f(t: pa.Table) -> pa.Table:
        hasher = MinHasher(minhash_cfg.num_perm, minhash_cfg.seed)
        sigs = np.empty((len(t), minhash_cfg.num_perm), dtype=np.uint64)
        for i, x in enumerate(t["text"].to_pylist()):
            toks = word_tokens(x) if x else []
            sh = word_shingles(toks, minhash_cfg.shingle_size)
            sigs[i] = hasher.signature(
                stable_u64(np.asarray(sh, dtype=object)) if sh else np.empty(0, dtype=np.uint64)
            )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "minhash_sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.ravel(), type=pa.uint64()), minhash_cfg.num_perm
                ),
            }
        )

    return docs_ds.map_batches(f, batch_format="pyarrow")


def minhash_dup_pairs(sf_dir: str, threshold: float = 0.6, minhash_cfg: MinHashConfig | None = None):
    """MinHash-LSH near-duplicate pairs: band keys → block groupby self-join →
    signature-agreement verify >= threshold.  Returns (left_id, right_id,
    est_jaccard) with est_jaccard rounded for stability."""
    cfg = minhash_cfg or MinHashConfig()
    sketches = _doc_sketches(_docs(sf_dir), cfg).materialize()

    def emit_keys(t: pa.Table) -> pa.Table:
        n = len(t)
        sigs = np.asarray(t["minhash_sig"].combine_chunks().flatten().to_numpy(zero_copy_only=False)).reshape(
            n, cfg.num_perm
        )
        keys = (band_keys(sigs, cfg.num_bands) >> np.uint64(1)).astype(np.int64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        nonempty = ~(sigs == np.uint64(0xFFFFFFFFFFFFFFFF)).all(axis=1)
        return pa.table(
            {
                "block_key": pa.array(keys[nonempty].ravel(), type=pa.int64()),
                "doc_id": pa.array(np.repeat(ids[nonempty], cfg.num_bands), type=pa.int64()),
            }
        )

    blocks = sketches.map_batches(emit_keys, batch_format="pyarrow")
    pairs = candidate_pairs(blocks, BlockingConfig(max_block_size=500), num_partitions=4)

    sig_map_ref = ray.put(
        {
            int(r["doc_id"]): np.asarray(r["minhash_sig"], dtype=np.uint64)
            for r in sketches.take_all()
        }
    )

    def verify(t: pa.Table) -> pa.Table:
        sm = ray.get(sig_map_ref)
        li = t["left_id"].to_numpy(zero_copy_only=False)
        ri = t["right_id"].to_numpy(zero_copy_only=False)
        if len(li) == 0:
            return pa.table(
                {"left_id": pa.array([], type=pa.int64()), "right_id": pa.array([], type=pa.int64()),
                 "est_jaccard": pa.array([], type=pa.float64())}
            )
        sl = np.vstack([sm[int(x)] for x in li])
        sr = np.vstack([sm[int(x)] for x in ri])
        est = (sl == sr).mean(axis=1)
        keep = est >= threshold
        return pa.table(
            {
                "left_id": pa.array(li[keep], type=pa.int64()),
                "right_id": pa.array(ri[keep], type=pa.int64()),
                "est_jaccard": pa.array(np.round(est[keep], 4), type=pa.float64()),
            }
        )

    return pairs.map_batches(verify, batch_format="pyarrow")


def simhash_dup_pairs(sf_dir: str, max_hamming: int = 8):
    """SimHash near-dup: block on 16-bit hash prefixes (4 rotations so any pair
    within Hamming<=3 of a rotation collides; wider distances best-effort),
    verify by exact Hamming distance."""
    docs = _docs(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        toks = [word_tokens(x) if x else [] for x in t["text"].to_pylist()]
        sh = simhash64(toks)
        return pa.table({"doc_id": t["doc_id"], "simhash": pa.array(sh.astype(np.int64), type=pa.int64())})

    hashed = docs.map_batches(f, batch_format="pyarrow").materialize()

    def emit_keys(t: pa.Table) -> pa.Table:
        h = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keys, kids = [], []
        for rot in range(4):
            prefix = ((h >> np.uint64(16 * rot)) & np.uint64(0xFFFF)).astype(np.int64) | (rot << 17)
            keys.append(prefix)
            kids.append(ids)
        return pa.table(
            {
                "block_key": pa.array(np.concatenate(keys), type=pa.int64()),
                "doc_id": pa.array(np.concatenate(kids), type=pa.int64()),
            }
        )

    blocks = hashed.map_batches(emit_keys, batch_format="pyarrow")
    pairs = candidate_pairs(blocks, BlockingConfig(max_block_size=500), num_partitions=4)
    hmap_ref = ray.put({int(r["doc_id"]): np.uint64(r["simhash"]) for r in hashed.take_all()})

    def verify(t: pa.Table) -> pa.Table:
        hm = ray.get(hmap_ref)
        li = t["left_id"].to_numpy(zero_copy_only=False)
        ri = t["right_id"].to_numpy(zero_copy_only=False)
        if len(li) == 0:
            return pa.table({"left_id": pa.array([], type=pa.int64()), "right_id": pa.array([], type=pa.int64()),
                             "hamming": pa.array([], type=pa.int64())})
        hl = np.array([hm[int(x)] for x in li], dtype=np.uint64)
        hr = np.array([hm[int(x)] for x in ri], dtype=np.uint64)
        d = hamming64(hl, hr)
        keep = d <= max_hamming
        return pa.table(
            {
                "left_id": pa.array(li[keep], type=pa.int64()),
                "right_id": pa.array(ri[keep], type=pa.int64()),
                "hamming": pa.array(d[keep].astype(np.int64), type=pa.int64()),
            }
        )

    return pairs.map_batches(verify, batch_format="pyarrow")


def ngram_jaccard_dup_pairs(sf_dir: str, threshold: float = 0.5, shingle_size: int = 3):
    """Exact n-gram Jaccard near-dup: LSH candidates (high-recall geometry) then
    EXACT shingle-set Jaccard verification — the no-false-positives variant."""
    cfg = MinHashConfig(num_perm=128, num_bands=64, shingle_size=shingle_size)
    cand = minhash_dup_pairs(sf_dir, threshold=0.0, minhash_cfg=cfg)
    docs_pd = _docs(sf_dir).to_pandas()
    shingle_map = {}
    for did, text in zip(docs_pd["doc_id"], docs_pd["text"]):
        toks = word_tokens(text) if text else []
        shingle_map[int(did)] = set(word_shingles(toks, shingle_size))
    smap_ref = ray.put(shingle_map)

    def verify(t: pa.Table) -> pa.Table:
        sm = ray.get(smap_ref)
        li = t["left_id"].to_numpy(zero_copy_only=False)
        ri = t["right_id"].to_numpy(zero_copy_only=False)
        keep_l, keep_r, jac = [], [], []
        for a, b in zip(li, ri):
            sa, sb = sm.get(int(a), set()), sm.get(int(b), set())
            u = len(sa | sb)
            j = (len(sa & sb) / u) if u else 1.0
            if j >= threshold:
                keep_l.append(int(a))
                keep_r.append(int(b))
                jac.append(round(j, 6))
        return pa.table(
            {
                "left_id": pa.array(keep_l, type=pa.int64()),
                "right_id": pa.array(keep_r, type=pa.int64()),
                "jaccard": pa.array(jac, type=pa.float64()),
            }
        )

    return cand.map_batches(verify, batch_format="pyarrow")


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.3):
    """Embedding-cosine near-dup over the ``embeddings`` table: brute-force
    row-block × broadcast-matrix cosine (exact — the baseline the LSH-bucketed
    variant in similarity_search is measured against).  Returns
    (left_vec_id, right_vec_id) with cosine >= threshold, left < right."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    all_pd = emb.to_pandas()
    ids_all = all_pd["vec_id"].to_numpy(dtype=np.int64)
    mat = np.array(all_pd["embedding"].to_list(), dtype=np.float64)
    mat_n = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids_all, mat_n))

    def f(t: pa.Table) -> pa.Table:
        ids_a, m = ray.get(ref)
        ids_b = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vb = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        vb = vb / np.maximum(np.linalg.norm(vb, axis=1, keepdims=True), 1e-12)
        sims = vb @ m.T  # (batch, all)
        bi, ai = np.nonzero(sims >= threshold)
        lb, ra = ids_b[bi], ids_a[ai]
        keep = lb < ra
        return pa.table(
            {
                "left_vec_id": pa.array(lb[keep], type=pa.int64()),
                "right_vec_id": pa.array(ra[keep], type=pa.int64()),
            }
        )

    return emb.map_batches(f, batch_format="pyarrow", batch_size=1024)


EMBEDDING_DUP_SQL = """
SELECT a.vec_id AS left_vec_id, b.vec_id AS right_vec_id
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id AND list_cosine_similarity(a.embedding, b.embedding) >= 0.3
"""


def dedup_apply_exact(sf_dir: str):
    """End-to-end exact dedup: return the kept documents (min doc_id per
    normalized-content hash), demonstrating the filter-side of dedup."""
    from .text_analysis import _with_hash

    docs = _docs(sf_dir)
    keep = (
        docs.map_batches(_with_hash, batch_format="pyarrow")
        .groupby("text_hash")
        .aggregate(Min("doc_id", alias_name="doc_id"))
    )
    keep_ids = set(keep.to_pandas()["doc_id"].astype(np.int64))
    ref = ray.put(keep_ids)

    def f(t: pa.Table) -> pa.Table:
        ki = ray.get(ref)
        mask = pa.array([int(x) in ki for x in t["doc_id"].to_numpy(zero_copy_only=False)])
        return t.filter(mask)

    return docs.map_batches(f, batch_format="pyarrow")


DEDUP_APPLY_EXACT_SQL = """
SELECT doc_id, text FROM documents
WHERE doc_id IN (
  SELECT min(doc_id) FROM documents GROUP BY md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
"""

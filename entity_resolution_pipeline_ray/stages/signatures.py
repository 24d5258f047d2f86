"""Signatures stage: docs → doc_features with MinHash signatures and hashed
TF-IDF vectors.

Replaces the reference's Embedding + Indexing stages
(/root/reference/src/batch_parallel_embedding.py — OpenAI vectors per unique string;
/root/reference/src/batch_parallel_indexing.py — Weaviate HNSW) with self-contained
sketches: a MinHash signature per doc (list<uint64>, num_perm slots) and a
TF-IDF sparse vector over a corpus vocabulary.

Vocabulary/IDF construction is the one wide step here and follows the
pre-aggregate pattern: per-batch partial token document-frequencies →
``groupby(token).sum`` over the (much smaller) partials → top-N vocab →
``ray.put`` broadcast into the vectorizer actors.  At 100 TB the partials table
is ~vocab-sized per block, not corpus-sized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..config import MinHashConfig, TfidfConfig, scale_gate
from ..functions.hashing import MinHasher, stable_hex128, stable_u64
from ..functions.text import shingle_lists, token_lists_arrow

DOC_FEATURES_COLUMNS = [
    "doc_id",
    "url",
    "title",
    "domain",
    "token_count",
    "minhash_sig",
    "tfidf_idx",
    "tfidf_val",
]


def token_df_partials(batch: pa.Table) -> pa.Table:
    """Per-batch partial document frequencies: one (token, df) row per distinct
    token per batch — the combiner half of the df groupby.  One Arrow
    tokenize + dictionary-encode pass; dfs are a unique count over the
    (doc, token-code) int pairs, no per-row Python."""
    flat, offs = token_lists_arrow(batch["text"])
    if len(flat) == 0:
        return pa.table({"token": pa.array([], type=pa.string()), "df": pa.array([], type=pa.int64())})
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(offs) - 1, dtype=np.int64), np.diff(offs))
    n_dict = len(enc.dictionary)
    pair = doc_idx * n_dict + codes
    dfs = np.bincount(np.unique(pair) % n_dict, minlength=n_dict)
    return pa.table(
        {"token": enc.dictionary, "df": pa.array(dfs, type=pa.int64())}
    )


def build_vocabulary(
    docs_ds, cfg: TfidfConfig, num_docs: int, *, driver_merge_threshold: int = 2_000_000
) -> dict:
    """Corpus vocabulary: token → (index, idf).

    Per-batch partial dfs stream out of the workers either into a driver-side
    pandas merge (below ``driver_merge_threshold`` docs — Ray's hash-aggregate
    finalizer runs at ~10-15k groups/s, so the groupby costs seconds of fixed
    time pandas does in milliseconds) or into the distributed
    ``groupby(token).sum`` (the at-scale plan — driver memory is bounded by
    the global distinct-token count otherwise).  Truncation at vocab_size is
    deterministic in BOTH plans: ties at the boundary break by (-df, token),
    not partition order."""
    partials = docs_ds.map_batches(token_df_partials, batch_format="pyarrow", batch_size=1024)
    if num_docs <= scale_gate(driver_merge_threshold):
        frames = [b.to_pandas() for b in partials.iter_batches(batch_size=1 << 20, batch_format="pyarrow")]
        if frames:
            top = pd.concat(frames).groupby("token", sort=False)["df"].sum().reset_index()
        else:
            top = pd.DataFrame({"token": [], "df": []})
    else:
        from ray.data.aggregate import Sum

        df_tbl = partials.groupby("token").aggregate(Sum("df", alias_name="df"))
        # secondary sort key BEFORE the limit: without it, which of the tokens
        # tied in df at the vocab_size boundary survive depends on partition
        # order (breaks the reproducible-from-config contract)
        top = df_tbl.sort(["df", "token"], descending=[True, False]).limit(cfg.vocab_size).to_pandas()
    top = top[top["df"] >= cfg.min_df]
    # deterministic index assignment: sort by (-df, token)
    top = (
        top.sort_values(["df", "token"], ascending=[False, True])
        .head(cfg.vocab_size)
        .reset_index(drop=True)
    )
    idf = np.log((1.0 + num_docs) / (1.0 + top["df"].to_numpy())) + 1.0
    return {tok: (i, float(idf[i])) for i, tok in enumerate(top["token"])}


def _text_features(texts, hasher: MinHasher, shingle_size: int, vocab: dict):
    """Text-derived features for a batch of texts: (token_counts, sigs,
    tf_idx list, tf_val list).  Pure function of the text — the unit the
    interned path computes once per UNIQUE text.

    Batch kernels end-to-end: one Arrow tokenize/shingle pass, one vocab
    lookup per DISTINCT token (dictionary encode), per-doc TF sums via
    ``np.bincount`` with weights — which accumulates each bin in occurrence
    order, bit-identical to the scalar dict-accumulation it replaced (pinned
    by test_signatures_vectorized_matches_scalar)."""
    col = (
        texts
        if isinstance(texts, (pa.Array, pa.ChunkedArray))
        else pa.array(list(texts), type=pa.string())
    )
    flat, offs = token_lists_arrow(col)
    n = len(offs) - 1
    token_counts = np.diff(offs).astype(np.int64)
    sh_flat, sh_offs = shingle_lists(flat, offs, shingle_size)
    sh_h = (
        stable_u64(sh_flat.to_numpy(zero_copy_only=False))
        if len(sh_flat)
        else np.empty(0, dtype=np.uint64)
    )
    sigs = np.empty((n, hasher.num_perm), dtype=np.uint64)
    for i in range(n):
        sigs[i] = hasher.signature(sh_h[sh_offs[i] : sh_offs[i + 1]])
    # hashed-vocab TF-IDF (sparse, L2-normalized); vocab gives (index, idf)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    dict_toks = enc.dictionary.to_pylist()
    u_idx = np.zeros(len(dict_toks), dtype=np.int64)  # vocab index + 1; 0 = OOV
    u_idf = np.zeros(len(dict_toks), dtype=np.float64)
    for j, tok in enumerate(dict_toks):
        ent = vocab.get(tok)
        if ent is not None:
            u_idx[j] = ent[0] + 1
            u_idf[j] = ent[1]
    codes = enc.indices.to_numpy(zero_copy_only=False) if len(flat) else np.empty(0, dtype=np.int32)
    tok_vidx = u_idx[codes]
    tok_idf = u_idf[codes]
    tf_idx: list[np.ndarray] = []
    tf_val: list[np.ndarray] = []
    empty_idx = np.empty(0, dtype=np.uint32)
    empty_val = np.empty(0, dtype=np.float32)
    for i in range(n):
        vi = tok_vidx[offs[i] : offs[i + 1]]
        m = vi > 0
        if not m.any():
            tf_idx.append(empty_idx)
            tf_val.append(empty_val)
            continue
        uv, inv = np.unique(vi[m] - 1, return_inverse=True)
        sums = np.bincount(inv, weights=tok_idf[offs[i] : offs[i + 1]][m])
        val = sums.astype(np.float32)
        norm = float(np.linalg.norm(val))
        if norm > 0:
            val = val / norm
        tf_idx.append(uv.astype(np.uint32))
        tf_val.append(val)
    return token_counts, sigs, tf_idx, tf_val


class SignatureVectorizer:
    """Actor-pool stage: holds MinHash permutations + broadcast vocabulary warm
    (setup once per actor — the reference's per-worker-client pattern,
    /root/reference/src/batch_parallel_querying.py:406-418) and emits doc_features rows.
    """

    def __init__(self, minhash_cfg: MinHashConfig, vocab_ref):
        self.hasher = MinHasher(minhash_cfg.num_perm, minhash_cfg.seed)
        self.shingle_size = minhash_cfg.shingle_size
        self.vocab = ray.get(vocab_ref) if vocab_ref is not None else {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        token_counts, sigs, tf_idx, tf_val = _text_features(
            texts, self.hasher, self.shingle_size, self.vocab
        )
        return pa.Table.from_arrays(
            [
                batch["doc_id"].combine_chunks() if isinstance(batch["doc_id"], pa.ChunkedArray) else batch["doc_id"],
                batch["url"].combine_chunks() if isinstance(batch["url"], pa.ChunkedArray) else batch["url"],
                batch["title"].combine_chunks() if isinstance(batch["title"], pa.ChunkedArray) else batch["title"],
                batch["domain"].combine_chunks() if isinstance(batch["domain"], pa.ChunkedArray) else batch["domain"],
                pa.array(token_counts, type=pa.int64()),
                pa.FixedSizeListArray.from_arrays(pa.array(sigs.ravel(), type=pa.uint64()), self.hasher.num_perm),
                pa.array([x for x in tf_idx], type=pa.list_(pa.uint32())),
                pa.array([x for x in tf_val], type=pa.list_(pa.float32())),
            ],
            names=DOC_FEATURES_COLUMNS,
        )


class TextFeatureVectorizer:
    """Actor-pool stage for the INTERNED path: text-derived features per unique
    text, keyed by content hash, list payloads packed to join-safe binary."""

    def __init__(self, minhash_cfg: MinHashConfig, vocab_ref):
        self.hasher = MinHasher(minhash_cfg.num_perm, minhash_cfg.seed)
        self.shingle_size = minhash_cfg.shingle_size
        self.vocab = ray.get(vocab_ref) if vocab_ref is not None else {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..rayops import pack_matrix, pack_ragged

        token_counts, sigs, tf_idx, tf_val = _text_features(
            batch["text"].to_pylist(), self.hasher, self.shingle_size, self.vocab
        )
        return pa.table(
            {
                "text_hash": batch["text_hash"],
                "token_count": pa.array(token_counts, type=pa.int64()),
                "sig_bin": pack_matrix(sigs),
                "tfi_bin": pack_ragged(tf_idx),
                "tfv_bin": pack_ragged(tf_val),
            }
        )


def _with_text_hash(batch: pa.Table) -> pa.Table:
    """Append a 128-bit content hash of the raw text (interning key) as a
    32-char hex string — sortable/joinable, and collision-safe at the multi-
    billion-document scales the interning plan targets (a 63-bit key has
    expected birthday collisions around ~3e9 docs, and the failure — two
    distinct texts silently sharing features — is invisible)."""
    texts = np.asarray(batch["text"].to_pylist(), dtype=object)
    texts = np.where(texts == None, "", texts)  # noqa: E711 — elementwise None test
    return batch.append_column("text_hash", pa.array(stable_hex128(texts), type=pa.string()))


def estimate_duplicate_fraction(docs_ds, num_docs: int, k: int = 1024) -> float:
    """Exact-duplicate fraction estimate via a bottom-k distinct-count sketch
    over content hashes: one cheap map pass, k smallest hashes per batch,
    tiny driver merge.  D ≈ (k-1)·2^63 / kth-smallest; error ~1/sqrt(k)."""

    def bottomk(t: pa.Table) -> pa.Table:
        texts = np.asarray(t["text"].to_pylist(), dtype=object)
        texts = np.where(texts == None, "", texts)  # noqa: E711
        h = np.unique((stable_u64(texts) >> np.uint64(1)).astype(np.int64))
        if len(h) > k:
            h = np.partition(h, k - 1)[:k]
        return pa.table({"h": pa.array(h, type=pa.int64())})

    parts = [
        b["h"].to_numpy(zero_copy_only=False)
        for b in docs_ds.select_columns(["text"])
        .map_batches(bottomk, batch_format="pyarrow")
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    ]
    merged = np.unique(np.concatenate(parts)) if parts else np.empty(0, dtype=np.int64)
    if len(merged) < k:
        distinct = float(len(merged))
    else:
        kth = float(np.partition(merged, k - 1)[k - 1])
        distinct = (k - 1) * float(2**63) / max(kth, 1.0)
    return max(0.0, 1.0 - distinct / max(1, num_docs))


def compute_doc_features(
    docs_ds,
    minhash_cfg: MinHashConfig,
    tfidf_cfg: TfidfConfig,
    *,
    concurrency: int = 4,
    batch_size: int = 512,
    with_tfidf: bool = True,
    intern: str = "auto",
    intern_min_dup_fraction: float = 0.10,
    intern_min_docs: int = 50_000,
    vocab: dict | None = None,
):
    """docs → doc_features.

    ``intern`` controls string interning (reference parity: unique strings are
    deduplicated before embedding, /root/reference/src/batch_parallel_preprocessing.py:280
    + /root/reference/src/batch_parallel_embedding.py:108-116):
    - "auto" (default): a bottom-k sketch estimates the exact-duplicate
      fraction; when >= ``intern_min_dup_fraction`` AND the corpus has at
      least ``intern_min_docs`` rows, the signature/TF-IDF work runs once per
      UNIQUE text and fans back out by content hash — the win on
      boilerplate-heavy web corpora.  Below either bound, the direct path:
      the interned plan pays ~4 fixed pipeline barriers (hash materialize,
      rep sort, rep vectorize, fan-out join — seconds of stage latency
      regardless of data size), while the work it saves is proportional to
      corpus size × dup fraction, so small corpora lose at ANY dup fraction.
    - "always" / "never": force the plan (tests pin both paths identical).
    """
    num_docs = None
    vocab_ref = None
    if with_tfidf:
        num_docs = docs_ds.count()
        if vocab is None:
            # vocabulary/IDF over ALL docs (duplicates count toward df — a
            # corpus statistic), identical in both plans.  A caller may pass a
            # PINNED vocab instead (incremental append: new docs are
            # featurized with the base run's frozen vocabulary/IDF, the
            # production pinned-featurizer discipline).
            vocab = build_vocabulary(docs_ds, tfidf_cfg, max(1, num_docs))
        vocab_ref = ray.put(vocab)

    use_intern = intern == "always"
    if intern == "auto":
        if num_docs is None:
            num_docs = docs_ds.count()
        use_intern = num_docs >= intern_min_docs and (
            estimate_duplicate_fraction(docs_ds, num_docs) >= intern_min_dup_fraction
        )

    def _task_map(vectorizer_cls, cache_tag):
        # task-based map with per-worker-process warm state (scoring._PROC_CACHE):
        # same warm-setup economics as an actor pool, without pool-minimum
        # scheduling constraints or per-stage actor ramp
        from .scoring import _cached_build

        key = (cache_tag, vocab_ref.hex() if vocab_ref is not None else None,
               minhash_cfg.num_perm, minhash_cfg.seed, minhash_cfg.shingle_size)

        def vectorize(batch):
            v = _cached_build(key, lambda: vectorizer_cls(minhash_cfg, vocab_ref))
            return v(batch)

        return vectorize

    if not use_intern:
        return docs_ds.map_batches(
            _task_map(SignatureVectorizer, "sigvec"),
            batch_format="pyarrow",
            batch_size=batch_size,
        )

    # ---- interned plan: hash → unique reps → vectorize once → fan-out join
    from ..rayops import adaptive_partitions, first_per_key, safe_join, unpack_matrix, unpack_ragged

    hashed = docs_ds.map_batches(_with_text_hash, batch_format="pyarrow").materialize()
    if num_docs is None:
        num_docs = hashed.count()
    reps = first_per_key(hashed.select_columns(["text_hash", "text"]), "text_hash")
    rep_feats = reps.map_batches(
        _task_map(TextFeatureVectorizer, "textvec"),
        batch_format="pyarrow",
        batch_size=batch_size,
    ).materialize()  # barrier before the fan-out join shuffle
    slim = hashed.select_columns(["doc_id", "url", "title", "domain", "text_hash"])
    joined = safe_join(
        slim,
        rep_feats,
        num_partitions=adaptive_partitions(num_docs),
        on=("text_hash",),
        right_on=("text_hash",),
    )
    num_perm = minhash_cfg.num_perm

    def unpack(t: pa.Table) -> pa.Table:
        sigs = unpack_matrix(t["sig_bin"], np.uint64, num_perm)
        tfi = unpack_ragged(t["tfi_bin"], np.uint32)
        tfv = unpack_ragged(t["tfv_bin"], np.float32)
        return pa.Table.from_arrays(
            [
                t["doc_id"].combine_chunks() if isinstance(t["doc_id"], pa.ChunkedArray) else t["doc_id"],
                t["url"].combine_chunks() if isinstance(t["url"], pa.ChunkedArray) else t["url"],
                t["title"].combine_chunks() if isinstance(t["title"], pa.ChunkedArray) else t["title"],
                t["domain"].combine_chunks() if isinstance(t["domain"], pa.ChunkedArray) else t["domain"],
                t["token_count"].combine_chunks() if isinstance(t["token_count"], pa.ChunkedArray) else t["token_count"],
                pa.FixedSizeListArray.from_arrays(pa.array(sigs.ravel(), type=pa.uint64()), num_perm),
                pa.array(list(tfi), type=pa.list_(pa.uint32())),
                pa.array(list(tfv), type=pa.list_(pa.float32())),
            ],
            names=DOC_FEATURES_COLUMNS,
        )

    return joined.map_batches(unpack, batch_format="pyarrow")

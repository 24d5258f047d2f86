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

import ray

from ..config import MinHashConfig, TfidfConfig
from ..functions.hashing import MinHasher, stable_u64
from ..functions.text import word_shingles, word_tokens

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
    token per batch — the combiner half of the df groupby."""
    counts: dict[str, int] = {}
    for t in batch["text"].to_pylist():
        if not t:
            continue
        for tok in set(word_tokens(t)):
            counts[tok] = counts.get(tok, 0) + 1
    if not counts:
        return pa.table({"token": pa.array([], type=pa.string()), "df": pa.array([], type=pa.int64())})
    return pa.table({"token": list(counts.keys()), "df": pa.array(list(counts.values()), type=pa.int64())})


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
    if num_docs <= driver_merge_threshold:
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
        n = len(texts)
        sigs = np.empty((n, self.hasher.num_perm), dtype=np.uint64)
        tf_idx: list[np.ndarray] = []
        tf_val: list[np.ndarray] = []
        token_counts = np.zeros(n, dtype=np.int64)
        for i, t in enumerate(texts):
            toks = word_tokens(t) if t else []
            token_counts[i] = len(toks)
            sh = word_shingles(toks, self.shingle_size)
            sigs[i] = self.hasher.signature(
                stable_u64(np.asarray(sh, dtype=object)) if sh else np.empty(0, dtype=np.uint64)
            )
            # hashed-vocab TF-IDF (sparse, L2-normalized)
            tf: dict[int, float] = {}
            for tok in toks:
                ent = self.vocab.get(tok)
                if ent is not None:
                    tf[ent[0]] = tf.get(ent[0], 0.0) + ent[1]
            if tf:
                idx = np.fromiter(tf.keys(), dtype=np.uint32, count=len(tf))
                val = np.fromiter(tf.values(), dtype=np.float32, count=len(tf))
                order = np.argsort(idx)
                idx, val = idx[order], val[order]
                norm = float(np.linalg.norm(val))
                if norm > 0:
                    val = val / norm
            else:
                idx = np.empty(0, dtype=np.uint32)
                val = np.empty(0, dtype=np.float32)
            tf_idx.append(idx)
            tf_val.append(val)
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


def compute_doc_features(
    docs_ds,
    minhash_cfg: MinHashConfig,
    tfidf_cfg: TfidfConfig,
    *,
    concurrency: int = 4,
    batch_size: int = 512,
    with_tfidf: bool = True,
):
    """docs → doc_features.  Two passes when with_tfidf: (1) vocabulary shuffle,
    (2) actor-pool vectorize.  The docs input is consumed twice, so callers
    should pass a (cheap) re-creatable or materialized small Dataset."""
    vocab_ref = None
    if with_tfidf:
        num_docs = docs_ds.count()
        vocab = build_vocabulary(docs_ds, tfidf_cfg, max(1, num_docs))
        vocab_ref = ray.put(vocab)
    from ..rayops import actor_num_cpus, actor_pool_bounds

    return docs_ds.map_batches(
        SignatureVectorizer,
        fn_constructor_args=(minhash_cfg, vocab_ref),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=actor_pool_bounds(concurrency),
        num_cpus=actor_num_cpus(),
    )

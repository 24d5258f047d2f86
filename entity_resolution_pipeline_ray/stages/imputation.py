"""Hot-deck imputation by blocking neighborhood.

Reference analog: the Imputator stage (/root/reference/src/batch_parallel_imputation.py)
— for records with null `provision`/`subjects` it fetched the record's vector
(:409-442), ran ANN over the target field (:444-491), and filled the value by
one of three methods (:494-539): 'average' (A6 mode of candidates), 'weighted'
(A7 similarity-weighted), 'nearest'.

Ray-native re-expression: a doc with a null field finds its candidates in the
blocks it already shares (the LSH neighborhood replaces the ANN query — same
substitution as candidate generation), similarity = MinHash agreement, and the
fill is computed per group inside the block-join, no point lookups:

    nulls(doc_id)  ⋈ blocks → (block_key, doc_id)
                   ⋈ blocks of non-null donors → (doc_id, donor_id, donor_value)
    groupby(doc_id) → mode / similarity-weighted / nearest donor value

Implemented with the broadcast pattern (donor payloads are the small side at
imputation time: only docs sharing a block with a null doc matter).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..config import BlockingConfig, MinHashConfig
from ..functions.similarity import minhash_agreement
from ..stages.blocking import emit_block_keys


def impute_field(
    doc_features_ds,
    docs_ds,
    field: str,
    minhash_cfg: MinHashConfig,
    blocking_cfg: BlockingConfig,
    *,
    method: str = "average",
    max_candidates: int = 10,
    min_similarity: float = 0.30,
):
    """Fill null ``field`` values from block-neighborhood donors.

    method: 'average' = modal candidate value (reference :520-539),
    'weighted' = similarity-weighted vote (:503-523), 'nearest' = single most
    similar donor.  max_candidates / min_similarity mirror the reference config
    (/root/reference/config.yml:70-72: max_candidates=10, similarity >= 0.30).

    Returns a Dataset (doc_id, imputed_<field>, n_donors) for docs whose field
    was null and had at least one qualifying donor.
    """
    import pyarrow.compute as pc

    if method not in ("average", "weighted", "nearest"):
        raise ValueError(f"unknown imputation method {method!r}")

    # target docs: null/empty field value
    field_tbl = docs_ds.select_columns(["doc_id", field]).to_pandas()
    null_mask = field_tbl[field].isna() | (field_tbl[field] == "")
    null_ids = set(field_tbl.loc[null_mask, "doc_id"].astype("int64"))
    donor_values = dict(
        zip(field_tbl.loc[~null_mask, "doc_id"].astype("int64"), field_tbl.loc[~null_mask, field])
    )
    if not null_ids:
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], type=pa.int64()),
                      f"imputed_{field}": pa.array([], type=pa.string()),
                      "n_donors": pa.array([], type=pa.int64())})
        )

    blocks = emit_block_keys(doc_features_ds, minhash_cfg, blocking_cfg).materialize()
    # keep the driver working set proportional to the NULL set, not the corpus:
    # (1) find the block keys that contain a null doc (distributed filter,
    # broadcast null-id set); (2) pull only those neighborhoods
    null_ref = ray.put(null_ids)

    def null_block_keys(t: pa.Table) -> pa.Table:
        ns = ray.get(null_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        mask = pa.array([int(d) in ns for d in ids])
        return t.filter(mask).select(["block_key"])

    nb_keys = set(
        blocks.map_batches(null_block_keys, batch_format="pyarrow").to_pandas()["block_key"].astype("int64")
    )
    nbk_ref = ray.put(nb_keys)

    def in_null_blocks(t: pa.Table) -> pa.Table:
        ks = ray.get(nbk_ref)
        keys = t["block_key"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array([int(k) in ks for k in keys]))

    bdf = blocks.map_batches(in_null_blocks, batch_format="pyarrow").to_pandas()
    bdf["is_null_doc"] = bdf["doc_id"].astype("int64").isin(null_ids)
    # candidate donors per null doc: co-blocked non-null docs
    cand: dict[int, set[int]] = {}
    for _, grp in bdf.groupby("block_key", sort=False):
        nulls = grp.loc[grp["is_null_doc"], "doc_id"].astype("int64")
        donors = grp.loc[~grp["is_null_doc"], "doc_id"].astype("int64")
        if len(nulls) == 0 or len(donors) == 0:
            continue
        dset = set(int(d) for d in donors if int(d) in donor_values)
        if not dset:
            continue
        for nd in nulls:
            cand.setdefault(int(nd), set()).update(dset)

    # similarity from signatures (broadcast payload of involved docs only)
    involved = set(cand.keys())
    for s in cand.values():
        involved |= s
    sig_map: dict[int, np.ndarray] = {}
    for b in doc_features_ds.select_columns(["doc_id", "minhash_sig"]).iter_batches(
        batch_size=4096, batch_format="pyarrow"
    ):
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        num_perm = b.schema.field("minhash_sig").type.list_size
        sigs = np.asarray(b["minhash_sig"].combine_chunks().flatten().to_numpy(zero_copy_only=False)).reshape(
            len(b), num_perm
        )
        for i, d in enumerate(ids):
            if int(d) in involved:
                sig_map[int(d)] = sigs[i]

    rows_doc, rows_val, rows_n = [], [], []
    for nd, donors in sorted(cand.items()):
        dlist = sorted(donors)
        sig_n = sig_map.get(nd)
        if sig_n is None:
            continue
        sims = np.array(
            [minhash_agreement(sig_n[None, :], sig_map[d][None, :])[0] if d in sig_map else 0.0 for d in dlist]
        )
        keep = sims >= min_similarity
        dlist = [d for d, k in zip(dlist, keep) if k]
        sims = sims[keep]
        if not dlist:
            continue
        if len(dlist) > max_candidates:
            order = np.argsort(-sims, kind="mergesort")[:max_candidates]
            dlist = [dlist[i] for i in order]
            sims = sims[order]
        vals = [donor_values[d] for d in dlist]
        if method == "nearest":
            best = int(np.argmax(sims))
            fill = vals[best]
        elif method == "weighted":
            scores: dict[str, float] = {}
            for v, s in zip(vals, sims):
                scores[v] = scores.get(v, 0.0) + float(s)
            fill = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        else:  # average -> mode, ties to lexicographically smallest (deterministic)
            counts: dict[str, int] = {}
            for v in vals:
                counts[v] = counts.get(v, 0) + 1
            fill = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        rows_doc.append(nd)
        rows_val.append(fill)
        rows_n.append(len(dlist))

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(rows_doc, type=pa.int64()),
                f"imputed_{field}": pa.array(rows_val, type=pa.string()),
                "n_donors": pa.array(rows_n, type=pa.int64()),
            }
        )
    )

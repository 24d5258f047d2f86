"""Hot-deck imputation by blocking neighborhood.

Reference analog: the Imputator stage (/root/reference/src/batch_parallel_imputation.py)
— for records with null `provision`/`subjects` it fetched the record's vector
(:409-442), ran ANN over the target field (:444-491), and filled the value by
one of three methods (:494-539): 'average' (A6 mode of candidates), 'weighted'
(A7 similarity-weighted), 'nearest'.

Ray-native re-expression, fully distributed: a doc with a null field finds its
candidates in the blocks it already shares (the LSH neighborhood replaces the
ANN query — same substitution as candidate generation), similarity = MinHash
agreement, and the fill is computed per null doc in boundary-aware sorted
block tasks (``rayops.map_sorted_groups`` — no hash shuffle):

    blocks restricted to null blocks
      → per-block null × donor edges (sorted block tasks over block_key)
      → sort-based distinct edges (a pair repeats once per shared band)
      → payload attach via hash joins (sig for both sides, donor value)
      → per-null-doc top-k + fill (sorted block tasks over doc_id)

Driver state is limited to ID SETS proportional to the null set (null doc ids,
null block keys, involved doc ids) — broadcast for pruning filters.  Payloads
(signatures, donor values) never leave the object store; the per-group fill
runs distributed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..config import BlockingConfig, MinHashConfig
from ..functions.similarity import minhash_agreement
from ..stages.blocking import distinct_pairs, emit_block_keys

def _empty_result_table(field: str) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            f"imputed_{field}": pa.array([], type=pa.string()),
            "n_donors": pa.array([], type=pa.int64()),
        }
    )


def _empty_result(field: str):
    return ray.data.from_arrow(_empty_result_table(field))


def _member_mask(ids: np.ndarray, sorted_set: np.ndarray) -> np.ndarray:
    if len(sorted_set) == 0:
        return np.zeros(len(ids), dtype=bool)
    pos = np.clip(np.searchsorted(sorted_set, ids), 0, len(sorted_set) - 1)
    return sorted_set[pos] == ids


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

    from ..rayops import (
        adaptive_partitions,
        attach_pair_sides,
        map_sorted_groups,
        pack_matrix,
        safe_join,
        unpack_matrix,
    )

    if method not in ("average", "weighted", "nearest"):
        raise ValueError(f"unknown imputation method {method!r}")

    # 1. target docs: null/empty field — DISTRIBUTED filter, only the null IDS
    #    come to the driver
    def null_rows(t: pa.Table) -> pa.Table:
        col = t[field]
        mask = pc.or_kleene(pc.is_null(col), pc.equal(col, ""))
        return t.filter(pc.fill_null(mask, True)).select(["doc_id"])

    nulls_parts = [
        b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        for b in docs_ds.select_columns(["doc_id", field])
        .map_batches(null_rows, batch_format="pyarrow")
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    ]
    null_ids_np = np.sort(np.concatenate(nulls_parts)) if nulls_parts else np.empty(0, dtype=np.int64)
    if len(null_ids_np) == 0:
        return _empty_result(field)

    blocks = emit_block_keys(doc_features_ds, minhash_cfg, blocking_cfg).materialize()
    # 2. block keys containing a null doc (distributed filter, null-set broadcast)
    null_ref = ray.put(null_ids_np)

    def null_block_keys(t: pa.Table) -> pa.Table:
        ns = ray.get(null_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(_member_mask(ids, ns))).select(["block_key"])

    nbk_parts = [
        b["block_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        for b in blocks.map_batches(null_block_keys, batch_format="pyarrow").iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        )
    ]
    nb_keys = np.unique(np.concatenate(nbk_parts)) if nbk_parts else np.empty(0, dtype=np.int64)
    if len(nb_keys) == 0:
        return _empty_result(field)
    nbk_ref = ray.put(nb_keys)

    # 3. restrict the block table to null blocks (distributed filter)
    def in_null_blocks(t: pa.Table) -> pa.Table:
        ks = ray.get(nbk_ref)
        keys = t["block_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(_member_mask(keys, ks)))

    blocks_f = blocks.map_batches(in_null_blocks, batch_format="pyarrow")

    # 4. per-block null × donor candidate edges — range-sort by block_key +
    #    boundary-aware block tasks (rayops.map_sorted_groups), NOT a hash
    #    groupby: the null-block table is null-neighborhood-proportional but
    #    its group count is row-cardinality, exactly where Ray's hash-
    #    aggregate finalizer (~10-15k groups/s) dominates
    _empty_edges = pa.table(
        {"left_id": pa.array([], type=pa.int64()), "right_id": pa.array([], type=pa.int64())}
    )

    def block_edges(g: pa.Table) -> pa.Table:
        # g holds one or more COMPLETE key-contiguous block groups
        if g.num_rows == 0:
            return _empty_edges
        ns = ray.get(null_ref)
        keys = g["block_key"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        isn = _member_mask(ids, ns)
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        ends = np.r_[starts[1:], len(keys)]
        ls, rs = [], []
        for s, e in zip(starts, ends):
            nd, dn = ids[s:e][isn[s:e]], ids[s:e][~isn[s:e]]
            if len(nd) and len(dn):
                ls.append(np.repeat(nd, len(dn)))
                rs.append(np.tile(dn, len(nd)))
        if not ls:
            return _empty_edges
        return pa.table(
            {
                "left_id": pa.array(np.concatenate(ls), type=pa.int64()),
                "right_id": pa.array(np.concatenate(rs), type=pa.int64()),
            }
        )

    raw_edges = map_sorted_groups(blocks_f, "block_key", block_edges, _empty_edges)
    # a (null, donor) pair repeats once per shared block — sort-based dedup
    edges = distinct_pairs(raw_edges).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return _empty_result(field)

    # 5. payload side table, pruned to involved docs (id-proportional broadcast
    #    filter): minhash sig (packed — joins reject list columns) left-outer
    #    donor value, so null docs keep their sig with a null value
    inv_parts = [
        np.concatenate(
            [
                b["left_id"].to_numpy(zero_copy_only=False),
                b["right_id"].to_numpy(zero_copy_only=False),
            ]
        )
        for b in edges.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        if b.num_rows
    ]
    involved_np = np.unique(np.concatenate(inv_parts))
    inv_ref = ray.put(involved_np)
    # signature width comes from the FEATURES' schema, not the caller's cfg —
    # a cfg/features num_perm mismatch must not garble the reshape
    ftype = doc_features_ds.schema().types[doc_features_ds.schema().names.index("minhash_sig")]
    num_perm = ftype.list_size

    def sig_rows(t: pa.Table) -> pa.Table:
        inv = ray.get(inv_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = t.filter(pa.array(_member_mask(ids, inv)))
        sig = t["minhash_sig"].combine_chunks() if isinstance(t["minhash_sig"], pa.ChunkedArray) else t["minhash_sig"]
        mat = np.asarray(sig.flatten().to_numpy(zero_copy_only=False)).reshape(len(t), num_perm)
        return pa.table({"doc_id": t["doc_id"], "sig_bin": pack_matrix(mat)})

    def value_rows(t: pa.Table) -> pa.Table:
        inv = ray.get(inv_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        col = t[field]
        nonnull = pc.fill_null(pc.and_kleene(pc.is_valid(col), pc.not_equal(col, "")), False)
        mask = _member_mask(ids, inv) & nonnull.to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(mask))
        return pa.table({"doc_id": t["doc_id"], "donor_val": pc.cast(t[field], pa.string())})

    nparts = adaptive_partitions(len(involved_np))
    sig_side = doc_features_ds.select_columns(["doc_id", "minhash_sig"]).map_batches(
        sig_rows, batch_format="pyarrow"
    )
    val_side = docs_ds.select_columns(["doc_id", field]).map_batches(value_rows, batch_format="pyarrow")
    side = safe_join(
        sig_side,
        val_side,
        num_partitions=nparts,
        on=("doc_id",),
        right_on=("doc_id",),
        join_type="left_outer",
        right_fill_schema={"donor_val": pa.string()},
    )

    enriched = attach_pair_sides(
        edges, side, id_col="doc_id", cols=("sig_bin", "donor_val"), num_partitions=nparts
    )

    # 6. per-edge similarity, then the min_similarity gate and the
    #    value-less-donor drop — vectorized per batch
    def score_edges(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "left_id": pa.array([], type=pa.int64()),
                    "right_id": pa.array([], type=pa.int64()),
                    "sim": pa.array([], type=pa.float64()),
                    "donor_val": pa.array([], type=pa.string()),
                }
            )
        sl = unpack_matrix(t["l_sig_bin"], np.uint64, num_perm)
        sr = unpack_matrix(t["r_sig_bin"], np.uint64, num_perm)
        sims = minhash_agreement(sl, sr)
        has_val = pc.is_valid(t["r_donor_val"]).to_numpy(zero_copy_only=False)
        keep = (sims >= min_similarity) & has_val
        return pa.table(
            {
                "left_id": t["left_id"].filter(pa.array(keep)),
                "right_id": t["right_id"].filter(pa.array(keep)),
                "sim": pa.array(sims[keep], type=pa.float64()),
                "donor_val": t["r_donor_val"].filter(pa.array(keep)),
            }
        )

    scored = enriched.map_batches(score_edges, batch_format="pyarrow")

    # 7. per-null-doc fill — range-sort by left_id + boundary-aware block
    #    tasks (no hash shuffle; group count = null docs is row-cardinality).
    #    Donor order within a group is pinned to ascending donor id before the
    #    stable top-k sort, so ties in similarity resolve to the lowest donor
    #    id (deterministic across plans and runs); the driver never sees the
    #    candidate lists.
    def fill_groups(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty_result_table(field)
        lids = g["left_id"].to_numpy(zero_copy_only=False)
        donors_all = g["right_id"].to_numpy(zero_copy_only=False)
        sims_all = g["sim"].to_numpy(zero_copy_only=False)
        vals_all = np.asarray(g["donor_val"].to_pylist(), dtype=object)
        starts = np.flatnonzero(np.r_[True, lids[1:] != lids[:-1]])
        ends = np.r_[starts[1:], len(lids)]
        out_doc, out_val, out_n = [], [], []
        for s, e in zip(starts, ends):
            order = np.argsort(donors_all[s:e], kind="mergesort")
            sims = sims_all[s:e][order]
            vals = vals_all[s:e][order]
            if len(sims) > max_candidates:
                top = np.argsort(-sims, kind="mergesort")[:max_candidates]
                sims, vals = sims[top], vals[top]
            if method == "nearest":
                fill = str(vals[int(np.argmax(sims))])
            elif method == "weighted":
                scores: dict[str, float] = {}
                for v, sim in zip(vals, sims):
                    scores[str(v)] = scores.get(str(v), 0.0) + float(sim)
                fill = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            else:  # average -> mode, ties to lexicographically smallest
                counts: dict[str, int] = {}
                for v in vals:
                    counts[str(v)] = counts.get(str(v), 0) + 1
                fill = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            out_doc.append(int(lids[s]))
            out_val.append(fill)
            out_n.append(len(sims))
        return pa.table(
            {
                "doc_id": pa.array(out_doc, type=pa.int64()),
                f"imputed_{field}": pa.array(out_val, type=pa.string()),
                "n_donors": pa.array(out_n, type=pa.int64()),
            }
        )

    return map_sorted_groups(scored, "left_id", fill_groups, _empty_result_table(field))

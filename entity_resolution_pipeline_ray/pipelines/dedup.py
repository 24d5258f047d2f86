"""Deduplication suite over the ``documents`` table — the training-data-pipeline
operators layered on the same engine primitives as the ER flagship:

- exact dedup (hash-partition + per-group min) — reference A3
  (/root/reference/src/batch_parallel_preprocessing.py:280)
- MinHash+LSH near-dup (shingle → minhash → band → bucket groupby → verify)
- SimHash near-dup (bucket by hash prefix, verify by Hamming distance)
- n-gram Jaccard near-dup (exact verification inside candidate blocks)
- embedding-cosine near-dup: hyperplane-LSH-bucketed production plan plus a
  chunk-pair block-nested-loop exact baseline (the oracle)

Scale discipline (round-2 rework): every verification step is a
hash-partitioned JOIN of the slim pair table against the sketch/shingle/vector
table (``rayops.attach_pair_sides`` — the same dual-sided enrichment plan as
``stages/scoring.py``).  Nothing corpus-sized is ever materialized on the
driver: no ``take_all``/``to_pandas`` broadcast dicts (the round-1 pattern this
replaces was exactly the MMapDict mistake SURVEY.md §1.4 warns against).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Min

from ..config import BlockingConfig, MinHashConfig
from ..functions.hashing import (
    MinHasher,
    band_keys,
    hamming64,
    hyperplane_code_sql,
    hyperplanes,
    md5_u64_dict,
    simhash64_flat,
    stable_u64,
)
from ..functions.text import shingle_lists, token_lists_arrow
from ..rayops import (
    _block_num_rows,
    adaptive_partitions,
    attach_pair_sides,
    first_per_key,
    list_float_matrix,
    memo_dataset,
    pack_matrix,
    pack_ragged,
    read_parquet_clean,
    safe_join,
    unpack_matrix,
    unpack_ragged,
)
from ..stages.blocking import candidate_pairs

# Side tables up to this many rows are broadcast as columnar payloads
# (sorted ids + value matrix, searchsorted gather); above it, pair
# verification goes through the two-sided hash join (attach_pair_sides) —
# the same dual-plan threshold discipline as stages/scoring.score_pairs.
BROADCAST_THRESHOLD_ROWS = 2_000_000


def _docs(sf_dir: str, columns=("doc_id", "text")):
    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=list(columns))


@ray.remote
def _sorted_cols_partial(t: pa.Table, id_col: str, val_cols: tuple):
    if t.num_rows == 0:
        return None
    out = {"ids": t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)}
    for c in val_cols:
        col = t[c]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if pa.types.is_fixed_size_list(arr.type):
            w = arr.type.list_size
            out[c] = np.asarray(arr.flatten().to_numpy(zero_copy_only=False)).reshape(len(arr), w)
        else:
            out[c] = arr.to_numpy(zero_copy_only=False)
    return out


def _broadcast_payload(side_ds, id_col: str, val_cols: tuple):
    """Columnar (sorted ids, value arrays) payload built by parallel per-block
    tasks — the small-side plan for pair verification."""
    parts = [
        p
        for p in ray.get(
            [_sorted_cols_partial.remote(r, id_col, val_cols) for r in side_ds.to_arrow_refs()]
        )
        if p is not None
    ]
    if not parts:
        return None
    ids = np.concatenate([p["ids"] for p in parts])
    order = np.argsort(ids, kind="mergesort")
    payload = {"ids": ids[order]}
    for c in val_cols:
        vals = [p[c] for p in parts]
        payload[c] = (np.vstack(vals) if vals[0].ndim == 2 else np.concatenate(vals))[order]
    return payload


def _payload_gather(payload: dict, ids, col: str):
    pos = np.searchsorted(payload["ids"], np.asarray(ids, dtype=np.int64))
    return payload[col][pos]  # candidate ids always exist in the side table


def _fsl_mat(col, width: int) -> np.ndarray:
    """(n, width) matrix view of a FixedSizeList column (zero-copy when possible)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return np.asarray(arr.flatten().to_numpy(zero_copy_only=False)).reshape(len(arr), width)


_EMPTY_PAIRS = pa.table(
    {"left_id": pa.array([], type=pa.int64()), "right_id": pa.array([], type=pa.int64())}
)


# ----------------------------------------------------------------- sketch emission


def _doc_sketches(docs_ds, minhash_cfg: MinHashConfig):
    """(doc_id, minhash_sig) rows — stateless vectorized map."""

    def f(t: pa.Table) -> pa.Table:
        hasher = MinHasher(minhash_cfg.num_perm, minhash_cfg.seed)
        flat_tok, offs = token_lists_arrow(t["text"])
        sh_flat, sh_offs = shingle_lists(flat_tok, offs, minhash_cfg.shingle_size)
        # md5-based shingle hash (DuckDB md5_number_upper parity) so the
        # signature — and the emitted pair set — is SQL-oracle-checkable;
        # tokenize/shingle/md5 are batch kernels (2.4× the per-string loop)
        h = md5_u64_dict(sh_flat)
        sigs = np.empty((len(t), minhash_cfg.num_perm), dtype=np.uint64)
        for i in range(len(t)):
            sigs[i] = hasher.signature(h[sh_offs[i] : sh_offs[i + 1]])
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
    join pairs back to the sketch table → vectorized signature-agreement verify
    >= threshold.  Returns (left_id, right_id, est_jaccard), est rounded.

    The verified pair set is memoized per (sf_dir, threshold, cfg) within the
    process — ``dedup_apply_fuzzy`` consumes the same pairs, so the driver's
    correctness sweep computes them once."""
    cfg = minhash_cfg or MinHashConfig()
    return memo_dataset(
        ("minhash_pairs", sf_dir, threshold, cfg),
        lambda: _minhash_dup_pairs_plan(sf_dir, threshold, cfg),
    )


def _minhash_band_blocks(sketches, cfg: MinHashConfig):
    """sketches → blocks(block_key, doc_id): num_bands LSH keys per non-empty
    doc — a pure function of a doc's own signature, so block streams compose
    across epochs (the incremental-dedup invariant)."""

    def emit_keys(t: pa.Table) -> pa.Table:
        n = len(t)
        sigs = _fsl_mat(t["minhash_sig"], cfg.num_perm)
        keys = (band_keys(sigs, cfg.num_bands) >> np.uint64(1)).astype(np.int64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        nonempty = ~(sigs == np.uint64(0xFFFFFFFFFFFFFFFF)).all(axis=1)
        return pa.table(
            {
                "block_key": pa.array(keys[nonempty].ravel(), type=pa.int64()),
                "doc_id": pa.array(np.repeat(ids[nonempty], cfg.num_bands), type=pa.int64()),
            }
        )

    return sketches.map_batches(emit_keys, batch_format="pyarrow")


def _minhash_dup_pairs_plan(sf_dir: str, threshold: float, cfg: MinHashConfig):
    sketches = _doc_sketches(_docs(sf_dir), cfg).materialize()
    n_docs = sketches.count()
    blocks = _minhash_band_blocks(sketches, cfg)
    return _verified_pairs_from_blocks(blocks, sketches, n_docs, threshold, cfg)


def _verified_pairs_from_blocks(
    blocks, sketches, n_docs: int, threshold: float, cfg: MinHashConfig, payload_ref=None
):
    """blocks + sketches → verified (left_id, right_id, est_jaccard) pairs.
    Dual plan: fused broadcast verify below the gate, binary-packed join
    verify above (see the inline comments).  ``payload_ref``: a pre-put
    broadcast sketch payload — pass it when verifying several block streams
    against the same sketches (d_incremental_fuzzy) so the driver gathers
    and pins the corpus signature matrix once."""
    nparts = adaptive_partitions(n_docs)

    def emit(li, ri, sl, sr) -> pa.Table:
        # est = k/num_perm is an exact dyadic rational — emitted UNROUNDED so
        # the float64 value matches DuckDB's CAST(k AS DOUBLE)/num_perm bit-for-bit
        # (round() would differ: numpy rounds half-even, DuckDB half-away)
        est = (np.asarray(sl, dtype=np.uint64) == np.asarray(sr, dtype=np.uint64)).mean(axis=1)
        keep = est >= threshold
        return pa.table(
            {
                "left_id": pa.array(np.asarray(li, dtype=np.int64)[keep], type=pa.int64()),
                "right_id": pa.array(np.asarray(ri, dtype=np.int64)[keep], type=pa.int64()),
                "est_jaccard": pa.array(est[keep], type=pa.float64()),
            }
        )

    empty = _EMPTY_PAIRS.append_column("est_jaccard", pa.array([], type=pa.float64()))
    if payload_ref is not None or n_docs <= BROADCAST_THRESHOLD_ROWS:
        # fused verify: the broadcast payload is gathered INSIDE each pair-
        # enumeration task, so only est>=threshold survivors (typically a tiny
        # fraction of the ~num_bands-duplicated candidates) flow through the
        # cross-band dedup sort — one pipeline stage fewer than
        # enumerate → distinct → verify, and less data through the shuffle
        pref = payload_ref or ray.put(_broadcast_payload(sketches, "doc_id", ("minhash_sig",)))

        def verify_pairs(li, ri) -> pa.Table:
            pm = ray.get(pref)
            if len(li) == 0 or pm is None:
                return empty
            return emit(li, ri, _payload_gather(pm, li, "minhash_sig"), _payload_gather(pm, ri, "minhash_sig"))

        return candidate_pairs(
            blocks, BlockingConfig(max_block_size=500), num_partitions=nparts, pair_fn=verify_pairs
        )

    pairs = candidate_pairs(blocks, BlockingConfig(max_block_size=500), num_partitions=nparts)

    def sig_bin(t: pa.Table) -> pa.Table:
        # joins reject list payloads — ship signatures as fixed-size binary
        return pa.table({"doc_id": t["doc_id"], "sig_bin": pack_matrix(_fsl_mat(t["minhash_sig"], cfg.num_perm))})

    side = sketches.map_batches(sig_bin, batch_format="pyarrow")
    enriched = attach_pair_sides(pairs, side, id_col="doc_id", cols=("sig_bin",), num_partitions=nparts)

    def verify_j(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        return emit(
            t["left_id"].to_numpy(zero_copy_only=False),
            t["right_id"].to_numpy(zero_copy_only=False),
            unpack_matrix(t["l_sig_bin"], np.uint64, cfg.num_perm),
            unpack_matrix(t["r_sig_bin"], np.uint64, cfg.num_perm),
        )

    return enriched.map_batches(verify_j, batch_format="pyarrow")


def simhash_dup_pairs(sf_dir: str, max_hamming: int = 8):
    """SimHash near-dup: block on 16-bit hash prefixes (4 rotations so any pair
    within Hamming<=3 of a rotation collides; wider distances best-effort),
    verify by exact Hamming distance after joining pairs to the hash table."""
    docs = _docs(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        flat_tok, offs = token_lists_arrow(t["text"])
        sh = simhash64_flat(md5_u64_dict(flat_tok), offs)
        return pa.table({"doc_id": t["doc_id"], "simhash": pa.array(sh.astype(np.int64), type=pa.int64())})

    hashed = docs.map_batches(f, batch_format="pyarrow").materialize()
    n_docs = hashed.count()
    nparts = adaptive_partitions(n_docs)

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

    def emit(li, ri, hl, hr) -> pa.Table:
        d = hamming64(np.asarray(hl, dtype=np.uint64), np.asarray(hr, dtype=np.uint64))
        keep = d <= max_hamming
        return pa.table(
            {
                "left_id": pa.array(np.asarray(li, dtype=np.int64)[keep], type=pa.int64()),
                "right_id": pa.array(np.asarray(ri, dtype=np.int64)[keep], type=pa.int64()),
                "hamming": pa.array(d[keep].astype(np.int64), type=pa.int64()),
            }
        )

    empty = _EMPTY_PAIRS.append_column("hamming", pa.array([], type=pa.int64()))
    if n_docs <= BROADCAST_THRESHOLD_ROWS:
        # fused verify inside the enumeration tasks (see minhash plan): only
        # Hamming<=max survivors flow through the cross-rotation dedup sort
        pref = ray.put(_broadcast_payload(hashed, "doc_id", ("simhash",)))

        def verify_pairs(li, ri) -> pa.Table:
            pm = ray.get(pref)
            if len(li) == 0 or pm is None:
                return empty
            return emit(li, ri, _payload_gather(pm, li, "simhash"), _payload_gather(pm, ri, "simhash"))

        return candidate_pairs(
            blocks, BlockingConfig(max_block_size=500), num_partitions=nparts, pair_fn=verify_pairs
        )

    pairs = candidate_pairs(blocks, BlockingConfig(max_block_size=500), num_partitions=nparts)
    enriched = attach_pair_sides(
        pairs, hashed, id_col="doc_id", cols=("simhash",), num_partitions=nparts
    )

    def verify_j(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        return emit(
            t["left_id"].to_numpy(zero_copy_only=False),
            t["right_id"].to_numpy(zero_copy_only=False),
            t["l_simhash"].to_numpy(zero_copy_only=False),
            t["r_simhash"].to_numpy(zero_copy_only=False),
        )

    return enriched.map_batches(verify_j, batch_format="pyarrow")


def _shingle_hash_table(docs_ds, shingle_size: int):
    """(doc_id, sh: binary) — sorted unique 64-bit shingle hashes per doc,
    packed as bytes (join-safe ragged payload).  Set ops over the hashes are
    exact Jaccard up to 64-bit collisions (negligible below ~10^9 distinct
    shingles per doc)."""

    def f(t: pa.Table) -> pa.Table:
        flat_tok, offs = token_lists_arrow(t["text"])
        sh_flat, sh_offs = shingle_lists(flat_tok, offs, shingle_size)
        h = (
            stable_u64(sh_flat.to_numpy(zero_copy_only=False))
            if len(sh_flat)
            else np.empty(0, dtype=np.uint64)
        )
        out = [np.unique(h[sh_offs[i] : sh_offs[i + 1]]) for i in range(len(t))]
        return pa.table({"doc_id": t["doc_id"], "sh": pack_ragged(out)})

    return docs_ds.map_batches(f, batch_format="pyarrow")


def ngram_jaccard_dup_pairs(sf_dir: str, threshold: float = 0.5, shingle_size: int = 3):
    """Exact n-gram Jaccard near-dup: LSH candidates (high-recall geometry),
    then exact shingle-set Jaccard verification via a join against the
    distributed shingle-hash table — the no-false-positives variant."""
    cfg = MinHashConfig(num_perm=128, num_bands=64, shingle_size=shingle_size)
    cand = minhash_dup_pairs(sf_dir, threshold=0.0, minhash_cfg=cfg).select_columns(
        ["left_id", "right_id"]
    )
    shingles = _shingle_hash_table(_docs(sf_dir), shingle_size).materialize()
    n_docs = shingles.count()
    nparts = adaptive_partitions(n_docs)

    def emit(li, ri, lrows, rrows) -> pa.Table:
        n = len(li)
        jac = np.empty(n, dtype=np.float64)
        for i in range(n):
            a, b = lrows[i], rrows[i]
            inter = len(np.intersect1d(a, b, assume_unique=True))
            union = len(a) + len(b) - inter
            jac[i] = (inter / union) if union else 1.0
        keep = jac >= threshold
        return pa.table(
            {
                "left_id": pa.array(np.asarray(li, dtype=np.int64)[keep], type=pa.int64()),
                "right_id": pa.array(np.asarray(ri, dtype=np.int64)[keep], type=pa.int64()),
                "jaccard": pa.array(np.round(jac[keep], 6), type=pa.float64()),
            }
        )

    empty = _EMPTY_PAIRS.append_column("jaccard", pa.array([], type=pa.float64()))
    if n_docs <= BROADCAST_THRESHOLD_ROWS:
        pref = ray.put(_broadcast_payload(shingles, "doc_id", ("sh",)))

        def verify_b(t: pa.Table) -> pa.Table:
            pm = ray.get(pref)
            if len(t) == 0 or pm is None:
                return empty
            li = t["left_id"].to_numpy(zero_copy_only=False)
            ri = t["right_id"].to_numpy(zero_copy_only=False)
            lrows = [np.frombuffer(b, dtype=np.uint64) for b in _payload_gather(pm, li, "sh")]
            rrows = [np.frombuffer(b, dtype=np.uint64) for b in _payload_gather(pm, ri, "sh")]
            return emit(li, ri, lrows, rrows)

        return cand.map_batches(verify_b, batch_format="pyarrow")

    enriched = attach_pair_sides(
        cand, shingles, id_col="doc_id", cols=("sh",), num_partitions=nparts
    )

    def verify_j(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        return emit(
            t["left_id"].to_numpy(zero_copy_only=False),
            t["right_id"].to_numpy(zero_copy_only=False),
            unpack_ragged(t["l_sh"], np.uint64),
            unpack_ragged(t["r_sh"], np.uint64),
        )

    return enriched.map_batches(verify_j, batch_format="pyarrow")


# All-pairs SimHash near-dup mirror: Hamming via bit_count(xor), candidate
# blocking mirrored exactly (a pair is emitted iff SOME 16-bit simhash chunk
# matches — the engine's 4-rotation prefix blocking; no block ever exceeds the
# size cap at oracle scale).
D_SIMHASH_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+') AS tk
  FROM documents),
hv AS (SELECT doc_id, md5_number_upper(unnest(tk)) AS v FROM toks),
votes AS (
  SELECT doc_id, b,
         sum(CASE WHEN (v >> CAST(b AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS vote
  FROM hv, range(0, 64) r(b) GROUP BY doc_id, b),
words0 AS (
  SELECT doc_id,
         bit_or(CASE WHEN vote > 0 THEN (1::UBIGINT << CAST(b AS INTEGER))
                     ELSE 0::UBIGINT END) AS w
  FROM votes GROUP BY doc_id),
s AS (
  SELECT t.doc_id, coalesce(w, 0::UBIGINT) AS w
  FROM toks t LEFT JOIN words0 USING (doc_id))
SELECT a.doc_id AS left_id, b.doc_id AS right_id,
       CAST(bit_count(xor(a.w, b.w)) AS BIGINT) AS hamming
FROM s a, s b
WHERE a.doc_id < b.doc_id
  AND bit_count(xor(a.w, b.w)) <= 8
  AND ((a.w & 65535::UBIGINT) = (b.w & 65535::UBIGINT)
    OR ((a.w >> 16) & 65535::UBIGINT) = ((b.w >> 16) & 65535::UBIGINT)
    OR ((a.w >> 32) & 65535::UBIGINT) = ((b.w >> 32) & 65535::UBIGINT)
    OR ((a.w >> 48) & 65535::UBIGINT) = ((b.w >> 48) & 65535::UBIGINT))
"""


# Exact shingle Jaccard >= 0.5 as a set-similarity join: unnest distinct
# shingles and equi-join on shingle (any pair with jaccard >= 0.5 shares at
# least one shingle, so the join finds every qualifying pair; empty-empty
# pairs — uni = 0 — are unreachable by the join AND excluded by the original
# predicate).  Equivalent to the quadratic list_intersect formulation but
# ~90x faster (8.2s -> 0.09s at sf0.01).  The engine computes the same thing
# through LSH candidates (128 perms / 64 bands: a >=0.5-Jaccard pair misses
# all bands with probability 0.75^64 ≈ 1e-8, i.e. never at test scale) and
# exact verification, so results match.
NGRAM_JACCARD_SQL = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+') AS toks
  FROM documents),
s AS (
  SELECT doc_id, list_distinct(CASE
    WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
    WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
    ELSE list_transform(range(1, len(toks) - 1),
                        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
  END) AS sh FROM t),
e AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS g FROM s),
inter AS (
  SELECT a.doc_id AS left_id, b.doc_id AS right_id,
         any_value(a.n) AS na, any_value(b.n) AS nb, count(*) AS inter
  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT left_id, right_id, round(inter * 1.0 / (na + nb - inter), 6) AS jaccard
FROM inter
WHERE (na + nb - inter) > 0 AND inter * 1.0 / (na + nb - inter) >= 0.5
"""


def _minhash_sig_ctes(c: MinHashConfig) -> str:
    """The shared CTE prefix computing per-doc MinHash signatures in SQL:
    toks → shingles → md5 hashes → the inlined permutation constants →
    per-slot minima → ``sig(doc_id, s)``.  Used by the pair oracle AND the
    bucket-statistics oracle so the signature arithmetic is written once."""
    mh = MinHasher(c.num_perm, c.seed)
    perm_rows = ",\n    ".join(
        f"({i}, {int(a)}::HUGEINT, {int(b)}::HUGEINT)" for i, (a, b) in enumerate(zip(mh.a, mh.b))
    )
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+') AS tk
  FROM documents),
sh AS (
  SELECT doc_id, unnest(CASE
    WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
    WHEN len(tk) <= {c.shingle_size} THEN [array_to_string(tk, ' ')]
    ELSE list_transform(range(1, len(tk) - {c.shingle_size - 2}),
                        i -> concat_ws(' ', {", ".join(f"tk[i+{o}]" for o in range(c.shingle_size))}))
  END) AS s FROM toks),
hv AS (SELECT doc_id, md5_number_upper(s) AS h FROM sh),
perms(i, a, b) AS (VALUES
    {perm_rows}),
mins AS (
  SELECT doc_id, i,
         -- & (2^64-1) == mod 2^64 for the non-negative operands here; DuckDB's
         -- HUGEINT modulo is ~20x slower than the bitwise mask (7.2s -> 0.4s
         -- for the 3.2M-row mins stage at sf0.01)
         min(CAST((a * CAST(h AS HUGEINT) + b) & 18446744073709551615 AS UBIGINT)) AS mv
  FROM hv, perms GROUP BY doc_id, i),
sig AS (SELECT doc_id, list(mv ORDER BY i) AS s FROM mins GROUP BY doc_id)"""


def _minhash_sql(threshold: float = 0.6, cfg: MinHashConfig | None = None) -> str:
    """Exact SQL replica of ``minhash_dup_pairs``: same md5 shingle hashes
    (``md5_number_upper``), the same 128 permutation constants inlined as
    literals (HUGEINT product, mod 2^64), the same band-collision candidate
    rule (some band of ``r`` consecutive slots fully agrees), and the same
    exact-dyadic ``est_jaccard`` = agree/num_perm.  FNV band-key collisions are
    the only divergence channel (~2^-64 per pair — never at oracle scale)."""
    c = cfg or MinHashConfig()
    r = c.num_perm // c.num_bands
    band_eq = " AND ".join(f"a.s[{r}*j+{o + 1}] = b.s[{r}*j+{o + 1}]" for o in range(r))
    return f"""
{_minhash_sig_ctes(c)},
cand AS (
  SELECT a.doc_id AS left_id, b.doc_id AS right_id,
         len(list_filter(range(0, {c.num_perm}), i -> a.s[i+1] = b.s[i+1])) AS agree
  FROM sig a, sig b
  WHERE a.doc_id < b.doc_id
    AND len(list_filter(range(0, {c.num_bands}), j -> {band_eq})) > 0)
SELECT left_id, right_id, CAST(agree AS DOUBLE) / {c.num_perm} AS est_jaccard
FROM cand WHERE CAST(agree AS DOUBLE) / {c.num_perm} >= {threshold}
"""


D_MINHASH_SQL = _minhash_sql()


# ----------------------------------------------------------------- embedding dedup


def _nvec_dim(ds) -> int:
    """Vector width from a Dataset's nvec FixedSizeList column type."""
    sch = ds.schema()
    return sch.types[sch.names.index("nvec")].list_size


def _normalized_embeddings(sf_dir: str):
    """(vec_id, nvec) with nvec an L2-normalized FixedSizeList<double> — computed
    once, reused by both embedding-dedup plans."""
    emb = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def f(t: pa.Table) -> pa.Table:
        m = list_float_matrix(t["embedding"])
        if m.size == 0:
            m = m.reshape(0, 0)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "nvec": pa.FixedSizeListArray.from_arrays(
                    pa.array(m.ravel(), type=pa.float64()), m.shape[1] if m.size else 1
                ),
            }
        )

    return emb.map_batches(f, batch_format="pyarrow")


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.3, chunk_rows: int = 512):
    """Exact all-pairs embedding-cosine dedup as a chunk-pair block-nested-loop:
    the corpus is partitioned into ~chunk_rows chunks held in the object store;
    one task per (chunk_i, chunk_j) pair pulls exactly two chunks and emits the
    qualifying id pairs.  O(n²) compute spread over k(k+1)/2 tasks with O(n²/k²)
    memory each — no full-matrix broadcast, nothing corpus-sized on the driver.
    This is the exact baseline/oracle; ``embedding_dup_pairs_lsh`` is the
    sub-quadratic production plan."""
    normed = _normalized_embeddings(sf_dir).materialize()
    n = normed.count()
    if n == 0:
        return rd.from_arrow(
            pa.table({"left_vec_id": pa.array([], type=pa.int64()), "right_vec_id": pa.array([], type=pa.int64())})
        )
    k = max(1, -(-n // chunk_rows))
    chunks = normed.repartition(k).materialize()
    refs = chunks.to_arrow_refs()
    sizes = ray.get([_block_num_rows.remote(r) for r in refs])
    refs = [r for r, c in zip(refs, sizes) if c > 0]
    dim = _nvec_dim(chunks)
    items = [{"i": i, "j": j} for i in range(len(refs)) for j in range(i, len(refs))]
    desc = rd.from_items(items).repartition(len(items))
    refs_ref = ray.put(refs)  # list of chunk ObjectRefs, not the data

    def cross(batch: pa.Table) -> pa.Table:
        rl = ray.get(refs_ref)
        out_l, out_r = [], []
        for i, j in zip(
            batch["i"].to_numpy(zero_copy_only=False), batch["j"].to_numpy(zero_copy_only=False)
        ):
            ti, tj = ray.get(rl[int(i)]), ray.get(rl[int(j)])
            ids_i = ti["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            ids_j = tj["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            mi = _fsl_mat(ti["nvec"], dim)
            mj = _fsl_mat(tj["nvec"], dim)
            sims = mi @ mj.T
            ai, aj = np.nonzero(sims >= threshold)
            l = np.minimum(ids_i[ai], ids_j[aj])
            r = np.maximum(ids_i[ai], ids_j[aj])
            keep = l < r  # drops self-pairs; i==j upper/lower dupes removed below
            l, r = l[keep], r[keep]
            if int(i) == int(j) and len(l):
                m = np.unique(np.column_stack([l, r]), axis=0)
                l, r = m[:, 0], m[:, 1]
            out_l.append(l)
            out_r.append(r)
        la = np.concatenate(out_l) if out_l else np.empty(0, dtype=np.int64)
        ra = np.concatenate(out_r) if out_r else np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "left_vec_id": pa.array(la, type=pa.int64()),
                "right_vec_id": pa.array(ra, type=pa.int64()),
            }
        )

    return desc.map_batches(cross, batch_format="pyarrow", batch_size=None)


EMBEDDING_DUP_SQL = """
SELECT a.vec_id AS left_vec_id, b.vec_id AS right_vec_id
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id AND list_cosine_similarity(a.embedding, b.embedding) >= 0.3
"""


def embedding_dup_pairs_lsh(
    sf_dir: str,
    threshold: float = 0.3,
    n_planes: int = 6,
    seed: int = 42,
    max_block_size: int = 2000,
    multi_probe: bool = True,
):
    """Sub-quadratic embedding dedup — the production plan at scale: bucket
    vectors by random-hyperplane sign bits (multi-probe: each vector also emits
    every 1-bit-flip bucket, so pairs whose codes differ by <=2 bits collide),
    enumerate candidates per bucket, verify exact cosine via a join back to the
    normalized-vector table.  Approximate in recall (measured vs the exact
    baseline in tests), exact in precision (every emitted pair is verified).

    With ``multi_probe=False`` each vector lands in exactly ONE sign-code
    bucket (candidates = same-code pairs) — the single-assignment "semantic
    cluster" view used by ``dedup_apply_semantic``."""
    normed = _normalized_embeddings(sf_dir).materialize()
    n = normed.count()
    if n == 0:
        return rd.from_arrow(
            pa.table({"left_vec_id": pa.array([], type=pa.int64()), "right_vec_id": pa.array([], type=pa.int64()),
                      "cosine": pa.array([], type=pa.float64())})
        )
    nparts = adaptive_partitions(n)
    dim = _nvec_dim(normed)
    planes = hyperplanes(n_planes, dim, seed)
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    def emit_keys(t: pa.Table) -> pa.Table:
        m = _fsl_mat(t["nvec"], dim)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        codes = ((m @ planes.T) > 0).astype(np.int64) @ weights
        keys = [codes]
        kids = [ids]
        if multi_probe:
            for p in range(n_planes):  # multi-probe: 1-bit flips
                keys.append(codes ^ (1 << p))
                kids.append(ids)
        return pa.table(
            {
                "block_key": pa.array(np.concatenate(keys), type=pa.int64()),
                "doc_id": pa.array(np.concatenate(kids), type=pa.int64()),
            }
        )

    blocks = normed.map_batches(emit_keys, batch_format="pyarrow")
    # partition the candidate shuffle by BLOCK rows (n x (1 + n_planes) probe
    # keys, quadratic in-bucket expansion) — sizing it by the vector count
    # alone starves the self-join at 2 partitions
    probe_mult = (n_planes + 1) if multi_probe else 1
    pair_parts = adaptive_partitions(n * probe_mult, rows_per_partition=500)
    pairs = candidate_pairs(blocks, BlockingConfig(max_block_size=max_block_size), num_partitions=pair_parts)

    empty = pa.table({"left_vec_id": pa.array([], type=pa.int64()), "right_vec_id": pa.array([], type=pa.int64()),
                      "cosine": pa.array([], type=pa.float64())})

    def emit(li, ri, l, r) -> pa.Table:
        cos = (np.asarray(l, dtype=np.float64) * np.asarray(r, dtype=np.float64)).sum(axis=1)
        keep = cos >= threshold
        return pa.table(
            {
                "left_vec_id": pa.array(np.asarray(li, dtype=np.int64)[keep], type=pa.int64()),
                "right_vec_id": pa.array(np.asarray(ri, dtype=np.int64)[keep], type=pa.int64()),
                "cosine": pa.array(np.round(cos[keep], 6), type=pa.float64()),
            }
        )

    if n <= BROADCAST_THRESHOLD_ROWS:
        pref = ray.put(_broadcast_payload(normed, "vec_id", ("nvec",)))

        def verify_b(t: pa.Table) -> pa.Table:
            pm = ray.get(pref)
            if len(t) == 0 or pm is None:
                return empty
            li = t["left_id"].to_numpy(zero_copy_only=False)
            ri = t["right_id"].to_numpy(zero_copy_only=False)
            return emit(li, ri, _payload_gather(pm, li, "nvec"), _payload_gather(pm, ri, "nvec"))

        # bounded batches: the gather materializes two (batch, dim) float64
        # matrices — keep them cache-sized
        return pairs.map_batches(verify_b, batch_format="pyarrow", batch_size=16384)

    def vec_bin(t: pa.Table) -> pa.Table:
        return pa.table({"vec_id": t["vec_id"], "nvec_bin": pack_matrix(_fsl_mat(t["nvec"], dim))})

    side = normed.map_batches(vec_bin, batch_format="pyarrow")
    enriched = attach_pair_sides(pairs, side, id_col="vec_id", cols=("nvec_bin",), num_partitions=nparts)

    def verify_j(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        return emit(
            t["left_id"].to_numpy(zero_copy_only=False),
            t["right_id"].to_numpy(zero_copy_only=False),
            unpack_matrix(t["l_nvec_bin"], np.float64, dim),
            unpack_matrix(t["r_nvec_bin"], np.float64, dim),
        )

    return enriched.map_batches(verify_j, batch_format="pyarrow")


def _embedding_lsh_sql(threshold: float = 0.3, n_planes: int = 6, seed: int = 42, dim: int = 64) -> str:
    """SQL replica of ``embedding_dup_pairs_lsh``.  The engine's multi-probe
    bucketing (each vector emits its code plus every 1-bit flip) makes a pair a
    candidate iff Hamming(code_a, code_b) <= 2 — written directly as
    ``bit_count(xor(...))``.  Cosine is computed in float64 (DuckDB's
    ``list_cosine_similarity`` is float32 — too coarse to match a rounded
    engine value), with the plane constants inlined via
    ``hyperplane_code_sql``.  ``dim`` is the testdata embedding width (64 in
    every sf dir); the engine itself reads the width from data."""
    code = hyperplane_code_sql("e", n_planes, dim, seed)
    return f"""
WITH c AS (
  SELECT vec_id, e, {code} AS code, sqrt(list_dot_product(e, e)) AS nrm
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)),
scored AS (
  SELECT a.vec_id AS left_vec_id, b.vec_id AS right_vec_id,
         list_dot_product(a.e, b.e) / (a.nrm * b.nrm) AS cos
  FROM c a, c b
  WHERE a.vec_id < b.vec_id AND bit_count(xor(a.code, b.code)) <= 2)
SELECT left_vec_id, right_vec_id, round(cos, 6) AS cosine
FROM scored WHERE cos >= {threshold}
"""


D_EMBEDDING_LSH_SQL = _embedding_lsh_sql()


def dedup_apply_semantic(sf_dir: str, threshold: float = 0.3, n_planes: int = 6, seed: int = 42):
    """SemDeDup-style semantic dedup APPLY (Abbas et al., arXiv:2303.09540,
    adapted to a deterministic rule): every vector is assigned to exactly ONE
    semantic bucket (its hyperplane sign code — the cheap stand-in for
    SemDeDup's k-means cluster), and within a bucket a vector is DROPPED iff
    some lower-id vector in the same bucket has cosine >= threshold to it.
    Output is the per-vector decision stream (vec_id, label, keep) — the form
    a training-data pipeline consumes.

    Plan: single-assignment LSH pair enumeration with fused cosine
    verification (``embedding_dup_pairs_lsh(multi_probe=False)``), then the
    drop set = distinct right ids of the verified pair set.  The drop set is
    duplicate-proportional, never corpus-proportional — below the broadcast
    threshold it ships as one sorted int64 array (searchsorted flag per
    batch); above it the decision is a left-outer hash join against the
    deduped drop table (same dual-plan discipline as the verification step
    itself)."""
    pairs = embedding_dup_pairs_lsh(
        sf_dir, threshold=threshold, n_planes=n_planes, seed=seed, multi_probe=False
    )
    emb = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"])
    drops = pairs.select_columns(["right_vec_id"]).materialize()
    n_drop_rows = drops.count()

    if n_drop_rows <= BROADCAST_THRESHOLD_ROWS:
        if n_drop_rows:
            chunks = [t["right_vec_id"].to_numpy(zero_copy_only=False) for t in ray.get(drops.to_arrow_refs()) if t.num_rows]
            drop_ids = np.unique(np.concatenate(chunks).astype(np.int64))
        else:
            drop_ids = np.empty(0, dtype=np.int64)
        ref = ray.put(drop_ids)

        def flag(t: pa.Table) -> pa.Table:
            d = ray.get(ref)
            ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(d, ids)
            dropped = (pos < len(d)) & (d[np.clip(pos, 0, max(len(d) - 1, 0))] == ids) if len(d) else np.zeros(len(ids), dtype=bool)
            return pa.table({"vec_id": t["vec_id"], "label": t["label"], "keep": pa.array(~dropped)})

        return emb.map_batches(flag, batch_format="pyarrow")

    marked = drops.map_batches(
        lambda t: pa.table(
            {"vec_id": pc.cast(t["right_vec_id"], pa.int64()), "dropped": pa.array(np.ones(len(t), dtype=np.int8))}
        ),
        batch_format="pyarrow",
    )
    marked = first_per_key(marked, "vec_id")
    joined = safe_join(
        emb,
        marked,
        num_partitions=adaptive_partitions(emb.count()),
        on=("vec_id",),
        right_on=("vec_id",),
        join_type="left_outer",
        right_fill_schema={"dropped": pa.int8()},
    )

    def finish(t: pa.Table) -> pa.Table:
        keep = pc.is_null(t["dropped"])
        return pa.table({"vec_id": t["vec_id"], "label": t["label"], "keep": keep})

    return joined.map_batches(finish, batch_format="pyarrow")


def _apply_semantic_sql(threshold: float = 0.3, n_planes: int = 6, seed: int = 42, dim: int = 64) -> str:
    """SQL replica of ``dedup_apply_semantic``: single-assignment buckets are
    code equality (no multi-probe), the drop set is the distinct greater side
    of verified same-bucket pairs, and the decision is a left anti lookup."""
    code = hyperplane_code_sql("e", n_planes, dim, seed)
    return f"""
WITH c AS (
  SELECT vec_id, e, {code} AS code, sqrt(list_dot_product(e, e)) AS nrm
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)),
drops AS (
  SELECT DISTINCT b.vec_id AS vec_id
  FROM c a JOIN c b ON a.code = b.code AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= {threshold})
SELECT e.vec_id, e.label, d.vec_id IS NULL AS keep
FROM embeddings e LEFT JOIN drops d USING (vec_id)
"""


D_APPLY_SEMANTIC_SQL = _apply_semantic_sql()


def dedup_apply_exact(sf_dir: str):
    """End-to-end exact dedup: keep the min-doc_id document per
    normalized-content hash.  Plan: ONE corpus-wide range shuffle —
    sort by (text_hash, doc_id), then a boundary-aware first-per-key pass
    (``rayops.first_per_key``) keeps exactly the min doc_id of each hash
    group.  This moves the corpus once; the previous
    groupby-min + hash-semi-join plan moved it twice and paid two
    hash-shuffle actor ramps (8.4s → ~1s at the sf0.01 query gate)."""
    from .text_analysis import append_md5_text_hash

    docs = _docs(sf_dir)
    hashed = docs.map_batches(append_md5_text_hash, batch_format="pyarrow")
    kept = first_per_key(hashed, "text_hash", order_col="doc_id")
    return kept.select_columns(["doc_id", "text"])


DEDUP_APPLY_EXACT_SQL = """
SELECT doc_id, text FROM documents
WHERE doc_id IN (
  SELECT min(doc_id) FROM documents GROUP BY md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
"""


def dedup_apply_fuzzy(sf_dir: str, threshold: float = 0.6):
    """End-to-end fuzzy dedup apply — the operator a training-data pipeline
    actually runs: MinHash-LSH near-dup pairs → transitive connected components
    (``stages.clustering.propagate_labels``: driver union-find below the edge
    threshold, distributed min-label propagation above) → per-doc decision
    (rep_doc_id = min doc_id of the near-dup cluster, keep = doc is its own
    rep).  The corpus streams through the component assignment; only the edge
    list (proportional to the duplicate set, never the corpus) is driver/
    broadcast state on the small-graph path."""
    from ..config import ClusteringConfig
    from ..stages.clustering import propagate_labels

    pairs = minhash_dup_pairs(sf_dir, threshold=threshold)
    edges = pairs.map_batches(
        lambda t: pa.table({"src": t["left_id"], "dst": t["right_id"]}), batch_format="pyarrow"
    )
    clusters = propagate_labels(edges, _docs(sf_dir, columns=("doc_id",)), ClusteringConfig())

    def finish(t: pa.Table) -> pa.Table:
        rep = t["cluster_id"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "rep_doc_id": pa.array(rep, type=pa.int64()),
                "keep": pa.array(rep == ids),
            }
        )

    return clusters.map_batches(finish, batch_format="pyarrow")


# Recursive-CTE transitive closure over the (SQL-replicated) MinHash pair set:
# rep = min doc_id reachable in the near-dup graph, keep = doc is its own rep.
D_APPLY_FUZZY_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT left_id, right_id FROM ({D_MINHASH_SQL}) mh
),
edges AS (
  SELECT left_id AS u, right_id AS v FROM pairs
  UNION
  SELECT right_id, left_id FROM pairs),
reach AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
rep AS (SELECT u AS doc_id, least(u, min(v)) AS rep0 FROM reach GROUP BY u)
SELECT d.doc_id,
       coalesce(r.rep0, d.doc_id) AS rep_doc_id,
       coalesce(r.rep0, d.doc_id) = d.doc_id AS keep
FROM documents d LEFT JOIN rep r USING (doc_id)
"""


# ------------------------------------------------------- exact substring dup
# Exact-substring duplication (Lee et al., "Deduplicating Training Data Makes
# Language Models Better", arXiv:2107.06499), restricted to token windows:
# two docs pair iff they share any SUBSTR_WIN-token contiguous span verbatim.
# The suffix-array criterion at window granularity — every shared span of
# >= SUBSTR_WIN tokens contains a shared SUBSTR_WIN-window, so recall is
# exact for the span length; the window table plays the suffix array's role
# and shards by window hash instead of needing a global lexicographic sort.

SUBSTR_WIN = 20


def substring_dup_pairs(sf_dir: str, window: int = SUBSTR_WIN):
    """(left_id, right_id) doc pairs sharing a verbatim ``window``-token
    span.  Plan: tokenize/window/md5 batch kernels → per-doc distinct window
    hashes (lexsort mask, no Python per doc) → the blocking kernel's
    sort-based group pair enumeration + sort-based pair dedup.  The hot-block
    cap is OPEN here (a window shared by k docs legitimately pairs all k):
    cap via BlockingConfig when boilerplate spans are expected instead of
    decontaminating them away first."""
    docs = _docs(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        flat_tok, offs = token_lists_arrow(t["text"])
        g_flat, g_offs = shingle_lists(flat_tok, offs, window, short="drop")
        h = md5_u64_dict(g_flat)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), np.diff(g_offs))
        order = np.lexsort((h, doc_idx))
        d2, h2 = doc_idx[order], h[order]
        keep = np.ones(len(h2), dtype=bool)
        keep[1:] = (h2[1:] != h2[:-1]) | (d2[1:] != d2[:-1])
        return pa.table(
            {
                "block_key": pa.array((h2[keep] >> np.uint64(1)).astype(np.int64), type=pa.int64()),
                "doc_id": pa.array(ids[d2[keep]], type=pa.int64()),
            }
        )

    blocks = docs.map_batches(f, batch_format="pyarrow")
    n_docs = _docs(sf_dir, columns=("doc_id",)).count()
    return candidate_pairs(
        blocks, BlockingConfig(max_block_size=1_000_000), num_partitions=adaptive_partitions(n_docs)
    )


def d_substring_sql(window: int = SUBSTR_WIN) -> str:
    """Oracle for ``substring_dup_pairs`` at the SAME window — generated from
    the parameter so a non-default window gets a matching oracle instead of
    silently diverging from the registered constant."""
    terms = ", ".join(f"tk[i+{j}]" for j in range(window))
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+') AS tk
  FROM documents),
g AS (
  SELECT doc_id, CASE WHEN len(tk) < {window} THEN CAST([] AS VARCHAR[])
    ELSE list_transform(range(1, len(tk) - {window - 2}),
                        i -> concat_ws(' ', {terms}))
  END AS grams FROM toks),
dg AS (SELECT DISTINCT doc_id, md5_number_upper(gram) >> 1 AS k
       FROM (SELECT doc_id, unnest(grams) AS gram FROM g))
SELECT DISTINCT a.doc_id AS left_id, b.doc_id AS right_id
FROM dg a JOIN dg b ON a.k = b.k AND a.doc_id < b.doc_id
"""


D_SUBSTRING_SQL = d_substring_sql(SUBSTR_WIN)


def dedup_apply_fuzzy_keep_best(sf_dir: str, threshold: float = 0.6):
    """Fuzzy dedup apply with the KEEP-BEST policy webtext curation actually
    wants: the representative of each near-dup cluster is its highest-quality
    member (longest n_chars, doc_id tiebreak), not the min id — dropping a
    long canonical page in favour of a truncated mirror is a real quality
    loss at corpus scale.  Plan: the d_apply_fuzzy component assignment, then
    one corpus join to attach n_chars, one head_k_per_key range sort
    (n_chars DESC, doc_id ASC, k=1) for the per-cluster winner, and one
    cluster_id join to broadcast the winner back — every step distributed,
    nothing corpus- or cluster-proportional on the driver."""
    from ..config import ClusteringConfig
    from ..rayops import head_k_per_key
    from ..stages.clustering import propagate_labels

    pairs = minhash_dup_pairs(sf_dir, threshold=threshold)
    edges = pairs.map_batches(
        lambda t: pa.table({"src": t["left_id"], "dst": t["right_id"]}), batch_format="pyarrow"
    )
    docs = _docs(sf_dir, columns=("doc_id", "n_chars")).materialize()
    nparts = adaptive_partitions(docs.count())
    clusters = propagate_labels(edges, docs.select_columns(["doc_id"]), ClusteringConfig())
    withq = safe_join(clusters, docs, num_partitions=nparts, on=("doc_id",), right_on=("doc_id",))
    winners = head_k_per_key(
        withq, "cluster_id", ["n_chars", "doc_id"], 1, descending=[True, False]
    ).map_batches(
        lambda t: pa.table({"cluster_id": t["cluster_id"], "rep_doc_id": t["doc_id"]}),
        batch_format="pyarrow",
    )
    out = safe_join(
        clusters, winners, num_partitions=nparts, on=("cluster_id",), right_on=("cluster_id",)
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "rep_doc_id": t["rep_doc_id"],
                "keep": pc.equal(t["doc_id"], t["rep_doc_id"]),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


# Keep-best over the same recursive-CTE closure as D_APPLY_FUZZY_SQL: the
# cluster of u is {u} ∪ reach(u); its rep maximizes (n_chars, -doc_id).
D_APPLY_FUZZY_KEEP_BEST_SQL = f"""
WITH RECURSIVE pairs AS (
  SELECT left_id, right_id FROM ({D_MINHASH_SQL}) mh
),
edges AS (
  SELECT left_id AS u, right_id AS v FROM pairs
  UNION
  SELECT right_id, left_id FROM pairs),
reach AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
members AS (
  SELECT u, v FROM reach
  UNION
  SELECT DISTINCT u, u FROM edges),
ranked AS (
  SELECT m.u AS doc_id, m.v AS rep,
         row_number() OVER (PARTITION BY m.u ORDER BY d.n_chars DESC, m.v ASC) AS rn
  FROM members m JOIN documents d ON d.doc_id = m.v),
rep AS (SELECT doc_id, rep FROM ranked WHERE rn = 1)
SELECT d.doc_id,
       coalesce(r.rep, d.doc_id) AS rep_doc_id,
       coalesce(r.rep, d.doc_id) = d.doc_id AS keep
FROM documents d LEFT JOIN rep r USING (doc_id)
"""


def dedup_cluster_size_hist(sf_dir: str, threshold: float = 0.6):
    """Duplicate-cluster size histogram — the curation report that tells you
    HOW duplicated the corpus is (how much a dedup pass will remove and
    whether boilerplate mega-clusters exist).  Plan: the d_apply_fuzzy
    component assignment, a per-cluster count (groupby with Ray's partial
    pre-aggregation; cluster ids are row-cardinality but the count stream
    shrinks to one row per cluster), then a tiny second groupby over sizes.
    Output (cluster_size, n_clusters)."""
    from ray.data.aggregate import Count

    assign = dedup_apply_fuzzy(sf_dir, threshold=threshold)
    sizes = assign.groupby("rep_doc_id").aggregate(Count(alias_name="cluster_size"))
    hist = sizes.groupby("cluster_size").aggregate(Count(alias_name="n_clusters"))
    return hist


D_CLUSTER_SIZE_HIST_SQL = f"""
WITH assign AS ({D_APPLY_FUZZY_SQL}),
sizes AS (SELECT rep_doc_id, count(*) AS cluster_size FROM assign GROUP BY rep_doc_id)
SELECT cluster_size, count(*) AS n_clusters FROM sizes GROUP BY cluster_size
"""


def d_minhash_accuracy(sf_dir: str, threshold: float = 0.6):
    """Sketch-quality audit: for every verified MinHash pair, the signature
    ESTIMATE next to the EXACT shingle-set Jaccard — the calibration report a
    dedup deployment publishes to justify its threshold (estimate bias at the
    decision boundary is what silently over/under-deletes).  Composes the
    memoized pair set with the distributed shingle-hash table (broadcast
    payload below the row threshold, pair join above — the ngram verify
    machinery).  Integer outputs: est_x128 = agreeing permutations (the
    estimate's exact numerator), true_ppm = inter*1e6 // union, and
    abs_err_ppm — no float-sum ambiguity anywhere."""
    pairs = minhash_dup_pairs(sf_dir, threshold)
    cfg = MinHashConfig()
    shingles = _shingle_hash_table(_docs(sf_dir), cfg.shingle_size).materialize()
    n_docs = shingles.count()
    nparts = adaptive_partitions(n_docs)

    def emit(li, ri, est, lrows, rrows) -> pa.Table:
        n = len(li)
        true_ppm = np.empty(n, dtype=np.int64)
        for i in range(n):
            a, b = lrows[i], rrows[i]
            inter = len(np.intersect1d(a, b, assume_unique=True))
            union = len(a) + len(b) - inter
            true_ppm[i] = (inter * 1_000_000) // union if union else 1_000_000
        est_x128 = np.round(np.asarray(est, dtype=np.float64) * cfg.num_perm).astype(np.int64)
        est_ppm = est_x128 * 1_000_000 // cfg.num_perm
        return pa.table(
            {
                "left_id": pa.array(np.asarray(li, dtype=np.int64), type=pa.int64()),
                "right_id": pa.array(np.asarray(ri, dtype=np.int64), type=pa.int64()),
                "est_x128": pa.array(est_x128, type=pa.int64()),
                "true_ppm": pa.array(true_ppm, type=pa.int64()),
                "abs_err_ppm": pa.array(np.abs(est_ppm - true_ppm), type=pa.int64()),
            }
        )

    empty = pa.table(
        {c: pa.array([], type=pa.int64())
         for c in ("left_id", "right_id", "est_x128", "true_ppm", "abs_err_ppm")}
    )
    if n_docs <= BROADCAST_THRESHOLD_ROWS:
        pref = ray.put(_broadcast_payload(shingles, "doc_id", ("sh",)))

        def audit_b(t: pa.Table) -> pa.Table:
            pm = ray.get(pref)
            if len(t) == 0 or pm is None:
                return empty
            li = t["left_id"].to_numpy(zero_copy_only=False)
            ri = t["right_id"].to_numpy(zero_copy_only=False)
            lrows = [np.frombuffer(b, dtype=np.uint64) for b in _payload_gather(pm, li, "sh")]
            rrows = [np.frombuffer(b, dtype=np.uint64) for b in _payload_gather(pm, ri, "sh")]
            return emit(li, ri, t["est_jaccard"].to_numpy(zero_copy_only=False), lrows, rrows)

        out = pairs.map_batches(audit_b, batch_format="pyarrow")
    else:
        enriched = attach_pair_sides(
            pairs, shingles, id_col="doc_id", cols=("sh",), num_partitions=nparts
        )

        def audit_j(t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return empty
            return emit(
                t["left_id"].to_numpy(zero_copy_only=False),
                t["right_id"].to_numpy(zero_copy_only=False),
                t["est_jaccard"].to_numpy(zero_copy_only=False),
                unpack_ragged(t["l_sh"], np.uint64),
                unpack_ragged(t["r_sh"], np.uint64),
            )

        out = enriched.map_batches(audit_j, batch_format="pyarrow")
    out = out.materialize()
    return empty if out.count() == 0 else out


D_MINHASH_ACCURACY_SQL = f"""
WITH p AS ({D_MINHASH_SQL}),
t AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+') AS toks
  FROM documents),
s AS (
  SELECT doc_id, list_distinct(CASE
    WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
    WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
    ELSE list_transform(range(1, len(toks) - 1),
                        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
  END) AS sh FROM t),
sizes AS (SELECT doc_id, len(sh) AS n FROM s),
e AS (SELECT doc_id, unnest(sh) AS g FROM s),
i AS (
  SELECT p.left_id, p.right_id, count(*) AS inter
  FROM p JOIN e a ON a.doc_id = p.left_id
         JOIN e b ON b.doc_id = p.right_id AND b.g = a.g
  GROUP BY 1, 2)
SELECT p.left_id, p.right_id,
       CAST(round(p.est_jaccard * 128) AS BIGINT) AS est_x128,
       CAST(CASE WHEN sa.n + sb.n - coalesce(i.inter, 0) = 0 THEN 1000000
                 ELSE coalesce(i.inter, 0) * 1000000 // (sa.n + sb.n - coalesce(i.inter, 0))
            END AS BIGINT) AS true_ppm,
       CAST(abs(CAST(round(p.est_jaccard * 128) AS BIGINT) * 1000000 // 128
                - CASE WHEN sa.n + sb.n - coalesce(i.inter, 0) = 0 THEN 1000000
                       ELSE coalesce(i.inter, 0) * 1000000 // (sa.n + sb.n - coalesce(i.inter, 0))
                  END) AS BIGINT) AS abs_err_ppm
FROM p
JOIN sizes sa ON sa.doc_id = p.left_id
JOIN sizes sb ON sb.doc_id = p.right_id
LEFT JOIN i ON i.left_id = p.left_id AND i.right_id = p.right_id
"""


def t_lsh_bucket_stats(sf_dir: str, minhash_cfg: MinHashConfig | None = None):
    """LSH bucket-size histogram — the skew telemetry a dedup deployment
    watches before every run: the bucket-size distribution decides the pair
    budget (pairs per bucket are quadratic) and flags boilerplate mega-
    buckets before they melt a shuffle.  Plan: the SAME band keys the pair
    pipeline blocks on, ONE distributed groupby count over the (banded)
    key stream, then a tiny histogram groupby over the sizes.  Output
    (bucket_size, n_buckets).  The engine's FNV band key and the oracle's
    literal slot-tuple group identically except for ~2^-64 FNV collisions."""
    from ray.data.aggregate import Count

    from ..functions.hashing import band_keys

    cfg = minhash_cfg or MinHashConfig()
    sketches = _doc_sketches(_docs(sf_dir), cfg)

    def emit_keys(t: pa.Table) -> pa.Table:
        sigs = _fsl_mat(t["minhash_sig"], cfg.num_perm)
        keys = (band_keys(sigs, cfg.num_bands) >> np.uint64(1)).astype(np.int64)
        nonempty = ~(sigs == np.uint64(0xFFFFFFFFFFFFFFFF)).all(axis=1)
        return pa.table({"block_key": pa.array(keys[nonempty].ravel(), type=pa.int64())})

    sizes = (
        sketches.map_batches(emit_keys, batch_format="pyarrow")
        .groupby("block_key")
        .aggregate(Count(alias_name="bucket_size"))
    )
    return sizes.groupby("bucket_size").aggregate(Count(alias_name="n_buckets"))


def _lsh_bucket_stats_sql(cfg: MinHashConfig | None = None) -> str:
    c = cfg or MinHashConfig()
    r = c.num_perm // c.num_bands
    slot_tuple = ", ".join(f"CAST(s[{r}*j+{o + 1}] AS VARCHAR)" for o in range(r))
    return f"""
{_minhash_sig_ctes(c)},
keys AS (
  SELECT doc_id, j, concat_ws(',', CAST(j AS VARCHAR), {slot_tuple}) AS bk
  FROM sig, range(0, {c.num_bands}) t(j)),
sizes AS (SELECT bk, count(*) AS bucket_size FROM keys GROUP BY bk)
SELECT CAST(bucket_size AS BIGINT) AS bucket_size, CAST(count(*) AS BIGINT) AS n_buckets
FROM sizes GROUP BY bucket_size
"""


T_LSH_BUCKET_STATS_SQL = _lsh_bucket_stats_sql()


SWEEP_THRESHOLDS_PCT = (50, 60, 70, 80, 90)


def d_minhash_threshold_sweep(sf_dir: str, minhash_cfg: MinHashConfig | None = None):
    """Threshold calibration sweep: verified near-dup pair counts at five
    similarity cutoffs from ONE pair-generation pass — the curve an operator
    reads before picking the dedup threshold (too low floods the closure,
    too high leaks mirrors).  Reuses the memoized 0.5-threshold pair stream;
    the per-threshold counts are per-block partials summed on the driver
    (5 ints per block).  The est_jaccard values are exact dyadics (k/128),
    so the >= comparisons against the decimal cutoffs are float-safe.
    Output (threshold_pct, n_pairs), zero-count thresholds included."""
    cfg = minhash_cfg or MinHashConfig()
    pairs = minhash_dup_pairs(sf_dir, threshold=0.5, minhash_cfg=cfg)
    ths = np.array(SWEEP_THRESHOLDS_PCT, dtype=np.float64) / 100.0

    def partial(t: pa.Table) -> pa.Table:
        est = t["est_jaccard"].to_numpy(zero_copy_only=False)
        counts = (est[None, :] >= ths[:, None]).sum(axis=1).astype(np.int64)
        return pa.table(
            {
                "threshold_pct": pa.array(np.array(SWEEP_THRESHOLDS_PCT, dtype=np.int64)),
                "n_pairs": pa.array(counts, type=pa.int64()),
            }
        )

    p = pairs.map_batches(partial, batch_format="pyarrow").to_pandas()
    if p.empty:
        tots = {int(t): 0 for t in SWEEP_THRESHOLDS_PCT}
    else:
        tots = p.groupby("threshold_pct")["n_pairs"].sum().to_dict()
    return pa.table(
        {
            "threshold_pct": pa.array([int(t) for t in SWEEP_THRESHOLDS_PCT], type=pa.int64()),
            "n_pairs": pa.array([int(tots.get(int(t), 0)) for t in SWEEP_THRESHOLDS_PCT], type=pa.int64()),
        }
    )


D_MINHASH_SWEEP_SQL = f"""
WITH p AS ({_minhash_sql(0.5)})
SELECT t.th AS threshold_pct, CAST(count(p.left_id) AS BIGINT) AS n_pairs
FROM (VALUES (50), (60), (70), (80), (90)) t(th)
LEFT JOIN p ON p.est_jaccard >= t.th / 100.0
GROUP BY t.th
"""


def d_incremental_exact(sf_dir: str):
    """Epoch-state exact dedup — dedup a NEW shard against a finished base
    epoch without rescanning base texts: the base epoch's artifact is its
    (text_hash → min doc_id) keeper state; a new doc is a duplicate when its
    hash is in the state (keeper = the base doc) or when an earlier new doc
    shares its hash (keeper = min new doc_id).  The append-side twin of
    ``er_incremental_append`` for the exact-dedup family.

    Deterministic epoch split (DuckDB ``md5_number_upper`` parity):
    md5(doc_id) % 4 == 0 → new shard (~25%), spread across duplicate groups
    so cross-epoch resolutions actually occur.

    Plan: ONE range shuffle builds the base keeper state (``first_per_key``),
    one more resolves first-wins among the new docs, then two hash joins
    (new ⋈ new-min, left ⋈ state) attach the keepers — every stage keyed on
    text_hash, nothing corpus-proportional on the driver.  Output
    (doc_id, keeper_id, is_dup) for every new doc.
    """
    from .text_analysis import append_md5_text_hash

    docs = _docs(sf_dir)

    def hashed_split(t: pa.Table) -> pa.Table:
        t = append_md5_text_hash(t)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        id_strs = pa.array([str(int(i)) for i in ids], type=pa.string())
        is_new = (md5_u64_dict(id_strs) % np.uint64(4)) == 0
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "text_hash": t["text_hash"],
                "is_new": pa.array(is_new),
            }
        )

    hashed = docs.map_batches(hashed_split, batch_format="pyarrow").materialize()

    def _side(new_side: bool):
        def f(t: pa.Table) -> pa.Table:
            m = t["is_new"] if new_side else pc.invert(t["is_new"])
            return t.filter(m).select(["doc_id", "text_hash"])

        return f

    base = hashed.map_batches(_side(False), batch_format="pyarrow")
    new = hashed.map_batches(_side(True), batch_format="pyarrow")

    def _as_keeper(col: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({"text_hash": t["text_hash"], col: t["doc_id"]})

        return f

    state = first_per_key(base, "text_hash", order_col="doc_id").map_batches(
        _as_keeper("base_keeper"), batch_format="pyarrow"
    )
    new_min = first_per_key(new, "text_hash", order_col="doc_id").map_batches(
        _as_keeper("new_keeper"), batch_format="pyarrow"
    )

    n_new = new.count()
    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "keeper_id": pa.array([], type=pa.int64()),
            "is_dup": pa.array([], type=pa.int64()),
        }
    )
    if n_new == 0:
        return empty
    nparts = adaptive_partitions(n_new)
    j = safe_join(new, new_min, num_partitions=nparts, on=("text_hash",), right_on=("text_hash",))
    j = safe_join(
        j,
        state,
        num_partitions=nparts,
        on=("text_hash",),
        right_on=("text_hash",),
        join_type="left_outer",
        right_fill_schema={"base_keeper": pa.int64()},
    )

    def resolve(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keeper = pc.coalesce(t["base_keeper"], t["new_keeper"]).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "keeper_id": pa.array(keeper, type=pa.int64()),
                "is_dup": pa.array((keeper != ids).astype(np.int64), type=pa.int64()),
            }
        )

    return j.map_batches(resolve, batch_format="pyarrow")


D_INCREMENTAL_EXACT_SQL = """
WITH d AS (
  SELECT doc_id,
         md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS h,
         md5_number_upper(CAST(doc_id AS VARCHAR)) % 4 = 0 AS is_new
  FROM documents),
state AS (SELECT h, min(doc_id) AS base_keeper FROM d WHERE NOT is_new GROUP BY h),
nm AS (SELECT h, min(doc_id) AS new_keeper FROM d WHERE is_new GROUP BY h)
SELECT n.doc_id,
       CAST(coalesce(s.base_keeper, nm.new_keeper) AS BIGINT) AS keeper_id,
       CAST(coalesce(s.base_keeper, nm.new_keeper) <> n.doc_id AS BIGINT) AS is_dup
FROM d n JOIN nm ON nm.h = n.h LEFT JOIN state s ON s.h = n.h
WHERE n.is_new
"""


def d_incremental_fuzzy(sf_dir: str, threshold: float = 0.6):
    """Epoch-state MinHash near-dup apply — the fuzzy twin of
    ``d_incremental_exact``: a NEW shard (md5(doc_id) % 4 == 0, DuckDB
    ``md5_number_upper`` parity) joins a base epoch whose persisted artifacts
    are its doc SKETCHES and verified PAIR EDGES.  Because LSH band keys are
    pure functions of a doc's own signature (``_minhash_band_blocks``), the
    full-corpus pair set decomposes exactly into base↔base pairs (the base
    epoch's artifact) ∪ pairs touching a new doc (enumerated here from blocks
    containing ≥1 new doc only) — so transitive clustering over the edge
    union equals a from-scratch run, and the DuckDB oracle is the SAME
    full-corpus recursive closure as ``d_apply_fuzzy``'s.  (Caveat shared
    with ``er_incremental_append``: an over-cap hot block's pair-budget
    stride is a per-epoch subsample.)  Output (doc_id, rep_doc_id, keep).
    """
    from ..config import ClusteringConfig, scale_gate
    from ..stages.clustering import propagate_labels

    cfg = MinHashConfig()
    sketches = _doc_sketches(_docs(sf_dir), cfg).materialize()
    n_docs = sketches.count()
    # build the broadcast sketch payload ONCE for both epoch pair passes
    payload_ref = (
        ray.put(_broadcast_payload(sketches, "doc_id", ("minhash_sig",)))
        if n_docs <= scale_gate(BROADCAST_THRESHOLD_ROWS)
        else None
    )

    # epoch membership is a PURE FUNCTION of doc_id (md5 parity), so it is
    # recomputed per row INSIDE each task — the driver never gathers, holds
    # or broadcasts an id set (the "new" side here is a fixed ~25% fraction
    # of the corpus, not a small shard, so an id broadcast would be
    # corpus-proportional; contrast er_incremental_append, whose broadcast
    # is genuinely bounded by the append shard).
    def _is_new(arr: np.ndarray) -> np.ndarray:
        id_strs = pa.array([str(int(i)) for i in arr], type=pa.string())
        return (md5_u64_dict(id_strs) % np.uint64(4)) == 0

    blocks = _minhash_band_blocks(sketches, cfg).materialize()

    # base epoch's pair artifact: base↔base pairs from base-only blocks
    def base_rows(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(~_is_new(t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64))))

    base_pairs = _verified_pairs_from_blocks(
        blocks.map_batches(base_rows, batch_format="pyarrow"),
        sketches, n_docs, threshold, cfg, payload_ref=payload_ref,
    )

    # append epoch: blocks touching >=1 new doc, pairs with >=1 new endpoint.
    # The touched-key set is O(|new docs| x num_bands) — corpus-proportional
    # under the md5%4 split — so the membership filter is size-gated: small
    # sets broadcast once (searchsorted per batch); at scale the filter is a
    # distributed SEMI-JOIN of the block stream against the distinct touched
    # keys.  --at-scale-plans forces the semi-join plan via scale_gate and the
    # local sweep pins it value-equal to the broadcast plan.
    def new_keys(t: pa.Table) -> pa.Table:
        m = _is_new(t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"block_key": pc.array_filter(t["block_key"], pa.array(m))})

    touched_ds = first_per_key(
        blocks.map_batches(new_keys, batch_format="pyarrow"), "block_key"
    ).materialize()
    n_touched = touched_ds.count()
    if n_touched <= scale_gate(BROADCAST_THRESHOLD_ROWS):
        touched = np.sort(
            np.concatenate(
                [
                    t["block_key"].to_numpy(zero_copy_only=False)
                    for t in touched_ds.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
                ]
                or [np.empty(0, np.int64)]
            ).astype(np.int64)
        )
        keys_ref = ray.put(touched)

        def touched_rows(t: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref)
            bk = t["block_key"].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(ks) == 0:
                return t.slice(0, 0)
            pos = np.searchsorted(ks, bk)
            m = (pos < len(ks)) & (ks[np.minimum(pos, len(ks) - 1)] == bk)
            return t.filter(pa.array(m))

        blocks_touched = blocks.map_batches(touched_rows, batch_format="pyarrow")
    else:
        blocks_touched = safe_join(
            blocks,
            touched_ds,
            num_partitions=adaptive_partitions(n_touched, cap=32),
            on=("block_key",),
            right_on=("block_key",),
        )

    def only_new_pairs(t: pa.Table) -> pa.Table:
        a = t["left_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["right_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(_is_new(a) | _is_new(b)))

    new_pairs = _verified_pairs_from_blocks(
        blocks_touched,
        sketches, n_docs, threshold, cfg, payload_ref=payload_ref,
    ).map_batches(only_new_pairs, batch_format="pyarrow")

    edges = base_pairs.union(new_pairs).map_batches(
        lambda t: pa.table({"src": t["left_id"], "dst": t["right_id"]}), batch_format="pyarrow"
    )
    clusters = propagate_labels(edges, _docs(sf_dir, columns=("doc_id",)), ClusteringConfig())

    def finish(t: pa.Table) -> pa.Table:
        rep = t["cluster_id"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "rep_doc_id": pa.array(rep, type=pa.int64()),
                "keep": pa.array(rep == ids),
            }
        )

    return clusters.map_batches(finish, batch_format="pyarrow")


# The incremental path must reproduce the from-scratch closure exactly —
# its oracle IS d_apply_fuzzy's full-corpus recursive-CTE closure.  Scope
# caveat: the SQL closure is uncapped, so equality holds only while no LSH
# block exceeds max_block_size=500 (true at every shipped sf; a grown hot
# block's pair-budget stride is per-epoch — see the docstring).
D_INCREMENTAL_FUZZY_SQL = D_APPLY_FUZZY_SQL

"""Deterministic hashing kernels: interning hashes, stable u64 ids, MinHash, SimHash.

Reference analog for string interning: ``compute_string_hash``
(/root/reference/src/utils.py:88-112) — MD5 of the string, with a fixed constant for
empty input.  We keep MD5 as the interning key (hex form, DuckDB-oracle-matchable
via ``md5(...)``) and additionally expose the reference's decimal-int form for
parity.  All other hashing (doc ids, shingles, band keys) uses stable 64-bit
hashes computed vectorized — never Python's seed-dependent ``hash()``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Reference uses a fixed constant hash for empty strings (src/utils.py:99).
EMPTY_MD5_HEX = hashlib.md5(b"").hexdigest()

_FNV_OFFSET = np.uint64(1469598103934665603)
_FNV_PRIME = np.uint64(1099511628211)
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def md5_hex(values) -> list[str]:
    """MD5 hex digest per string (None/empty → digest of b"").

    Matches DuckDB ``md5(col)`` exactly for non-null strings — the oracle parity
    contract for the interning queries.
    """
    out = []
    for v in values:
        b = v.encode("utf-8") if isinstance(v, str) else (v or b"")
        out.append(hashlib.md5(b).hexdigest())
    return out


def md5_int_str(values) -> list[str]:
    """Reference-parity interning key: MD5 hex converted to a decimal integer
    string (/root/reference/src/utils.py:88-112)."""
    return [str(int(h, 16)) for h in md5_hex(values)]


def stable_u64(values: np.ndarray | list, key: str = "er_ray_engine_k0") -> np.ndarray:
    """Stable (process-independent) unsigned 64-bit hash of strings, vectorized.

    Uses pandas' SipHash-based ``hash_array`` with a fixed key — deterministic
    across runs, workers and machines (unlike builtin ``hash``).
    """
    arr = np.asarray(values, dtype=object)
    # hash_key must be exactly 16 bytes
    return pd.util.hash_array(arr, hash_key=key, categorize=False).astype(np.uint64)


def stable_hex128(values: np.ndarray | list) -> np.ndarray:
    """128-bit stable content hash as a 32-char hex key (U32 numpy array):
    two independent SipHash-64 lanes packed big-endian and hexed in one
    buffer pass.  Interning/dedup keys need >64 bits — birthday collisions on
    a 63-bit key become expected around ~3e9 rows and fail silently."""
    arr = np.asarray(values, dtype=object)
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype="U32")
    h = np.empty((n, 2), dtype=">u8")
    h[:, 0] = stable_u64(arr, key="er_ray_engine_k0")
    h[:, 1] = stable_u64(arr, key="er_ray_engine_k1")
    return np.frombuffer(h.tobytes().hex().encode("ascii"), dtype="S32").astype("U32")


def doc_id_for_urls(urls) -> np.ndarray:
    """int64 doc id from url — the engine's record key (url plays the role of
    the reference's ``personId``, FIXTURES.md §1).

    63-bit (top bit dropped) so the id survives every signed-int64 context —
    Ray groupby/Min aggregates, pandas merges, DuckDB oracles — without
    overflow or float round-trips.
    """
    return (stable_u64(urls) >> np.uint64(1)).astype(np.int64)


class MinHasher:
    """Vectorized MinHash signatures over word shingles.

    k universal-ish hash functions h_i(x) = (a_i * x + b_i) mod 2^64 applied to
    stable u64 shingle hashes; signature element i = min over shingles.
    Deterministic from (num_perm, seed).  Replaces the reference's
    OpenAI-embedding + Weaviate-HNSW similarity machinery
    (/root/reference/src/batch_parallel_embedding.py, batch_parallel_indexing.py)
    with a self-contained sketch.
    """

    def __init__(self, num_perm: int = 128, seed: int = 42):
        rng = np.random.RandomState(seed)
        # odd multipliers for better mixing under mod-2^64 arithmetic
        self.a = (rng.randint(1, 2**62, size=num_perm).astype(np.uint64) * np.uint64(2) + np.uint64(1))
        self.b = rng.randint(0, 2**62, size=num_perm).astype(np.uint64)
        self.num_perm = num_perm

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        """(n_shingles,) u64 → (num_perm,) u64 signature; empty input → all MAX."""
        if shingle_hashes.size == 0:
            return np.full(self.num_perm, _MASK64, dtype=np.uint64)
        with np.errstate(over="ignore"):
            # (n, k) = shingles × permutations; overflow wraps mod 2^64 (intended)
            m = shingle_hashes[:, None] * self.a[None, :] + self.b[None, :]
        return m.min(axis=0)

    def signatures(self, shingle_hash_arrays) -> np.ndarray:
        """List of per-doc shingle-hash arrays → (n_docs, num_perm) u64."""
        out = np.empty((len(shingle_hash_arrays), self.num_perm), dtype=np.uint64)
        for i, sh in enumerate(shingle_hash_arrays):
            out[i] = self.signature(sh)
        return out


def band_keys(signatures: np.ndarray, num_bands: int) -> np.ndarray:
    """LSH band keys, vectorized: (n_docs, num_perm) u64 → (n_docs, num_bands) u64.

    Two docs share key j iff their signatures agree on band j's slice.  The band
    index is mixed into the FNV fold so different bands occupy disjoint key
    spaces.  Keys are uint64 (not strings) — far cheaper to shuffle/groupby at
    scale; a 64-bit birthday collision merely merges two unrelated blocks, which
    costs a few spurious candidate pairs that the scorer prunes (recall is
    unaffected — blocking keys only ever ADD candidates).
    """
    n_docs, num_perm = signatures.shape
    assert num_perm % num_bands == 0, "num_perm must be divisible by num_bands"
    r = num_perm // num_bands
    sig3 = signatures.reshape(n_docs, num_bands, r)
    bands = np.arange(1, num_bands + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        acc = np.broadcast_to((_FNV_OFFSET ^ bands) * _FNV_PRIME, (n_docs, num_bands)).copy()
        for j in range(r):
            acc = (acc ^ sig3[:, :, j]) * _FNV_PRIME
    return acc


def md5_u64(s: str) -> int:
    """Little-endian first 8 md5 bytes — EXACTLY DuckDB's ``md5_number_upper``,
    so any operator built on this hash is SQL-oracled."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


def md5_u64_arr(strings) -> np.ndarray:
    """``md5_u64`` over a sequence of strings → uint64 array.

    The shingle hash for the dedup MinHash path: DuckDB ``md5_number_upper``
    parity makes the whole MinHash signature (and therefore the LSH pair set)
    exactly SQL-reproducible, like ``simhash64`` above."""
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        out[i] = int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")
    return out


def md5_u64_dict(strings: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """``md5_u64_arr`` over an Arrow string array, hashing each DISTINCT
    string once: web tokens/shingles are zipfian, so dictionary-encode,
    md5 only the dictionary, then gather.  Returns uint64 per input row."""
    if len(strings) == 0:
        return np.empty(0, dtype=np.uint64)
    enc = pc.dictionary_encode(strings)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    uniq_hashes = md5_u64_arr(enc.dictionary.to_pylist())
    return uniq_hashes[enc.indices.to_numpy(zero_copy_only=False)]


def simhash64_flat(tok_hashes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """``simhash64`` from pre-hashed flat tokens + doc offsets.

    The expensive part (md5 per token) is paid once upstream via
    ``md5_u64_dict``; here each doc's (n_tokens, 64) bit matrix comes from one
    ``np.unpackbits`` pass over the little-endian byte view (column j == bit
    j) and stays cache-sized — a corpus-wide bit matrix + segmented cumsum
    measured 10× slower (same lesson as minhash reduceat).  Empty docs hash
    to 0 (same as ``simhash64``)."""
    n = np.diff(offsets).astype(np.int64)
    out = np.zeros(len(n), dtype=np.uint64)
    if tok_hashes.size == 0:
        return out
    bits = np.arange(64, dtype=np.uint64)
    bytes_view = np.ascontiguousarray(tok_hashes).view(np.uint8).reshape(-1, 8)
    for i in range(len(n)):
        if n[i] == 0:
            continue
        bitmat = np.unpackbits(bytes_view[offsets[i] : offsets[i + 1]], axis=1, bitorder="little")
        votes = bitmat.sum(axis=0, dtype=np.int64) * 2 - n[i]
        out[i] = ((votes > 0).astype(np.uint64) << bits).sum(dtype=np.uint64)
    return out


def hyperplanes(n_planes: int, dim: int, seed: int) -> np.ndarray:
    """The engine's random-hyperplane matrix — deterministic from (seed, shape);
    shared by the LSH embedding paths and their SQL oracles."""
    return np.random.RandomState(seed).randn(n_planes, dim)


def hyperplane_code_sql(col: str, n_planes: int, dim: int, seed: int) -> str:
    """SQL expression computing the engine's hyperplane sign-bit code for a
    DOUBLE[] column ``col`` — the plane constants inlined as full-precision
    literals (repr round-trips to the identical float64).  Sign of the dot
    product is scale-invariant, so the code matches whether the engine hashed
    raw or L2-normalized vectors."""
    planes = hyperplanes(n_planes, dim, seed)
    bits = []
    for p in range(n_planes):
        lit = "[" + ",".join(repr(float(x)) for x in planes[p]) + "]"
        bits.append(
            f"(CASE WHEN list_dot_product({col}, {lit}) > 0"
            f" THEN {1 << p}::UBIGINT ELSE 0::UBIGINT END)"
        )
    return "(" + " | ".join(bits) + ")"


def simhash64(token_lists) -> np.ndarray:
    """64-bit SimHash per document from its token multiset (unweighted).

    Near-duplicates have small Hamming distance between simhashes.  Token
    hash = md5_u64 (DuckDB ``md5_number_upper`` parity) so both the
    fingerprint and Hamming-verified near-dup pairs are exactly
    SQL-reproducible (round-1 used a SipHash no SQL function computes).
    Repeated tokens are memoized per batch — web text is zipfian."""
    out = np.zeros(len(token_lists), dtype=np.uint64)
    bits = np.arange(64, dtype=np.uint64)
    memo: dict[str, int] = {}
    for i, toks in enumerate(token_lists):
        if not toks:
            continue
        h = np.empty(len(toks), dtype=np.uint64)
        for j, tk in enumerate(toks):
            v = memo.get(tk)
            if v is None:
                v = md5_u64(tk)
                memo[tk] = v
            h[j] = v
        # (n_tokens, 64) bit matrix → column sums vs n/2
        bitmat = ((h[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int64)
        votes = bitmat.sum(axis=0) * 2 - len(toks)
        out[i] = ((votes > 0).astype(np.uint64) << bits).sum(dtype=np.uint64)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between u64 arrays."""
    x = np.bitwise_xor(a, b)
    # popcount via unpackbits on the byte view
    bytes_view = x.astype(np.uint64).view(np.uint8).reshape(len(x), 8)
    return np.unpackbits(bytes_view, axis=1).sum(axis=1)

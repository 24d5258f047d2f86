"""Pairwise similarity kernels for the feature-engineering stage.

Reference analogs (/root/reference/src/batch_parallel_feature_engineering.py):
- cosine similarity :670-702 (0.0 on empty/zero vectors), [-1,1]→[0,1] renorm :437-439
- Levenshtein similarity :504-514 (1 - dist/max_len)
- Jaro-Winkler :516-520 (reference uses jellyfish; ours is a from-scratch
  implementation of the public algorithm)
- harmonic mean /root/reference/src/utils.py:163-176 (2ab/(a+b), 0 if either <= 0)
- product interaction :549-554, sigmoid-normalized ratio :556-570

All kernels operate on whole batches (numpy arrays / lists) — per-pair Python is
confined to the intrinsically scalar string DPs, each of which is O(len^2) C-ish
numpy row DP rather than nested Python loops.
"""

from __future__ import annotations

import numpy as np


def harmonic_mean(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """2ab/(a+b); 0.0 where either side <= 0 (reference /root/reference/src/utils.py:163-176)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    denom = a + b
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where((a > 0) & (b > 0) & (denom > 0), 2.0 * a * b / np.where(denom == 0, 1, denom), 0.0)
    return out


def renorm_01(cos: np.ndarray) -> np.ndarray:
    """[-1,1] → [0,1] (reference :437-439)."""
    return (np.asarray(cos, dtype=np.float64) + 1.0) / 2.0


def sigmoid_ratio(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Sigmoid-normalized ratio 2/(1+e^-r)-1 with r=min/max (reference :556-570);
    0 where either side is 0."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mx = np.maximum(a, b)
    mn = np.minimum(a, b)
    r = np.where(mx > 0, mn / np.where(mx == 0, 1, mx), 0.0)
    return 2.0 / (1.0 + np.exp(-r)) - 1.0


def levenshtein_sim(a: str, b: str) -> float:
    """1 - levenshtein(a,b)/max(len); 1.0 for two empties (reference :504-514).

    Two-row list DP: for the short strings this kernel sees (titles, url
    parts) a plain Python inner loop beats numpy row ops ~20x (per-op numpy
    overhead dominates at width < ~100)."""
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    if a == b:
        return 1.0
    if la < lb:
        a, b, la, lb = b, a, lb, la
    prev = list(range(lb + 1))
    for i in range(la):
        ca = a[i]
        cur = [i + 1] * (lb + 1)
        run = i + 1
        for j in range(lb):
            c = prev[j] if ca == b[j] else (prev[j] + 1)
            d = prev[j + 1] + 1
            if d < c:
                c = d
            if run + 1 < c:
                c = run + 1
            cur[j + 1] = c
            run = c
        prev = cur
    return 1.0 - prev[lb] / la


def _codepoint_matrix(strs) -> tuple[np.ndarray, np.ndarray]:
    """(n,) sequence of str → ((n, W) uint32 codepoint matrix zero-padded to the
    longest string, (n,) int64 lengths).  numpy U-dtype arrays are fixed-width
    UCS4, so the view is a single copy-free reinterpretation.  Precondition:
    no embedded NUL characters (impossible in extracted titles/urls — numpy U
    arrays cannot round-trip them anyway)."""
    a = np.asarray(strs, dtype=np.str_)
    n = len(a)
    w = max(1, a.dtype.itemsize // 4)
    if a.dtype.itemsize == 0:  # all-empty input: view would be 0-width
        return np.zeros((n, 1), dtype=np.uint32), np.zeros(n, dtype=np.int64)
    m = a.view(np.uint32).reshape(n, w)
    return m, (m != 0).sum(axis=1).astype(np.int64)


def levenshtein_dist_batch(A, B) -> np.ndarray:
    """Vectorized INTEGER edit distances over parallel string sequences —
    DuckDB ``levenshtein`` parity (exact, no float in the result).  Same DP
    as ``levenshtein_sim_batch`` (which wraps this); equal pairs and
    empty-side pairs short-circuit."""
    am_all, la_all = _codepoint_matrix(A)
    bm_all, lb_all = _codepoint_matrix(B)
    n = len(am_all)
    out = np.zeros(n, dtype=np.int64)
    eq = np.asarray(A, dtype=np.str_) == np.asarray(B, dtype=np.str_)
    either_empty = ~eq & ((la_all == 0) | (lb_all == 0))
    out[either_empty] = np.maximum(la_all, lb_all)[either_empty]
    todo = ~eq & ~either_empty
    if not todo.any():
        return out
    idx = np.nonzero(todo)[0]
    # re-pack the DP subset so W is the subset's own max width
    am, la = _codepoint_matrix(np.asarray(A, dtype=np.str_)[idx])
    bm, lb = _codepoint_matrix(np.asarray(B, dtype=np.str_)[idx])
    k = len(idx)
    La, Lb = am.shape[1], bm.shape[1]
    am = np.where(am == 0, np.uint32(0xFFFFFFFF), am)
    bm = np.where(bm == 0, np.uint32(0xFFFFFFFE), bm)
    prev = np.broadcast_to(np.arange(Lb + 1, dtype=np.int32), (k, Lb + 1)).copy()
    dist = np.empty(k, dtype=np.int32)
    for i in range(La):
        cur = np.empty((k, Lb + 1), dtype=np.int32)
        cur[:, 0] = i + 1
        sub = prev[:, :-1] + (am[:, i : i + 1] != bm).astype(np.int32)
        m = np.minimum(sub, prev[:, 1:] + 1)
        run = cur[:, 0].copy()
        for j in range(Lb):
            run = np.minimum(m[:, j], run + 1)
            cur[:, j + 1] = run
        hit = la == i + 1
        if hit.any():
            dist[hit] = cur[hit, lb[hit]]
        prev = cur
    out[idx] = dist
    return out


def levenshtein_sim_batch(A, B) -> np.ndarray:
    """Vectorized ``levenshtein_sim`` over parallel string sequences.

    Row DP with the pairs axis vectorized (see ``levenshtein_dist_batch``):
    the i/j loops are Python but every cell update is an O(n_pairs) numpy op,
    ~3-5x the scalar kernel on title-sized strings and growing with batch
    size.  Bit-identical to the scalar kernel (pinned by tests): sim =
    1 - d/max(len), with the two-empties pair defined as 1.0."""
    d = levenshtein_dist_batch(A, B)
    _, la = _codepoint_matrix(A)
    _, lb = _codepoint_matrix(B)
    m = np.maximum(la, lb)
    return np.where(m == 0, 1.0, 1.0 - d / np.maximum(m, 1))


def jaro_winkler_batch(A, B, prefix_scale: float = 0.1) -> np.ndarray:
    """Vectorized ``jaro_winkler`` over parallel string sequences.

    The greedy match loop runs over character position i (Python) with the
    pairs axis fully vectorized: window masks, first-available-match argmax,
    and transposition counting are all (n_pairs, len) numpy ops.  Bit-identical
    to the scalar kernel (pinned by tests)."""
    am, la = _codepoint_matrix(A)
    bm, lb = _codepoint_matrix(B)
    n, La = am.shape
    Lb = bm.shape[1]
    if n == 0:
        return np.empty(0, dtype=np.float64)
    md = np.maximum(0, np.maximum(la, lb) // 2 - 1)
    jarr = np.arange(Lb)
    b_avail = bm != 0
    a_match = np.zeros((n, La), dtype=bool)
    b_match = np.zeros((n, Lb), dtype=bool)
    rows = np.arange(n)
    for i in range(La):
        ai = am[:, i]
        cand = (
            (jarr >= (i - md)[:, None])
            & (jarr <= (i + md)[:, None])
            & b_avail
            & (bm == ai[:, None])
            & (ai != 0)[:, None]
        )
        j = cand.argmax(axis=1)
        found = cand[rows, j]
        rsel = rows[found]
        jsel = j[found]
        b_avail[rsel, jsel] = False
        b_match[rsel, jsel] = True
        a_match[rsel, i] = True
    m = a_match.sum(axis=1)
    mm = int(m.max()) if n else 0
    if mm == 0:
        outj = np.zeros(n, dtype=np.float64)
    else:
        # matched chars of each side in order → padded (n, mm) matrices; the
        # transposition count is the positionwise mismatch count // 2
        pa = np.cumsum(a_match, axis=1) - 1
        pb = np.cumsum(b_match, axis=1) - 1
        seq_a = np.zeros((n, mm), dtype=np.uint32)
        seq_b = np.zeros((n, mm), dtype=np.uint32)
        ra, ca = np.nonzero(a_match)
        seq_a[ra, pa[ra, ca]] = am[ra, ca]
        rb, cb = np.nonzero(b_match)
        seq_b[rb, pb[rb, cb]] = bm[rb, cb]
        t = ((seq_a != seq_b) & (np.arange(mm) < m[:, None])).sum(axis=1) // 2
        mf = m.astype(np.float64)
        outj = np.where(
            m > 0,
            (mf / np.maximum(la, 1) + mf / np.maximum(lb, 1) + (mf - t) / np.maximum(mf, 1)) / 3.0,
            0.0,
        )
    outj = np.where((la == 0) & (lb == 0), 1.0, np.where((la == 0) | (lb == 0), 0.0, outj))
    pmax = min(4, La, Lb)
    if pmax > 0:
        peq = (am[:, :pmax] == bm[:, :pmax]) & (am[:, :pmax] != 0)
        prefix = np.cumprod(peq, axis=1).sum(axis=1)
    else:
        prefix = np.zeros(n, dtype=np.int64)
    return outj + prefix * prefix_scale * (1.0 - outj)


def jaro(a: str, b: str) -> float:
    """Jaro similarity (public algorithm; from scratch)."""
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    # window floor 0: for 1-2 char strings max//2-1 is negative and would make
    # identical single chars "unmatched" (jaro('0','0') must be 1.0)
    match_dist = max(0, max(la, lb) // 2 - 1)
    a_match = [False] * la
    b_match = [False] * lb
    matches = 0
    for i in range(la):
        lo = max(0, i - match_dist)
        hi = min(lb, i + match_dist + 1)
        for j in range(lo, hi):
            if not b_match[j] and a[i] == b[j]:
                a_match[i] = True
                b_match[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if a_match[i]:
            while not b_match[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / la + matches / lb + (matches - t) / matches) / 3.0


def jaro_winkler(a: str, b: str, prefix_scale: float = 0.1) -> float:
    """Jaro-Winkler: Jaro boosted by up to 4 chars of common prefix (reference :516-520)."""
    j = jaro(a, b)
    prefix = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca == cb:
            prefix += 1
        else:
            break
    return j + prefix * prefix_scale * (1.0 - j)


def token_jaccard(a_tokens, b_tokens) -> float:
    """Jaccard of token sets; 1.0 for two empties."""
    sa, sb = set(a_tokens), set(b_tokens)
    if not sa and not sb:
        return 1.0
    u = len(sa | sb)
    return len(sa & sb) / u if u else 1.0


_EMPTY_SIG_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


def minhash_agreement(sig_l: np.ndarray, sig_r: np.ndarray) -> np.ndarray:
    """Estimated Jaccard = fraction of agreeing MinHash slots.
    sig_l/sig_r: (n_pairs, num_perm) u64 → (n_pairs,) float64.

    Pairs where EITHER side is the all-sentinel empty-document signature score
    0.0: two empty pages agree on every sentinel slot, which would otherwise
    read as a perfect sketch match (and, with prefilter rules on, force
    prob=1.0) for unrelated empty pages that merely share a block key —
    mirroring how empty docs are already excluded from band keys."""
    agree = (sig_l == sig_r).mean(axis=1)
    empty = (sig_l == _EMPTY_SIG_SENTINEL).all(axis=1) | (sig_r == _EMPTY_SIG_SENTINEL).all(axis=1)
    return np.where(empty, 0.0, agree)


def cosine_dense(vl: np.ndarray, vr: np.ndarray) -> np.ndarray:
    """Row-wise cosine of two (n, d) float matrices; 0.0 where either row is all-zero
    (reference behavior at :670-702)."""
    vl = np.asarray(vl, dtype=np.float64)
    vr = np.asarray(vr, dtype=np.float64)
    num = (vl * vr).sum(axis=1)
    nl = np.linalg.norm(vl, axis=1)
    nr = np.linalg.norm(vr, axis=1)
    denom = nl * nr
    return np.where(denom > 0, num / np.where(denom == 0, 1, denom), 0.0)


def cosine_topk(query: np.ndarray, matrix: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Brute-force top-k cosine of one query against a (n, d) matrix.
    Returns (indices, scores) sorted by (-score, index) for determinism."""
    q = np.asarray(query, dtype=np.float64)
    m = np.asarray(matrix, dtype=np.float64)
    qn = np.linalg.norm(q)
    mn = np.linalg.norm(m, axis=1)
    denom = mn * (qn if qn > 0 else 1.0)
    scores = np.where(denom > 0, m @ q / np.where(denom == 0, 1, denom), 0.0)
    k = min(k, len(scores))
    idx = np.argpartition(-scores, k - 1)[:k] if k < len(scores) else np.arange(len(scores))
    order = np.lexsort((idx, -scores[idx]))
    idx = idx[order]
    return idx, scores[idx]


def sigmoid(z: np.ndarray) -> np.ndarray:
    """Clipped sigmoid (reference /root/reference/src/batch_parallel_classification.py:971-981)."""
    z = np.clip(np.asarray(z, dtype=np.float64), -100.0, 100.0)
    return 1.0 / (1.0 + np.exp(-z))

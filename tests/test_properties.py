"""Property-based tests (hypothesis) for the similarity and hashing kernels —
bounds, symmetry, identity, determinism."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from entity_resolution_pipeline_ray.functions.hashing import MinHasher, md5_hex, stable_u64
from entity_resolution_pipeline_ray.functions.similarity import (
    harmonic_mean,
    jaro_winkler,
    levenshtein_sim,
    token_jaccard,
)
from entity_resolution_pipeline_ray.functions.text import (
    extract_text_from_html,
    normalize_whitespace_str,
    whitespace_token_count,
)

short_text = st.text(max_size=30)


@settings(max_examples=200, deadline=None)
@given(short_text, short_text)
def test_levenshtein_properties(a, b):
    s = levenshtein_sim(a, b)
    assert 0.0 <= s <= 1.0
    assert s == levenshtein_sim(b, a)  # symmetric
    assert levenshtein_sim(a, a) == 1.0


@settings(max_examples=200, deadline=None)
@given(short_text, short_text)
def test_jaro_winkler_properties(a, b):
    s = jaro_winkler(a, b)
    assert 0.0 <= s <= 1.0 + 1e-12
    assert abs(s - jaro_winkler(b, a)) < 1e-12
    assert jaro_winkler(a, a) == 1.0


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=8), max_size=20), st.lists(st.text(min_size=1, max_size=8), max_size=20))
def test_token_jaccard_properties(a, b):
    j = token_jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert j == token_jaccard(b, a)
    assert token_jaccard(a, a) == 1.0


@settings(max_examples=100, deadline=None)
@given(st.floats(0, 1), st.floats(0, 1))
def test_harmonic_mean_bounds(a, b):
    h = harmonic_mean([a], [b])[0]
    assert 0.0 <= h <= max(a, b) + 1e-12
    assert h <= (a + b) / 2 + 1e-12  # HM <= AM


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=50))
def test_normalize_idempotent(s):
    n1 = normalize_whitespace_str(s)
    assert normalize_whitespace_str(n1) == n1  # idempotent
    assert whitespace_token_count(s) == whitespace_token_count(n1)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=200))
def test_extract_deterministic_and_normalized(b):
    t1 = extract_text_from_html(b)
    t2 = extract_text_from_html(b)
    assert t1 == t2
    assert normalize_whitespace_str(t1) == t1  # output is already normalized


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=10), min_size=1, max_size=10))
def test_stable_u64_and_md5_deterministic(vals):
    assert (stable_u64(vals) == stable_u64(list(vals))).all()
    assert md5_hex(vals) == md5_hex(list(vals))


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 2**62), min_size=1, max_size=100, unique=True))
def test_minhash_signature_permutation_invariant(hashes):
    mh = MinHasher(32, 42)
    a = np.asarray(hashes, dtype=np.uint64)
    rng = np.random.RandomState(0)
    b = a[rng.permutation(len(a))]
    assert (mh.signature(a) == mh.signature(b)).all()  # set semantics


# ---------------------------------------------------------------- curation ops

from entity_resolution_pipeline_ray.pipelines.curation import (  # noqa: E402
    BPE_PATTERN,
    EMAIL_RE,
    IP_RE,
    PHONE_RE,
    _contact_strings,
    _gram_hashes_batch,
)

ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=80
)


@settings(max_examples=200, deadline=None)
@given(ascii_text)
def test_bpe_matches_tile_ascii_text(s):
    """Non-overlapping BPE-ish matches exactly tile any printable-ASCII string
    (no character is skipped or double-counted)."""
    import re

    assert "".join(re.findall(BPE_PATTERN, s)) == s


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=10**9))
def test_pii_redaction_idempotent(doc_id):
    import re

    [c] = _contact_strings(np.array([doc_id]))

    def scrub(x):
        x = re.sub(EMAIL_RE, "<EMAIL>", x)
        x = re.sub(PHONE_RE, "<PHONE>", x)
        return re.sub(IP_RE, "<IP>", x)

    once = scrub(c)
    assert scrub(once) == once  # placeholders never re-match
    assert once.count("<EMAIL>") == 1 and once.count("<PHONE>") == 1 and once.count("<IP>") == 1


@settings(max_examples=100, deadline=None)
@given(st.lists(st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]), max_size=20), max_size=8))
def test_gram_hashes_count_and_determinism(docs):
    import pyarrow as pa

    texts = pa.array([" ".join(toks) for toks in docs], type=pa.string())
    h, offs = _gram_hashes_batch(texts)
    sizes = list(np.diff(offs))
    assert sizes == [max(0, len(toks) - 4) if toks else 0 for toks in docs]
    h2, offs2 = _gram_hashes_batch(texts)
    assert (h == h2).all() and (offs == offs2).all()


from entity_resolution_pipeline_ray.pipelines.curation import (  # noqa: E402
    _bit_length_u64,
    _hll_registers,
    HLL_M,
)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 64) - 1))
def test_bit_length_u64_exact(x):
    assert _bit_length_u64(np.array([x], dtype=np.uint64))[0] == x.bit_length()


def test_hll_estimate_accuracy():
    # 20k distinct hashes -> estimate within ~3 standard errors (1.04/sqrt(m))
    rng = np.random.default_rng(5)
    # full 64-bit range: a 63-bit draw would leave half the buckets empty
    hashes = np.unique(rng.integers(0, 1 << 64, size=20000, dtype=np.uint64))
    reg = _hll_registers(hashes)
    m = HLL_M
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -reg.astype(np.float64)))
    rel_err = abs(est - len(hashes)) / len(hashes)
    assert rel_err < 3 * 1.04 / np.sqrt(m)


def test_hll_registers_mergeable():
    # register-wise max of two partials == registers of the union (the
    # distributed merge invariant)
    rng = np.random.default_rng(6)
    a = rng.integers(0, 1 << 64, size=500, dtype=np.uint64)
    b = rng.integers(0, 1 << 64, size=500, dtype=np.uint64)
    merged = np.maximum(_hll_registers(a), _hll_registers(b))
    assert (merged == _hll_registers(np.concatenate([a, b]))).all()


from hypothesis import given, settings, strategies as st


@st.composite
def _edge_lists(draw):
    n = draw(st.integers(min_value=2, max_value=12))
    m = draw(st.integers(min_value=1, max_value=30))
    edges = draw(
        st.lists(
            st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)).filter(lambda e: e[0] != e[1]),
            min_size=m,
            max_size=m,
        )
    )
    return sorted(set(edges))


def _pagerank_reference(edges, iters=3):
    """10-line driver replay of the exact integer recurrence."""
    from entity_resolution_pipeline_ray.pipelines.graph import DAMP_DEN, DAMP_NUM, SCALE

    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    n = len(nodes)
    rank = {v: SCALE // n for v in nodes}
    teleport = (SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN) // n
    for _ in range(iters):
        acc = {v: 0 for v in nodes}
        for u, v in edges:
            acc[v] += (rank[u] * DAMP_NUM // DAMP_DEN) // deg[u]
        rank = {v: teleport + acc[v] for v in nodes}
    return rank


@settings(max_examples=8, deadline=None)
@given(_edge_lists())
def test_pagerank_on_edges_matches_reference_replay(ray_session, edges):
    import pyarrow as pa

    import ray.data as rd

    from entity_resolution_pipeline_ray.pipelines.graph import pagerank_on_edges

    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([u for u, _ in edges], type=pa.int64()),
                "dst": pa.array([v for _, v in edges], type=pa.int64()),
            }
        )
    )
    got = pagerank_on_edges(ds, iters=3)
    gdf = got.to_pandas()  # pa.Table (broadcast plan) and Dataset both expose it
    ref = _pagerank_reference(edges, iters=3)
    assert dict(zip(gdf["node"], gdf["rank_units"])) == ref

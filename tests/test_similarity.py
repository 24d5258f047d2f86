"""Unit tests for similarity kernels vs scalar oracles
(reference analog: harmonic-mean test /root/reference/tests/test_pipeline.py:71-78)."""

import numpy as np
import pytest

from entity_resolution_pipeline_ray.functions.similarity import (
    cosine_dense,
    cosine_topk,
    harmonic_mean,
    jaro,
    jaro_winkler,
    levenshtein_sim,
    minhash_agreement,
    renorm_01,
    sigmoid,
    sigmoid_ratio,
    token_jaccard,
)


def test_harmonic_mean():
    assert harmonic_mean([0.5], [0.5])[0] == pytest.approx(0.5)
    assert harmonic_mean([1.0], [0.0])[0] == 0.0
    assert harmonic_mean([0.0], [0.0])[0] == 0.0
    assert harmonic_mean([0.2], [0.8])[0] == pytest.approx(2 * 0.2 * 0.8 / 1.0)


def test_renorm_and_sigmoid():
    assert renorm_01(np.array([-1.0, 0.0, 1.0])).tolist() == [0.0, 0.5, 1.0]
    assert sigmoid(np.array([0.0]))[0] == 0.5
    assert sigmoid(np.array([1000.0]))[0] == pytest.approx(1.0)  # clipped, no overflow
    assert sigmoid_ratio(np.array([1.0]), np.array([1.0]))[0] == pytest.approx(2 / (1 + np.exp(-1)) - 1)
    assert sigmoid_ratio(np.array([0.0]), np.array([5.0]))[0] == pytest.approx(0.0)


def test_levenshtein_known_values():
    assert levenshtein_sim("kitten", "sitting") == pytest.approx(1 - 3 / 7)
    assert levenshtein_sim("abc", "abc") == 1.0
    assert levenshtein_sim("", "") == 1.0
    assert levenshtein_sim("abc", "") == 0.0
    assert levenshtein_sim("flaw", "lawn") == pytest.approx(1 - 2 / 4)


def test_jaro_winkler_known_values():
    # classic published examples
    assert jaro("MARTHA", "MARHTA") == pytest.approx(0.944444, abs=1e-5)
    assert jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.961111, abs=1e-5)
    assert jaro("DWAYNE", "DUANE") == pytest.approx(0.822222, abs=1e-5)
    assert jaro_winkler("DWAYNE", "DUANE") == pytest.approx(0.840000, abs=1e-5)
    assert jaro_winkler("", "") == 1.0
    assert jaro_winkler("a", "") == 0.0
    assert jaro_winkler("same", "same") == 1.0


def test_token_jaccard():
    assert token_jaccard(["a", "b"], ["b", "c"]) == pytest.approx(1 / 3)
    assert token_jaccard([], []) == 1.0
    assert token_jaccard(["a"], []) == 0.0


def test_minhash_agreement_shape():
    a = np.array([[1, 2, 3, 4]], dtype=np.uint64)
    b = np.array([[1, 2, 9, 9]], dtype=np.uint64)
    assert minhash_agreement(a, b)[0] == 0.5


def test_cosine_dense_zero_guard():
    out = cosine_dense(np.array([[0.0, 0.0], [1.0, 0.0]]), np.array([[1.0, 0.0], [1.0, 0.0]]))
    assert out[0] == 0.0 and out[1] == pytest.approx(1.0)


def test_cosine_topk_deterministic():
    rng = np.random.RandomState(0)
    m = rng.randn(100, 8)
    q = m[7]
    idx, scores = cosine_topk(q, m, 5)
    assert idx[0] == 7 and scores[0] == pytest.approx(1.0)
    idx2, _ = cosine_topk(q, m, 5)
    assert (idx == idx2).all()
    assert (np.diff(scores) <= 1e-12).all()  # descending


def test_batch_string_kernels_match_scalar():
    """The vectorized batch DP kernels must be bit-equivalent to the scalar
    kernels they replace in the scoring hot path (same model inputs)."""
    import random

    from entity_resolution_pipeline_ray.functions.similarity import (
        jaro_winkler_batch,
        levenshtein_sim_batch,
    )

    random.seed(11)
    alpha = "abcdefg é中 -"
    cases = [
        ("", ""), ("a", ""), ("", "b"), ("a", "a"), ("ab", "ba"),
        ("martha", "marhta"), ("dixon", "dicksonx"), ("kitten", "sitting"),
        ("The Alpha Beta Page", "The Alpha Beta Page Extra"),
    ]
    for _ in range(500):
        la, lb = random.randint(0, 14), random.randint(0, 14)
        cases.append(
            ("".join(random.choice(alpha) for _ in range(la)),
             "".join(random.choice(alpha) for _ in range(lb)))
        )
    A = [c[0] for c in cases]
    B = [c[1] for c in cases]
    np.testing.assert_allclose(
        levenshtein_sim_batch(A, B), [levenshtein_sim(a, b) for a, b in cases], atol=1e-12
    )
    np.testing.assert_allclose(
        jaro_winkler_batch(A, B), [jaro_winkler(a, b) for a, b in cases], atol=1e-12
    )


def test_batch_string_kernels_empty_and_allempty():
    from entity_resolution_pipeline_ray.functions.similarity import (
        jaro_winkler_batch,
        levenshtein_sim_batch,
    )

    assert levenshtein_sim_batch([], []).shape == (0,)
    assert jaro_winkler_batch([], []).shape == (0,)
    np.testing.assert_allclose(levenshtein_sim_batch(["", ""], ["", "x"]), [1.0, 0.0])
    np.testing.assert_allclose(jaro_winkler_batch(["", ""], ["", "x"]), [1.0, 0.0])


def test_title_features_unique_pair_gather():
    """_title_features computes per unique pair and gathers back: repeated
    pairs must produce identical values to direct scalar computation."""
    from entity_resolution_pipeline_ray.stages.scoring import _StringSimCache, _title_features
    from entity_resolution_pipeline_ray.functions.text import word_tokens

    tl = ["Alpha Beta", "Alpha Beta", "Gamma", "", "Alpha Beta", "Delta"]
    tr = ["Alpha Beta", "Alpha Bets", "Gamma", "", "Alpha Bets", ""]
    cache = _StringSimCache()
    jw, lev, tj, ex = _title_features(tl, tr, cache)
    for i, (a, b) in enumerate(zip(tl, tr)):
        assert jw[i] == pytest.approx(jaro_winkler(a, b), abs=1e-12)
        assert lev[i] == pytest.approx(levenshtein_sim(a, b), abs=1e-12)
        assert tj[i] == pytest.approx(token_jaccard(word_tokens(a), word_tokens(b)), abs=1e-12)
        assert ex[i] == (1.0 if a == b and a != "" else 0.0)
    # second call hits the cross-batch cache and must return the same values
    jw2, lev2, tj2, ex2 = _title_features(tl, tr, cache)
    np.testing.assert_array_equal(jw, jw2)
    np.testing.assert_array_equal(lev, lev2)
    np.testing.assert_array_equal(tj, tj2)
    np.testing.assert_array_equal(ex, ex2)

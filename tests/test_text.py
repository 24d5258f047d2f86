"""Unit tests for the deterministic text kernels (SURVEY §5: per-operator tests
against scalar oracles)."""

import numpy as np
import pyarrow as pa
import pytest

from entity_resolution_pipeline_ray.functions.text import (
    domain_of_url,
    extract_text_from_html,
    extract_title_from_html,
    lang_id,
    normalize_whitespace_arrow,
    normalize_whitespace_str,
    nullify_sentinels,
    quality_stats,
    whitespace_token_count,
    word_shingles,
    word_tokens,
)


def test_normalize_scalar():
    assert normalize_whitespace_str("  a\t\tb\n c  ") == "a b c"
    assert normalize_whitespace_str("") == ""
    assert normalize_whitespace_str("x") == "x"


def test_normalize_arrow_matches_scalar():
    vals = ["  a\t b ", "x\n\ny", "", "  ", "ünï  cödé "]
    arr = pa.array(vals)
    out = normalize_whitespace_arrow(arr).to_pylist()
    assert out == [normalize_whitespace_str(v) for v in vals]


def test_extract_basic():
    html = b"<html><head><title>T &amp; U</title><style>x{}</style><script>var a=1;</script></head><body><p>Hello   <b>world</b></p><!-- note --></body></html>"
    assert extract_text_from_html(html) == "T & U Hello world"
    assert extract_title_from_html(html) == "T & U"


def test_extract_edge_cases():
    assert extract_text_from_html(b"") == ""
    assert extract_text_from_html(None) == ""
    assert extract_text_from_html(b"plain text no tags") == "plain text no tags"
    assert extract_text_from_html(b"<p>unclosed") == "unclosed"
    # unicode + entities
    assert extract_text_from_html("<p>Archäologie &mdash; café</p>".encode()) == "Archäologie — café"
    # invalid utf-8 bytes don't crash and are deterministic
    out1 = extract_text_from_html(b"<p>\xff\xfe bad</p>")
    out2 = extract_text_from_html(b"<p>\xff\xfe bad</p>")
    assert out1 == out2


def test_extract_deterministic_repeat():
    html = b"<html><body><p>abc</p><p>def</p></body></html>"
    assert extract_text_from_html(html) == extract_text_from_html(html) == "abc def"


def test_domain_of_url():
    assert domain_of_url("https://Example.COM/a/b?q=1") == "example.com"
    assert domain_of_url("http://x.io") == "x.io"
    assert domain_of_url("nohost/path") == "nohost"


def test_tokens_and_shingles():
    assert word_tokens("Hello, World! 42") == ["hello", "world", "42"]
    assert word_shingles(["a", "b", "c", "d"], 3) == ["a b c", "b c d"]
    assert word_shingles(["a", "b"], 3) == ["a b"]
    assert word_shingles([], 3) == []


def test_whitespace_token_count():
    assert whitespace_token_count("a b  c") == 3
    assert whitespace_token_count("  ") == 0
    assert whitespace_token_count("") == 0
    assert whitespace_token_count(None) == 0
    assert whitespace_token_count(" one ") == 1


def test_nullify_sentinels():
    arr = pa.array(["NULL", "ok", "", "N/A", "None"])
    out = nullify_sentinels(arr)
    assert out.to_pylist() == [None, "ok", None, None, None]


def test_lang_id():
    assert lang_id("the cat and the dog is in the house for it was") == "en"
    assert lang_id("der hund und die katze ist von dem haus mit den") == "de"
    assert lang_id("") == "und"
    assert lang_id("zzz qqq xxx") == "und"


def test_quality_stats():
    q = quality_stats(np.asarray(["Hello, World 42!", ""], dtype=object))
    assert q["char_count"][0] == 16 and q["char_count"][1] == 0
    assert q["token_count"][0] == 3
    assert q["digit_ratio"][0] == pytest.approx(2 / 16)
    assert q["punct_ratio"][0] == pytest.approx(2 / 16)  # ',' and '!'


def test_quality_stats_vectorized_matches_scalar():
    """The Arrow-RE2 vectorized quality_stats must equal the scalar definition
    (ASCII inputs — the engine's corpus domain)."""
    import numpy as np

    from entity_resolution_pipeline_ray.functions.text import (
        _quality_stats_scalar,
        quality_stats,
    )

    texts = np.asarray(
        [
            "",
            None,
            "Hello, World! 123",
            "the and of to in is that it for with was on",
            "   spaced   out   tokens  ",
            "ALLCAPS!!! 999",
            "a.b,c;d:e!f?g",
            "x" * 500,
        ],
        dtype=object,
    )
    v = quality_stats(texts)
    s = _quality_stats_scalar(texts)
    for k in s:
        np.testing.assert_allclose(v[k].astype(float), s[k].astype(float), atol=1e-12, err_msg=k)


def test_parse_life_years_battery():
    """Typed year extraction over person-name-style strings (reference battery
    parity: /root/reference/src/birth_death_regexes.py)."""
    from entity_resolution_pipeline_ray.functions.text import parse_life_years

    cases = {
        "Smith, John, 1944-2001": (1944, 2001),
        "565 - approximately 665": (565, 665),
        "approximately 1370-approximately 1450": (1370, 1450),
        "(1870-1937)": (1870, 1937),
        "(1900-)": (1900, None),
        "(-1980)": (None, 1980),
        "b. 1901": (1901, None),
        "born circa 1850": (1850, None),
        "d. 1984": (None, 1984),
        "died approximately 1200": (None, 1200),
        "fl. 1500-1550": (1500, 1550),
        "fl. 1500": (1500, None),
        "circa 1800": (1800, None),
        "1900-": (1900, None),
        "- 1980": (None, 1980),
        "1812? - 1870": (1812, 1870),
        "Jones, 565 or 566-640?": (565, 640),
        "Doe, Jane": (None, None),
        "": (None, None),
        None: (None, None),
    }
    for s, expected in cases.items():
        assert parse_life_years(s) == expected, (s, parse_life_years(s), expected)


def test_bio_string_battery_covers_all_variants():
    """t_life_years' derived corpus exercises every battery kind: each of the
    15 bio formats yields the expected (birth, death) shape."""
    from entity_resolution_pipeline_ray.functions.text import parse_life_years
    from entity_resolution_pipeline_ray.pipelines.text_analysis import _bio_string

    # doc_ids 0..14 hit each format once; recompute expected from the formula
    for doc_id in range(15):
        y1 = 1500 + (doc_id * 7) % 400
        y2 = y1 + 20 + doc_id % 60
        b, d = parse_life_years(_bio_string(doc_id))
        expected = [
            (y1, None), (y1, None), (None, y2), (None, y2),  # b./born/d./died
            (y1, y2), (y1, y2), (y1, None), (None, y2),      # fl., (r), (b-), (-d)
            (y1, y2), (y1, None), (None, y2), (y1, None),    # plain range/one-sided/circa
            (y1, None), (y1, y2), (None, None),              # b.?, 'or' range, no years
        ][doc_id % 15]
        assert (b, d) == expected, (doc_id, _bio_string(doc_id), (b, d), expected)


def test_token_lists_arrow_matches_word_tokens():
    """The vectorized tokenizer is bit-identical to the per-string path on
    ASCII corpora (the oracle token spec) incl. nulls/empties/punct-only."""
    import numpy as np
    import pyarrow as pa

    from entity_resolution_pipeline_ray.functions.text import token_lists_arrow, word_tokens

    docs = [
        "Hello, World! foo_bar 42", "", None, "a", "a b", "a b c", "a b c d e",
        "  !!! ", "one-two three", "x " * 500, "Mixed CASE tokens 99_z", "tab\tsep\nline",
    ]
    flat, offs = token_lists_arrow(pa.array(docs, type=pa.string()))
    assert offs[0] == 0 and offs[-1] == len(flat)
    for i, d in enumerate(docs):
        assert flat[offs[i] : offs[i + 1]].to_pylist() == (word_tokens(d) if d else [])


def test_token_lists_arrow_fuzz():
    import random
    import string

    import pyarrow as pa

    from entity_resolution_pipeline_ray.functions.text import token_lists_arrow, word_tokens

    rng = random.Random(7)
    alphabet = string.ascii_letters + string.digits + " .,_!?\n\t-"
    docs = ["".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 200))) for _ in range(300)]
    flat, offs = token_lists_arrow(pa.array(docs))
    for i, d in enumerate(docs):
        assert flat[offs[i] : offs[i + 1]].to_pylist() == word_tokens(d)


def test_shingle_lists_matches_word_shingles():
    import pyarrow as pa

    from entity_resolution_pipeline_ray.functions.text import (
        shingle_lists,
        token_lists_arrow,
        word_shingles,
        word_tokens,
    )

    docs = ["", None, "a", "a b", "a b c", "a b c d", "a b c d e f g", "!!!", "x y " * 50]
    flat, offs = token_lists_arrow(pa.array(docs, type=pa.string()))
    for k in (2, 3, 4, 5):
        sh, so = shingle_lists(flat, offs, k)
        for i, d in enumerate(docs):
            exp = word_shingles(word_tokens(d) if d else [], k)
            assert sh[so[i] : so[i + 1]].to_pylist() == exp, (k, d)
        # short="drop": docs shorter than k emit NOTHING (decontamination rule)
        shd, sod = shingle_lists(flat, offs, k, short="drop")
        for i, d in enumerate(docs):
            toks = word_tokens(d) if d else []
            exp = word_shingles(toks, k) if len(toks) >= k else []
            assert shd[sod[i] : sod[i + 1]].to_pylist() == exp, (k, d)


def test_md5_dict_and_simhash_flat_match_scalar():
    import numpy as np
    import pyarrow as pa

    from entity_resolution_pipeline_ray.functions.hashing import (
        md5_u64_arr,
        md5_u64_dict,
        simhash64,
        simhash64_flat,
    )
    from entity_resolution_pipeline_ray.functions.text import token_lists_arrow, word_tokens

    s = pa.array(["abc", "abc", "", "zz", "abc", "zz"] * 3)
    assert np.array_equal(md5_u64_dict(s), md5_u64_arr(s.to_pylist()))

    docs = ["the cat sat", "", None, "the the the", "a b c d e f", "one"]
    flat, offs = token_lists_arrow(pa.array(docs, type=pa.string()))
    got = simhash64_flat(md5_u64_dict(flat), offs)
    exp = simhash64([word_tokens(d) if d else [] for d in docs])
    assert np.array_equal(got, exp)


def test_signatures_vectorized_matches_scalar():
    """_text_features (the ER doc-features kernel) is bit-identical to the
    scalar per-doc implementation it replaced: same minhash signatures, same
    sparse TF-IDF indices AND float32 values (bincount accumulates each bin
    in occurrence order, like the dict it replaced)."""
    import random

    import numpy as np
    import pyarrow as pa

    from entity_resolution_pipeline_ray.functions.hashing import MinHasher, stable_u64
    from entity_resolution_pipeline_ray.functions.text import word_shingles, word_tokens
    from entity_resolution_pipeline_ray.stages.signatures import _text_features, token_df_partials

    def scalar_features(texts, hasher, shingle_size, vocab):
        n = len(texts)
        sigs = np.empty((n, hasher.num_perm), dtype=np.uint64)
        tf_idx, tf_val = [], []
        token_counts = np.zeros(n, dtype=np.int64)
        for i, t in enumerate(texts):
            toks = word_tokens(t) if t else []
            token_counts[i] = len(toks)
            sh = word_shingles(toks, shingle_size)
            sigs[i] = hasher.signature(
                stable_u64(np.asarray(sh, dtype=object)) if sh else np.empty(0, dtype=np.uint64)
            )
            tf: dict = {}
            for tok in toks:
                ent = vocab.get(tok)
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
        return token_counts, sigs, tf_idx, tf_val

    rng = random.Random(3)
    words = ["w%03d" % i for i in range(300)]
    texts = [" ".join(rng.choice(words) for _ in range(rng.randrange(0, 120))) for _ in range(150)]
    texts += ["", None, "oov tokens only zz qq", "w001"]
    vocab = {w: (i, 1.0 + (i % 7) * 0.31) for i, w in enumerate(words) if i % 3 != 0}
    h = MinHasher(64, 1)
    a = scalar_features(["" if t is None else t for t in texts], h, 3, vocab)
    b = _text_features(pa.array(texts, type=pa.string()), h, 3, vocab)
    assert np.array_equal(a[0], b[0])
    assert np.array_equal(a[1], b[1])
    assert all(np.array_equal(x, y) for x, y in zip(a[2], b[2]))
    assert all(np.array_equal(x, y) for x, y in zip(a[3], b[3]))

    # token_df_partials: distinct-doc counts per token
    def scalar_df(texts):
        counts: dict = {}
        for t in texts:
            if not t:
                continue
            for tok in set(word_tokens(t)):
                counts[tok] = counts.get(tok, 0) + 1
        return counts

    got = token_df_partials(pa.table({"text": pa.array(texts, type=pa.string())}))
    assert dict(zip(got["token"].to_pylist(), got["df"].to_pylist())) == scalar_df(texts)


def test_ws_token_count_regex_equivalence():
    """count_substring_regex(r'\\S+') == whitespace_token_count per string —
    the vectorized t_token_count kernel's contract."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from entity_resolution_pipeline_ray.functions.text import whitespace_token_count

    docs = ["a b  c", "", None, "  ", " x ", "one\ttwo\nthree", "a" * 5, "\n\n", "a b"]
    filled = pc.coalesce(pa.array(docs, type=pa.string()), pa.scalar("", type=pa.string()))
    got = pc.cast(pc.count_substring_regex(filled, pattern=r"\S+"), pa.int64()).to_pylist()
    assert got == [whitespace_token_count(x) for x in docs]
    # divergence channel (documented): unicode whitespace like NBSP is \s to
    # Python but \S to RE2 — the kernel follows RE2 == the DuckDB oracle
    nb = pc.count_substring_regex(pa.array(["a\xa0b"]), pattern=r"\S+")
    assert nb.to_pylist() == [1] and whitespace_token_count("a\xa0b") == 2


def test_zipf_fit_known_answer(ray_session, tmp_path):
    """A corpus whose token counts follow an exact power law n = C * rank^s
    recovers slope s; ranks tie-break (count DESC, token ASC)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from entity_resolution_pipeline_ray.pipelines.text_analysis import t_zipf_fit

    # token w{r} appears floor(1000 / r) times -> slope ~= -1
    texts = []
    for r in range(1, 30):
        texts.extend([f"w{r:02d}"] * (1000 // r))
    docs = [" ".join(texts[i : i + 50]) for i in range(0, len(texts), 50)]
    t = pa.table(
        {"doc_id": list(range(len(docs))), "text": docs,
         "lang": ["en"] * len(docs), "source": ["s"] * len(docs),
         "n_chars": [len(d) for d in docs]}
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = t_zipf_fit(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert out["n_ranks"][0] == 29
    assert abs(out["zipf_slope"][0] + 1.0) < 0.02  # floor() distortion only


def test_zipf_fit_degenerate(ray_session, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from entity_resolution_pipeline_ray.pipelines.text_analysis import t_zipf_fit

    t = pa.table(
        {"doc_id": [0], "text": ["solo solo solo"], "lang": ["en"],
         "source": ["s"], "n_chars": [14]}
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = t_zipf_fit(str(tmp_path)).to_pandas()
    assert out["n_ranks"][0] == 1 and pd.isna(out["zipf_slope"][0])


def test_char_entropy_known_answers(ray_session, tmp_path):
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from entity_resolution_pipeline_ray.pipelines.text_analysis import t_char_entropy

    rows = {0: "aaaa", 1: "ab", 2: "", 3: None, 4: "aabb", 5: "éé", 6: "héllo"}
    t = pa.table(
        {"doc_id": list(rows), "text": pa.array(list(rows.values()), type=pa.string()),
         "lang": ["en"] * 7, "source": ["s"] * 7,
         "n_chars": [len(v) if v else 0 for v in rows.values()]}
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = t_char_entropy(str(tmp_path)).to_pandas().set_index("doc_id")
    assert got.loc[0, "char_entropy"] == 0.0 and got.loc[0, "n_chars_scored"] == 4
    assert abs(got.loc[1, "char_entropy"] - math.log(2)) < 1e-6
    assert got.loc[2, "char_entropy"] == 0.0 and got.loc[2, "n_chars_scored"] == 0
    assert got.loc[3, "char_entropy"] == 0.0 and got.loc[3, "n_chars_scored"] == 0
    assert abs(got.loc[4, "char_entropy"] - math.log(2)) < 1e-6
    # non-ASCII docs score CODEPOINTS (the oracle's unnest), not UTF-8 bytes
    assert got.loc[5, "char_entropy"] == 0.0 and got.loc[5, "n_chars_scored"] == 2
    assert got.loc[6, "n_chars_scored"] == 5
    # {h:1, é:1, l:2, o:1} over 5 codepoints
    exp = -(3 * (1 / 5) * math.log(1 / 5) + (2 / 5) * math.log(2 / 5))
    assert abs(got.loc[6, "char_entropy"] - exp) < 1e-6


def test_chunk_lists_matches_pseudo_lines():
    """chunk_lists (stride-w tiling join) equals the scalar per-doc
    _pseudo_lines for every doc incl. empty/null/short/exact-multiple."""
    import pyarrow as pa

    from entity_resolution_pipeline_ray.functions.text import chunk_lists, token_lists_arrow
    from entity_resolution_pipeline_ray.pipelines.curation import _pseudo_lines

    docs = [
        "", None, "one", " ".join(f"t{i}" for i in range(10)),
        " ".join(f"t{i}" for i in range(25)), " ".join(f"t{i}" for i in range(30)),
        "a b", "x " * 95,
    ]
    flat, offs = token_lists_arrow(pa.array(docs, type=pa.string()))
    lines, l_offs = chunk_lists(flat, offs, 10)
    for i, d in enumerate(docs):
        assert lines[l_offs[i] : l_offs[i + 1]].to_pylist() == _pseudo_lines(d), d

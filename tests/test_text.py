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

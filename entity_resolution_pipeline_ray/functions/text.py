"""Deterministic text kernels: HTML→text extraction, normalization, tokenization.

Reference analogs:
- whitespace-collapse normalizer: /root/reference/src/batch_parallel_preprocessing.py:414-430
  (collapse ``\\s+`` to a single space, strip — the only active normalization there).
- null sentinel list: /root/reference/config.yml:63.
- The HTML extractor is this engine's analog of the reference's per-record field
  extraction (/root/reference/src/batch_parallel_preprocessing.py:304-354), re-targeted
  at Common-Crawl-style pages: a pure, versioned function of the ``html`` bytes.
  EXTRACTOR_VERSION must be bumped on any behavior change so goldens stay honest.
"""

from __future__ import annotations

import html as _htmllib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

EXTRACTOR_VERSION = 1

# Reference null sentinels (config.yml:63); real Arrow nulls are produced for these.
NULL_TOKENS = ("NULL", "null", "", "None", "NA", "N/A")

# --- compiled once at module import (stateless map_batches tasks reuse them) ---
_RE_SCRIPT = re.compile(rb"<script\b.*?</script\s*>", re.IGNORECASE | re.DOTALL)
_RE_STYLE = re.compile(rb"<style\b.*?</style\s*>", re.IGNORECASE | re.DOTALL)
_RE_COMMENT = re.compile(rb"<!--.*?-->", re.DOTALL)
_RE_TAG = re.compile(rb"<[^>]*>")
_RE_WS = re.compile(r"\s+")
_RE_TITLE = re.compile(rb"<title[^>]*>(.*?)</title\s*>", re.IGNORECASE | re.DOTALL)
_RE_WORD = re.compile(r"\w+", re.UNICODE)


def normalize_whitespace_str(s: str) -> str:
    """Scalar normalizer: ``\\s+`` → single space, strip (reference parity)."""
    return _RE_WS.sub(" ", s).strip()


def normalize_whitespace_arrow(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized Arrow normalizer — identical output to normalize_whitespace_str.

    ``\\s+`` in RE2 (Arrow's regex engine) matches unicode whitespace the same
    way Python's ``re`` does for the ASCII+unicode space classes used in our
    corpora; golden tests pin the equivalence.
    """
    out = pc.replace_substring_regex(col, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim_whitespace(out)


def extract_text_from_html(html_bytes: bytes | None) -> str:
    """Deterministic HTML→text: drop script/style/comments, strip tags,
    unescape entities, collapse whitespace.  Pure function of the bytes —
    byte-identical output per input is the contract (BASELINE.json per-row
    invariant).  Returns "" for None/empty/malformed input."""
    if not html_bytes:
        return ""
    b = _RE_SCRIPT.sub(b" ", html_bytes)
    b = _RE_STYLE.sub(b" ", b)
    b = _RE_COMMENT.sub(b" ", b)
    b = _RE_TAG.sub(b" ", b)
    text = b.decode("utf-8", errors="replace")
    text = _htmllib.unescape(text)
    return normalize_whitespace_str(text)


def extract_title_from_html(html_bytes: bytes | None) -> str:
    """First <title> element's text, unescaped + whitespace-normalized; "" if none."""
    if not html_bytes:
        return ""
    m = _RE_TITLE.search(html_bytes)
    if not m:
        return ""
    t = _htmllib.unescape(m.group(1).decode("utf-8", errors="replace"))
    return normalize_whitespace_str(t)


def domain_of_url(url: str) -> str:
    """Host part of an http(s) url; deterministic string slicing, no urllib quirks."""
    i = url.find("://")
    rest = url[i + 3 :] if i >= 0 else url
    for sep in ("/", "?", "#"):
        j = rest.find(sep)
        if j >= 0:
            rest = rest[:j]
    return rest.lower()


def word_tokens(text: str) -> list[str]:
    """Lowercased \\w+ tokens — the unit for shingles, TF-IDF and stopword stats."""
    return _RE_WORD.findall(text.lower())


def whitespace_token_count(text: str | None) -> int:
    """Number of whitespace-separated tokens; 0 for empty/None.

    Matches DuckDB ``array_length(regexp_split_to_array(trim(text), '\\s+'))``
    with the empty-string case handled (oracle parity for the token-count query).
    """
    if text is None:
        return 0
    t = text.strip()
    if not t:
        return 0
    return len(_RE_WS.split(t))


def word_shingles(tokens: list[str], k: int) -> list[str]:
    """Word k-shingles; docs shorter than k yield the whole-token join (or [] if empty)."""
    if not tokens:
        return []
    if len(tokens) <= k:
        return [" ".join(tokens)]
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


def token_lists_arrow(col: pa.ChunkedArray | pa.Array) -> tuple[pa.Array, np.ndarray]:
    """Vectorized ``word_tokens`` over a whole string column (one C++ pass).

    Token spec = the oracle's: ``regexp_extract_all(lower(coalesce(text, '')),
    '[0-9a-z_]+')`` — ASCII word runs of the lowered text, extracted as a
    split on ``[^0-9a-z_]+`` with boundary empties dropped.  Identical to the
    per-string ``word_tokens`` (Python ``\\w+``) on ASCII corpora — every
    oracle corpus here — and on non-ASCII input it keeps the ORACLE's
    semantics (non-ASCII letters separate) where ``\\w+`` would keep them.

    Returns ``(flat_tokens, offsets)``: doc ``d``'s tokens are
    ``flat_tokens[offsets[d]:offsets[d+1]]``; null/empty docs have none.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lower = pc.utf8_lower(pc.fill_null(col, ""))
    lists = pc.split_pattern_regex(lower, pattern="[^0-9a-z_]+")
    n_raw = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = lists.flatten()
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    raw_offs = np.concatenate(([0], np.cumsum(n_raw, dtype=np.int64)))
    kept_cum = np.concatenate(([0], np.cumsum(keep_np, dtype=np.int64)))
    return flat.filter(keep), kept_cum[raw_offs]


def shingle_lists(
    flat: pa.Array, offsets: np.ndarray, k: int, short: str = "join"
) -> tuple[pa.Array, np.ndarray]:
    """Vectorized ``word_shingles`` over tokenized docs in (flat, offsets) form.

    Per doc with n tokens: ``n > k`` → the n-k+1 space-joined k-grams;
    ``1 <= n <= k`` → the single whole-token join (``short="join"``,
    ``word_shingles`` parity) or nothing (``short="drop"``, the
    decontamination n-gram rule); ``n == 0`` → none.  The k-gram join is ONE
    ``binary_join_element_wise`` over k shifted views of the flat token
    array; windows crossing a document boundary are masked out (no Python
    per doc).  Returns ``(flat_shingles, sh_offsets)``.
    """
    n = np.diff(offsets)
    n_docs = len(n)
    n_tok = len(flat)
    if short == "drop":
        cnt = np.maximum(n - k + 1, 0).astype(np.int64)
    else:
        cnt = np.where(n == 0, 0, np.maximum(n - k + 1, 1)).astype(np.int64)
    sh_offs = np.concatenate(([0], np.cumsum(cnt)))
    total = int(sh_offs[-1])
    if total == 0:
        return pa.array([], type=pa.string()), sh_offs
    # docs with n >= k: every k-token window, computed globally then masked
    a_vals = None
    if n_tok >= k:
        parts = [flat.slice(j, n_tok - k + 1) for j in range(k)]
        joined = pc.binary_join_element_wise(*parts, " ")
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), n)
        valid = doc_idx[: n_tok - k + 1] == doc_idx[k - 1 :]
        a_vals = joined.filter(pa.array(valid))
    n_a = len(a_vals) if a_vals is not None else 0
    # docs with 1 <= n < k: one shingle = the whole-token join (unless dropped)
    is_b = (n > 0) & (n < k) if short != "drop" else np.zeros(n_docs, dtype=bool)
    b_idx = np.flatnonzero(is_b)
    if len(b_idx) == 0:
        return a_vals if a_vals is not None else pa.array([], type=pa.string()), sh_offs
    all_lists = pa.LargeListArray.from_arrays(pa.array(offsets, type=pa.int64()), flat)
    b_vals = pc.binary_join(all_lists.take(pa.array(b_idx, type=pa.int64())), " ")
    if isinstance(b_vals, pa.ChunkedArray):
        b_vals = b_vals.combine_chunks()
    b_vals = b_vals.cast(pa.string())
    if n_a == 0:
        return b_vals, sh_offs
    # interleave: A docs' windows are contiguous in a_vals in doc order; each
    # B doc contributes exactly one b_vals entry, also in doc order
    combined = pa.concat_arrays([a_vals.cast(pa.string()), b_vals])
    is_a = n >= k
    a_start = np.concatenate(([0], np.cumsum(np.where(is_a, cnt, 0))))[:-1]
    b_rank = np.cumsum(is_b) - 1
    out_doc = np.repeat(np.arange(n_docs, dtype=np.int64), cnt)
    within = np.arange(total, dtype=np.int64) - np.repeat(sh_offs[:-1], cnt)
    src = np.where(is_a[out_doc], a_start[out_doc] + within, n_a + b_rank[out_doc])
    return combined.take(pa.array(src, type=pa.int64())), sh_offs


def chunk_lists(flat: pa.Array, offsets: np.ndarray, w: int) -> tuple[pa.Array, np.ndarray]:
    """Non-overlapping ``w``-token chunk joins per doc ("pseudo-lines"): doc
    with n tokens yields ceil(n/w) space-joined chunks, the last one short.
    Unlike ``shingle_lists`` (stride 1) the chunks tile the doc (stride w), so
    every chunk is a CONTIGUOUS range of the flat token array and chunk j's
    end is chunk j+1's start — the whole column joins in ONE
    ``binary_join`` over a list view built from computed offsets (no Python
    per doc, no token copies).  Returns ``(flat_chunks, chunk_offsets)``."""
    n = np.diff(offsets)
    cnt = -(-n // w)  # ceil(n / w)
    out_offs = np.concatenate(([0], np.cumsum(cnt, dtype=np.int64)))
    total = int(out_offs[-1])
    if total == 0:
        return pa.array([], type=pa.string()), out_offs
    doc_rep = np.repeat(np.arange(len(n), dtype=np.int64), cnt)
    within = np.arange(total, dtype=np.int64) - np.repeat(out_offs[:-1], cnt)
    starts = offsets[:-1][doc_rep] + within * w
    ends = np.minimum(starts + w, offsets[1:][doc_rep])
    # chunks tile each doc and docs tile flat, so [starts[0], *ends] is a
    # valid monotone offset vector over flat (ends[j] == starts[j+1])
    lst = pa.LargeListArray.from_arrays(
        pa.array(np.concatenate(([starts[0]], ends)), type=pa.int64()), flat
    )
    joined = pc.binary_join(lst, " ")
    if isinstance(joined, pa.ChunkedArray):
        joined = joined.combine_chunks()
    return joined.cast(pa.string()), out_offs


def nullify_sentinels(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Replace reference null-sentinel strings with real Arrow nulls."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    mask = pc.is_in(col, value_set=pa.array(list(NULL_TOKENS), type=col.type))
    return pc.if_else(mask, pa.scalar(None, type=col.type), col)


# ---------------------------------------------------------------- typed year extraction
# Reference analog: the birth/death-year battery over person-name strings
# (/root/reference/src/birth_death_regexes.py:13-147 — 15 sequential patterns).
# Re-designed here as ONE prioritized battery with explicit kinds: explicit
# b./d. prefixes outrank floruit, floruit outranks plain ranges, ranges
# outrank one-sided years, a lone approximate year is the fallback.  Unlike
# the reference (whose one-sided branch decides birth-vs-death by substring
# tests against the WHOLE string), the kind is a property of the matched
# pattern itself — "d. 1984" can never be read as a birth year.

_LY_YEAR = r"(\d{2,4}(?:\?|\s+or\s+\d{1,4})?)"
_LY_APPROX = r"(?:approximately|ca\.|circa)\s+"
_LY_DASH = r"\s*[-–—]\s*"

_LIFE_YEAR_BATTERY: list[tuple[re.Pattern, str]] = [
    (re.compile(rf"(?:\bb\.|\bborn)\s+(?:{_LY_APPROX})?{_LY_YEAR}"), "birth"),
    (re.compile(rf"(?:\bd\.|\bdied)\s+(?:{_LY_APPROX})?{_LY_YEAR}"), "death"),
    (re.compile(rf"(?:\bfl\.|\bfloruit)\s+{_LY_YEAR}(?:{_LY_DASH}{_LY_YEAR})?"), "floruit"),
    (re.compile(rf"\(\s*{_LY_YEAR}{_LY_DASH}{_LY_YEAR}\s*\)"), "range"),
    (re.compile(rf"\(\s*{_LY_YEAR}{_LY_DASH}\s*\)"), "birth"),
    (re.compile(rf"\(\s*{_LY_DASH}{_LY_YEAR}\s*\)"), "death"),
    (re.compile(rf"(?:{_LY_APPROX})?{_LY_YEAR}{_LY_DASH}(?:{_LY_APPROX})?{_LY_YEAR}"), "range"),
    (re.compile(rf"(?:{_LY_APPROX})?{_LY_YEAR}{_LY_DASH}"), "birth"),
    (re.compile(rf"{_LY_DASH}(?:{_LY_APPROX})?{_LY_YEAR}"), "death"),
    (re.compile(rf"{_LY_APPROX}{_LY_YEAR}"), "birth"),
]

_LY_DIGITS = re.compile(r"\d+")


def _clean_year(year_str: str | None) -> int | None:
    """First digit run of a matched year token ('1812?' → 1812, '565 or 566' → 565)."""
    if not year_str:
        return None
    m = _LY_DIGITS.search(year_str)
    return int(m.group(0)) if m else None


def parse_life_years(s: str | None) -> tuple[int | None, int | None]:
    """(birth_year, death_year) from a person-name-style string; (None, None)
    when no pattern matches.  Handles explicit prefixes ('b. 1901',
    'died 1984'), floruit ('fl. 1500-1550' → active range), parenthesized and
    plain ranges ('(1870-1937)', '565 - approximately 665'), one-sided ranges
    ('1900-', '-1980'), uncertainty markers ('1812?', '565 or 566'), and a
    lone approximate year ('circa 1800')."""
    if not s:
        return None, None
    for pattern, kind in _LIFE_YEAR_BATTERY:
        m = pattern.search(s)
        if not m:
            continue
        g = m.groups()
        if kind == "birth":
            return _clean_year(g[0]), None
        if kind == "death":
            return None, _clean_year(g[0])
        # "range" and "floruit": two groups (floruit's second may be absent)
        return _clean_year(g[0]), _clean_year(g[1] if len(g) > 1 else None)
    return None, None


def parse_life_years_batch(values) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized-shape wrapper: object arrays of (birth, death) with None holes."""
    births = np.empty(len(values), dtype=object)
    deaths = np.empty(len(values), dtype=object)
    for i, v in enumerate(values):
        births[i], deaths[i] = parse_life_years(v)
    return births, deaths


# A small multilingual stopword map for the n-gram language heuristic.
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "with", "was", "on"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "den", "für", "auf", "ein", "nicht"},
    "fr": {"le", "la", "les", "et", "de", "des", "un", "une", "est", "pour", "dans", "que"},
    "es": {"el", "la", "los", "las", "de", "que", "y", "en", "un", "una", "es", "por"},
}

STOPWORDS_EN = _LANG_STOPWORDS["en"]


def lang_id(text: str | None) -> str:
    """Tiny deterministic language heuristic: argmax of stopword hits per language,
    "und" (undetermined) when nothing matches.  Ties broken by language code order."""
    if not text:
        return "und"
    toks = word_tokens(text)[:200]
    if not toks:
        return "und"
    tokset = {}
    for t in toks:
        tokset[t] = tokset.get(t, 0) + 1
    best_lang, best_score = "und", 0
    for code in sorted(_LANG_STOPWORDS):
        score = sum(cnt for w, cnt in tokset.items() if w in _LANG_STOPWORDS[code])
        if score > best_score:
            best_lang, best_score = code, score
    return best_lang


def lang_id_batch(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized ``lang_id`` over a whole string column: one tokenize pass
    (``token_lists_arrow``), the 200-token cap applied as an index gather,
    then ONE ``is_in`` + segmented count per language.  Same argmax /
    first-code tie-break / 'und' semantics as the scalar ``lang_id``
    (equivalence pinned by tests)."""
    flat, offs = token_lists_arrow(col)
    n = np.diff(offs)
    n_docs = len(n)
    cn = np.minimum(n, 200)
    out_offs = np.concatenate(([0], np.cumsum(cn)))
    total = int(out_offs[-1])
    if total:
        within = np.arange(total, dtype=np.int64) - np.repeat(out_offs[:-1], cn)
        capped = flat.take(pa.array(np.repeat(offs[:-1], cn) + within, type=pa.int64()))
    else:
        capped = pa.array([], type=pa.string())
    best = np.full(n_docs, "und", dtype="U3")
    best_score = np.zeros(n_docs, dtype=np.int64)
    for code in sorted(_LANG_STOPWORDS):
        hits = pc.is_in(capped, value_set=pa.array(sorted(_LANG_STOPWORDS[code])))
        cum = np.concatenate(([0], np.cumsum(hits.to_numpy(zero_copy_only=False), dtype=np.int64)))
        score = cum[out_offs[1:]] - cum[out_offs[:-1]]
        better = score > best_score  # strict: ties keep the earlier code
        best[better] = code
        best_score[better] = score[better]
    return best


def quality_stats(texts) -> dict[str, np.ndarray]:
    """Quality metrics per document (length / punct / digit / upper ratios,
    stopword ratio, mean token length), fully vectorized via Arrow RE2 kernels.
    Reference analog: field statistics at
    /root/reference/src/batch_parallel_preprocessing.py:500-512.

    Equivalence with the scalar definition (``_quality_stats_scalar``) is
    pinned by tests on ASCII corpora; RE2 character classes are ASCII
    (``[0-9]``/``[A-Z]``/``\\w``) where Python's ``isdigit``/``isupper``/``\\w``
    are unicode-aware — identical on the ASCII corpora this engine targets and
    on the DuckDB oracle's own ``[0-9]`` semantics."""
    col = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) else pa.array(list(texts), type=pa.string())
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)

    def _count(pattern: str, target=None) -> np.ndarray:
        c = pc.count_substring_regex(target if target is not None else col, pattern)
        return np.nan_to_num(c.to_numpy(zero_copy_only=False).astype(np.float64))

    char_count = np.nan_to_num(
        pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.float64)
    )
    token_count = _count(r"\S+")
    denom = np.maximum(char_count, 1.0)
    punct_ratio = _count(r"[.,;:!?]") / denom
    digit_ratio = _count(r"[0-9]") / denom
    upper_ratio = _count(r"[A-Z]") / denom
    lower = pc.utf8_lower(col)
    word_tokens_n = _count(r"\w+", lower)
    word_chars_n = _count(r"\w", lower)
    stop_pattern = r"\b(?:" + "|".join(sorted(STOPWORDS_EN)) + r")\b"
    stop_n = _count(stop_pattern, lower)
    tok_denom = np.maximum(word_tokens_n, 1.0)
    stop_ratio = np.where(word_tokens_n > 0, stop_n / tok_denom, 0.0)
    mean_tok_len = np.where(word_tokens_n > 0, word_chars_n / tok_denom, 0.0)
    return {
        "char_count": char_count.astype(np.int64),
        "token_count": token_count.astype(np.int64),
        "punct_ratio": punct_ratio,
        "digit_ratio": digit_ratio,
        "upper_ratio": upper_ratio,
        "stopword_ratio": stop_ratio,
        "mean_token_len": mean_tok_len,
    }


def _quality_stats_scalar(texts: np.ndarray) -> dict[str, np.ndarray]:
    """Scalar reference implementation of quality_stats (kept for the
    vectorized-equivalence test)."""
    n = len(texts)
    char_count = np.zeros(n, dtype=np.int64)
    token_count = np.zeros(n, dtype=np.int64)
    punct_ratio = np.zeros(n, dtype=np.float64)
    digit_ratio = np.zeros(n, dtype=np.float64)
    upper_ratio = np.zeros(n, dtype=np.float64)
    stop_ratio = np.zeros(n, dtype=np.float64)
    mean_tok_len = np.zeros(n, dtype=np.float64)
    for i, t in enumerate(texts):
        if t is None or t == "":
            continue
        char_count[i] = len(t)
        token_count[i] = whitespace_token_count(t)
        np_chars = len(t)
        punct_ratio[i] = sum(c in ".,;:!?" for c in t) / np_chars
        digit_ratio[i] = sum(c.isdigit() for c in t) / np_chars
        upper_ratio[i] = sum(c.isupper() for c in t) / np_chars
        toks = word_tokens(t)
        if toks:
            stop_ratio[i] = sum(w in STOPWORDS_EN for w in toks) / len(toks)
            mean_tok_len[i] = sum(len(w) for w in toks) / len(toks)
    return {
        "char_count": char_count,
        "token_count": token_count,
        "punct_ratio": punct_ratio,
        "digit_ratio": digit_ratio,
        "upper_ratio": upper_ratio,
        "stopword_ratio": stop_ratio,
        "mean_token_len": mean_tok_len,
    }

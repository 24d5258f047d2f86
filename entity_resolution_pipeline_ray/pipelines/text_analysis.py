"""Text-analysis pipelines over the ``documents`` table: normalization, string
interning (hash + counts + exact dedup), token counting, quality scoring,
language ID, fingerprinting.

Reference analogs: the preprocessing stage's normalize→hash→count→dedup flow
(/root/reference/src/batch_parallel_preprocessing.py:255-430 — M2 normalizer, M3 MD5
interning hash, A1 string counts, A3 exact first-wins dedup, A4 field stats).
Oracle parity: every SQL-expressible op names its columns identically to the
DuckDB SQL next to it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..rayops import read_parquet_clean
from ray.data.aggregate import Count, Mean, Min

from ..functions.hashing import md5_hex, md5_u64_dict, simhash64_flat, stable_u64
from ..config import scale_gate
from ..functions.text import (
    lang_id_batch,
    normalize_whitespace_arrow,
    quality_stats,
    shingle_lists,
    token_lists_arrow,
)


def _docs(sf_dir: str, columns):
    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=columns)


def t_normalize(sf_dir: str):
    """M2 whitespace-collapse normalizer, vectorized Arrow kernels."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "norm_text": normalize_whitespace_arrow(t["text"])})

    return ds.map_batches(f, batch_format="pyarrow")


T_NORMALIZE_SQL = """
SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS norm_text FROM documents
"""


def append_md5_text_hash(t: pa.Table) -> pa.Table:
    """Append the M3 interning hash (md5 of whitespace-normalized text) to the
    batch — THE single definition of the exact-dedup key; `_with_hash`,
    d_apply_exact and p_curation_pipeline all derive from it so the key can
    never silently diverge from the t_string_hash oracle."""
    norm = normalize_whitespace_arrow(t["text"])
    return t.append_column("text_hash", pa.array(md5_hex(norm.to_pylist()), type=pa.string()))


def _with_hash(t: pa.Table) -> pa.Table:
    return append_md5_text_hash(t).select(["doc_id", "text_hash"])


def t_string_hash(sf_dir: str):
    """M3 interning hash: MD5 of the normalized string (DuckDB ``md5`` parity)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(_with_hash, batch_format="pyarrow")


T_STRING_HASH_SQL = """
SELECT doc_id, md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS text_hash FROM documents
"""


def t_string_counts(sf_dir: str):
    """A1 global string counts by interning hash (groupby shuffle with automatic
    partial aggregation)."""
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_with_hash, batch_format="pyarrow")
        .groupby("text_hash")
        .aggregate(Count(alias_name="n"))
    )


T_STRING_COUNTS_SQL = """
SELECT md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS text_hash, count(*) AS n
FROM documents GROUP BY 1
"""


def t_exact_dedup(sf_dir: str):
    """A3 exact dedup: hash-partition by content hash, keep the minimum doc_id
    (deterministic first-wins; reference used insertion order —
    /root/reference/src/batch_parallel_preprocessing.py:280)."""
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_with_hash, batch_format="pyarrow")
        .groupby("text_hash")
        .aggregate(Min("doc_id", alias_name="keep_doc_id"))
    )


T_EXACT_DEDUP_SQL = """
SELECT md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS text_hash, min(doc_id) AS keep_doc_id
FROM documents GROUP BY 1
"""


def token_count_arrow(text_col) -> pa.Array:
    """int64 whitespace-token counts of a (possibly null) string column —
    count of \\S+ runs == DuckDB ``len(regexp_split_to_array(trim(text),
    '\\s+'))`` with empty/null → 0.  THE pinned parity kernel: every operator
    that counts whitespace tokens for an oracled output (t_token_count,
    p_quality_skyline) must use this function, so a parity fix propagates
    everywhere at once (equivalence with the scalar whitespace_token_count
    pinned by test)."""
    filled = pc.coalesce(text_col, pa.scalar("", type=pa.string()))
    return pc.cast(pc.count_substring_regex(filled, pattern=r"\S+"), pa.int64())


def t_token_count(sf_dir: str):
    """Whitespace token counting (oracle parity with regexp_split_to_array)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "n_tokens": token_count_arrow(t["text"])})

    return ds.map_batches(f, batch_format="pyarrow")


T_TOKEN_COUNT_SQL = """
SELECT doc_id,
       CASE WHEN text IS NULL OR trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
FROM documents
"""


def t_lang_stats(sf_dir: str):
    """A4 field statistics per language: doc count, mean char length, distinct
    sources.  One pass: per-block (lang, source) combiners — dimension-sized
    partials (langs × sources rows per block) — merged on the driver.  (The
    first version ran the read twice and three hash groupbys for a 5-row
    result: 3.8 s at sf0.1; this is ~1 s.)  avg_chars is exact-int sum /
    count divided once, matching DuckDB avg(BIGINT)."""
    ds = _docs(sf_dir, ["lang", "source", "n_chars"])

    def part(t: pa.Table) -> pa.Table:
        g = (
            t.to_pandas()
            .groupby(["lang", "source"], sort=False)
            .agg(n=("n_chars", "size"), s=("n_chars", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "lang": pa.array(g["lang"], type=pa.string()),
                "source": pa.array(g["source"], type=pa.string()),
                "n": pa.array(g["n"].to_numpy(dtype=np.int64), type=pa.int64()),
                "s": pa.array(g["s"].to_numpy(dtype=np.int64), type=pa.int64()),
            }
        )

    p = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    if p.empty:
        return pa.table(
            {"lang": pa.array([], type=pa.string()), "n_docs": pa.array([], type=pa.int64()),
             "avg_chars": pa.array([], type=pa.float64()), "n_sources": pa.array([], type=pa.int64())}
        )
    ls = p.groupby(["lang", "source"], sort=False)[["n", "s"]].sum().reset_index()
    out = (
        ls.groupby("lang", sort=True)
        .agg(n_docs=("n", "sum"), sum_chars=("s", "sum"), n_sources=("source", "nunique"))
        .reset_index()
    )
    return pa.table(
        {
            "lang": pa.array(out["lang"], type=pa.string()),
            "n_docs": pa.array(out["n_docs"].to_numpy(dtype=np.int64), type=pa.int64()),
            "avg_chars": pa.array(
                out["sum_chars"].to_numpy(dtype=np.int64) / out["n_docs"].to_numpy(dtype=np.int64),
                type=pa.float64(),
            ),
            "n_sources": pa.array(out["n_sources"].to_numpy(dtype=np.int64), type=pa.int64()),
        }
    )


T_LANG_STATS_SQL = """
SELECT lang, count(*) AS n_docs, avg(n_chars) AS avg_chars, count(DISTINCT source) AS n_sources
FROM documents GROUP BY lang
"""


def t_quality(sf_dir: str):
    """Quality scoring: char/token counts + punct/digit/upper ratios (all
    oracle-expressible; stopword ratio and mean token length are engine-only
    and exposed via t_quality_full)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        q = quality_stats(t["text"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "char_count": pa.array(q["char_count"], type=pa.int64()),
                "n_tokens": pa.array(q["token_count"], type=pa.int64()),
                "punct_ratio": pa.array(np.round(q["punct_ratio"], 6), type=pa.float64()),
                "digit_ratio": pa.array(np.round(q["digit_ratio"], 6), type=pa.float64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


T_QUALITY_SQL = """
SELECT doc_id,
       length(text) AS char_count,
       CASE WHEN text IS NULL OR trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
       CASE WHEN length(text) = 0 THEN 0.0
            ELSE round((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) * 1.0 / length(text), 6) END AS punct_ratio,
       CASE WHEN length(text) = 0 THEN 0.0
            ELSE round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) * 1.0 / length(text), 6) END AS digit_ratio
FROM documents
"""


def t_quality_full(sf_dir: str):
    """Full quality metrics incl. stopword ratio, mean token length and upper
    ratio — all RE2-expressible, so DuckDB (also RE2) oracles them exactly."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        q = quality_stats(t["text"])
        out = {"doc_id": t["doc_id"]}
        for k, v in q.items():
            out[k] = pa.array(v)
        return pa.table(out)

    return ds.map_batches(f, batch_format="pyarrow")


# Same RE2 semantics as quality_stats: ASCII \w classes, non-overlapping scans.
T_QUALITY_FULL_SQL = """
WITH q AS (
  SELECT doc_id,
         coalesce(length(text), 0) AS n_chars,
         len(regexp_extract_all(coalesce(text, ''), '\\S+')) AS n_ws_tokens,
         len(regexp_extract_all(coalesce(text, ''), '[.,;:!?]')) AS n_punct,
         len(regexp_extract_all(coalesce(text, ''), '[0-9]')) AS n_digit,
         len(regexp_extract_all(coalesce(text, ''), '[A-Z]')) AS n_upper,
         len(regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+')) AS n_wtok,
         len(regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]')) AS n_wchar,
         len(regexp_extract_all(lower(coalesce(text, '')),
             '\\b(?:and|for|in|is|it|of|on|that|the|to|was|with)\\b')) AS n_stop
  FROM documents)
SELECT doc_id,
       n_chars AS char_count,
       n_ws_tokens AS token_count,
       n_punct * 1.0 / greatest(n_chars, 1) AS punct_ratio,
       n_digit * 1.0 / greatest(n_chars, 1) AS digit_ratio,
       n_upper * 1.0 / greatest(n_chars, 1) AS upper_ratio,
       CASE WHEN n_wtok > 0 THEN n_stop * 1.0 / n_wtok ELSE 0.0 END AS stopword_ratio,
       CASE WHEN n_wtok > 0 THEN n_wchar * 1.0 / n_wtok ELSE 0.0 END AS mean_token_len
FROM q
"""


def t_lang_id(sf_dir: str):
    """Language-ID heuristic: stopword vote over the first 200 tokens, argmax
    per language, ties to the lexicographically first code, 'und' when no
    stopword hits."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        preds = lang_id_batch(t["text"])
        return pa.table({"doc_id": t["doc_id"], "lang_pred": pa.array(preds, type=pa.string())})

    return ds.map_batches(f, batch_format="pyarrow")


def _lang_id_sql() -> str:
    """DuckDB mirror of lang_id: same tokenizer (ASCII \\w on lowered text),
    same 200-token cap, same strict-> argmax over sorted language codes."""
    from ..functions.text import _LANG_STOPWORDS

    score_cols = []
    for code in sorted(_LANG_STOPWORDS):
        words = ", ".join(f"'{w}'" for w in sorted(_LANG_STOPWORDS[code]))
        score_cols.append(f"len(list_filter(tk, x -> x IN ({words}))) AS s_{code}")
    codes = sorted(_LANG_STOPWORDS)
    g = "greatest(" + ", ".join(f"s_{c}" for c in codes) + ")"
    case = f"CASE WHEN {g} = 0 THEN 'und' "
    for c in codes[:-1]:
        case += f"WHEN s_{c} = {g} THEN '{c}' "
    case += f"ELSE '{codes[-1]}' END AS lang_pred"
    return f"""
WITH toks AS (
  SELECT doc_id,
         (regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+'))[1:200] AS tk
  FROM documents),
sc AS (SELECT doc_id, {", ".join(score_cols)} FROM toks)
SELECT doc_id, {case} FROM sc
"""


T_LANG_ID_SQL = _lang_id_sql()


def t_simhash(sf_dir: str):
    """Document fingerprint: 64-bit SimHash over the token multiset (md5-based
    token hash = DuckDB ``md5_number_upper``, so the bit-voting sketch is
    fully SQL-oracled; hex string output)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        flat_tok, offs = token_lists_arrow(t["text"])
        sh = simhash64_flat(md5_u64_dict(flat_tok), offs)
        return pa.table(
            {"doc_id": t["doc_id"], "simhash": pa.array([format(int(v), "016x") for v in sh], type=pa.string())}
        )

    return ds.map_batches(f, batch_format="pyarrow")


# Bit-vote per (doc, bit) over the unnested token multiset, then OR the
# positive-vote bits together.  votes = ones*2 - n_tokens matches the engine's
# sum(+-1) exactly; empty docs fall out of the vote table and get sketch 0.
SIMHASH_WORD_SQL = """
toks AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+') AS tk
  FROM documents),
hv AS (SELECT doc_id, md5_number_upper(unnest(tk)) AS v FROM toks),
votes AS (
  SELECT doc_id, b,
         sum(CASE WHEN (v >> CAST(b AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS vote
  FROM hv, range(0, 64) r(b) GROUP BY doc_id, b),
words AS (
  SELECT doc_id,
         bit_or(CASE WHEN vote > 0 THEN (1::UBIGINT << CAST(b AS INTEGER))
                     ELSE 0::UBIGINT END) AS w
  FROM votes GROUP BY doc_id)
"""

T_SIMHASH_SQL = f"""
WITH {SIMHASH_WORD_SQL.strip()}
SELECT t.doc_id, lower(lpad(to_hex(coalesce(w, 0::UBIGINT)), 16, '0')) AS simhash
FROM toks t LEFT JOIN words USING (doc_id)
"""


def t_fingerprint(sf_dir: str):
    """Winnowing-style rolling fingerprint: min 64-bit md5 hash over token
    4-grams.  The hash is the little-endian first 8 md5 bytes — exactly
    DuckDB's ``md5_number_upper`` — so the whole operator is SQL-oracled
    (round-1 used FNV, which no SQL function reproduces)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        # 4-gram windows (short docs: the whole-token join) are exactly
        # word_shingles(k=4) — one vectorized shingle + dict-md5 pass
        flat, offs = token_lists_arrow(t["text"])
        g_flat, g_offs = shingle_lists(flat, offs, 4)
        h = md5_u64_dict(g_flat)
        out = np.zeros(len(t), dtype=np.int64)
        for i in range(len(t)):
            if g_offs[i + 1] > g_offs[i]:
                out[i] = int(h[g_offs[i] : g_offs[i + 1]].min() >> np.uint64(1))
        return pa.table({"doc_id": t["doc_id"], "fingerprint": pa.array(out, type=pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


T_FINGERPRINT_SQL = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+') AS toks
  FROM documents),
g AS (
  SELECT doc_id, CASE
    WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
    WHEN len(toks) < 4 THEN [array_to_string(toks, ' ')]
    ELSE list_transform(range(1, len(toks) - 2),
                        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3]))
  END AS grams FROM t)
SELECT doc_id,
       CASE WHEN len(grams) = 0 THEN 0
            ELSE CAST(list_min(list_transform(grams, s -> md5_number_upper(s) >> 1)) AS BIGINT)
       END AS fingerprint
FROM g
"""


def t_token_topk(sf_dir: str, k: int = 50, driver_merge_threshold: int = 2_000_000):
    """Global token document-frequency top-k — the vocabulary-build operator
    (stages/signatures.py:55-91) exposed as a query, with the same dual plan:
    per-batch partial (token, df) counts, then a driver pandas merge below the
    doc threshold (Ray's hash-aggregate finalizer runs ~10-15k groups/s — the
    distributed groupby costs ~15 s of fixed time pandas does in milliseconds)
    or the distributed groupby-sum at scale.  Deterministic (df DESC, token
    ASC) boundary tie-break in both plans."""
    from ray.data.aggregate import Sum

    from ..stages.signatures import token_df_partials

    ds = _docs(sf_dir, ["doc_id", "text"])
    n_docs = ds.count()
    partials = ds.map_batches(token_df_partials, batch_format="pyarrow")
    if n_docs <= scale_gate(driver_merge_threshold):
        frames = [b.to_pandas() for b in partials.iter_batches(batch_size=1 << 20, batch_format="pyarrow")]
        if not frames:  # 0-row corpus: pd.concat([]) raises
            return pa.table({"token": pa.array([], type=pa.string()), "df": pa.array([], type=pa.int64())})
        merged = pd.concat(frames).groupby("token", sort=False)["df"].sum().reset_index()
        top = merged.sort_values(["df", "token"], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(top, preserve_index=False)
    counts = partials.groupby("token").aggregate(Sum("df", alias_name="df"))
    return counts.sort(["df", "token"], descending=[True, False]).limit(k)


T_TOKEN_TOPK_SQL = """
SELECT token, count(*) AS df FROM (
  SELECT doc_id, unnest(list_distinct(regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+'))) AS token
  FROM documents)
GROUP BY token ORDER BY df DESC, token LIMIT 50
"""


# ---------------------------------------------------------------- life years
# Typed year extraction (M5 battery, reference analog
# /root/reference/src/birth_death_regexes.py:13-147).  The documents corpus
# has no year strings, so the query derives a deterministic biography-style
# column FROM doc_id — both the Ray side and the SQL oracle build the exact
# same string, then run the battery (Python re here, RE2 there; the patterns
# use only constructs both engines share).


def _bio_string(doc_id: int) -> str:
    y1 = 1500 + (doc_id * 7) % 400
    y2 = y1 + 20 + doc_id % 60
    v = doc_id % 15
    p = f"Author {doc_id}"
    return [
        f"{p}, b. {y1}",
        f"{p}, born approximately {y1}",
        f"{p}, d. {y2}",
        f"{p}, died {y2}",
        f"{p}, fl. {y1}-{y2}",
        f"{p} ({y1}-{y2})",
        f"{p} ({y1}-)",
        f"{p} (-{y2})",
        f"{p}, {y1} - approximately {y2}",
        f"{p}, {y1}-",
        f"{p}, -{y2}",
        f"{p}, circa {y1}",
        f"{p}, b. {y1}?",
        f"{p}, {y1} or {y1 + 1}-{y2}",
        p,
    ][v]


def t_life_years(sf_dir: str):
    """Prioritized birth/death/floruit year battery over derived biography
    strings; output (doc_id, bio, birth_year, death_year)."""
    from ..functions.text import parse_life_years_batch

    ds = _docs(sf_dir, ["doc_id"])

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        bios = [_bio_string(int(i)) for i in ids]
        births, deaths = parse_life_years_batch(bios)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "bio": pa.array(bios, type=pa.string()),
                "birth_year": pa.array(births.tolist(), type=pa.int64()),
                "death_year": pa.array(deaths.tolist(), type=pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


# RE2 battery (same pattern constants as functions/text.py; cascade order =
# battery priority; group refs mirror parse_life_years' kind handling).
_SQL_Y = r"(\d{2,4}(?:\?|\s+or\s+\d{1,4})?)"
_SQL_AP = r"(?:approximately|ca\.|circa)\s+"
_SQL_DA = r"\s*[-–—]\s*"
_SQL_PATS = {
    "pb": rf"(?:\bb\.|\bborn)\s+(?:{_SQL_AP})?{_SQL_Y}",
    "pd": rf"(?:\bd\.|\bdied)\s+(?:{_SQL_AP})?{_SQL_Y}",
    "pfl": rf"(?:\bfl\.|\bfloruit)\s+{_SQL_Y}(?:{_SQL_DA}{_SQL_Y})?",
    "ppr": rf"\(\s*{_SQL_Y}{_SQL_DA}{_SQL_Y}\s*\)",
    "ppb": rf"\(\s*{_SQL_Y}{_SQL_DA}\s*\)",
    "ppd": rf"\(\s*{_SQL_DA}{_SQL_Y}\s*\)",
    "pr": rf"(?:{_SQL_AP})?{_SQL_Y}{_SQL_DA}(?:{_SQL_AP})?{_SQL_Y}",
    "pob": rf"(?:{_SQL_AP})?{_SQL_Y}{_SQL_DA}",
    "pod": rf"{_SQL_DA}(?:{_SQL_AP})?{_SQL_Y}",
    "pap": rf"{_SQL_AP}{_SQL_Y}",
}


def _sql_year(expr: str) -> str:
    return rf"CAST(NULLIF(regexp_extract({expr}, '\d+'), '') AS BIGINT)"


def _sql_g(pat: str, group: int) -> str:
    return _sql_year(f"regexp_extract(bio, '{_SQL_PATS[pat]}', {group})")


T_LIFE_YEARS_SQL = f"""
WITH base AS (
  SELECT doc_id,
         1500 + (doc_id * 7) % 400 AS y1,
         1500 + (doc_id * 7) % 400 + 20 + doc_id % 60 AS y2,
         doc_id % 15 AS v
  FROM documents),
bios AS (
  SELECT doc_id, CASE v
    WHEN 0  THEN 'Author ' || doc_id || ', b. ' || y1
    WHEN 1  THEN 'Author ' || doc_id || ', born approximately ' || y1
    WHEN 2  THEN 'Author ' || doc_id || ', d. ' || y2
    WHEN 3  THEN 'Author ' || doc_id || ', died ' || y2
    WHEN 4  THEN 'Author ' || doc_id || ', fl. ' || y1 || '-' || y2
    WHEN 5  THEN 'Author ' || doc_id || ' (' || y1 || '-' || y2 || ')'
    WHEN 6  THEN 'Author ' || doc_id || ' (' || y1 || '-)'
    WHEN 7  THEN 'Author ' || doc_id || ' (-' || y2 || ')'
    WHEN 8  THEN 'Author ' || doc_id || ', ' || y1 || ' - approximately ' || y2
    WHEN 9  THEN 'Author ' || doc_id || ', ' || y1 || '-'
    WHEN 10 THEN 'Author ' || doc_id || ', -' || y2
    WHEN 11 THEN 'Author ' || doc_id || ', circa ' || y1
    WHEN 12 THEN 'Author ' || doc_id || ', b. ' || y1 || '?'
    WHEN 13 THEN 'Author ' || doc_id || ', ' || y1 || ' or ' || (y1 + 1) || '-' || y2
    ELSE 'Author ' || doc_id
  END AS bio FROM base)
SELECT doc_id, bio,
  CASE
    WHEN regexp_matches(bio, '{_SQL_PATS["pb"]}')  THEN {_sql_g("pb", 1)}
    WHEN regexp_matches(bio, '{_SQL_PATS["pd"]}')  THEN NULL
    WHEN regexp_matches(bio, '{_SQL_PATS["pfl"]}') THEN {_sql_g("pfl", 1)}
    WHEN regexp_matches(bio, '{_SQL_PATS["ppr"]}') THEN {_sql_g("ppr", 1)}
    WHEN regexp_matches(bio, '{_SQL_PATS["ppb"]}') THEN {_sql_g("ppb", 1)}
    WHEN regexp_matches(bio, '{_SQL_PATS["ppd"]}') THEN NULL
    WHEN regexp_matches(bio, '{_SQL_PATS["pr"]}')  THEN {_sql_g("pr", 1)}
    WHEN regexp_matches(bio, '{_SQL_PATS["pob"]}') THEN {_sql_g("pob", 1)}
    WHEN regexp_matches(bio, '{_SQL_PATS["pod"]}') THEN NULL
    WHEN regexp_matches(bio, '{_SQL_PATS["pap"]}') THEN {_sql_g("pap", 1)}
    ELSE NULL
  END AS birth_year,
  CASE
    WHEN regexp_matches(bio, '{_SQL_PATS["pb"]}')  THEN NULL
    WHEN regexp_matches(bio, '{_SQL_PATS["pd"]}')  THEN {_sql_g("pd", 1)}
    WHEN regexp_matches(bio, '{_SQL_PATS["pfl"]}') THEN {_sql_g("pfl", 2)}
    WHEN regexp_matches(bio, '{_SQL_PATS["ppr"]}') THEN {_sql_g("ppr", 2)}
    WHEN regexp_matches(bio, '{_SQL_PATS["ppb"]}') THEN NULL
    WHEN regexp_matches(bio, '{_SQL_PATS["ppd"]}') THEN {_sql_g("ppd", 1)}
    WHEN regexp_matches(bio, '{_SQL_PATS["pr"]}')  THEN {_sql_g("pr", 2)}
    WHEN regexp_matches(bio, '{_SQL_PATS["pob"]}') THEN NULL
    WHEN regexp_matches(bio, '{_SQL_PATS["pod"]}') THEN {_sql_g("pod", 1)}
    ELSE NULL
  END AS death_year
FROM bios
"""


# ------------------------------------------------------------------ Zipf fit
# Corpus-health statistic: the Zipf slope of the token frequency spectrum
# (ln count vs ln rank over the top ZIPF_TOPK tokens).  Natural webtext sits
# near -1; template/boilerplate corpora flatten, gibberish steepens.  The
# heavy half (global token counts) reuses the dual-plan spectrum build of
# t_token_topk / t_unigram_logprob; the regression runs on <= ZIPF_TOPK
# (rank, count) pairs of driver state.

ZIPF_TOPK = 1000


def t_zipf_fit(sf_dir: str, driver_merge_threshold: int = 2_000_000):
    """One row (zipf_slope, n_ranks): OLS slope of ln(count) on ln(rank),
    ranks by (count DESC, token ASC) — the deterministic tie order the SQL
    window uses too."""
    import pandas as pd

    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        flat, _ = token_lists_arrow(t["text"])
        vc = pc.value_counts(flat)
        return pa.table(
            {"token": vc.field("values").cast(pa.string()), "n": vc.field("counts").cast(pa.int64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    if ds.count() <= scale_gate(driver_merge_threshold):
        frames = [
            b.to_pandas()
            for b in partials.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        ]
        merged = (
            pd.concat(frames).groupby("token", sort=False)["n"].sum().reset_index()
            if frames
            else pd.DataFrame({"token": [], "n": []})
        )
    else:
        merged = (
            partials.groupby("token")
            .aggregate(Sum("n", alias_name="n"))
            .sort(["n", "token"], descending=[True, False])
            .limit(ZIPF_TOPK)
            .to_pandas()
        )
    top = merged.sort_values(["n", "token"], ascending=[False, True], kind="mergesort").head(
        ZIPF_TOPK
    )
    k = len(top)
    if k < 2:
        return pa.table(
            {"zipf_slope": pa.array([None], type=pa.float64()), "n_ranks": pa.array([k], type=pa.int64())}
        )
    x = np.log(np.arange(1, k + 1, dtype=np.float64))
    y = np.log(top["n"].to_numpy(dtype=np.float64))
    xc = x - x.mean()
    slope = float((xc * (y - y.mean())).sum() / (xc * xc).sum())
    return pa.table(
        {
            "zipf_slope": pa.array([round(slope, 6)], type=pa.float64()),
            "n_ranks": pa.array([k], type=pa.int64()),
        }
    )


T_ZIPF_FIT_SQL = f"""
WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+')) AS token
  FROM documents),
c AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
r AS (SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rank FROM c),
top AS (SELECT * FROM r WHERE rank <= {ZIPF_TOPK})
SELECT round(regr_slope(ln(n), ln(rank)), 6) AS zipf_slope,
       count(*) AS n_ranks
FROM top
"""


# ------------------------------------------------------------- char entropy
# Character-level Shannon entropy — the gibberish/boilerplate quality signal
# orthogonal to the token-level stats: natural English sits near 4.1 bits
# equivalent (~2.9 nats); repeated templates collapse it, random bytes max it.
# Kernel: ONE zero-copy view of the Arrow string buffer as uint8 and ONE
# whole-batch 256-bin-per-doc bincount (bytes == codepoints == the oracle's
# per-character unnest on ASCII docs); docs containing multibyte sequences
# fall back per doc to the exact codepoint distribution, so the operator is
# oracle-faithful on any input, not just the ASCII corpus.


def t_char_entropy(sf_dir: str):
    """(doc_id, n_chars_scored, char_entropy): entropy in nats of the doc's
    character distribution, 0.0 for null/empty docs, rounded to 6."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        col = t["text"]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        arr = arr.cast(pa.large_string())
        filled = pc.fill_null(arr, "")
        n_docs = len(filled)
        buf = np.frombuffer(filled.buffers()[2] or b"", dtype=np.uint8)
        offs = np.frombuffer(filled.buffers()[1], dtype=np.int64)[
            filled.offset : filled.offset + n_docs + 1
        ]
        n = np.diff(offs).copy()
        ent = np.zeros(n_docs, dtype=np.float64)
        if buf.size:
            # one whole-batch histogram: row d = doc d's byte counts
            doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), n)
            cnt = np.bincount(doc_idx * 256 + buf, minlength=n_docs * 256).reshape(n_docs, 256)
            safe_n = np.maximum(n, 1)[:, None]
            p = cnt / safe_n
            with np.errstate(divide="ignore", invalid="ignore"):
                terms = np.where(cnt > 0, p * np.log(p), 0.0)
            ent = -terms.sum(axis=1)
            # a multibyte (non-ASCII) doc falls back to the oracle's exact
            # CODEPOINT distribution — rare by construction on web corpora
            # after lang filtering, so per-doc decode cost is negligible
            is_mb = cnt[:, 128:].sum(axis=1) > 0
            for i in np.flatnonzero(is_mb):
                cp = np.frombuffer(
                    filled[i].as_py().encode("utf-32-le"), dtype=np.uint32
                )
                n[i] = len(cp)
                _, c = np.unique(cp, return_counts=True)
                pi = c / n[i]
                ent[i] = -(pi * np.log(pi)).sum()
        ent = np.array([round(float(v), 6) for v in ent], dtype=np.float64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars_scored": pa.array(n, type=pa.int64()),
                "char_entropy": pa.array(ent, type=pa.float64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


T_CHAR_ENTROPY_SQL = r"""
WITH ch AS (
  SELECT doc_id, unnest(regexp_extract_all(coalesce(text, ''), '[\s\S]')) AS c
  FROM documents),
cnt AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY doc_id, c),
tot AS (SELECT doc_id, sum(n) AS s FROM cnt GROUP BY doc_id),
e AS (
  SELECT c.doc_id, CAST(t.s AS BIGINT) AS n_chars_scored,
         round(-sum((c.n * 1.0 / t.s) * ln(c.n * 1.0 / t.s)), 6) AS char_entropy
  FROM cnt c JOIN tot t USING (doc_id) GROUP BY c.doc_id, t.s)
SELECT d.doc_id,
       coalesce(e.n_chars_scored, 0) AS n_chars_scored,
       coalesce(e.char_entropy, 0.0) AS char_entropy
FROM documents d LEFT JOIN e USING (doc_id)
"""


# ------------------------------------------------------------- readability
# Flesch Reading Ease as a quality signal (Flesch 1948; the DataComp-LM-style
# cheap readability feature).  Heuristics are fully regex-defined so the
# score is bit-reproducible in SQL: words = ASCII token runs (the corpus
# token spec), syllables = vowel-group runs [aeiouy]+ of the lowered text,
# sentences = [.!?]+ runs clamped to >= 1.  Zero-word docs score NULL.


def t_readability(sf_dir: str):
    """(doc_id, n_words, n_syllables, n_sentences, flesch): one streaming
    pass of three RE2 count kernels + float arithmetic, rounded to 6."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(pc.coalesce(t["text"], pa.scalar("", type=pa.string())))
        w = pc.count_substring_regex(low, pattern="[0-9a-z_]+").to_numpy(zero_copy_only=False).astype(np.float64)
        syl = pc.count_substring_regex(low, pattern="[aeiouy]+").to_numpy(zero_copy_only=False).astype(np.float64)
        sent = pc.count_substring_regex(low, pattern="[.!?]+").to_numpy(zero_copy_only=False).astype(np.float64)
        sent = np.maximum(sent, 1.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            score = 206.835 - 1.015 * (w / sent) - 84.6 * (syl / w)
        score = np.round(score, 6)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": pa.array(w.astype(np.int64)),
                "n_syllables": pa.array(syl.astype(np.int64)),
                "n_sentences": pa.array(sent.astype(np.int64)),
                "flesch": pa.array(np.nan_to_num(score), type=pa.float64(), mask=(w == 0)),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


T_READABILITY_SQL = """
WITH base AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+')) AS BIGINT) AS n_words,
         CAST(len(regexp_extract_all(lower(coalesce(text, '')), '[aeiouy]+')) AS BIGINT) AS n_syllables,
         CAST(greatest(len(regexp_extract_all(lower(coalesce(text, '')), '[.!?]+')), 1) AS BIGINT) AS n_sentences
  FROM documents)
SELECT doc_id, n_words, n_syllables, n_sentences,
       CASE WHEN n_words = 0 THEN NULL
            ELSE round(206.835 - 1.015 * (n_words * 1.0 / n_sentences)
                       - 84.6 * (n_syllables * 1.0 / n_words), 6) END AS flesch
FROM base
"""


# --------------------------------------------------- per-source distinctive terms
# Weighted log-odds with add-1 smoothing (the "Fightin' Words" shape, Monroe
# et al., Political Analysis 2008, simplified to symmetric Dirichlet): for
# each source, which tokens are over-represented vs the REST of the corpus.
# score(t, s) = ln((c_ts + 1) / (N_s + V)) - ln((c_t - c_ts + 1) / (N - N_s + V)).


def _source_token_partials(t: pa.Table) -> pa.Table:
    """Per-batch partial (source, token, n) occurrence counts — one Arrow
    tokenize pass, counts via a dictionary-encode + bincount, no per-row
    Python."""
    flat, offs = token_lists_arrow(t["text"])
    if len(flat) == 0:
        return pa.table(
            {
                "source": pa.array([], type=pa.string()),
                "token": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    # null sources must not reach pd.factorize (it codes None as -1, which
    # would floor the pair key into the wrong source); '' matches the
    # oracle's coalesce(source, '')
    src = pc.fill_null(t["source"], "").to_numpy(zero_copy_only=False)
    src_per_tok = np.repeat(src, np.diff(offs))
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    s_enc = pd.factorize(src_per_tok)[0].astype(np.int64)
    n_dict = len(enc.dictionary)
    pair = s_enc * n_dict + codes
    uniq, counts = np.unique(pair, return_counts=True)
    s_names = pd.unique(src_per_tok)
    return pa.table(
        {
            "source": pa.array(s_names[(uniq // n_dict)].astype(str)),
            "token": enc.dictionary.take(pa.array(uniq % n_dict, type=pa.int64())),
            "n": pa.array(counts.astype(np.int64), type=pa.int64()),
        }
    )


def _logodds_frame(ct: pd.DataFrame, k: int) -> pa.Table:
    """(source, token, n) counts -> top-k log-odds rows per source."""
    if ct.empty:
        return pa.table(
            {
                "source": pa.array([], type=pa.string()),
                "token": pa.array([], type=pa.string()),
                "log_odds": pa.array([], type=pa.float64()),
                "rank": pa.array([], type=pa.int64()),
            }
        )
    ns = ct.groupby("source")["n"].sum()
    c_all = ct.groupby("token")["n"].sum()
    v = len(c_all)
    n_total = int(ct["n"].sum())
    c = ct["n"].to_numpy(dtype=np.float64)
    ns_v = ns.loc[ct["source"]].to_numpy(dtype=np.float64)
    ca_v = c_all.loc[ct["token"]].to_numpy(dtype=np.float64)
    score = np.log((c + 1.0) / (ns_v + v)) - np.log((ca_v - c + 1.0) / (n_total - ns_v + v))
    out = ct[["source", "token"]].copy()
    out["log_odds"] = score
    out = out.sort_values(["source", "log_odds", "token"], ascending=[True, False, True], kind="mergesort")
    out = out.groupby("source", sort=True).head(k).copy()
    out["rank"] = out.groupby("source").cumcount() + 1
    out["log_odds"] = out["log_odds"].round(6)
    return pa.Table.from_pandas(
        out.astype({"rank": np.int64}).reset_index(drop=True), preserve_index=False
    )


def t_source_terms(sf_dir: str, k: int = 10, driver_merge_threshold: int = 2_000_000):
    """Top-``k`` distinctive tokens per source by smoothed log-odds vs the
    rest of the corpus.  Dual plan: per-batch (source, token, n) combiners
    stream to a driver pandas merge below the doc threshold (vocab-sized
    state); above it the counts aggregate distributedly (packed key groupby,
    then token totals inside ONE boundary-aware range-sorted pass) and only
    the per-source top-k reaches the driver."""
    ds = _docs(sf_dir, ["source", "text"])
    n_docs = ds.count()
    partials = ds.map_batches(_source_token_partials, batch_format="pyarrow")

    if n_docs <= scale_gate(driver_merge_threshold):
        frames = [
            b.to_pandas()
            for b in partials.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
            if b.num_rows
        ]
        ct = (
            pd.concat(frames).groupby(["source", "token"], sort=False)["n"].sum().reset_index()
            if frames
            else pd.DataFrame(columns=["source", "token", "n"])
        )
        return _logodds_frame(ct, k)

    # distributed plan: pack (source, token) into one string key (sources
    # never contain \x00), aggregate, then recompute the marginals as slim
    # side tables and join them back token-partitioned
    from ray.data.aggregate import Sum

    from ..rayops import first_per_key, head_k_per_key, map_sorted_groups

    def packkey(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(t["source"], t["token"], "\x00")
        return pa.table({"key": key, "n": t["n"]})

    ct = partials.map_batches(packkey, batch_format="pyarrow").groupby("key").aggregate(
        Sum("n", alias_name="n")
    )

    def unpack(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["key"], "\x00")
        return pa.table(
            {
                "source": pc.list_element(parts, 0),
                "token": pc.list_element(parts, 1),
                "n": t["n"],
            }
        )

    ct = ct.map_batches(unpack, batch_format="pyarrow").materialize()
    src_tot = {
        r["source"]: int(r["ns"])
        for r in ct.groupby("source").aggregate(Sum("n", alias_name="ns")).take_all()
    }
    v = first_per_key(ct.select_columns(["token"]), "token").count()
    n_total = sum(src_tot.values())

    import ray as _ray

    sref = _ray.put(src_tot)
    empty_scored = pa.table(
        {"source": pa.array([], type=pa.string()), "token": pa.array([], type=pa.string()),
         "log_odds": pa.array([], type=pa.float64())}
    )

    # token totals via ONE range sort with boundary-aware complete groups —
    # not a (token-total side table ⋈ counts) hash join: Ray's hash-join
    # aggregator infers a partition's schema from the blocks it happens to
    # receive, so a rows-less partition can finalize schema-less and fail
    # (observed flakily under --tiny-blocks); the sorted-group pass has no
    # such mode and moves the same slim rows once
    def score_groups(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty_scored
        st = _ray.get(sref)
        tok = t["token"].to_numpy(zero_copy_only=False)
        c = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        starts = np.flatnonzero(np.r_[True, tok[1:] != tok[:-1]])
        seg = np.repeat(np.arange(len(starts)), np.diff(np.r_[starts, len(tok)]))
        ca = np.add.reduceat(c, starts)[seg]
        ns_v = np.array([st[s] for s in t["source"].to_pylist()], dtype=np.float64)
        sc = np.log((c + 1.0) / (ns_v + v)) - np.log((ca - c + 1.0) / (n_total - ns_v + v))
        return pa.table(
            {"source": t["source"], "token": t["token"], "log_odds": pa.array(sc, type=pa.float64())}
        )

    scored = map_sorted_groups(ct, "token", score_groups, empty_scored)
    top = head_k_per_key(scored, "source", ["log_odds", "token"], k, descending=[True, False])
    df = top.to_pandas().sort_values(["source", "log_odds", "token"], ascending=[True, False, True])
    df["rank"] = df.groupby("source").cumcount() + 1
    df["log_odds"] = df["log_odds"].round(6)
    return pa.Table.from_pandas(df.astype({"rank": np.int64}).reset_index(drop=True), preserve_index=False)


T_SOURCE_TERMS_SQL = """
WITH toks AS (
  SELECT coalesce(source, '') AS source,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+')) AS tok
  FROM documents),
ct AS (SELECT source, tok, count(*) AS c FROM toks GROUP BY source, tok),
tot_s AS (SELECT source, count(*) AS ns FROM toks GROUP BY source),
tot_t AS (SELECT tok, count(*) AS c_all FROM toks GROUP BY tok),
consts AS (SELECT (SELECT count(*) FROM tot_t) AS v, (SELECT count(*) FROM toks) AS n),
scored AS (
  SELECT ct.source, ct.tok AS token,
         ln((ct.c + 1.0) / (tot_s.ns + consts.v))
           - ln((tot_t.c_all - ct.c + 1.0) / (consts.n - tot_s.ns + consts.v)) AS lo
  FROM ct JOIN tot_s USING (source) JOIN tot_t ON tot_t.tok = ct.tok, consts)
SELECT source, token, round(lo, 6) AS log_odds, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY source ORDER BY lo DESC, token) AS rank
  FROM scored)
WHERE rank <= 10
"""


# ------------------------------------------------------------ PMI collocations
# Pointwise mutual information of adjacent token pairs (Church & Hanks, CL
# 1990): pmi(x,y) = ln(p(xy)) - ln(p(x)) - ln(p(y)) with p over bigram/unigram
# totals.  High-PMI pairs are collocations ("new york"); a corpus-health /
# phrase-mining staple.

PMI_MIN_COUNT = 5


def _gram_count_partials(t: pa.Table) -> pa.Table:
    """ONE tokenize pass emitting BOTH unigram and adjacent-bigram partial
    counts as a tagged table (is_bigram, key, n) — the corpus is scanned
    once, not twice.  Bigrams join adjacent tokens with ' ' (tokens never
    contain spaces); pairs crossing a doc boundary are masked out; counts
    come from the C++ value_counts kernel."""
    flat, offs = token_lists_arrow(t["text"])
    empty = pa.table(
        {
            "is_bigram": pa.array([], type=pa.bool_()),
            "key": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
        }
    )
    if not len(flat):
        return empty
    uvc = pc.value_counts(flat)
    u_keys, u_ns = uvc.field("values"), uvc.field("counts").cast(pa.int64())
    if len(flat) >= 2:
        left = flat.slice(0, len(flat) - 1)
        right = flat.slice(1)
        grams = pc.binary_join_element_wise(left, right, " ")
        # positions where the pair crosses a doc boundary: left index == offs-1
        mask = np.ones(len(grams), dtype=bool)
        ends = offs[1:-1] - 1  # last token of every doc but the final one
        # trailing empty/null-text docs make offs[k] == len(flat), i.e.
        # ends == len(grams) — out of bounds (no pair starts there anyway)
        ends = ends[(ends >= 0) & (ends < len(grams))]
        mask[ends] = False
        grams = grams.filter(pa.array(mask))
    else:
        grams = pa.array([], type=pa.string())
    if len(grams):
        bvc = pc.value_counts(grams)
        b_keys, b_ns = bvc.field("values"), bvc.field("counts").cast(pa.int64())
    else:
        b_keys = pa.array([], type=pa.string())
        b_ns = pa.array([], type=pa.int64())
    def _arr(x):
        return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x

    return pa.table(
        {
            "is_bigram": pa.array(
                np.concatenate([np.zeros(len(u_keys), bool), np.ones(len(b_keys), bool)])
            ),
            "key": pa.concat_arrays([_arr(u_keys), _arr(b_keys)]),
            "n": pa.concat_arrays([_arr(u_ns), _arr(b_ns)]),
        }
    )


def t_pmi_bigrams(sf_dir: str, k: int = 25, driver_merge_threshold: int = 2_000_000):
    """Top-``k`` collocations by PMI among bigrams with count >=
    ``PMI_MIN_COUNT``.  One tokenize pass emits tagged unigram+bigram
    combiners; the count merge is dual-plan (driver pandas below the doc
    threshold, distributed groupby-sum above — the t_token_topk discipline);
    scoring and top-k always run over VOCABULARY-bounded aggregated tables
    (never the corpus).  Ranking is by unrounded float64 PMI (ties -> bigram
    asc) in both engines; emitted pmi is rounded to 6."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["doc_id", "text"])
    n_docs = ds.count()
    partials = ds.map_batches(_gram_count_partials, batch_format="pyarrow")

    if n_docs <= scale_gate(driver_merge_threshold):
        frames = [
            b.to_pandas()
            for b in partials.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
            if b.num_rows
        ]
        merged = (
            pd.concat(frames).groupby(["is_bigram", "key"], sort=False)["n"].sum().reset_index()
            if frames
            else pd.DataFrame(columns=["is_bigram", "key", "n"])
        )
    else:

        def packkey(t: pa.Table) -> pa.Table:
            tag = pc.if_else(t["is_bigram"], pa.scalar("b"), pa.scalar("u"))
            return pa.table(
                {"key": pc.binary_join_element_wise(tag, t["key"], "\x00"), "n": t["n"]}
            )

        agg = partials.map_batches(packkey, batch_format="pyarrow").groupby("key").aggregate(
            Sum("n", alias_name="n")
        )
        mdf = agg.to_pandas()  # vocabulary-bounded, not corpus-bounded
        if mdf.empty:
            merged = pd.DataFrame(columns=["is_bigram", "key", "n"])
        else:
            merged = pd.DataFrame(
                {
                    "is_bigram": mdf["key"].str[0].eq("b"),
                    "key": mdf["key"].str[2:],
                    "n": mdf["n"],
                }
            )

    empty = pa.table(
        {
            "bigram": pa.array([], type=pa.string()),
            "n_pair": pa.array([], type=pa.int64()),
            "pmi": pa.array([], type=pa.float64()),
            "rank": pa.array([], type=pa.int64()),
        }
    )
    if merged.empty:  # empty object mask would index COLUMNS, not rows
        return empty
    mask = merged["is_bigram"].astype(bool)
    bc = merged[mask][["key", "n"]].rename(columns={"key": "bigram"})
    uc = merged[~mask][["key", "n"]].rename(columns={"key": "token"})
    if bc.empty or uc.empty:
        return empty
    nb = int(bc["n"].sum())
    nu = int(uc["n"].sum())
    bc = bc[bc["n"] >= PMI_MIN_COUNT].copy()
    if bc.empty:  # no bigram reaches min support (split on empty loses columns)
        return empty
    toks = bc["bigram"].str.split(" ", n=1, expand=True)
    um = uc.set_index("token")["n"]
    cl = um.loc[toks[0]].to_numpy(dtype=np.float64)
    cr = um.loc[toks[1]].to_numpy(dtype=np.float64)
    c = bc["n"].to_numpy(dtype=np.float64)
    pmi = np.log(c / nb) - np.log(cl / nu) - np.log(cr / nu)
    bc["pmi_raw"] = pmi
    bc = bc.sort_values(["pmi_raw", "bigram"], ascending=[False, True], kind="mergesort").head(k)
    bc["rank"] = np.arange(1, len(bc) + 1, dtype=np.int64)
    return pa.table(
        {
            "bigram": pa.array(bc["bigram"].tolist(), type=pa.string()),
            "n_pair": pa.array(bc["n"].to_numpy(np.int64), type=pa.int64()),
            "pmi": pa.array(np.round(bc["pmi_raw"].to_numpy(), 6), type=pa.float64()),
            "rank": pa.array(bc["rank"].to_numpy(), type=pa.int64()),
        }
    )


T_PMI_BIGRAMS_SQL = f"""
WITH toks AS (
  SELECT regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+') AS tk FROM documents),
uni AS (SELECT unnest(tk) AS tok FROM toks),
ucnt AS (SELECT tok, count(*) AS c FROM uni GROUP BY tok),
nu AS (SELECT count(*) AS n FROM uni),
bg AS (SELECT unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i + 1])) AS g
       FROM toks WHERE len(tk) >= 2),
bcnt AS (SELECT g, count(*) AS c FROM bg GROUP BY g),
nb AS (SELECT count(*) AS n FROM bg),
scored AS (
  SELECT bcnt.g AS bigram, bcnt.c AS n_pair,
         ln(bcnt.c * 1.0 / nb.n) - ln(cl.c * 1.0 / nu.n) - ln(cr.c * 1.0 / nu.n) AS pmi_raw
  FROM bcnt
  JOIN ucnt cl ON cl.tok = split_part(bcnt.g, ' ', 1)
  JOIN ucnt cr ON cr.tok = split_part(bcnt.g, ' ', 2)
  CROSS JOIN nb CROSS JOIN nu
  WHERE bcnt.c >= {PMI_MIN_COUNT})
SELECT bigram, n_pair, round(pmi_raw, 6) AS pmi, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (ORDER BY pmi_raw DESC, bigram) AS rank FROM scored)
WHERE rank <= {25}
"""


# --------------------------------------------------- tf-idf keyword extraction
# Top-k terms per document by tf-idf — the classic keyword-extraction /
# document-tagging operator (reference analog: the feature-importance report's
# "which strings matter" question, applied per document).  Scale plan: explode
# to a (doc_id, tok, tf) stream (corpus-sized but streaming), derive the
# document-frequency table from it with a distributed groupby (vocab-sized,
# stays distributed — NO vocabulary broadcast), join tf⋈df on the token key
# (one hash shuffle), then per-doc top-k via map_sorted_groups (one range
# sort, complete doc groups per task — no driver materialization).
# The idf is fixed-point (floor(ln(n/df) * 1e6) as int64), so the score
# tf * idf_fp and the rank order are exact integers on both engines; only the
# single ln() call touches floats, rounded at 1e-6 where engine ulp noise
# cannot flip an order.

TFIDF_TOP_K = 3
TFIDF_FP = 1_000_000


def t_tfidf_topk(sf_dir: str, k: int = TFIDF_TOP_K):
    """Top-k (doc_id, tok, rank, score_fp) per document by fixed-point tf-idf;
    rank 1..k by (score desc, tok asc).

    Plan: two range sorts, no hash exchange.  Complete tok groups compute df
    as the group size and score in place (each (doc, tok) row counts once),
    then complete doc groups rank top-k.  (The first version used
    groupby(tok).count + hash join back — 9.2 s at sf0.1 because the lazy tf
    stream feeding both join inputs re-executed and the join added two hash
    exchanges; same cure as t_dup_ngram_fraction.)"""
    from ..rayops import map_sorted_groups

    docs = _docs(sf_dir, ["doc_id", "text"])
    n_docs = docs.count()

    def tf_partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, offsets = token_lists_arrow(t["text"])
        dl = np.diff(offsets)
        if len(flat) == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.int64()), "tok": pa.array([], type=pa.string()),
                 "tf": pa.array([], type=pa.int64())}
            )
        doc_idx = np.repeat(np.arange(len(dl), dtype=np.int64), dl)
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_dict = len(enc.dictionary)
        packed = doc_idx * n_dict + codes
        uniq, counts = np.unique(packed, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(ids[uniq // n_dict], type=pa.int64()),
                "tok": pc.take(enc.dictionary, pa.array(uniq % n_dict, type=pa.int64())),
                "tf": pa.array(counts.astype(np.int64), type=pa.int64()),
            }
        )

    tf = docs.map_batches(tf_partial, batch_format="pyarrow")

    def score_tok_groups(t: pa.Table) -> pa.Table:
        # complete tok groups: df(tok) = group size — each (doc, tok) row
        # counts once, so a bincount over in-block dictionary codes IS the
        # corpus document frequency
        enc = pc.dictionary_encode(t["tok"])
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        df_v = np.bincount(codes)[codes].astype(np.float64)
        tf_v = t["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        idf_fp = np.floor(np.log(n_docs / df_v) * TFIDF_FP).astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "tok": t["tok"],
                "score_fp": pa.array(tf_v * idf_fp, type=pa.int64()),
            }
        )

    empty_scored = pa.table(
        {"doc_id": pa.array([], type=pa.int64()), "tok": pa.array([], type=pa.string()),
         "score_fp": pa.array([], type=pa.int64())}
    )
    scored = map_sorted_groups(tf, "tok", score_tok_groups, empty_scored)

    empty = pa.table(
        {"doc_id": pa.array([], type=pa.int64()), "tok": pa.array([], type=pa.string()),
         "rank": pa.array([], type=pa.int64()), "score_fp": pa.array([], type=pa.int64())}
    )

    def topk_rank(t: pa.Table) -> pa.Table:
        # complete doc groups, any intra-group order: rank (score desc, tok asc)
        df_ = t.to_pandas().sort_values(
            ["doc_id", "score_fp", "tok"], ascending=[True, False, True]
        )
        df_["rank"] = df_.groupby("doc_id", sort=False).cumcount() + 1
        df_ = df_[df_["rank"] <= k]
        return pa.Table.from_pandas(
            df_[["doc_id", "tok", "rank", "score_fp"]], preserve_index=False
        )

    # per-doc top-k stays distributed: one range sort, complete groups per task
    # (n_docs * k output rows never touch the driver)
    return map_sorted_groups(scored, "doc_id", topk_rank, empty)


T_TFIDF_TOPK_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+')) AS tok
  FROM documents),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok,
         tf.tf * CAST(floor(ln(CAST(n.n AS DOUBLE) / df.df) * {TFIDF_FP}) AS BIGINT) AS score_fp
  FROM tf JOIN df USING (tok), n)
SELECT doc_id, tok, CAST(rank AS BIGINT) AS rank, score_fp FROM (
  SELECT doc_id, tok, score_fp,
         row_number() OVER (PARTITION BY doc_id ORDER BY score_fp DESC, tok) AS rank
  FROM scored)
WHERE rank <= {TFIDF_TOP_K}
"""


def t_vocab_stats(sf_dir: str):
    """EXACT corpus vocabulary statistics — total tokens, distinct vocabulary
    size, hapax count (frequency-1 types) — the companion to the approximate
    ``t_distinct_hll`` for corpora where exactness matters (tokenizer vocab
    construction, Heaps-law audits).  Plan: ``pc.value_counts`` per block is
    the combiner (zipfian tokens collapse ~100x before the shuffle), ONE
    token-keyed ``groupby().sum()`` — the same token-cardinality exchange as
    t_tfidf's df — then O(#blocks) scalar partials to the driver."""
    from ray.data.aggregate import Sum

    docs = _docs(sf_dir, ["text"])

    def tok_partial(t: pa.Table) -> pa.Table:
        flat, _ = token_lists_arrow(t["text"])
        if len(flat) == 0:
            return pa.table(
                {"tok": pa.array([], type=pa.string()), "c": pa.array([], type=pa.int64())}
            )
        vc = pc.value_counts(flat)
        return pa.table({"tok": vc.field("values"), "c": vc.field("counts").cast(pa.int64())})

    counts = (
        docs.map_batches(tok_partial, batch_format="pyarrow").groupby("tok").aggregate(Sum("c", alias_name="n"))
    )

    def reduce_partial(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_tokens": pa.array([int(n.sum())], type=pa.int64()),
                "vocab_size": pa.array([len(n)], type=pa.int64()),
                "n_hapax": pa.array([int((n == 1).sum())], type=pa.int64()),
            }
        )

    parts = counts.map_batches(reduce_partial, batch_format="pyarrow").to_pandas()
    tot = parts.sum() if not parts.empty else {"n_tokens": 0, "vocab_size": 0, "n_hapax": 0}
    return pa.table(
        {
            "n_tokens": pa.array([int(tot["n_tokens"])], type=pa.int64()),
            "vocab_size": pa.array([int(tot["vocab_size"])], type=pa.int64()),
            "n_hapax": pa.array([int(tot["n_hapax"])], type=pa.int64()),
        }
    )


T_VOCAB_STATS_SQL = """
WITH tok AS (SELECT unnest(regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+')) AS tk
             FROM documents),
c AS (SELECT tk, count(*) AS n FROM tok GROUP BY tk)
SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS vocab_size,
       CAST(count(*) FILTER (n = 1) AS BIGINT) AS n_hapax
FROM c
"""


DUP_NGRAM_N = 8


def t_dup_ngram_fraction(sf_dir: str, n: int = DUP_NGRAM_N):
    """Cross-document duplicate n-gram fraction — the MassiveText/RefinedWeb
    curation signal: per doc, the share of its DISTINCT 8-gram windows that
    also occur in at least one other document (boilerplate detection the
    within-doc ``t_repetition``/``t_dupline_ratio`` checks can't see).  Docs
    shorter than n tokens emit no windows and are excluded (the
    decontamination short="drop" rule).  Plan: vectorized flat shingling →
    md5 gram keys (int64, never gram strings on the wire) → within-doc
    dedup in the batch → TWO range sorts and nothing else: complete gram
    groups flag each (doc, gram) row dup when its group has ≥2 rows, then
    complete doc groups count.  (The first version used
    groupby(gram).count + hash join back — 11.3 s at sf0.1 because the lazy
    gram stream feeding both join inputs re-executed and the join added two
    hash exchanges; the two-sort plan is ~3x faster and each exchange is a
    slim 2×int64 stream.)  md5 collisions (~2^-64/pair) are the only
    divergence from the string-keyed oracle — the repo's documented MinHash
    channel.  Output (doc_id, n_grams, n_dup, dup_ppm), dup_ppm an exact
    integer floor(n_dup*1e6/n_grams)."""
    from ..rayops import map_sorted_groups

    docs = _docs(sf_dir, ["doc_id", "text"])

    def doc_grams(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, offsets = token_lists_arrow(t["text"])
        sh, sh_offs = shingle_lists(flat, offsets, n, short="drop")
        cnt = np.diff(sh_offs)
        if len(sh) == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.int64()), "gram_h": pa.array([], type=pa.int64())}
            )
        doc = np.repeat(ids, cnt)
        h = md5_u64_dict(sh).view(np.int64)
        order = np.lexsort((h, doc))
        doc, h = doc[order], h[order]
        keep = np.ones(len(doc), dtype=bool)
        keep[1:] = (doc[1:] != doc[:-1]) | (h[1:] != h[:-1])
        return pa.table(
            {
                "doc_id": pa.array(doc[keep], type=pa.int64()),
                "gram_h": pa.array(h[keep], type=pa.int64()),
            }
        )

    grams = docs.map_batches(doc_grams, batch_format="pyarrow")

    def flag_dup(t: pa.Table) -> pa.Table:
        # complete gram groups: a row is dup iff its gram's group size >= 2
        h = t["gram_h"].to_numpy(zero_copy_only=False)
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        hs = h[order]
        _, starts, counts = np.unique(hs, return_index=True, return_counts=True)
        dup_sorted = np.repeat(counts >= 2, counts)
        dup = np.empty(len(h), dtype=np.int64)
        dup[order] = dup_sorted
        return pa.table(
            {"doc_id": pa.array(d, type=pa.int64()), "dup": pa.array(dup, type=pa.int64())}
        )

    flagged = map_sorted_groups(
        grams,
        "gram_h",
        flag_dup,
        pa.table({"doc_id": pa.array([], type=pa.int64()), "dup": pa.array([], type=pa.int64())}),
    )

    def per_doc(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        dup = t["dup"].to_numpy(zero_copy_only=False)
        order = np.argsort(d, kind="stable")
        d, dup = d[order], dup[order]
        uniq, starts, counts = np.unique(d, return_index=True, return_counts=True)
        ndup = np.add.reduceat(dup, starts) if len(d) else np.array([], dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(uniq, type=pa.int64()),
                "n_grams": pa.array(counts.astype(np.int64), type=pa.int64()),
                "n_dup": pa.array(ndup, type=pa.int64()),
                "dup_ppm": pa.array(ndup * 1_000_000 // counts, type=pa.int64()),
            }
        )

    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "n_grams": pa.array([], type=pa.int64()),
            "n_dup": pa.array([], type=pa.int64()),
            "dup_ppm": pa.array([], type=pa.int64()),
        }
    )
    return map_sorted_groups(flagged, "doc_id", per_doc, empty)


def _dup_ngram_sql(n: int = DUP_NGRAM_N) -> str:
    gram_expr = ", ".join(f"tk[i+{o}]" for o in range(n))
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+') AS tk
  FROM documents),
sh AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id, unnest(CASE
      WHEN len(tk) < {n} THEN CAST([] AS VARCHAR[])
      ELSE list_transform(range(1, len(tk) - {n - 2}), i -> concat_ws(' ', {gram_expr}))
    END) AS g FROM toks)),
df AS (SELECT g, count(*) AS df FROM sh GROUP BY g)
SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(*) FILTER (df.df >= 2) AS BIGINT) AS n_dup,
       CAST(count(*) FILTER (df.df >= 2) * 1000000 // count(*) AS BIGINT) AS dup_ppm
FROM sh s JOIN df ON df.g = s.g
GROUP BY s.doc_id
"""


T_DUP_NGRAM_SQL = _dup_ngram_sql()


def t_bpe_merges(sf_dir: str, n_merges: int = 20, max_vocab: int = 100_000):
    """BPE tokenizer-vocabulary learning (Sennrich et al. 2016): the top
    ``n_merges`` byte-pair merges over the corpus, rank-ordered.  The
    distributed part is the corpus→word-count reduction (the corpus-sized
    stage: per-block ``pc.value_counts`` combiner then ONE token-keyed
    groupby sum, as t_vocab_stats); the merge loop itself runs on the driver
    over the count-capped vocabulary — the published algorithm's shape
    (BPE iterates over the VOCAB with frequencies, never the corpus), with
    ``max_vocab`` bounding driver state like the clustering fast path.
    Deterministic: ties break on the lexicographically smallest pair.
    Not SQL-expressible (iterative re-tokenization) → rows-only oracle.
    Output (rank, left, right, pair_count)."""
    from ray.data.aggregate import Sum

    docs = _docs(sf_dir, ["text"])

    def tok_partial(t: pa.Table) -> pa.Table:
        flat, _ = token_lists_arrow(t["text"])
        if len(flat) == 0:
            return pa.table(
                {"tok": pa.array([], type=pa.string()), "c": pa.array([], type=pa.int64())}
            )
        vc = pc.value_counts(flat)
        return pa.table({"tok": vc.field("values"), "c": vc.field("counts").cast(pa.int64())})

    counts = (
        docs.map_batches(tok_partial, batch_format="pyarrow").groupby("tok").aggregate(Sum("c", alias_name="n"))
    )

    def vocab_topk(t: pa.Table) -> pa.Table:
        # per-block partial top-max_vocab by (n desc, tok asc) — the driver
        # merge sees at most max_vocab rows per block, never the full vocab
        toks = t["tok"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        if len(toks) > max_vocab:
            order = np.lexsort((toks, -n))[:max_vocab]
            toks, n = toks[order], n[order]
        return pa.table({"tok": pa.array(toks, type=pa.string()), "n": pa.array(n, type=pa.int64())})

    vdf = counts.map_batches(vocab_topk, batch_format="pyarrow").to_pandas()
    if not vdf.empty:
        vdf = vdf.sort_values(["n", "tok"], ascending=[False, True], kind="mergesort").head(max_vocab)

    # driver BPE loop over the (small) vocab: word -> symbol tuple
    words = {tuple(w): int(c) for w, c in zip(vdf.get("tok", []), vdf.get("n", []))}
    out_rank, out_left, out_right, out_cnt = [], [], [], []
    for rank in range(1, n_merges + 1):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, c in words.items():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        # tie-break: highest count, then lexicographically smallest pair
        top = max(pair_counts.values())
        best = min(p for p, c in pair_counts.items() if c == top)
        cnt = top
        out_rank.append(rank)
        out_left.append(best[0])
        out_right.append(best[1])
        out_cnt.append(cnt)
        merged = best[0] + best[1]
        new_words = {}
        for syms, c in words.items():
            if len(syms) > 1:
                ns, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                        ns.append(merged)
                        i += 2
                    else:
                        ns.append(syms[i])
                        i += 1
                syms = tuple(ns)
            new_words[syms] = new_words.get(syms, 0) + c
        words = new_words
    return pa.table(
        {
            "rank": pa.array(out_rank, type=pa.int64()),
            "left": pa.array(out_left, type=pa.string()),
            "right": pa.array(out_right, type=pa.string()),
            "pair_count": pa.array(out_cnt, type=pa.int64()),
        }
    )


TERM_SEARCH_TERMS = ("table", "quality", "sample")


def t_term_search(sf_dir: str, terms: tuple = TERM_SEARCH_TERMS):
    """Concordance / grep-at-scale: for each query term, the docs containing
    it and the 1-based position of the first hit (DuckDB ``strpos`` parity on
    this ASCII corpus) — the corpus-inspection primitive behind targeted
    decontamination and eval-leak hunts.  One streaming pass; each term is a
    vectorized ``pc.find_substring`` over the lowered text (no per-row
    Python).  Output (term, doc_id, first_pos)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(pc.fill_null(t["text"], ""))
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        outs = []
        for term in terms:
            pos = pc.find_substring(low, term).to_numpy(zero_copy_only=False)
            m = pos >= 0
            outs.append(
                pa.table(
                    {
                        "term": pa.array([term] * int(m.sum()), type=pa.string()),
                        "doc_id": pa.array(ids[m], type=pa.int64()),
                        "first_pos": pa.array(pos[m] + 1, type=pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    return ds.map_batches(f, batch_format="pyarrow")


def _term_search_sql(terms: tuple = TERM_SEARCH_TERMS) -> str:
    vals = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH t(term) AS (VALUES {vals})
SELECT t.term, d.doc_id,
       CAST(strpos(lower(coalesce(d.text, '')), t.term) AS BIGINT) AS first_pos
FROM documents d, t
WHERE strpos(lower(coalesce(d.text, '')), t.term) > 0
"""


T_TERM_SEARCH_SQL = _term_search_sql()


def _roundtrip_file(sf_dir: str, fmt: str) -> str:
    """Materialize documents(doc_id, lang, n_chars) to CSV / JSONL under /tmp
    ONCE per sf_dir (marker-gated) so the reader-coverage queries below
    exercise sources.read_pages' non-Parquet branches on real files."""
    import hashlib
    import os
    import shutil

    import pyarrow.parquet as pq

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    d = f"/tmp/reader_roundtrip/{fmt}_{key}"
    fname = os.path.join(d, f"docs.{fmt}")
    marker = os.path.join(d, "_COMPLETE")
    if not os.path.exists(marker):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)
        tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"])
        if fmt == "csv":
            import pyarrow.csv as pacsv

            pacsv.write_csv(tbl, fname)
        else:
            tbl.to_pandas().to_json(fname, orient="records", lines=True)
        with open(marker, "w") as f:
            f.write("ok")
    return fname


def _reader_lang_agg(ds):
    """(lang, n_docs, sum_chars) via per-block combiners + tiny driver merge."""
    def part(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("lang", sort=False).agg(
            n=("n_chars", "size"), s=("n_chars", "sum")).reset_index()
        return pa.table(
            {"lang": pa.array(g["lang"], type=pa.string()),
             "n": pa.array(g["n"].to_numpy(dtype=np.int64), type=pa.int64()),
             "s": pa.array(g["s"].to_numpy(dtype=np.int64), type=pa.int64())}
        )

    p = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    if p.empty:
        return pa.table(
            {"lang": pa.array([], type=pa.string()), "n_docs": pa.array([], type=pa.int64()),
             "sum_chars": pa.array([], type=pa.int64())}
        )
    g = p.groupby("lang", sort=True)[["n", "s"]].sum().reset_index()
    return pa.table(
        {"lang": pa.array(g["lang"], type=pa.string()),
         "n_docs": pa.array(g["n"].to_numpy(dtype=np.int64), type=pa.int64()),
         "sum_chars": pa.array(g["s"].to_numpy(dtype=np.int64), type=pa.int64())}
    )


def t_csv_reader_agg(sf_dir: str):
    """S1 reader coverage, CSV branch: parquet → CSV → ``read_pages`` →
    per-lang aggregate, value-oracled against SQL over the ORIGINAL parquet —
    a lossless-roundtrip proof for the directory reader's CSV path."""
    from ..sources.readers import read_pages

    return _reader_lang_agg(read_pages(_roundtrip_file(sf_dir, "csv"), columns=["lang", "n_chars"]))


def t_jsonl_reader_agg(sf_dir: str):
    """S1 reader coverage, JSONL branch (the web-crawl interchange format):
    parquet → JSONL → ``read_pages`` → per-lang aggregate, value-oracled
    against the original parquet."""
    from ..sources.readers import read_pages

    return _reader_lang_agg(read_pages(_roundtrip_file(sf_dir, "jsonl"), columns=["lang", "n_chars"]))


T_READER_AGG_SQL = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang
"""

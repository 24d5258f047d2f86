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
from ray.data.aggregate import Count, Mean, Min

from ..functions.hashing import md5_hex, simhash64, stable_u64
from ..functions.text import (
    lang_id,
    normalize_whitespace_arrow,
    quality_stats,
    whitespace_token_count,
    word_tokens,
)


def _docs(sf_dir: str, columns):
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def t_normalize(sf_dir: str):
    """M2 whitespace-collapse normalizer, vectorized Arrow kernels."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "norm_text": normalize_whitespace_arrow(t["text"])})

    return ds.map_batches(f, batch_format="pyarrow")


T_NORMALIZE_SQL = """
SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS norm_text FROM documents
"""


def _with_hash(t: pa.Table) -> pa.Table:
    norm = normalize_whitespace_arrow(t["text"])
    return pa.table(
        {"doc_id": t["doc_id"], "text_hash": pa.array(md5_hex(norm.to_pylist()), type=pa.string())}
    )


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


def t_token_count(sf_dir: str):
    """Whitespace token counting (oracle parity with regexp_split_to_array)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        counts = [whitespace_token_count(x) for x in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"], "n_tokens": pa.array(counts, type=pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


T_TOKEN_COUNT_SQL = """
SELECT doc_id,
       CASE WHEN text IS NULL OR trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
FROM documents
"""


def t_lang_stats(sf_dir: str):
    """A4 field statistics per language: doc count, mean char length, distinct
    sources (two-level pre-aggregated distinct)."""
    ds = _docs(sf_dir, ["doc_id", "lang", "source", "n_chars"])
    base = ds.groupby("lang").aggregate(Count(alias_name="n_docs"), Mean("n_chars", alias_name="avg_chars"))
    nsrc = (
        ds.groupby(["lang", "source"])
        .aggregate(Count(alias_name="_c"))
        .groupby("lang")
        .aggregate(Count(alias_name="n_sources"))
    )
    b = base.to_pandas()
    s = nsrc.to_pandas()
    return pa.Table.from_pandas(b.merge(s, on="lang"), preserve_index=False)


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
        q = quality_stats(np.asarray(t["text"].to_pylist(), dtype=object))
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
    """Engine-only quality metrics (stopword ratio, mean token length, upper
    ratio) — heuristics with no clean SQL analog; rows-only check."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        q = quality_stats(np.asarray(t["text"].to_pylist(), dtype=object))
        out = {"doc_id": t["doc_id"]}
        for k, v in q.items():
            out[k] = pa.array(v)
        return pa.table(out)

    return ds.map_batches(f, batch_format="pyarrow")


def t_lang_id(sf_dir: str):
    """Language-ID heuristic (stopword n-gram voting) — engine-only."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        preds = [lang_id(x) for x in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"], "lang_pred": pa.array(preds, type=pa.string())})

    return ds.map_batches(f, batch_format="pyarrow")


def t_simhash(sf_dir: str):
    """Document fingerprint: 64-bit SimHash over tokens (engine-only; stable
    across runs — hex string output)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        toks = [word_tokens(x) if x else [] for x in t["text"].to_pylist()]
        sh = simhash64(toks)
        return pa.table(
            {"doc_id": t["doc_id"], "simhash": pa.array([format(int(v), "016x") for v in sh], type=pa.string())}
        )

    return ds.map_batches(f, batch_format="pyarrow")


def t_fingerprint(sf_dir: str):
    """Winnowing-style rolling fingerprint: min stable-u64 over token 4-grams
    (document fingerprinting; engine-only)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        out = np.zeros(len(t), dtype=np.int64)
        for i, x in enumerate(t["text"].to_pylist()):
            toks = word_tokens(x) if x else []
            if len(toks) >= 4:
                grams = [" ".join(toks[j : j + 4]) for j in range(len(toks) - 3)]
                out[i] = int(stable_u64(np.asarray(grams, dtype=object)).min() >> np.uint64(1))
            elif toks:
                out[i] = int(stable_u64(np.asarray([" ".join(toks)], dtype=object))[0] >> np.uint64(1))
        return pa.table({"doc_id": t["doc_id"], "fingerprint": pa.array(out, type=pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")

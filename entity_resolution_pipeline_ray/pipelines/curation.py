"""Webtext-curation operators over the ``documents`` table: BPE-ish token
counting, PII redaction, repetition quality signals, and benchmark n-gram
decontamination.

These extend the reference's preprocessing surface (normalize → hash → count,
/root/reference/src/batch_parallel_preprocessing.py:255-430) with the curation
stages a large-scale training-data pipeline needs.  Every operator streams the
corpus through vectorized ``map_batches`` and is DuckDB-oracled — both engines
run RE2, so the regex-defined outputs match bit-exactly on the ASCII corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import md5_u64_arr, md5_u64_dict
from ..functions.text import chunk_lists, shingle_lists, token_lists_arrow, word_tokens
from ..rayops import read_parquet_clean
from ..config import scale_gate


def _docs(sf_dir: str, columns):
    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=columns)


# ------------------------------------------------------------- BPE-ish tokens
# GPT-2-style pretokenizer, restricted to RE2-safe constructs (no lookahead,
# ASCII classes) so pyarrow and DuckDB count the exact same matches:
# contractions, optionally-space-prefixed letter runs / digit runs / other
# runs, then whitespace runs.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def t_bpe_count(sf_dir: str):
    """Token counting with a BPE-ish regex (the whitespace counter is
    ``t_token_count``): one non-overlapping RE2 scan per doc, zero-copy Arrow
    in and out."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        filled = pc.coalesce(t["text"], pa.scalar("", type=pa.string()))
        n = pc.count_substring_regex(filled, pattern=BPE_PATTERN)
        return pa.table({"doc_id": t["doc_id"], "n_bpe_tokens": pc.cast(n, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


T_BPE_COUNT_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(coalesce(text, ''), '{BPE_PATTERN.replace("'", "''")}')) AS n_bpe_tokens
FROM documents
"""


# --------------------------------------------------------------- PII redaction
# The corpus has no planted PII, so (like the life-years battery,
# text_analysis.t_life_years) both sides derive the same deterministic
# contact string from doc_id, then run the same scrub cascade.

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+\d{1,2}-\d{3}-\d{3}-\d{4}"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def _contact_strings(doc_ids: np.ndarray) -> list[str]:
    out = []
    for i in doc_ids:
        i = int(i)
        out.append(
            f"Reach user{i}@mail{i % 7}.example.com or +1-{200 + i % 700}-"
            f"{100 + (i * 3) % 900}-{1000 + (i * 7) % 9000} from host "
            f"{1 + i % 223}.{(i * 5) % 256}.{(i * 11) % 256}.{(i * 13) % 256} today."
        )
    return out


def t_pii_redact(sf_dir: str):
    """PII scrubbing: email → ``<EMAIL>``, then phone → ``<PHONE>``, then IPv4
    → ``<IP>`` (cascade order matters — the email eats its host-like domain
    before the IP pass).  Vectorized ``replace_substring_regex``; per-type hit
    counts from the unredacted string."""
    ds = _docs(sf_dir, ["doc_id"])

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        contact = pa.array(_contact_strings(ids), type=pa.string())
        red = pc.replace_substring_regex(contact, pattern=EMAIL_RE, replacement="<EMAIL>")
        red = pc.replace_substring_regex(red, pattern=PHONE_RE, replacement="<PHONE>")
        red = pc.replace_substring_regex(red, pattern=IP_RE, replacement="<IP>")
        n_pii = pc.add(
            pc.add(
                pc.count_substring_regex(contact, pattern=EMAIL_RE),
                pc.count_substring_regex(contact, pattern=PHONE_RE),
            ),
            pc.count_substring_regex(contact, pattern=IP_RE),
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "contact": contact,
                "redacted": red,
                "n_pii": pc.cast(n_pii, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


T_PII_REDACT_SQL = f"""
WITH c AS (
  SELECT doc_id,
         'Reach user' || doc_id || '@mail' || (doc_id % 7) || '.example.com or +1-' ||
         (200 + doc_id % 700) || '-' || (100 + (doc_id * 3) % 900) || '-' ||
         (1000 + (doc_id * 7) % 9000) || ' from host ' ||
         (1 + doc_id % 223) || '.' || ((doc_id * 5) % 256) || '.' ||
         ((doc_id * 11) % 256) || '.' || ((doc_id * 13) % 256) || ' today.' AS contact
  FROM documents)
SELECT doc_id, contact,
       regexp_replace(regexp_replace(regexp_replace(contact,
           '{EMAIL_RE}', '<EMAIL>', 'g'),
           '{PHONE_RE}', '<PHONE>', 'g'),
           '{IP_RE}', '<IP>', 'g') AS redacted,
       len(regexp_extract_all(contact, '{EMAIL_RE}'))
         + len(regexp_extract_all(contact, '{PHONE_RE}'))
         + len(regexp_extract_all(contact, '{IP_RE}')) AS n_pii
FROM c
"""


# --------------------------------------------------------- repetition signals
# Gopher-style repetition quality stats: a doc whose token stream is dominated
# by few distinct tokens is boilerplate.  Token unit = word_tokens (same \\w+
# tokenizer as TF-IDF / stopword stats).


def _repetition_full(texts):
    """(n_tokens, n_distinct, dup_ratio, top_ratio) arrays for a text batch.

    Tokenization + string dedup are batch kernels (Arrow regex split +
    dictionary encode); the per-doc distinct/top counts run over the small
    int32 code slices, never over strings."""
    col = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) else pa.array(texts, type=pa.string())
    flat, offs = token_lists_arrow(col)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False)
    n = np.diff(offs)
    n_docs = len(n)
    n_dist = np.zeros(n_docs, dtype=np.int64)
    dup = np.zeros(n_docs, dtype=np.float64)
    top = np.zeros(n_docs, dtype=np.float64)
    for i in range(n_docs):
        if n[i] == 0:
            continue
        _, counts = np.unique(codes[offs[i] : offs[i + 1]], return_counts=True)
        n_dist[i] = len(counts)
        dup[i] = round(1.0 - len(counts) / n[i], 6)
        top[i] = round(counts.max() / n[i], 6)
    return n.astype(np.int64), n_dist, dup, top


def t_repetition(sf_dir: str):
    """Per-doc repetition stats: token count, distinct-token count,
    duplicate-token ratio (1 - distinct/total) and top-token fraction."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        n_tok, n_dist, dup, top = _repetition_full(t["text"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tok),
                "n_distinct": pa.array(n_dist),
                "dup_token_ratio": pa.array(dup),
                "top_token_ratio": pa.array(top),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


T_REPETITION_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+') AS tk
  FROM documents),
c AS (
  SELECT doc_id, w, count(*) AS n
  FROM (SELECT doc_id, unnest(tk) AS w FROM toks) GROUP BY doc_id, w),
a AS (
  SELECT doc_id, sum(n) AS n_tokens, count(*) AS n_distinct, max(n) AS top_n
  FROM c GROUP BY doc_id)
SELECT t.doc_id,
       CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(a.n_distinct, 0) AS BIGINT) AS n_distinct,
       CASE WHEN a.n_tokens IS NULL THEN 0.0
            ELSE round(1.0 - a.n_distinct * 1.0 / a.n_tokens, 6) END AS dup_token_ratio,
       CASE WHEN a.n_tokens IS NULL THEN 0.0
            ELSE round(a.top_n * 1.0 / a.n_tokens, 6) END AS top_token_ratio
FROM toks t LEFT JOIN a USING (doc_id)
"""


def t_dupline_ratio(sf_dir: str):
    """Per-doc duplicate-LINE ratio (the CCNet paragraph-level quality signal,
    complementing t_repetition's token-level one): split text on newlines,
    ratio = 1 - distinct/total.  Fully vectorized: one Arrow split kernel,
    dictionary-encode the flat lines, per-doc distinct via a packed
    (doc, code) unique + bincount — no Python per row.  Splitting '' yields
    one empty line in BOTH engines, so n_lines >= 1 always."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        lines = pc.split_pattern(pc.fill_null(t["text"], ""), pattern="\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        flat = pc.list_flatten(lines)
        counts = pc.list_value_length(lines).to_numpy(zero_copy_only=False).astype(np.int64)
        doc_i = np.repeat(np.arange(len(t), dtype=np.int64), counts)
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_dict = max(len(enc.dictionary), 1)
        uniq = np.unique(doc_i * n_dict + codes)
        n_distinct = np.bincount(uniq // n_dict, minlength=len(t)).astype(np.int64)
        ratio = np.where(counts > 0, 1.0 - n_distinct * 1.0 / np.maximum(counts, 1), 0.0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_lines": pa.array(counts, type=pa.int64()),
                "n_distinct_lines": pa.array(n_distinct, type=pa.int64()),
                "dup_line_ratio": pa.array(np.round(ratio, 6), type=pa.float64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


T_DUPLINE_RATIO_SQL = """
WITH l AS (
  SELECT doc_id, unnest(str_split(coalesce(text, ''), chr(10))) AS line
  FROM documents),
a AS (SELECT doc_id, count(*) AS n_lines, count(DISTINCT line) AS n_distinct_lines
      FROM l GROUP BY doc_id)
SELECT doc_id, n_lines, n_distinct_lines,
       round(1.0 - n_distinct_lines * 1.0 / n_lines, 6) AS dup_line_ratio
FROM a
"""


# ------------------------------------------------------------ decontamination
# Benchmark n-gram decontamination: flag corpus docs sharing any token 5-gram
# with the "benchmark" split (docs with doc_id % 20 == 0 stand in for an eval
# suite).  Scale shape: the benchmark side is tiny BY DEFINITION (an eval
# suite vs a 100-TB corpus), so its gram-hash set is the canonical broadcast
# (``ray.put`` once, zero-copy uint64 array in every task); the corpus side
# streams and checks membership with one vectorized ``np.isin`` per batch.

DECON_NGRAM = 5
DECON_MOD = 20


def _gram_hashes_batch(col) -> tuple[np.ndarray, np.ndarray]:
    """md5 hashes of every DECON_NGRAM-token window, per doc, for a whole
    batch → (flat_hashes, doc offsets).  Docs shorter than the window emit
    none (``short="drop"``); tokenize/window/md5 are all batch kernels."""
    flat, offs = token_lists_arrow(col)
    g_flat, g_offs = shingle_lists(flat, offs, DECON_NGRAM, short="drop")
    return md5_u64_dict(g_flat), g_offs


def _mod_filter(want_zero: bool):
    def f(t: pa.Table) -> pa.Table:
        mod = t["doc_id"].to_numpy(zero_copy_only=False) % DECON_MOD
        return t.filter(pa.array(mod == 0 if want_zero else mod != 0))

    return f


def _contamination_flags(sf_dir: str, extra_cols: tuple = ()):
    """The decontamination flag stream with optional passthrough columns:
    (doc_id, contaminated, *extra_cols) for every non-benchmark doc."""
    import ray

    bench = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _mod_filter(True), batch_format="pyarrow"
    )

    def grams_of(t: pa.Table) -> pa.Table:
        h, _ = _gram_hashes_batch(t["text"])
        return pa.table({"gram_hash": pa.array(np.unique(h))})

    bench_hashes = np.unique(
        np.concatenate(
            [b["gram_hash"].to_numpy() for b in bench.map_batches(grams_of, batch_format="pyarrow").iter_batches(batch_format="pyarrow")]
            + [np.empty(0, dtype=np.uint64)]
        )
    )
    ref = ray.put(bench_hashes)

    corpus = _docs(sf_dir, ["doc_id", "text", *extra_cols]).map_batches(
        _mod_filter(False), batch_format="pyarrow"
    )

    def check(t: pa.Table, bench_ref=ref) -> pa.Table:
        bset = ray.get(bench_ref) if isinstance(bench_ref, ray.ObjectRef) else bench_ref
        h, g_offs = _gram_hashes_batch(t["text"])
        hits = np.isin(h, bset)
        # segmented any(): a doc is contaminated iff a hit falls in its window range
        cum = np.concatenate(([0], np.cumsum(hits, dtype=np.int64)))
        out = (cum[g_offs[1:]] - cum[g_offs[:-1]]) > 0
        cols = {"doc_id": t["doc_id"], "contaminated": pa.array(out)}
        for c in extra_cols:
            cols[c] = t[c]
        return pa.table(cols)

    return corpus.map_batches(check, batch_format="pyarrow")


def d_decontaminate(sf_dir: str):
    """Output (doc_id, contaminated) for every non-benchmark doc."""
    return _contamination_flags(sf_dir)


# -------------------------------------------------------- boilerplate lines
# Common-line removal (the RefinedWeb/CCNet line-dedup shape).  This corpus is
# single-line prose, so the "line" unit is a fixed 10-token pseudo-line
# (disjoint windows of the token stream).  Count every line's DOCUMENT
# frequency (md5-keyed distributed groupby — the count table is
# line-cardinality, but the HOT set with df >= K is boilerplate and therefore
# tiny), broadcast the hot hashes, and flag each doc's boilerplate lines in a
# streaming second pass.

BOILER_MIN_DF = 2
BOILER_LINE_TOKENS = 10


def _pseudo_lines(text: str | None) -> list[str]:
    toks = word_tokens(text) if text else []
    W = BOILER_LINE_TOKENS
    return [" ".join(toks[j : j + W]) for j in range(0, len(toks), W)]


def d_boilerplate(sf_dir: str):
    """(doc_id, n_lines, n_common): per-doc count of 10-token pseudo-lines
    shared by >= BOILER_MIN_DF documents."""
    import ray
    from ray.data.aggregate import Count

    ds = _docs(sf_dir, ["doc_id", "text"])

    def _doc_line_hashes(t: pa.Table):
        """(hashes, line_offsets) of every pseudo-line, batch kernels only."""
        flat, offs = token_lists_arrow(t["text"])
        lines, l_offs = chunk_lists(flat, offs, BOILER_LINE_TOKENS)
        return md5_u64_dict(lines), l_offs

    def emit(t: pa.Table) -> pa.Table:
        h, l_offs = _doc_line_hashes(t)
        # per-doc DISTINCT (df = DOCUMENT frequency): lexsort mask, no Python
        doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), np.diff(l_offs))
        order = np.lexsort((h, doc_idx))
        d2, h2 = doc_idx[order], h[order]
        keep = np.ones(len(h2), dtype=bool)
        keep[1:] = (h2[1:] != h2[:-1]) | (d2[1:] != d2[:-1])
        return pa.table({"sh": pa.array(h2[keep].astype(np.int64))})

    counts = ds.map_batches(emit, batch_format="pyarrow").groupby("sh").aggregate(Count(alias_name="df"))
    hot = counts.filter(expr=f"df >= {BOILER_MIN_DF}").to_pandas()
    hot_hashes = np.sort(hot["sh"].to_numpy(dtype=np.int64)) if len(hot) else np.empty(0, np.int64)
    ref = ray.put(hot_hashes.astype(np.uint64))

    def flag(t: pa.Table) -> pa.Table:
        hset = ray.get(ref)
        h, l_offs = _doc_line_hashes(t)
        n_lines = np.diff(l_offs)
        hits = np.isin(h, hset) if (h.size and len(hset)) else np.zeros(len(h), dtype=bool)
        cum = np.concatenate(([0], np.cumsum(hits, dtype=np.int64)))
        n_common = cum[l_offs[1:]] - cum[l_offs[:-1]]
        return pa.table(
            {"doc_id": t["doc_id"], "n_lines": pa.array(n_lines), "n_common": pa.array(n_common)}
        )

    return ds.map_batches(flag, batch_format="pyarrow")


_W = BOILER_LINE_TOKENS
D_BOILERPLATE_SQL = f"""
WITH s AS (
  SELECT doc_id,
         list_transform(range(0, CAST(ceil(len(tk) * 1.0 / {_W}) AS BIGINT)),
                        i -> array_to_string(tk[i * {_W} + 1 : (i + 1) * {_W}], ' ')) AS lines
  FROM (SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+') AS tk
        FROM documents)),
u AS (SELECT doc_id, unnest(lines) AS line FROM s),
df AS (SELECT line, count(DISTINCT doc_id) AS df FROM u GROUP BY line),
hot AS (SELECT line FROM df WHERE df >= {BOILER_MIN_DF}),
per_doc AS (
  SELECT u.doc_id, count(*) AS n_common
  FROM u JOIN hot USING (line) GROUP BY u.doc_id)
SELECT s.doc_id,
       CAST(len(s.lines) AS BIGINT) AS n_lines,
       CAST(coalesce(p.n_common, 0) AS BIGINT) AS n_common
FROM s LEFT JOIN per_doc p USING (doc_id)
"""


# ---------------------------------------------------------- line-dedup apply
# The APPLY form of line-level dedup (CCNet, Wenzek et al., arXiv:1911.00359:
# dedup paragraphs by hash across the corpus, keep the first occurrence):
# every pseudo-line occurrence except the globally FIRST of its content —
# lowest (doc_id, line_idx) — is REMOVED, and each doc's text is rebuilt from
# its retained lines.  Differs from d_boilerplate (a per-doc hot-line COUNT
# signal) in that it changes the text and keeps one copy corpus-wide.

LINE_POS_STRIDE = 1 << 20  # occurrence order key: doc_id * stride + line_idx


def d_line_dedup(sf_dir: str):
    """(doc_id, n_lines, n_removed, text): corpus-wide first-occurrence line
    dedup.  Plan: slim (line_hash, pos) occurrence stream → ONE range shuffle
    (``first_per_key(invert=True)``) emits exactly the non-first occurrences
    (duplicate-proportional, never corpus-proportional) → dual-plan apply
    (broadcast sorted pos array below the threshold, per-doc packed removal
    lists via ``map_sorted_groups`` + hash join above) → per-batch vectorized
    text rebuild (filter + list-view ``binary_join``)."""
    import ray
    import ray.data as rd

    from ..rayops import (
        adaptive_partitions,
        first_per_key,
        map_sorted_groups,
        safe_join,
    )

    ds = _docs(sf_dir, ["doc_id", "text"])
    W = BOILER_LINE_TOKENS

    def _lines(t: pa.Table):
        flat, offs = token_lists_arrow(t["text"])
        lines, l_offs = chunk_lists(flat, offs, W)
        return lines, md5_u64_dict(lines).astype(np.int64), l_offs

    def occurrences(t: pa.Table) -> pa.Table:
        _, h, l_offs = _lines(t)
        cnt = np.diff(l_offs)
        doc_rep = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64), cnt)
        within = np.arange(len(h), dtype=np.int64) - np.repeat(l_offs[:-1], cnt)
        return pa.table(
            {"h": pa.array(h), "pos": pa.array(doc_rep * LINE_POS_STRIDE + within, type=pa.int64())}
        )

    removed = first_per_key(
        ds.map_batches(occurrences, batch_format="pyarrow"), "h", order_col="pos", invert=True
    ).select_columns(["pos"]).materialize()
    n_removed_total = removed.count()

    def rebuild(t: pa.Table, rm_line_mask: np.ndarray, lines, l_offs) -> pa.Table:
        cnt = np.diff(l_offs)
        n = len(cnt)
        batch_doc_idx = np.repeat(np.arange(n, dtype=np.int64), cnt)
        keep = ~rm_line_mask
        kept_lines = lines.filter(pa.array(keep))
        kept_cnt = np.bincount(batch_doc_idx[keep], minlength=n).astype(np.int64) if len(keep) else np.zeros(n, np.int64)
        offsets = np.concatenate(([0], np.cumsum(kept_cnt, dtype=np.int64)))
        lst = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), kept_lines)
        text = pc.binary_join(lst, " ")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_lines": pa.array(cnt, type=pa.int64()),
                "n_removed": pa.array(cnt - kept_cnt, type=pa.int64()),
                "text": text,
            }
        )

    from ..pipelines.dedup import BROADCAST_THRESHOLD_ROWS

    if n_removed_total <= BROADCAST_THRESHOLD_ROWS:
        if n_removed_total:
            chunks = [t["pos"].to_numpy(zero_copy_only=False) for t in ray.get(removed.to_arrow_refs()) if t.num_rows]
            rm_pos = np.sort(np.concatenate(chunks).astype(np.int64))
        else:
            rm_pos = np.empty(0, dtype=np.int64)
        ref = ray.put(rm_pos)

        def apply_b(t: pa.Table) -> pa.Table:
            rm = ray.get(ref)
            lines, _, l_offs = _lines(t)
            cnt = np.diff(l_offs)
            doc_rep = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64), cnt)
            within = np.arange(len(doc_rep), dtype=np.int64) - np.repeat(l_offs[:-1], cnt)
            pos = doc_rep * LINE_POS_STRIDE + within
            if len(rm) and len(pos):
                p = np.searchsorted(rm, pos)
                mask = (p < len(rm)) & (rm[np.minimum(p, len(rm) - 1)] == pos)
            else:
                mask = np.zeros(len(pos), dtype=bool)
            return rebuild(t, mask, lines, l_offs)

        return ds.map_batches(apply_b, batch_format="pyarrow")

    # join plan: pack each doc's removal list (within-doc line indices) into
    # one binary cell, join against the doc stream, unpack vectorized
    rm_rows = removed.map_batches(
        lambda t: pa.table(
            {
                # stride is a power of two: decode with shift/mask kernels
                "doc_id": pc.shift_right(t["pos"], 20),
                "idx": pc.bit_wise_and(t["pos"], LINE_POS_STRIDE - 1),
            }
        ),
        batch_format="pyarrow",
    )

    def pack_group(g: pa.Table) -> pa.Table:
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        i = g["idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((i, d))
        d2, i2 = d[order], i[order]
        starts = np.concatenate(([0], np.nonzero(d2[1:] != d2[:-1])[0] + 1))
        ends = np.concatenate((starts[1:], [len(d2)]))
        return pa.table(
            {
                "doc_id": pa.array(d2[starts], type=pa.int64()),
                "rm_bin": pa.array([i2[s:e].tobytes() for s, e in zip(starts, ends)], type=pa.binary()),
            }
        )

    empty_packed = pa.table({"doc_id": pa.array([], type=pa.int64()), "rm_bin": pa.array([], type=pa.binary())})
    packed = map_sorted_groups(rm_rows, "doc_id", pack_group, empty_packed)
    joined = safe_join(
        ds,
        packed,
        num_partitions=adaptive_partitions(n_removed_total),
        on=("doc_id",),
        right_on=("doc_id",),
        join_type="left_outer",
        right_fill_schema={"rm_bin": pa.binary()},
    )

    def apply_j(t: pa.Table) -> pa.Table:
        lines, _, l_offs = _lines(t)
        mask = np.zeros(int(l_offs[-1]), dtype=bool)
        rm_col = t["rm_bin"]
        for row, start in enumerate(l_offs[:-1]):
            cell = rm_col[row].as_py()
            if cell:
                mask[start + np.frombuffer(cell, dtype=np.int64)] = True
        out = rebuild(t, mask, lines, l_offs)
        return out

    return joined.map_batches(apply_j, batch_format="pyarrow")


_LD_W = BOILER_LINE_TOKENS
D_LINE_DEDUP_SQL = f"""
WITH s AS (
  SELECT doc_id,
         list_transform(range(0, CAST(ceil(len(tk) * 1.0 / {_LD_W}) AS BIGINT)),
                        i -> array_to_string(tk[i * {_LD_W} + 1 : (i + 1) * {_LD_W}], ' ')) AS lines
  FROM (SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+') AS tk
        FROM documents)),
u AS (SELECT doc_id, unnest(lines) AS line, unnest(range(len(lines))) AS i FROM s),
w AS (SELECT line, min(doc_id * {LINE_POS_STRIDE} + i) AS wpos FROM u GROUP BY line),
kept AS (
  SELECT u.doc_id, u.i, u.line
  FROM u JOIN w USING (line)
  WHERE u.doc_id * {LINE_POS_STRIDE} + u.i = w.wpos),
clean AS (
  SELECT doc_id, count(*) AS n_kept, string_agg(line, ' ' ORDER BY i) AS text
  FROM kept GROUP BY doc_id)
SELECT s.doc_id,
       CAST(len(s.lines) AS BIGINT) AS n_lines,
       CAST(len(s.lines) - coalesce(c.n_kept, 0) AS BIGINT) AS n_removed,
       coalesce(c.text, '') AS text
FROM s LEFT JOIN clean c USING (doc_id)
"""


# ------------------------------------------------------------- filter applies
# The actual KEEP/DROP steps of a webtext curation pipeline: a C4/Gopher-style
# combined quality rule and a declared-vs-detected language consistency check.
# Both emit per-doc boolean decisions (filtering is a downstream .filter on
# `keep` — emitting the decision keeps the operator value-oracle-checkable).


def _repetition_arrays(texts):
    n_tok, _, dup, top = _repetition_full(texts)
    return n_tok, dup, top


def _quality_keep(text_col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    from ..functions.text import quality_stats

    q = quality_stats(text_col)
    n_tok, dup, top = _repetition_arrays(text_col)
    punct = np.round(q["punct_ratio"], 6)
    digit = np.round(q["digit_ratio"], 6)
    return (n_tok >= 10) & (punct <= 0.2) & (digit <= 0.3) & (dup <= 0.5) & (top <= 0.3)


def _lang_keep(text_col, lang_col) -> np.ndarray:
    from ..functions.text import lang_id_batch

    preds = lang_id_batch(text_col)
    golds = np.asarray(pc.fill_null(lang_col, "").to_pylist(), dtype="U8")
    return preds.astype("U8") == golds


def p_quality_filter(sf_dir: str):
    """Combined quality filter: keep docs with >= 10 word tokens, punct ratio
    <= 0.2, digit ratio <= 0.3, duplicate-token ratio <= 0.5 and top-token
    fraction <= 0.3 (rounded ratios on both sides so boundary comparisons are
    deterministic).  Output (doc_id, keep)."""
    ds = _docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        keep = _quality_keep(t["text"])
        return pa.table({"doc_id": t["doc_id"], "keep": pa.array(keep)})

    return ds.map_batches(f, batch_format="pyarrow")


P_QUALITY_FILTER_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+') AS tk,
         coalesce(length(text), 0) AS n_chars,
         len(regexp_extract_all(coalesce(text, ''), '[.,;:!?]')) AS n_punct,
         len(regexp_extract_all(coalesce(text, ''), '[0-9]')) AS n_digit
  FROM documents),
c AS (
  SELECT doc_id, w, count(*) AS n
  FROM (SELECT doc_id, unnest(tk) AS w FROM toks) GROUP BY doc_id, w),
a AS (
  SELECT doc_id, sum(n) AS n_tokens, count(*) AS n_distinct, max(n) AS top_n
  FROM c GROUP BY doc_id)
SELECT t.doc_id,
       (coalesce(a.n_tokens, 0) >= 10
        AND round(t.n_punct * 1.0 / greatest(t.n_chars, 1), 6) <= 0.2
        AND round(t.n_digit * 1.0 / greatest(t.n_chars, 1), 6) <= 0.3
        AND round(1.0 - a.n_distinct * 1.0 / a.n_tokens, 6) <= 0.5
        AND round(a.top_n * 1.0 / a.n_tokens, 6) <= 0.3) AS keep
FROM toks t LEFT JOIN a USING (doc_id)
"""


def p_lang_filter(sf_dir: str):
    """Language-consistency filter: detected language (stopword-vote lang_id)
    vs the declared ``lang`` column; keep when they agree.  Output
    (doc_id, lang, lang_pred, keep)."""
    from ..functions.text import lang_id_batch

    ds = _docs(sf_dir, ["doc_id", "text", "lang"])

    def f(t: pa.Table) -> pa.Table:
        preds = lang_id_batch(t["text"])
        keep = _lang_keep(t["text"], t["lang"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "lang_pred": pa.array(preds, type=pa.string()),
                "keep": pa.array(keep),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def _lang_filter_sql() -> str:
    from .text_analysis import T_LANG_ID_SQL

    return f"""
SELECT d.doc_id, d.lang, p.lang_pred, (coalesce(d.lang, '') = p.lang_pred) AS keep
FROM documents d JOIN ({T_LANG_ID_SQL.strip()}) p USING (doc_id)
"""


P_LANG_FILTER_SQL = _lang_filter_sql()


def p_curation_pipeline(sf_dir: str):
    """The composed end-to-end curation pass over the documents table:
    exact-dedup winner (min doc_id per normalized-content hash) ∧ quality rule
    ∧ language consistency, in ONE streaming plan — one corpus-wide range
    shuffle: sort by (text_hash, doc_id) and keep the boundary-aware first row
    per hash (exactly the min-doc_id winner, the d_apply_exact plan), then the
    two filters compute inline on the surviving batches.  No hash-aggregate
    and no join — the corpus moves once.  Output: surviving doc_ids."""
    from ..rayops import first_per_key
    from .text_analysis import append_md5_text_hash

    docs = _docs(sf_dir, ["doc_id", "text", "lang"])
    hashed = docs.map_batches(append_md5_text_hash, batch_format="pyarrow")
    kept = first_per_key(hashed, "text_hash", order_col="doc_id")

    def filters(t: pa.Table) -> pa.Table:
        mask = _quality_keep(t["text"]) & _lang_keep(t["text"], t["lang"])
        return pa.table({"doc_id": t["doc_id"].filter(pa.array(mask))})

    return kept.map_batches(filters, batch_format="pyarrow")


def _curation_pipeline_sql() -> str:
    from .text_analysis import T_LANG_ID_SQL

    quality = P_QUALITY_FILTER_SQL.strip()
    return f"""
SELECT d.doc_id
FROM documents d
JOIN ({quality}) q USING (doc_id)
JOIN ({T_LANG_ID_SQL.strip()}) l USING (doc_id)
WHERE q.keep AND coalesce(d.lang, '') = l.lang_pred
  AND d.doc_id IN (
    SELECT min(doc_id) FROM documents
    GROUP BY md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
"""


P_CURATION_PIPELINE_SQL = _curation_pipeline_sql()


# ----------------------------------------------------------- unigram logprob
# CCNet-style LM quality score with a unigram model trained on the corpus
# itself: pass 1 aggregates global token frequencies (per-batch value_counts
# combiners -> driver pandas merge; vocabulary-bounded, the same dual-plan shape as
# t_token_topk — swap in the distributed groupby above ~2M distinct tokens),
# pass 2 broadcasts the log-prob table and scores each doc's mean token
# log-probability in one vectorized lookup.


def t_unigram_logprob(sf_dir: str):
    """(doc_id, n_scored, mean_logprob): mean ln(corpus unigram probability)
    of the doc's tokens — low scores mark gibberish / rare-token boilerplate."""
    import ray

    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        flat, _ = token_lists_arrow(t["text"])
        vc = pc.value_counts(flat)
        return pa.table(
            {"token": vc.field("values").cast(pa.string()),
             "n": vc.field("counts").cast(pa.int64())}
        )

    import pandas as pd

    frames = [
        b.to_pandas()
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        )
    ]
    if frames:
        merged = pd.concat(frames).groupby("token", sort=False)["n"].sum()
        total = int(merged.sum())
        logp = dict(zip(merged.index, np.log(merged.to_numpy(dtype=np.float64) / total)))
    else:
        logp = {}
    ref = ray.put(logp)

    def score(t: pa.Table) -> pa.Table:
        lp = ray.get(ref)
        flat, offs = token_lists_arrow(t["text"])
        # dict-encode so the broadcast-table lookup runs once per DISTINCT
        # token in the batch; per-doc slices are then pure float math
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        uniq_lp = np.fromiter(
            (lp[w] for w in enc.dictionary.to_pylist()), dtype=np.float64, count=len(enc.dictionary)
        )
        vals = uniq_lp[enc.indices.to_numpy(zero_copy_only=False)] if len(flat) else np.empty(0)
        n_scored = np.diff(offs)
        mlp = np.zeros(len(t), dtype=np.float64)
        for i in range(len(t)):
            if n_scored[i]:
                # np.mean (pairwise summation) kept — bit-identical to the
                # scalar path on rounding-boundary docs
                mlp[i] = round(float(np.mean(vals[offs[i] : offs[i + 1]])), 6)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_scored": pa.array(n_scored),
                "mean_logprob": pa.array(mlp),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


T_UNIGRAM_LOGPROB_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+') AS tk
  FROM documents),
u AS (SELECT doc_id, unnest(tk) AS w FROM toks),
cnt AS (SELECT w, count(*) AS c FROM u GROUP BY w),
tot AS (SELECT sum(c) AS t FROM cnt),
per_doc AS (
  SELECT u.doc_id, count(*) AS k, avg(ln(cnt.c * 1.0 / (SELECT t FROM tot))) AS mlp
  FROM u JOIN cnt USING (w) GROUP BY u.doc_id)
SELECT t.doc_id,
       CAST(coalesce(p.k, 0) AS BIGINT) AS n_scored,
       coalesce(round(p.mlp, 6), 0.0) AS mean_logprob
FROM toks t LEFT JOIN per_doc p USING (doc_id)
"""


# ------------------------------------------------------------------ HLL sketch
# Distinct-count sketch: HyperLogLog over the global token multiset — the
# mergeable-sketch pattern (per-batch partial registers, elementwise-max
# merge) that replaces exact COUNT(DISTINCT) at 100 TB.  Deterministic and
# SQL-oracled exactly: the md5 token hash is DuckDB ``md5_number_upper`` and
# the register rank uses exact integer bit-length on BOTH sides (np byte-table
# here, ``length(bin(w))`` there) — no float log2 anywhere, so registers (and
# the rounded estimate) match bit-for-bit.

HLL_P = 10  # 2^10 = 1024 registers
HLL_M = 1 << HLL_P

_BITLEN_TABLE = np.array([0] + [i.bit_length() for i in range(1, 256)], dtype=np.int64)


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length of uint64 values (no float conversion)."""
    b = w.astype(">u8").view(np.uint8).reshape(-1, 8)  # big-endian bytes
    nz = b != 0
    first = np.where(nz.any(axis=1), nz.argmax(axis=1), 8)
    out = np.zeros(len(w), dtype=np.int64)
    has = first < 8
    out[has] = (8 - first[has] - 1) * 8 + _BITLEN_TABLE[b[np.arange(len(w))[has], first[has]]]
    return out


def _hll_registers(hashes: np.ndarray) -> np.ndarray:
    """1024 int64 registers from uint64 hashes: bucket = top HLL_P bits,
    rank = leading-zero count of the remaining 54 bits + 1."""
    reg = np.zeros(HLL_M, dtype=np.int64)
    if len(hashes) == 0:
        return reg
    bucket = (hashes >> np.uint64(64 - HLL_P)).astype(np.int64)
    w = hashes & np.uint64((1 << (64 - HLL_P)) - 1)
    rank = (64 - HLL_P) - _bit_length_u64(w) + 1
    np.maximum.at(reg, bucket, rank)
    return reg


def t_distinct_hll(sf_dir: str):
    """HLL distinct-token estimate over the corpus: per-batch partial
    registers stream to the driver (1024 ints per block, constant-size), the
    merge is an elementwise max, and the standard alpha/harmonic-mean formula
    (with the linear-counting small-range correction) yields the estimate.
    Output: one row (m, v_zero, estimate)."""
    ds = _docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        flat, _ = token_lists_arrow(t["text"])
        uniq = pc.unique(flat)
        reg = _hll_registers(md5_u64_arr(uniq.to_pylist()) if len(uniq) else np.empty(0, np.uint64))
        return pa.table({"reg": pa.array([reg.tobytes()], type=pa.binary())})

    from ..rayops import reduce_registers

    reg = reduce_registers(
        ds.map_batches(partial, batch_format="pyarrow"), "reg", np.int64, np.maximum, HLL_M
    )
    m = HLL_M
    v = int((reg == 0).sum())
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / np.sum(np.power(2.0, -reg.astype(np.float64)))
    est = m * np.log(m / v) if (raw <= 2.5 * m and v > 0) else raw
    return pa.table(
        {
            "m": pa.array([m], type=pa.int64()),
            "v_zero": pa.array([v], type=pa.int64()),
            "estimate": pa.array([int(round(float(est)))], type=pa.int64()),
        }
    )


T_DISTINCT_HLL_SQL = f"""
WITH hv AS (
  SELECT DISTINCT md5_number_upper(unnest(regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+'))) AS h
  FROM documents),
reg0 AS (
  SELECT CAST(h >> {64 - HLL_P} AS BIGINT) AS bucket,
         max(CASE WHEN (h & ((1::UBIGINT << {64 - HLL_P}) - 1)) = 0 THEN {64 - HLL_P + 1}
                  ELSE {64 - HLL_P + 1} - length(bin(CAST(h & ((1::UBIGINT << {64 - HLL_P}) - 1) AS BIGINT)))
             END) AS rank
  FROM hv GROUP BY 1),
allreg AS (
  SELECT CAST(r.range AS BIGINT) AS bucket, coalesce(reg0.rank, 0) AS rank
  FROM range(0, {HLL_M}) r LEFT JOIN reg0 ON reg0.bucket = r.range),
agg AS (
  SELECT count(*) FILTER (rank = 0) AS v, sum(pow(2.0, -rank)) AS z FROM allreg)
SELECT {HLL_M}::BIGINT AS m, CAST(v AS BIGINT) AS v_zero,
       CAST(round(CASE WHEN (0.7213 / (1.0 + 1.079 / {HLL_M})) * {HLL_M} * {HLL_M} / z <= 2.5 * {HLL_M} AND v > 0
                       THEN {HLL_M} * ln({HLL_M} * 1.0 / v)
                       ELSE (0.7213 / (1.0 + 1.079 / {HLL_M})) * {HLL_M} * {HLL_M} / z END) AS BIGINT) AS estimate
FROM agg
"""


NG = DECON_NGRAM
D_DECONTAMINATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+') AS tk
  FROM documents),
g AS (
  SELECT doc_id, CASE WHEN len(tk) < {NG} THEN CAST([] AS VARCHAR[])
    ELSE list_transform(range(1, len(tk) - {NG - 2}),
         i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3], tk[i+4]))
  END AS grams FROM toks),
bg AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % {DECON_MOD} = 0),
cg AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % {DECON_MOD} <> 0),
hit AS (SELECT DISTINCT doc_id FROM cg WHERE gram IN (SELECT gram FROM bg))
SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % {DECON_MOD} <> 0) d
LEFT JOIN hit h USING (doc_id)
"""


# ----------------------------------------------------- Bloom decontamination
# The same benchmark-overlap flag as d_decontaminate, but through a Bloom
# filter instead of the exact gram-hash set: at 100 TB an eval suite can
# still hold billions of distinct grams (an 8 GB+ uint64 broadcast), while a
# Bloom filter holding them at ~1% false positives is a fixed 2^BLOOM_LOG2M
# BITS — the broadcast shrinks ~50x and membership stays O(k) bit probes.
# Bit positions use Kirsch–Mitzenmacher double hashing of the gram md5
# (pos_i = (lo32 + i*hi32) mod m, public technique), so the filter — false
# positives included — is a deterministic function of the grams and the SQL
# oracle reproduces the EXACT same decisions by materializing the set of lit
# bit positions.

BLOOM_LOG2M = 20  # 2^20 bits = 128 KiB broadcast
BLOOM_K = 4


def _bloom_positions(h: np.ndarray) -> np.ndarray:
    """(n, BLOOM_K) bit positions per gram hash (uint64 in, int64 out)."""
    lo = h & np.uint64(0xFFFFFFFF)
    hi = h >> np.uint64(32)
    i = np.arange(BLOOM_K, dtype=np.uint64)
    return ((lo[:, None] + i[None, :] * hi[:, None]) & np.uint64((1 << BLOOM_LOG2M) - 1)).astype(
        np.int64
    )


def d_bloom_decontaminate(sf_dir: str):
    """(doc_id, contaminated) for every non-benchmark doc, where contaminated
    means "some token 5-gram probes only lit bits of the benchmark Bloom
    filter" — d_decontaminate's semantics plus the filter's deterministic
    false positives.  Build: per-batch partial bit arrays OR-merged on the
    driver (HLL-register discipline — the reduced unit is the fixed-size
    filter, never the grams).  Check: one broadcast of the packed filter;
    each corpus batch probes vectorized and reduces all-bits-set per gram,
    any-gram per doc."""
    import ray

    bench = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _mod_filter(True), batch_format="pyarrow"
    )

    def partial_bloom(t: pa.Table) -> pa.Table:
        h, _ = _gram_hashes_batch(t["text"])
        bits = np.zeros(1 << BLOOM_LOG2M, dtype=bool)
        if h.size:
            bits[_bloom_positions(np.unique(h)).ravel()] = True
        return pa.table({"bloom": pa.array([np.packbits(bits).tobytes()], type=pa.binary())})

    from ..rayops import reduce_registers

    packed = reduce_registers(
        bench.map_batches(partial_bloom, batch_format="pyarrow"),
        "bloom", np.uint8, np.bitwise_or, (1 << BLOOM_LOG2M) // 8,
    )
    ref = ray.put(packed)

    corpus = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _mod_filter(False), batch_format="pyarrow"
    )

    def check(t: pa.Table, bloom_ref=ref) -> pa.Table:
        bits = np.unpackbits(
            ray.get(bloom_ref) if isinstance(bloom_ref, ray.ObjectRef) else bloom_ref
        ).astype(bool)
        h, g_offs = _gram_hashes_batch(t["text"])
        hit = bits[_bloom_positions(h)].all(axis=1) if h.size else np.empty(0, dtype=bool)
        cum = np.concatenate(([0], np.cumsum(hit, dtype=np.int64)))
        out = (cum[g_offs[1:]] - cum[g_offs[:-1]]) > 0
        return pa.table({"doc_id": t["doc_id"], "contaminated": pa.array(out)})

    return corpus.map_batches(check, batch_format="pyarrow")


_BLOOM_MASK = (1 << BLOOM_LOG2M) - 1
D_BLOOM_DECONTAMINATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+') AS tk
  FROM documents),
g AS (
  SELECT doc_id, CASE WHEN len(tk) < {NG} THEN CAST([] AS VARCHAR[])
    ELSE list_transform(range(1, len(tk) - {NG - 2}),
         i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3], tk[i+4]))
  END AS grams FROM toks),
bh AS (SELECT DISTINCT md5_number_upper(gram) AS h
       FROM (SELECT unnest(grams) AS gram FROM g WHERE doc_id % {DECON_MOD} = 0)),
bpos AS (SELECT DISTINCT ((h & 4294967295) + r.range * (h >> 32)) & {_BLOOM_MASK} AS p
         FROM bh CROSS JOIN range(0, {BLOOM_K}) r),
cg AS (SELECT doc_id, md5_number_upper(gram) AS h
       FROM (SELECT doc_id, unnest(list_distinct(grams)) AS gram
             FROM g WHERE doc_id % {DECON_MOD} <> 0)),
cp AS (SELECT doc_id, h, ((h & 4294967295) + r.range * (h >> 32)) & {_BLOOM_MASK} AS p
       FROM cg CROSS JOIN range(0, {BLOOM_K}) r),
hit AS (SELECT doc_id FROM cp LEFT JOIN bpos ON cp.p = bpos.p
        GROUP BY doc_id, h HAVING bool_and(bpos.p IS NOT NULL)),
hd AS (SELECT DISTINCT doc_id FROM hit)
SELECT d.doc_id, (hd.doc_id IS NOT NULL) AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % {DECON_MOD} <> 0) d
LEFT JOIN hd USING (doc_id)
"""


# -------------------------------------------------------- perplexity buckets
# CCNet's head/middle/tail split (Wenzek et al., arXiv:1911.00359 §4.3): rank
# every document by its LM score and cut the corpus into terciles — head =
# most-fluent third, tail = least.  LM score = the unigram mean log-prob
# already computed by t_unigram_logprob (rounded to 6, so tercile boundary
# values are identical doubles in both engines); the tercile boundaries are
# exact distributed order statistics via rayops.kth_by_sort (one range sort,
# O(#blocks) ints on the driver), index convention = DuckDB quantile_disc
# (ceil(n*q) - 1).


def p_perplexity_buckets(sf_dir: str):
    """(doc_id, mean_logprob, bucket): bucket in {'head','middle','tail'} by
    corpus terciles of the unigram LM score (higher logprob = more fluent =
    'head')."""
    import ray

    from ..rayops import kth_by_sort

    lp = t_unigram_logprob(sf_dir).select_columns(["doc_id", "mean_logprob"]).materialize()
    n = lp.count()
    if n == 0:
        return lp.map_batches(
            lambda t: pa.table(
                {"doc_id": t["doc_id"], "mean_logprob": t["mean_logprob"],
                 "bucket": pa.array([], type=pa.string())}
            ),
            batch_format="pyarrow",
        )
    k1 = max(int(np.ceil(n / 3)) - 1, 0)
    k2 = max(int(np.ceil(2 * n / 3)) - 1, 0)
    b1, b2 = kth_by_sort(lp, "mean_logprob", [k1, k2])
    ref = ray.put((float(b1), float(b2)))

    def f(t: pa.Table) -> pa.Table:
        lo, hi = ray.get(ref)
        v = t["mean_logprob"].to_numpy(zero_copy_only=False)
        bucket = np.where(v <= lo, "tail", np.where(v <= hi, "middle", "head"))
        return pa.table(
            {"doc_id": t["doc_id"], "mean_logprob": t["mean_logprob"],
             "bucket": pa.array(bucket.astype(object), type=pa.string())}
        )

    return lp.map_batches(f, batch_format="pyarrow")


P_PERPLEXITY_BUCKETS_SQL = f"""
WITH lp AS ({T_UNIGRAM_LOGPROB_SQL}),
q AS (SELECT quantile_disc(mean_logprob, 1.0/3) AS b1,
             quantile_disc(mean_logprob, 2.0/3) AS b2 FROM lp)
SELECT lp.doc_id, lp.mean_logprob,
       CASE WHEN lp.mean_logprob <= q.b1 THEN 'tail'
            WHEN lp.mean_logprob <= q.b2 THEN 'middle'
            ELSE 'head' END AS bucket
FROM lp, q
"""


# ------------------------------------------------------------ bigram logprob
# The bigram upgrade of the unigram LM score (KenLM-shaped fluency signal,
# hash-bucketed so the model is FIXED-SIZE like the DSIR features): bigrams
# hash into 2^16 md5 buckets, pass 1 tree-reduces packed int64[65536] count
# partials (rayops.reduce_registers — the driver sees <= 64 blobs at any
# corpus size), pass 2 broadcasts the add-1-smoothed log-prob table and
# scores each doc's mean bigram log-probability.

BIGRAM_BUCKETS = 1 << 16


def _bigram_buckets(text_col) -> tuple[np.ndarray, np.ndarray]:
    """(flat bucket ids of in-doc adjacent-token bigrams, per-doc bigram
    counts) for one batch — bigram string = 'w1 w2', md5-bucketed (DuckDB
    ``md5_number_upper`` parity)."""
    flat, offsets = token_lists_arrow(text_col)
    n = np.diff(offsets)
    total = int(offsets[-1])
    if total < 2:
        return np.empty(0, dtype=np.int64), np.maximum(n - 1, 0)
    left = flat.slice(0, total - 1)
    right = flat.slice(1, total - 1)
    pairs = pc.binary_join_element_wise(left, right, " ")
    # drop pairs straddling doc boundaries: position i pairs (i, i+1), invalid
    # when i+1 is the first token of the next doc
    valid = np.ones(total - 1, dtype=bool)
    # doc j (j >= 1) starts at offsets[j]: the pair at position offsets[j]-1
    # straddles the boundary (guard offsets[j] == 0 — leading empty docs)
    ends = offsets[1:-1]
    cut = ends[ends > 0] - 1
    if len(cut):
        valid[cut] = False
    b = (md5_u64_dict(pairs) & np.uint64(BIGRAM_BUCKETS - 1)).astype(np.int64)[valid]
    return b, np.maximum(n - 1, 0)


def t_bigram_logprob(sf_dir: str):
    """(doc_id, n_bigrams, mean_logprob): mean ln(smoothed corpus bigram
    probability) per doc; 0.0 / n_bigrams=0 for docs under two tokens."""
    import ray

    from ..rayops import reduce_registers

    ds = _docs(sf_dir, ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        b, _ = _bigram_buckets(t["text"])
        cnt = np.bincount(b, minlength=BIGRAM_BUCKETS).astype(np.int64)
        return pa.table({"reg": pa.array([cnt.tobytes()], type=pa.binary())})

    counts = reduce_registers(
        ds.map_batches(partial, batch_format="pyarrow"), "reg", np.int64, np.add, BIGRAM_BUCKETS
    )
    tot = int(counts.sum())
    logp = np.log((counts + 1.0) / (tot + BIGRAM_BUCKETS))
    ref = ray.put(logp)

    def score(t: pa.Table) -> pa.Table:
        lp = ray.get(ref)
        b, k = _bigram_buckets(t["text"])
        doc_idx = np.repeat(np.arange(len(k), dtype=np.int64), k)
        s = np.bincount(doc_idx, weights=lp[b], minlength=len(k))
        with np.errstate(invalid="ignore"):
            mean = np.where(k > 0, s / np.maximum(k, 1), 0.0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bigrams": pa.array(k.astype(np.int64)),
                "mean_logprob": pa.array(np.round(mean, 6), type=pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


T_BIGRAM_LOGPROB_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+') AS tk
  FROM documents),
bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i + 1])) AS g
  FROM toks WHERE len(tk) >= 2),
hb AS (SELECT doc_id, CAST(md5_number_upper(g) & {BIGRAM_BUCKETS - 1} AS BIGINT) AS b FROM bg),
cnt AS (SELECT b, count(*) AS c FROM hb GROUP BY b),
tot AS (SELECT count(*) AS t FROM hb),
per_doc AS (
  SELECT hb.doc_id, count(*) AS k, avg(ln((cnt.c + 1.0) / (tot.t + {BIGRAM_BUCKETS}))) AS mlp
  FROM hb JOIN cnt USING (b), tot GROUP BY hb.doc_id)
SELECT t.doc_id,
       CAST(coalesce(p.k, 0) AS BIGINT) AS n_bigrams,
       coalesce(round(p.mlp, 6), 0.0) AS mean_logprob
FROM toks t LEFT JOIN per_doc p USING (doc_id)
"""


# --------------------------------------------------- Count-Min heavy hitters
# Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005): CMS_D
# hashed counter rows of width CMS_W; a token's estimate is the MIN of its
# counters, an overestimate with error <= eps*N at probability 1-delta.  The
# row buckets are disjoint 16-bit fields of ONE md5 per token (pairwise
# independence in the KM-double-hashing spirit; one hash pass, not CMS_D),
# so the sketch — collisions included — is a deterministic function of the
# corpus and the SQL oracle reproduces the EXACT same estimates.  At 100 TB
# the sketch is the point: per-batch partials are a fixed 2 MB register
# blob merged by the bounded-fan-in tree reduce (rayops.reduce_registers),
# never a token-cardinality shuffle.

CMS_W = 1 << 16  # counters per row (16-bit bucket fields)
CMS_D = 4  # rows (64-bit md5 / 16)


def _cms_partial(t: pa.Table) -> pa.Table:
    flat, _ = token_lists_arrow(t["text"])
    regs = np.zeros(CMS_D * CMS_W, dtype=np.int64)
    if len(flat):
        vc = pc.value_counts(flat)  # one C++ hash-count pass, no object numpy
        uniq = vc.field("values")
        counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        h = md5_u64_arr(uniq.to_pylist())
        for r in range(CMS_D):
            b = ((h >> np.uint64(16 * r)) & np.uint64(CMS_W - 1)).astype(np.int64)
            np.add.at(regs, r * CMS_W + b, counts)
    return pa.table({"reg": pa.array([regs.tobytes()], type=pa.binary())})


def t_cms_topk(sf_dir: str, k: int = 25, driver_merge_threshold: int = 5_000_000):
    """CMS-estimated vs exact counts for the corpus's top-``k`` tokens by
    total occurrences.  Two streaming passes: (1) fixed-size CMS register
    partials -> tree reduce; (2) (token, n) occurrence partials -> driver
    merge below the doc threshold / distributed groupby-sum above (the
    t_token_topk dual plan).  Output (token, exact_count, est_count) with
    est_count >= exact_count always (CMS never undercounts)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from ..rayops import reduce_registers

    ds = _docs(sf_dir, ["doc_id", "text"])
    n_docs = ds.count()

    regs = reduce_registers(
        ds.map_batches(_cms_partial, batch_format="pyarrow"), "reg", np.int64, np.add, CMS_D * CMS_W
    )

    def count_partial(t: pa.Table) -> pa.Table:
        flat, _ = token_lists_arrow(t["text"])
        if not len(flat):
            return pa.table({"token": pa.array([], type=pa.string()), "n": pa.array([], type=pa.int64())})
        vc = pc.value_counts(flat)
        return pa.table(
            {
                "token": vc.field("values"),
                "n": vc.field("counts").cast(pa.int64()),
            }
        )

    partials = ds.map_batches(count_partial, batch_format="pyarrow")
    if n_docs <= scale_gate(driver_merge_threshold):
        frames = [
            b.to_pandas()
            for b in partials.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
            if b.num_rows
        ]
        if not frames:
            return pa.table(
                {
                    "token": pa.array([], type=pa.string()),
                    "exact_count": pa.array([], type=pa.int64()),
                    "est_count": pa.array([], type=pa.int64()),
                }
            )
        merged = pd.concat(frames).groupby("token", sort=False)["n"].sum().reset_index()
        top = merged.sort_values(["n", "token"], ascending=[False, True], kind="mergesort").head(k)
    else:
        agg = partials.groupby("token").aggregate(Sum("n", alias_name="n"))
        from ..rayops import head_k_per_key

        # global top-k: single constant key, per-block partial top-k
        def tag(t: pa.Table) -> pa.Table:
            return t.append_column("one", pa.array(np.zeros(len(t), np.int64)))

        top = (
            head_k_per_key(agg.map_batches(tag, batch_format="pyarrow"), "one", ["n", "token"], k, descending=[True, False])
            .to_pandas()[["token", "n"]]
        )

    toks = top["token"].tolist()
    exact = top["n"].to_numpy(dtype=np.int64)
    h = md5_u64_arr(toks) if toks else np.empty(0, np.uint64)
    est = np.full(len(toks), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(CMS_D):
        b = ((h >> np.uint64(16 * r)) & np.uint64(CMS_W - 1)).astype(np.int64)
        est = np.minimum(est, regs[r * CMS_W + b])
    return pa.table(
        {
            "token": pa.array(toks, type=pa.string()),
            "exact_count": pa.array(exact, type=pa.int64()),
            "est_count": pa.array(est if len(toks) else np.empty(0, np.int64), type=pa.int64()),
        }
    )


T_CMS_TOPK_SQL = f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+')) AS tok
  FROM documents),
ht AS (SELECT tok, md5_number_upper(tok) AS h FROM toks),
exact AS (
  SELECT tok, count(*) AS exact_count FROM toks
  GROUP BY tok ORDER BY exact_count DESC, tok LIMIT 25),
r0 AS (SELECT CAST(h & {CMS_W - 1} AS BIGINT) AS b, count(*) AS c FROM ht GROUP BY 1),
r1 AS (SELECT CAST((h >> 16) & {CMS_W - 1} AS BIGINT) AS b, count(*) AS c FROM ht GROUP BY 1),
r2 AS (SELECT CAST((h >> 32) & {CMS_W - 1} AS BIGINT) AS b, count(*) AS c FROM ht GROUP BY 1),
r3 AS (SELECT CAST((h >> 48) & {CMS_W - 1} AS BIGINT) AS b, count(*) AS c FROM ht GROUP BY 1)
SELECT e.tok AS token, e.exact_count,
       least(c0.c, c1.c, c2.c, c3.c) AS est_count
FROM exact e
JOIN r0 c0 ON c0.b = CAST(md5_number_upper(e.tok) & {CMS_W - 1} AS BIGINT)
JOIN r1 c1 ON c1.b = CAST((md5_number_upper(e.tok) >> 16) & {CMS_W - 1} AS BIGINT)
JOIN r2 c2 ON c2.b = CAST((md5_number_upper(e.tok) >> 32) & {CMS_W - 1} AS BIGINT)
JOIN r3 c3 ON c3.b = CAST((md5_number_upper(e.tok) >> 48) & {CMS_W - 1} AS BIGINT)
"""


def d_contamination_by_source(sf_dir: str):
    """Per-source contamination report — the audit a curation run publishes
    next to the decontamination pass: for each source, how many corpus docs
    share an eval n-gram (count + rate in exact 1e-6 units, so no float-sum
    ambiguity).  Single pass: the decontamination flag map carries ``source``
    through (the first version joined the flag stream back to a doc→source
    lookup — 9.5 s at sf0.1, all doc-keyed join overhead for a 19-row
    report), per-block (source, n, flagged) combiners, then a tiny
    source-keyed groupby over the partials."""
    from ray.data.aggregate import Sum

    flags = _contamination_flags(sf_dir, extra_cols=("source",))

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["source", "contaminated"])
            .to_pandas()
            .assign(flagged=lambda d: d["contaminated"].astype(np.int64))
            .groupby("source", dropna=False, sort=False)
            .agg(n=("flagged", "size"), f=("flagged", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "source": pa.array(g["source"], type=pa.string()),
                "n": pa.array(g["n"].to_numpy(dtype=np.int64), type=pa.int64()),
                "f": pa.array(g["f"].to_numpy(dtype=np.int64), type=pa.int64()),
            }
        )

    agg = (
        flags.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n", alias_name="n_docs"), Sum("f", alias_name="n_flagged"))
    )

    def fin(t: pa.Table) -> pa.Table:
        n = t["n_docs"].to_numpy(zero_copy_only=False)
        f = t["n_flagged"].to_numpy(zero_copy_only=False)
        # exact micro-units: (f * 1e6) // n is integer arithmetic end to end
        rate = (f * 1_000_000) // np.maximum(n, 1)
        return pa.table(
            {
                "source": t["source"],
                "n_docs": t["n_docs"],
                "n_flagged": pa.array(f, type=pa.int64()),
                "rate_ppm": pa.array(rate, type=pa.int64()),
            }
        )

    return agg.map_batches(fin, batch_format="pyarrow")


D_CONTAMINATION_BY_SOURCE_SQL = f"""
WITH flags AS ({D_DECONTAMINATE_SQL})
SELECT d.source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN f.contaminated THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       CAST(sum(CASE WHEN f.contaminated THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS rate_ppm
FROM flags f JOIN documents d USING (doc_id)
GROUP BY d.source
"""

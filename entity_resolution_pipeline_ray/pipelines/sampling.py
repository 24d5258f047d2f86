"""Training-data sampling operators over the ``documents`` table.

The web-scale corpus-curation trio the reference pipeline lacks but any
LLM-data pipeline needs in front of dedup/scoring:

- per-source cap (the per-host cap of crawl curation): first K docs per
  source in deterministic doc_id order, distributed via range-sort +
  boundary-aware local ranking (rayops.head_k_per_key) — never a
  hash-aggregate over row-cardinality keys;
- deterministic stratified sampling: hash-mod rate per source, a pure
  map_batches filter (md5_u64 == DuckDB ``md5_number_upper``, so the exact
  sample is SQL-oracled);
- exact per-group quantiles via the bounded-domain histogram trick:
  (lang, n_chars) counts shrink the corpus to its value domain, then a tiny
  driver cumsum picks DuckDB ``quantile_disc`` indices (ceil(n*q)-1).

Each is a ``queries()`` entry with a DuckDB oracle; column names match the
SQL exactly (driver hashes values after sorting columns by name).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import md5_u64
from ..rayops import head_k_per_key, read_parquet_clean

SOURCE_CAP_K = 20

# sample percentage by source; unknown sources fall to the default row
SAMPLE_RATES = {"src0": 75, "src1": 50, "src2": 25, "src3": 10}
SAMPLE_RATE_DEFAULT = 5


def _docs(sf_dir: str, columns):
    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=columns)


def q_source_cap(sf_dir: str):
    """First SOURCE_CAP_K docs per source by doc_id (per-host cap)."""
    ds = _docs(sf_dir, ["doc_id", "source"])
    return head_k_per_key(ds, "source", "doc_id", SOURCE_CAP_K)


Q_SOURCE_CAP_SQL = f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents)
WHERE rn <= {SOURCE_CAP_K}
"""


def q_stratified_sample(sf_dir: str):
    """Deterministic hash-mod sampling at a per-source rate.  The decision is
    a pure function of doc_id (md5 of its decimal string, mod 100), so the
    sample is reproducible across runs/partitionings and SQL-checkable."""
    ds = _docs(sf_dir, ["doc_id", "source", "lang"])

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        src = t["source"].to_pylist()
        rates = np.array([SAMPLE_RATES.get(s, SAMPLE_RATE_DEFAULT) for s in src], dtype=np.int64)
        buckets = np.array([md5_u64(str(int(i))) % 100 for i in ids], dtype=np.int64)
        return t.filter(pa.array(buckets < rates))

    return ds.map_batches(f, batch_format="pyarrow")


_RATE_SQL = " ".join(f"WHEN '{s}' THEN {r}" for s, r in SAMPLE_RATES.items())
Q_STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, source, lang FROM documents
WHERE md5_number_upper(CAST(doc_id AS VARCHAR)) % 100
      < (CASE source {_RATE_SQL} ELSE {SAMPLE_RATE_DEFAULT} END)
"""


def q_lang_quantiles(sf_dir: str):
    """Exact per-lang quantiles of n_chars without sorting the corpus: a
    partial (lang, n_chars)->count combiner inside map_batches, one small
    groupby over the value DOMAIN (bounded by distinct char-lengths, not by
    corpus rows), then a driver cumsum picking quantile_disc indices.  At
    100 TB the shuffled table is |langs| x |distinct lengths| rows."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        df = (
            t.to_pandas()
            .groupby(["lang", "n_chars"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )

    def qdisc(vals: np.ndarray, cnts: np.ndarray, q: float) -> int:
        # DuckDB quantile_disc: element at index ceil(n*q)-1 of the sorted multiset
        n = int(cnts.sum())
        idx = max(int(np.ceil(n * q)) - 1, 0)
        return int(vals[np.searchsorted(np.cumsum(cnts), idx + 1)])

    rows = []
    for lang, g in counts.sort_values(["lang", "n_chars"]).groupby("lang", sort=True):
        vals = g["n_chars"].to_numpy()
        cnts = g["c"].to_numpy()
        rows.append(
            {
                "lang": lang,
                "n_docs": int(cnts.sum()),
                "p50_chars": qdisc(vals, cnts, 0.5),
                "p90_chars": qdisc(vals, cnts, 0.9),
                "p99_chars": qdisc(vals, cnts, 0.99),
            }
        )
    return pd.DataFrame(rows)


Q_LANG_QUANTILES_SQL = """
SELECT lang,
       count(*) AS n_docs,
       quantile_disc(n_chars, 0.5) AS p50_chars,
       quantile_disc(n_chars, 0.9) AS p90_chars,
       quantile_disc(n_chars, 0.99) AS p99_chars
FROM documents GROUP BY lang
"""


# ------------------------------------------------------------ sequence packing
# Greedy sequence packing for training shards: docs in doc_id order fill
# fixed token-budget shards by cumulative token count.  The running total is
# the distributed scan (rayops.exclusive_prefix_sum) — per-block scalar sums
# to the driver, offsets back out — so at 100 TB nothing corpus-sized is
# driver state and the corpus streams exactly twice.

PACK_BUDGET = 2048


def p_pack_sequences(sf_dir: str):
    """(doc_id, n_tokens, shard_id): shard_id = floor(prev_cum_tokens /
    PACK_BUDGET) over doc_id order, n_tokens = whitespace token count (the
    ``t_token_count`` spec).  Split-by-cumulative-count packing: shard
    boundaries fall wherever the running token total crosses a budget
    multiple, so every shard holds ~PACK_BUDGET tokens of consecutive docs."""
    from ..rayops import exclusive_prefix_sum
    from .text_analysis import t_token_count

    # the token-count kernel IS t_token_count (one spec, one oracle pin)
    slim = t_token_count(sf_dir)
    pref = exclusive_prefix_sum(slim, "doc_id", "n_tokens", "prev_tokens")

    def shard(t: pa.Table) -> pa.Table:
        prev = t["prev_tokens"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "shard_id": pa.array(prev // PACK_BUDGET, type=pa.int64()),
            }
        )

    return pref.map_batches(shard, batch_format="pyarrow")


P_PACK_SEQUENCES_SQL = f"""
WITH t AS (
  SELECT doc_id, len(regexp_extract_all(coalesce(text, ''), '\\S+')) AS n_tokens
  FROM documents)
SELECT doc_id, n_tokens,
       CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            // {PACK_BUDGET} AS BIGINT) AS shard_id
FROM t
"""


# ------------------------------------------------------------- language mixing
# Data-mixing rebalance: downsample every language to the size of the
# smallest, deterministically.  The keep decision ``md5(doc_id) % count_lang
# < min_count`` is integer-exact (keep probability = min/count with no float
# rate) and a pure function of doc_id, so the sample is reproducible across
# partitionings and SQL-checkable.  Scale shape: the per-lang count table is
# |langs| rows — a closure constant, never a shuffle side.


def p_lang_balance(sf_dir: str):
    """(doc_id, lang) of the kept rows after balancing the language mix down
    to the rarest language's count.  Null langs are one group keyed '' (same
    coalesce on both engine and oracle sides — Ray's groupby sort rejects
    None keys and SQL's equi-join drops NULLs, so the fill is the one
    null-consistent spec); the output ``lang`` column is the coalesced key."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    ds = _docs(sf_dir, ["doc_id", "lang"]).map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"],
             "lang": pc.fill_null(t["lang"], pa.scalar("", type=pa.string()))}
        ),
        batch_format="pyarrow",
    )
    counts = {
        r["lang"]: r["count()"]
        for r in ds.groupby("lang").aggregate(Count()).take_all()
    }
    if not counts:
        return pa.table({"doc_id": pa.array([], type=pa.int64()), "lang": pa.array([], type=pa.string())})
    mn = min(counts.values())

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        n_lang = np.array([counts[l] for l in t["lang"].to_pylist()], dtype=np.uint64)
        h = np.array([md5_u64(str(int(i))) for i in ids], dtype=np.uint64)
        return t.filter(pa.array(h % n_lang < np.uint64(mn)))

    return ds.map_batches(f, batch_format="pyarrow")


P_LANG_BALANCE_SQL = """
WITH d AS (SELECT doc_id, coalesce(lang, '') AS lang FROM documents),
c AS (SELECT lang, count(*) AS n FROM d GROUP BY lang),
m AS (SELECT min(n) AS mn FROM c)
SELECT d.doc_id, d.lang
FROM d JOIN c USING (lang) CROSS JOIN m
WHERE md5_number_upper(CAST(d.doc_id AS VARCHAR)) % c.n < m.mn
"""


# --------------------------------------------------------- DSIR importance
# Data Selection with Importance Resampling (Xie et al., arXiv:2302.03169):
# score every raw document by how much more likely its hashed-unigram bag is
# under a target-domain distribution than under the raw-corpus distribution.
# Here the "target domain" proxy is source='src0'; features are md5-hashed
# unigram buckets (DuckDB ``md5_number_upper`` parity → fully SQL-oracled).
#
# Plan (two streaming passes, zero shuffles):
#  1. per-batch partial bucket histograms for target and raw — each partial
#     is ONE row carrying two packed int64[B] arrays (32 KiB at B=4096,
#     independent of corpus size), summed on the driver like the HLL/Bloom
#     register merges in pipelines/curation.py;
#  2. broadcast the add-1-smoothed log-ratio table; per-doc score is one
#     weighted bincount over the token->bucket ids.

DSIR_BUCKETS = 4096
DSIR_TARGET_SOURCE = "src0"


def _dsir_buckets(text_col) -> tuple[np.ndarray, np.ndarray]:
    """(flat bucket ids, per-doc token counts) for one batch."""
    from ..functions.hashing import md5_u64_dict
    from ..functions.text import token_lists_arrow

    flat, offsets = token_lists_arrow(text_col)
    counts = np.diff(offsets)
    b = (md5_u64_dict(flat) & np.uint64(DSIR_BUCKETS - 1)).astype(np.int64)
    return b, counts


def p_importance_weights(sf_dir: str):
    """(doc_id, log_weight): DSIR hashed-unigram log importance weight of
    every document against the target domain, rounded to 6 decimals."""
    import ray
    import ray.data as rd

    docs = _docs(sf_dir, ["doc_id", "text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        b, counts = _dsir_buckets(t["text"])
        is_target = np.repeat(
            (t["source"].to_numpy(zero_copy_only=False) == DSIR_TARGET_SOURCE), counts
        )
        cr = np.bincount(b, minlength=DSIR_BUCKETS)
        ct = np.bincount(b[is_target], minlength=DSIR_BUCKETS)
        reg = np.concatenate([ct, cr]).astype(np.int64)
        return pa.table({"reg": pa.array([reg.tobytes()], type=pa.binary())})

    from ..rayops import reduce_registers

    merged = reduce_registers(
        docs.map_batches(partial, batch_format="pyarrow"), "reg", np.int64, np.add, 2 * DSIR_BUCKETS
    )
    ct, cr = merged[:DSIR_BUCKETS], merged[DSIR_BUCKETS:]
    nt, nr = int(ct.sum()), int(cr.sum())
    lr = np.log((ct + 1.0) / (nt + DSIR_BUCKETS)) - np.log((cr + 1.0) / (nr + DSIR_BUCKETS))
    ref = ray.put(lr)

    def score(t: pa.Table) -> pa.Table:
        lr_ = ray.get(ref)
        b, counts = _dsir_buckets(t["text"])
        doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        s = np.bincount(doc_idx, weights=lr_[b], minlength=len(counts))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "log_weight": pa.array(np.round(s, 6), type=pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


P_IMPORTANCE_WEIGHTS_SQL = f"""
WITH toks AS (
  SELECT doc_id, source,
         md5_number_upper(unnest(regexp_extract_all(lower(coalesce(text, '')), '[0-9a-z_]+')))
           & {DSIR_BUCKETS - 1} AS b
  FROM documents),
ct AS (SELECT b, count(*) AS c FROM toks WHERE source = '{DSIR_TARGET_SOURCE}' GROUP BY b),
cr AS (SELECT b, count(*) AS c FROM toks GROUP BY b),
tot AS (SELECT (SELECT count(*) FROM toks WHERE source = '{DSIR_TARGET_SOURCE}') AS nt,
               (SELECT count(*) FROM toks) AS nr),
ratio AS (
  SELECT cr.b,
         ln((coalesce(ct.c, 0) + 1.0) / (tot.nt + {DSIR_BUCKETS}))
           - ln((cr.c + 1.0) / (tot.nr + {DSIR_BUCKETS})) AS lr
  FROM cr LEFT JOIN ct USING (b), tot),
scored AS (SELECT t.doc_id, sum(r.lr) AS s FROM toks t JOIN ratio r USING (b) GROUP BY t.doc_id)
SELECT d.doc_id, round(coalesce(s.s, 0.0), 6) AS log_weight
FROM documents d LEFT JOIN scored s USING (doc_id)
"""


# --------------------------------------------------- temperature-scaled mix
# Multilingual/multi-source temperature sampling (the XLM-R / mT5 recipe,
# Conneau et al., arXiv:1911.02116 §3): rebalance source shares to
# q_s ∝ p_s^alpha with alpha = 0.5, realized as pure downsampling — keep
# fraction f_s = sqrt(c_min / c_s) so kept counts are sqrt(c_min * c_s),
# i.e. exactly the alpha=0.5 temperature shape with the rarest source kept
# whole.  The keep decision is integer-deterministic: md5(doc_id) % 1e6
# under a per-source threshold floor(1e6 * sqrt(c_min / c_s)) — division
# and sqrt are correctly-rounded IEEE ops, so numpy and DuckDB compute the
# identical threshold.

TEMP_MIX_SCALE = 1_000_000


def p_temperature_mix(sf_dir: str):
    """(doc_id, source, keep): alpha=0.5 temperature-rebalance decision per
    document.  One tiny source-cardinality groupby; the decision pass is a
    pure streaming map with a broadcast threshold dict."""
    import ray
    from ray.data.aggregate import Count

    ds = _docs(sf_dir, ["doc_id", "source"])
    counts = ds.groupby("source").aggregate(Count(alias_name="c")).to_pandas()
    cmin = int(counts["c"].min())
    thr = {
        s: min(TEMP_MIX_SCALE, int(np.floor(TEMP_MIX_SCALE * np.sqrt(cmin / int(c)))))
        for s, c in zip(counts["source"], counts["c"])
    }
    ref = ray.put(thr)

    def f(t: pa.Table) -> pa.Table:
        th = ray.get(ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        buckets = np.array([md5_u64(str(int(i))) % TEMP_MIX_SCALE for i in ids], dtype=np.int64)
        lim = np.array([th[s] for s in t["source"].to_pylist()], dtype=np.int64)
        return pa.table({"doc_id": t["doc_id"], "source": t["source"], "keep": pa.array(buckets < lim)})

    return ds.map_batches(f, batch_format="pyarrow")


P_TEMPERATURE_MIX_SQL = f"""
WITH c AS (SELECT source, count(*) AS c FROM documents GROUP BY source),
m AS (SELECT min(c) AS cmin FROM c),
thr AS (SELECT c.source,
               least({TEMP_MIX_SCALE},
                     CAST(floor({TEMP_MIX_SCALE} * sqrt(m.cmin * 1.0 / c.c)) AS BIGINT)) AS thr
        FROM c, m)
SELECT d.doc_id, d.source,
       (md5_number_upper(CAST(d.doc_id AS VARCHAR)) % {TEMP_MIX_SCALE}) < t.thr AS keep
FROM documents d JOIN thr t USING (source)
"""


# --------------------------------------------------------- per-source budget
# Token-budget mixing: keep docs (in deterministic doc_id order) while the
# source's cumulative size stays under a fixed budget — the "N tokens from
# this source" knob of training-mix recipes (n_chars is the container's
# deterministic token proxy).  One range sort via the segmented prefix-sum
# primitive; a doc is kept iff the chars BEFORE it are under budget, so the
# doc that crosses the line is included (truncation semantics).

SOURCE_CHAR_BUDGET = 150_000


def p_source_token_cap(sf_dir: str):
    """Docs kept by the per-source char budget, via
    rayops.keyed_exclusive_prefix_sum (one (source, doc_id) range sort,
    O(#blocks) driver scalars)."""
    from ..rayops import keyed_exclusive_prefix_sum

    ds = _docs(sf_dir, ["doc_id", "source", "n_chars"])
    pre = keyed_exclusive_prefix_sum(ds, "source", "doc_id", "n_chars", "chars_before")

    def f(t: pa.Table) -> pa.Table:
        keep = pa.compute.less(t["chars_before"], SOURCE_CHAR_BUDGET)
        return t.filter(keep).select(["doc_id", "source", "chars_before"])

    return pre.map_batches(f, batch_format="pyarrow")


P_SOURCE_TOKEN_CAP_SQL = f"""
SELECT doc_id, source, chars_before FROM (
  SELECT doc_id, source,
         coalesce(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chars_before
  FROM documents)
WHERE chars_before < {SOURCE_CHAR_BUDGET}
"""


# ----------------------------------------------------------- split assignment
# Deterministic train/dev/test assignment by content-independent id hash —
# the split must be a pure function of the doc id so it is stable across
# runs, partitionings and corpus growth (a doc never migrates between
# splits when new docs arrive).  Same md5 == md5_number_upper parity as
# q_stratified_sample, so the exact assignment is SQL-oracled.

SPLIT_TRAIN_PCT, SPLIT_DEV_PCT = 80, 10


def p_split_assign(sf_dir: str):
    """(doc_id, split) with train/dev/test at 80/10/10 by md5(doc_id) % 100."""
    ds = _docs(sf_dir, ["doc_id"])

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        b = np.array([md5_u64(str(int(i))) % 100 for i in ids], dtype=np.int64)
        split = np.where(
            b < SPLIT_TRAIN_PCT, "train", np.where(b < SPLIT_TRAIN_PCT + SPLIT_DEV_PCT, "dev", "test")
        )
        return pa.table({"doc_id": t["doc_id"], "split": pa.array(split.astype(object), type=pa.string())})

    return ds.map_batches(f, batch_format="pyarrow")


P_SPLIT_ASSIGN_SQL = f"""
SELECT doc_id,
       CASE WHEN md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 < {SPLIT_TRAIN_PCT} THEN 'train'
            WHEN md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 < {SPLIT_TRAIN_PCT + SPLIT_DEV_PCT} THEN 'dev'
            ELSE 'test' END AS split
FROM documents
"""


def q_lang_mad(sf_dir: str):
    """Per-lang median absolute deviation of n_chars — the robust spread
    statistic quality dashboards want next to quantiles (outlier docs don't
    drag it like a stddev).  Same bounded-domain histogram plan as
    q_lang_quantiles: ONE distributed (lang, n_chars) count table, then the
    median AND the deviation median both derive from that tiny histogram on
    the driver (|deviations| of a histogram is itself a histogram — no second
    corpus pass, DuckDB needs two).  quantile_disc semantics throughout."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby(["lang", "n_chars"], sort=False).size().reset_index(name="c")
        return pa.Table.from_pandas(df, preserve_index=False)

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )

    def qdisc(vals: np.ndarray, cnts: np.ndarray, q: float) -> int:
        n = int(cnts.sum())
        idx = max(int(np.ceil(n * q)) - 1, 0)
        return int(vals[np.searchsorted(np.cumsum(cnts), idx + 1)])

    if counts.empty:  # all-empty to_pandas() loses its columns
        return pd.DataFrame({"lang": pd.Series(dtype=object),
                             "median_chars": pd.Series(dtype=np.int64),
                             "mad_chars": pd.Series(dtype=np.int64)})
    rows = []
    for lang, g in counts.sort_values(["lang", "n_chars"]).groupby("lang", sort=True):
        vals = g["n_chars"].to_numpy(dtype=np.int64)
        cnts = g["c"].to_numpy(dtype=np.int64)
        med = qdisc(vals, cnts, 0.5)
        dev = np.abs(vals - med)
        order = np.argsort(dev, kind="stable")
        # merge equal deviations (two values can map to the same |v - med|)
        dvals, dcnts = [], []
        for d, c in zip(dev[order], cnts[order]):
            if dvals and dvals[-1] == d:
                dcnts[-1] += c
            else:
                dvals.append(int(d))
                dcnts.append(int(c))
        mad = qdisc(np.array(dvals, dtype=np.int64), np.array(dcnts, dtype=np.int64), 0.5)
        rows.append({"lang": lang, "median_chars": med, "mad_chars": mad})
    return pd.DataFrame(rows)


Q_LANG_MAD_SQL = """
WITH m AS (SELECT lang, quantile_disc(n_chars, 0.5) AS med FROM documents GROUP BY lang)
SELECT d.lang, m.med AS median_chars,
       quantile_disc(abs(d.n_chars - m.med), 0.5) AS mad_chars
FROM documents d JOIN m USING (lang)
GROUP BY d.lang, m.med
"""


def p_weighted_sample(sf_dir: str, k: int = 200):
    """Deterministic weighted sampling without replacement — priority
    sampling (Duffield–Lund–Thorup, JACM 2007): each doc draws priority
    u/w where u is its md5-derived "uniform" (the hash of doc_id as a
    double) and w = max(n_chars, 1) its weight; the k SMALLEST priorities
    are the sample, so long docs are proportionally more likely in.  This is
    the selection step that consumes importance weights in corpus curation
    (the DSIR/DoReMi apply).  Plan: per-block partial top-k inside
    ``map_batches``, then a tiny driver merge of k-per-block partials — the
    same distributed top-k shape as s_knn_bruteforce, no sort shuffle.
    Exactly SQL-oracled: uint64→double casts and double division are
    IEEE-defined (correctly rounded), so numpy and DuckDB compute
    bit-identical priorities; ties break on doc_id."""
    from ..functions.hashing import md5_u64_arr

    ds = _docs(sf_dir, ["doc_id", "n_chars"])

    def partial_topk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = np.maximum(t["n_chars"].to_numpy(zero_copy_only=False), 1).astype(np.int64)
        h = md5_u64_arr([str(int(i)) for i in ids]).astype(np.float64)
        pr = h / w.astype(np.float64)
        sel = np.lexsort((ids, pr))[: min(k, len(ids))]
        return pa.table(
            {
                "doc_id": pa.array(ids[sel], type=pa.int64()),
                "weight": pa.array(w[sel], type=pa.int64()),
                "priority": pa.array(pr[sel], type=pa.float64()),
            }
        )

    pdf = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    if pdf.empty:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "weight": pa.array([], type=pa.int64()),
                "priority": pa.array([], type=pa.float64()),
            }
        )
    top = pdf.sort_values(["priority", "doc_id"], kind="mergesort").head(k)
    return pa.Table.from_pandas(top, preserve_index=False)


P_WEIGHTED_SAMPLE_SQL = """
WITH pr AS (
  SELECT doc_id, CAST(GREATEST(n_chars, 1) AS BIGINT) AS weight,
         CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) AS DOUBLE)
           / CAST(GREATEST(n_chars, 1) AS DOUBLE) AS priority
  FROM documents)
SELECT doc_id, weight, priority FROM pr ORDER BY priority, doc_id LIMIT 200
"""


def p_lang_top_quartile(sf_dir: str):
    """Quality-quantile filter apply — keep each language's top quartile by
    n_chars (the per-group "top X% by score" selection step of curation
    recipes): the q_lang_quantiles histogram machinery computes exact
    DuckDB-parity thresholds (value-domain-sized driver state), the
    thresholds broadcast, and ONE filter pass streams the corpus.  Output
    (doc_id, lang, n_chars)."""
    import ray
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, ["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby(["lang", "n_chars"], sort=False).size().reset_index(name="c")
        return pa.Table.from_pandas(df, preserve_index=False)

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )

    def qdisc(vals: np.ndarray, cnts: np.ndarray, q: float) -> int:
        n = int(cnts.sum())
        idx = max(int(np.ceil(n * q)) - 1, 0)
        return int(vals[np.searchsorted(np.cumsum(cnts), idx + 1)])

    th = {}
    if not counts.empty:
        for lang, g in counts.sort_values(["lang", "n_chars"]).groupby("lang", sort=True):
            th[lang] = qdisc(g["n_chars"].to_numpy(), g["c"].to_numpy(), 0.75)
    tref = ray.put(th)

    full = _docs(sf_dir, ["doc_id", "lang", "n_chars"])

    def keep(t: pa.Table) -> pa.Table:
        thr = ray.get(tref)
        lang = t["lang"].to_pylist()
        n = t["n_chars"].to_numpy(zero_copy_only=False)
        mask = np.array([n[i] >= thr.get(l, np.iinfo(np.int64).max) for i, l in enumerate(lang)])
        if len(mask) == 0:
            return t
        return t.filter(pa.array(mask))

    return full.map_batches(keep, batch_format="pyarrow")


P_LANG_TOP_QUARTILE_SQL = """
WITH th AS (SELECT lang, quantile_disc(n_chars, 0.75) AS q75 FROM documents GROUP BY lang)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN th USING (lang) WHERE d.n_chars >= th.q75
"""


def p_write_lang_shards(sf_dir: str):
    """Partitioned-Parquet sink coverage (the resumable-output shape: one
    directory per partition key, so a re-run skips finished partitions):
    write documents hive-partitioned by lang under /tmp ONCE (marker-gated —
    the resume path), then read the WRITTEN files back and aggregate, value-
    oracled against the original table — a write→read integrity proof.
    Output (lang, n_docs, sum_chars)."""
    import hashlib
    import os
    import shutil

    from ..rayops import read_parquet_clean

    empty_out = pa.table(
        {"lang": pa.array([], type=pa.string()), "n_docs": pa.array([], type=pa.int64()),
         "sum_chars": pa.array([], type=pa.int64())}
    )
    src = _docs(sf_dir, ["doc_id", "lang", "n_chars"])
    if src.count() == 0:  # nothing to shard; an empty partitioned write has no read-back
        return empty_out

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    d = f"/tmp/lang_shards_{key}"
    marker = os.path.join(d, "_COMPLETE")
    if not os.path.exists(marker):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)
        src.write_parquet(d, partition_cols=["lang"])
        with open(marker, "w") as f:
            f.write("ok")

    back = read_parquet_clean(d, columns=["lang", "n_chars"])

    def part(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("lang", sort=False).agg(
            n=("n_chars", "size"), s=("n_chars", "sum")).reset_index()
        return pa.table(
            {"lang": pa.array(g["lang"].astype(str), type=pa.string()),
             "n": pa.array(g["n"].to_numpy(dtype=np.int64), type=pa.int64()),
             "s": pa.array(g["s"].to_numpy(dtype=np.int64), type=pa.int64())}
        )

    p = back.map_batches(part, batch_format="pyarrow").to_pandas()
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


P_WRITE_LANG_SHARDS_SQL = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang
"""


def p_curriculum_order(sf_dir: str):
    """Curriculum ordering: a GLOBAL training-order index over the corpus —
    rank 1..N by (n_chars DESC, doc_id), i.e. longest documents first (swap
    in any quality score).  The global row_number Ray Data lacks, via
    ``rayops.exclusive_prefix_sum``: ONE range sort on a packed
    (score, doc_id) key, per-block scalar sums to the driver (O(#blocks)
    ints), a driver cumsum, and a second streaming pass adding each block's
    offset — nothing corpus-sized leaves the workers.  Output
    (doc_id, curriculum_rank)."""
    from ..rayops import exclusive_prefix_sum

    docs = _docs(sf_dir, ["doc_id", "n_chars"])

    def keyed(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(d) and (
            int(d.max()) >= (1 << 42) or int(d.min()) < 0 or int(n.max()) >= (1 << 20) or int(n.min()) < 0
        ):
            raise ValueError("doc_id/n_chars exceeds the 42/20-bit packing bound; widen the pack")
        ok = ((1 << 20) - 1 - n) * (1 << 42) + d  # descending n_chars, ascending doc_id
        return pa.table(
            {
                "ok": pa.array(ok, type=pa.int64()),
                "doc_id": pa.array(d, type=pa.int64()),
                "one": pa.array(np.ones(len(d), dtype=np.int64), type=pa.int64()),
            }
        )

    ranked = exclusive_prefix_sum(docs.map_batches(keyed, batch_format="pyarrow"), "ok", "one", "rank0")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "curriculum_rank": pa.array(
                    t["rank0"].to_numpy(zero_copy_only=False) + 1, type=pa.int64()
                ),
            }
        )

    return ranked.map_batches(finish, batch_format="pyarrow")


P_CURRICULUM_ORDER_SQL = """
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS curriculum_rank
FROM documents
"""


GROUP_SAMPLE_K = 25


def p_group_sample_k(sf_dir: str, k: int = GROUP_SAMPLE_K):
    """Uniform k-per-group sampling, deterministic: each language keeps its k
    docs with the SMALLEST md5(doc_id) — an unbiased fixed-size per-group
    sample that is a pure function of doc_id (reproducible across runs and
    partitionings, unlike seeded shuffles), the eval-set carving step of
    corpus curation.  Plan: ONE ``head_k_per_key`` range sort on
    (lang, hash) — never a hash aggregate over group keys.  Output
    (doc_id, lang, h)."""
    ds = _docs(sf_dir, ["doc_id", "lang"])

    def hashed(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        h = np.array([md5_u64(str(int(i))) for i in ids], dtype=np.uint64)
        # shift into int64 range for the sort key; order-preserving
        return pa.table(
            {"doc_id": t["doc_id"], "lang": t["lang"],
             "h": pa.array((h >> np.uint64(1)).astype(np.int64), type=pa.int64())}
        )

    return head_k_per_key(ds.map_batches(hashed, batch_format="pyarrow"), "lang", ["h", "doc_id"], k)


P_GROUP_SAMPLE_K_SQL = f"""
SELECT doc_id, lang, h FROM (
  SELECT doc_id, lang,
         CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) >> 1 AS BIGINT) AS h,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5_number_upper(CAST(doc_id AS VARCHAR)) >> 1, doc_id) AS rn
  FROM documents)
WHERE rn <= {GROUP_SAMPLE_K}
"""


SHUFFLE_SEED = 42


def p_seeded_shuffle(sf_dir: str, seed: int = SHUFFLE_SEED):
    """Global seeded deterministic shuffle — THE pretraining-data ordering
    step: every doc gets a reproducible position 1..N given (seed, doc_id),
    independent of partitioning or cluster size (unlike
    ``Dataset.random_shuffle``, whose layout depends on block structure).

    Plan: shuffle key = md5 hex of "seed:doc_id" (DuckDB ``md5`` parity,
    effectively collision-free so the global order is total), then the
    distributed row_number via ``rayops.exclusive_prefix_sum`` — one range
    sort of slim (key, doc_id) rows, O(#blocks) driver scalars, a second
    streaming pass adding block offsets.  Output (doc_id, shuffle_pos)."""
    import pyarrow.parquet as pq

    from ..functions.hashing import md5_hex

    # 0-row guard from the parquet footer (pure metadata read, no scan):
    # map_batches skips empty blocks so the derived sort key would never
    # exist, and an empty Dataset's to_pandas() loses columns — return a
    # schema-bearing Arrow table instead
    if pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows == 0:
        return pa.table(
            {"doc_id": pa.array([], type=pa.int64()), "shuffle_pos": pa.array([], type=pa.int64())}
        )
    docs = _docs(sf_dir, ["doc_id"])
    prefix = f"{int(seed)}:"

    def keyed(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = md5_hex([prefix + str(int(i)) for i in ids])
        return pa.table(
            {
                "h": pa.array(h, type=pa.string()),
                "doc_id": pa.array(ids, type=pa.int64()),
                "one": pa.array(np.ones(len(ids), dtype=np.int64), type=pa.int64()),
            }
        )

    from ..rayops import exclusive_prefix_sum

    ranked = exclusive_prefix_sum(docs.map_batches(keyed, batch_format="pyarrow"), "h", "one", "pos0")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "shuffle_pos": pa.array(
                    t["pos0"].to_numpy(zero_copy_only=False) + 1, type=pa.int64()
                ),
            }
        )

    return ranked.map_batches(finish, batch_format="pyarrow")


P_SEEDED_SHUFFLE_SQL = f"""
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY md5(concat('{SHUFFLE_SEED}:', CAST(doc_id AS VARCHAR)))) AS BIGINT) AS shuffle_pos
FROM documents
"""


def _skyline_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean mask of the 2-D maxima (Pareto frontier, both axes maximized).

    A point is dominated iff some other point is >= on both axes and > on at
    least one — equal points never dominate each other, so exact duplicates of
    a frontier point all survive (the SQL NOT EXISTS semantics).  Vectorized:
    sort by (x desc, y desc); a point survives iff its y equals its x-group's
    max AND strictly exceeds the best y of every strictly-greater x group."""
    n = len(x)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-y, -x))
    xs, ys = x[order], y[order]
    new_grp = np.empty(n, dtype=bool)
    new_grp[0] = True
    new_grp[1:] = xs[1:] != xs[:-1]
    grp_id = np.cumsum(new_grp) - 1
    grp_max_y = ys[new_grp]  # first row of each x-group is its max y
    prev_best = np.concatenate(
        [[np.iinfo(np.int64).min], np.maximum.accumulate(grp_max_y)[:-1]]
    )[grp_id]
    keep_sorted = (ys == grp_max_y[grp_id]) & (ys > prev_best)
    mask = np.zeros(n, dtype=bool)
    mask[order[keep_sorted]] = True
    return mask


def p_quality_skyline(sf_dir: str):
    """2-D Pareto frontier (skyline) of the corpus on (n_chars, n_tokens),
    both maximized — the "no doc strictly better on every quality axis"
    selection used to pick exemplar documents for curation review.  Plan: the
    skyline-of-skylines identity (the global frontier is a subset of the
    union of per-block frontiers) makes this ONE streaming pass: each block
    emits its local frontier inside ``map_batches``, and the driver reduces
    the tiny union — O(#blocks × |local frontier|) driver state, and a random
    2-D frontier is O(log n) points expected, so the union stays KB-sized at
    any corpus scale.  Token counts reuse the t_token_count parity kernel
    (count of \\S+ runs == DuckDB ``len(regexp_split_to_array(trim(text),
    '\\s+'))`` with empty → 0).  Output (doc_id, n_chars, n_tokens), the
    full frontier including coordinate-duplicates."""
    from .text_analysis import token_count_arrow

    ds = _docs(sf_dir, ["doc_id", "text", "n_chars"])

    def local_frontier(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nch = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        ntok = token_count_arrow(t["text"]).to_numpy(zero_copy_only=False).astype(np.int64)
        m = _skyline_mask(nch, ntok)
        return pa.table(
            {
                "doc_id": pa.array(ids[m], type=pa.int64()),
                "n_chars": pa.array(nch[m], type=pa.int64()),
                "n_tokens": pa.array(ntok[m], type=pa.int64()),
            }
        )

    parts = ds.map_batches(local_frontier, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "n_chars": pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
            }
        )
    x = parts["n_chars"].to_numpy(dtype=np.int64)
    y = parts["n_tokens"].to_numpy(dtype=np.int64)
    m = _skyline_mask(x, y)
    top = parts[m].sort_values("doc_id", kind="mergesort")
    return pa.table(
        {
            "doc_id": pa.array(top["doc_id"].to_numpy(dtype=np.int64), type=pa.int64()),
            "n_chars": pa.array(top["n_chars"].to_numpy(dtype=np.int64), type=pa.int64()),
            "n_tokens": pa.array(top["n_tokens"].to_numpy(dtype=np.int64), type=pa.int64()),
        }
    )


P_QUALITY_SKYLINE_SQL = """
WITH m AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
         CAST(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens
  FROM documents)
SELECT a.doc_id, a.n_chars, a.n_tokens FROM m a
WHERE NOT EXISTS (
  SELECT 1 FROM m b
  WHERE b.n_chars >= a.n_chars AND b.n_tokens >= a.n_tokens
    AND (b.n_chars > a.n_chars OR b.n_tokens > a.n_tokens))
"""

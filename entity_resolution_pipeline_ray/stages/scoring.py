"""Scoring stage: candidate pairs → per-pair similarity features → match probability.

Reference analogs:
- feature engineering per pair (/root/reference/src/batch_parallel_feature_engineering.py:395-668):
  cosine + [-1,1]→[0,1] renorm, Levenshtein, Jaro-Winkler, harmonic-mean and
  product interaction features — recomputed here over (title, url/domain,
  text-sketch) instead of (person, composite, ...) fields.
- warm scorer state (/root/reference/src/batch_parallel_classification.py:366-394,806-838):
  model weights loaded once per worker → here an actor pool holding the
  broadcast model + doc-payload side table; whole-batch X@w matmul instead of
  per-pair calls.

Pair enrichment (attach both sides' doc payloads — reference analog: the
two-sided pair assembly at /root/reference/src/batch_parallel_querying.py:174-210) has
two physical plans, chosen by side-table size:
- **broadcast**: doc payload map ``ray.put`` once, read in every actor's
  ``__init__`` — no shuffle; right for corpora that fit an object-store object.
- **join**: two hash-partitioned ``Dataset.join``s (pairs⋈docs ON left_id,
  then ⋈ ON right_id) — the 100 TB path; partitioning key is doc_id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..config import ERConfig
from ..functions.similarity import (
    harmonic_mean,
    minhash_agreement,
    sigmoid_ratio,
    token_jaccard,
)
from ..functions.text import word_tokens
from ..state.model import LRModel
from ..config import scale_gate

def select_feature_names(fcfg) -> list[str]:
    """Config-driven feature selection with fnmatch wildcards (reference
    ``_apply_feature_selection``, /root/reference/src/batch_parallel_feature_engineering.py:704-803;
    wildcard groups like "*_cosine" at config.yml:164-193)."""
    import fnmatch

    if fcfg is None:
        return list(FEATURE_NAMES)
    names = list(FEATURE_NAMES)
    if fcfg.include:
        names = [n for n in names if any(fnmatch.fnmatch(n, p) for p in fcfg.include)]
    if fcfg.exclude:
        names = [n for n in names if not any(fnmatch.fnmatch(n, p) for p in fcfg.exclude)]
    if not names:
        raise ValueError("feature selection removed every feature")
    return names


def apply_model(X_full: np.ndarray, model: "LRModel", prefilter=None, feature_names=None) -> np.ndarray:
    """Probability for each pair: model over its selected feature columns, with
    the optional vectorized prefilter rule pass forcing 0/1 on rule hits
    (reference ``_apply_prefilters``,
    /root/reference/src/batch_parallel_feature_engineering.py:805-888).
    ``feature_names``: the column layout of X_full — pass the driver-captured
    list when registered extension features are in play (worker modules only
    know the built-ins)."""
    fns = FEATURE_NAMES if feature_names is None else feature_names
    idx = [fns.index(n) for n in model.feature_names]
    prob = model.predict_proba(X_full[:, idx])
    if prefilter is not None and getattr(prefilter, "enabled", False):
        mh = X_full[:, fns.index("minhash_jaccard")]
        te = X_full[:, fns.index("title_exact")]
        jw = X_full[:, fns.index("title_jw")]
        if prefilter.high_sketch_match is not None:
            prob = np.where(mh >= prefilter.high_sketch_match, 1.0, prob)
        if prefilter.exact_title_sketch is not None:
            prob = np.where((te > 0.5) & (mh >= prefilter.exact_title_sketch), 1.0, prob)
        if prefilter.low_sketch_nonmatch is not None and prefilter.low_title_jw is not None:
            prob = np.where((mh < prefilter.low_sketch_nonmatch) & (jw < prefilter.low_title_jw), 0.0, prob)
    return prob


FEATURE_NAMES = [
    "minhash_jaccard",
    "tfidf_cosine",
    "title_jw",
    "title_lev",
    "title_token_jaccard",
    "title_exact",
    "domain_equal",
    "len_ratio",
    "hm_cos_title",
    "prod_sketch_cos",
]

# Registered extension features (extension.register_pair_feature): name ->
# fn(left_payload, right_payload) -> (n,) float64.  Driver-side registry —
# scoring call sites capture a snapshot into their worker closures, because
# worker processes re-import this module and would otherwise see it empty.
EXTRA_PAIR_FEATURES: dict = {}


def _sparse_cosine(idx_l, val_l, idx_r, val_r) -> float:
    """Dot of two L2-normalized sparse vectors (sorted uint32 indices)."""
    if len(idx_l) == 0 or len(idx_r) == 0:
        return 0.0
    common, li, ri = np.intersect1d(idx_l, idx_r, assume_unique=True, return_indices=True)
    if len(common) == 0:
        return 0.0
    return float(np.dot(val_l[li], val_r[ri]))


class _StringSimCache:
    """Cross-batch memo for per-unique-title-pair string features — hot blocks
    repeat the same title pairs thousands of times (hard-negative templates).
    Keyed by canonical (min, max) pair; bounded so a long-lived worker process
    scoring many corpora cannot grow without limit."""

    def __init__(self, maxsize: int = 200_000):
        self.pair: dict[tuple[str, str], tuple[float, float, float]] = {}  # (jw, lev, token_jaccard)
        self.tokens: dict[str, frozenset] = {}
        self.maxsize = maxsize

    def token_set(self, s: str) -> frozenset:
        ts = self.tokens.get(s)
        if ts is None:
            ts = frozenset(word_tokens(s))
            if len(self.tokens) < self.maxsize:
                self.tokens[s] = ts
        return ts


def _title_features(titles_l, titles_r, cache: _StringSimCache) -> tuple[np.ndarray, ...]:
    """(jw, lev, token_jaccard, exact) arrays for parallel title sequences.

    Computed once per UNIQUE (left, right) title pair: candidate pairs inside a
    hot block repeat few distinct titles, so factorize both sides, dedupe the
    code pairs, run the batch DP kernels over cache misses only, and gather the
    results back through the inverse index."""
    import pandas as pd

    from ..functions.similarity import jaro_winkler_batch, levenshtein_sim_batch

    n = len(titles_l)
    if n == 0:
        z = np.empty(0, dtype=np.float64)
        return z, z.copy(), z.copy(), z.copy()
    ca, ua = pd.factorize(np.asarray(titles_l, dtype=np.str_))
    cb, ub = pd.factorize(np.asarray(titles_r, dtype=np.str_))
    comb = ca.astype(np.int64) * max(1, len(ub)) + cb
    ucomb, inv = np.unique(comb, return_inverse=True)
    # ua_str/ub_str (not "pa"/"pb"): a local named pa would shadow the
    # module-level pyarrow alias
    ua_str = np.asarray(ua, dtype=np.str_)[ucomb // max(1, len(ub))]
    ub_str = np.asarray(ub, dtype=np.str_)[ucomb % max(1, len(ub))]
    m = len(ucomb)
    ujw = np.empty(m, dtype=np.float64)
    ulev = np.empty(m, dtype=np.float64)
    utj = np.empty(m, dtype=np.float64)
    miss = []
    keys = []
    for i in range(m):
        a, b = ua_str[i], ub_str[i]
        k = (a, b) if a <= b else (b, a)
        keys.append(k)
        v = cache.pair.get(k)
        if v is None:
            miss.append(i)
        else:
            ujw[i], ulev[i], utj[i] = v
    if miss:
        mi = np.asarray(miss)
        ma, mb = ua_str[mi], ub_str[mi]
        ujw[mi] = jaro_winkler_batch(ma, mb)
        ulev[mi] = levenshtein_sim_batch(ma, mb)
        for j, i in enumerate(miss):
            tsa = cache.token_set(str(ma[j]))
            tsb = cache.token_set(str(mb[j]))
            utj[i] = token_jaccard(tsa, tsb)
            if len(cache.pair) < cache.maxsize:
                cache.pair[keys[i]] = (float(ujw[i]), float(ulev[i]), float(utj[i]))
    uex = ((ua_str == ub_str) & (ua_str != "")).astype(np.float64)
    return ujw[inv], ulev[inv], utj[inv], uex[inv]


def pair_feature_matrix(
    left: dict, right: dict, cache: _StringSimCache | None = None, extras: dict | None = None
) -> np.ndarray:
    """Feature matrix (n_pairs, len(FEATURE_NAMES)) from two side payloads.

    Side payload: {"title": list[str], "domain": list[str], "token_count": np,
    "sig": (n, num_perm) u64, "tfidf_idx": list[np], "tfidf_val": list[np]}.
    Vectorized throughout: minhash agreement, ratios and products are whole-
    batch numpy; the string DPs run as batch kernels over unique title pairs
    (functions/similarity.py::levenshtein_sim_batch / jaro_winkler_batch).
    """
    n = len(left["title"])
    cache = cache or _StringSimCache()
    mh = minhash_agreement(left["sig"], right["sig"])
    cos = np.fromiter(
        (
            _sparse_cosine(left["tfidf_idx"][i], left["tfidf_val"][i], right["tfidf_idx"][i], right["tfidf_val"][i])
            for i in range(n)
        ),
        dtype=np.float64,
        count=n,
    )
    tl = ["" if t is None else t for t in left["title"]] if isinstance(left["title"], list) else left["title"]
    tr = ["" if t is None else t for t in right["title"]] if isinstance(right["title"], list) else right["title"]
    title_jw, title_lev, title_tj, title_exact = _title_features(tl, tr, cache)
    dom_eq = (
        np.asarray(left["domain"], dtype=np.str_) == np.asarray(right["domain"], dtype=np.str_)
    ).astype(np.float64)
    len_ratio = sigmoid_ratio(left["token_count"], right["token_count"])
    hm = harmonic_mean(cos, title_jw)
    prod = mh * cos
    base = [mh, cos, title_jw, title_lev, title_tj, title_exact, dom_eq, len_ratio, hm, prod]
    for fn in (extras or {}).values():
        base.append(np.asarray(fn(left, right), dtype=np.float64))
    return np.column_stack(base)


# ----------------------------------------------------------------------- payload handling


@ray.remote
def _payload_partial(batch: pa.Table) -> dict | None:
    """Per-block slice of the broadcast payload (runs in parallel tasks)."""
    import pyarrow.compute as _pc

    n = len(batch)
    if n == 0:
        return None
    num_perm = batch.schema.field("minhash_sig").type.list_size
    tfi = batch["tfidf_idx"].combine_chunks()
    tfv = batch["tfidf_val"].combine_chunks()
    return {
        "ids": batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
        # fixed-width unicode arrays: zero-copy through the object store
        # (object-dtype string arrays are re-pickled in every actor's init);
        # nulls → "" BEFORE the U-dtype cast (None would stringify)
        "title": np.asarray(
            _pc.fill_null(batch["title"], "").to_numpy(zero_copy_only=False), dtype=np.str_
        ),
        "domain": np.asarray(
            _pc.fill_null(batch["domain"], "").to_numpy(zero_copy_only=False), dtype=np.str_
        ),
        "tc": batch["token_count"].to_numpy(zero_copy_only=False).astype(np.int64),
        "sig": np.asarray(
            batch["minhash_sig"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        ).reshape(n, num_perm),
        "tfi": np.asarray(tfi.flatten().to_numpy(zero_copy_only=False), dtype=np.uint32),
        "tfv": np.asarray(tfv.flatten().to_numpy(zero_copy_only=False), dtype=np.float32),
        "tflen": _pc.list_value_length(tfi).to_numpy(zero_copy_only=False).astype(np.int64),
        "num_perm": num_perm,
    }


def payload_map_from_features(doc_features_ds) -> dict:
    """Collect doc_features into a COLUMNAR broadcast payload: parallel arrays
    sorted by doc_id + FLAT tfidf arrays with offsets, looked up via
    np.searchsorted (vectorized gather; per-doc tfidf vectors are zero-copy
    slices of the flat arrays).  The per-block Arrow→numpy conversions run as
    parallel tasks; the driver only concatenates and argsorts."""
    parts = [
        p
        for p in ray.get([_payload_partial.remote(r) for r in doc_features_ds.to_arrow_refs()])
        if p is not None
    ]
    num_perm = parts[0]["num_perm"] if parts else 128
    ids_l = [p["ids"] for p in parts]
    titles_l = [p["title"] for p in parts]
    doms_l = [p["domain"] for p in parts]
    tcs_l = [p["tc"] for p in parts]
    sigs_l = [p["sig"] for p in parts]
    tfi_flat_l = [p["tfi"] for p in parts]
    tfv_flat_l = [p["tfv"] for p in parts]
    tflen_l = [p["tflen"] for p in parts]
    if not ids_l:
        return {"ids": np.empty(0, dtype=np.int64), "num_perm": 128}
    ids = np.concatenate(ids_l)
    order = np.argsort(ids, kind="mergesort")
    lengths = np.concatenate(tflen_l)
    # flat arrays are in PRE-SORT order; keep per-doc (start, len) and remap
    starts = np.concatenate([[0], np.cumsum(lengths)])[:-1]
    return {
        "ids": ids[order],
        "title": np.concatenate(titles_l)[order],
        "domain": np.concatenate(doms_l)[order],
        "token_count": np.concatenate(tcs_l)[order],
        "sig": np.vstack(sigs_l)[order],
        "tfidf_flat_idx": np.concatenate(tfi_flat_l) if tfi_flat_l else np.empty(0, np.uint32),
        "tfidf_flat_val": np.concatenate(tfv_flat_l) if tfv_flat_l else np.empty(0, np.float32),
        "tfidf_start": starts[order],
        "tfidf_len": lengths[order],
        "num_perm": num_perm,
    }


def _sides_from_payload_map(pm: dict, left_ids, right_ids, num_perm: int) -> tuple[dict, dict]:
    """Vectorized gather from the columnar payload via searchsorted; tfidf
    vectors come out as zero-copy views into the flat arrays; unknown ids get
    empty defaults (empty-signature doc)."""
    pids = pm["ids"]
    e_i = np.empty(0, dtype=np.uint32)
    e_v = np.empty(0, dtype=np.float32)

    def side(ids):
        ids = np.asarray(ids, dtype=np.int64)
        n = len(ids)
        if len(pids) == 0:
            return {
                "title": [""] * n,
                "domain": [""] * n,
                "token_count": np.zeros(n, dtype=np.int64),
                "sig": np.full((n, num_perm), 0xFFFFFFFFFFFFFFFF, dtype=np.uint64),
                "tfidf_idx": [e_i] * n,
                "tfidf_val": [e_v] * n,
            }
        pos = np.searchsorted(pids, ids)
        pos_c = np.clip(pos, 0, len(pids) - 1)
        found = pids[pos_c] == ids
        sig = pm["sig"][pos_c]
        if not found.all():
            sig = sig.copy()
            sig[~found] = np.uint64(0xFFFFFFFFFFFFFFFF)
        tc = np.where(found, pm["token_count"][pos_c], 0)
        titles = pm["title"][pos_c]
        domains = pm["domain"][pos_c]
        fi, fv = pm["tfidf_flat_idx"], pm["tfidf_flat_val"]
        st = pm["tfidf_start"][pos_c]
        ln = pm["tfidf_len"][pos_c]
        tfi = [fi[st[i] : st[i] + ln[i]] if found[i] else e_i for i in range(n)]
        tfv = [fv[st[i] : st[i] + ln[i]] if found[i] else e_v for i in range(n)]
        if not found.all():
            titles = titles.copy()
            titles[~found] = ""
            domains = domains.copy()
            domains[~found] = ""
        return {
            "title": titles,
            "domain": domains,
            "token_count": tc.astype(np.int64),
            "sig": sig,
            "tfidf_idx": tfi,
            "tfidf_val": tfv,
        }

    return side(left_ids), side(right_ids)


# Per-WORKER-PROCESS state cache: Ray reuses idle worker processes across map
# tasks, so state keyed by ObjectRef persists exactly like actor state — but
# tasks schedule elastically (no pool minimum to ramp, no reserved CPUs).
# The payload itself is zero-copy out of plasma (numeric + fixed-width-unicode
# arrays), so the first ray.get per process is cheap too.  Bounded FIFO: a
# long session scoring against many models/payloads must not accumulate them.
_PROC_CACHE: dict = {}
_PROC_CACHE_MAX = 8


def _cache_put(key, value):
    while len(_PROC_CACHE) >= _PROC_CACHE_MAX:
        _PROC_CACHE.pop(next(iter(_PROC_CACHE)))
    _PROC_CACHE[key] = value
    return value


def _cached_get(ref):
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _PROC_CACHE:
        return _cache_put(key, ray.get(ref))
    return _PROC_CACHE[key]


def _cached_build(key, build):
    if key not in _PROC_CACHE:
        return _cache_put(key, build())
    return _PROC_CACHE[key]


class BroadcastPairScorer:
    """Broadcast-plan scorer: payload map + model held warm per worker
    process; pairs batch in → (left_id, right_id, feat_*, prob, match) out.
    Runs as a TASK-based map (state via _PROC_CACHE) — the reference's
    per-worker warm-client pattern without actor-pool scheduling constraints."""

    def __init__(self, payload_ref, model_json: str | None, num_perm: int, prefilter=None,
                 extras: dict | None = None, feature_names: list | None = None):
        self.pm = _cached_get(payload_ref)
        self.model = LRModel.from_json(model_json) if model_json else None
        self.num_perm = num_perm
        self.prefilter = prefilter
        self.cache = _StringSimCache()
        self.extras = extras or {}
        self.feature_names = feature_names if feature_names is not None else list(FEATURE_NAMES)

    def __call__(self, batch: pa.Table) -> pa.Table:
        left_ids = batch["left_id"].to_numpy(zero_copy_only=False)
        right_ids = batch["right_id"].to_numpy(zero_copy_only=False)
        l, r = _sides_from_payload_map(self.pm, left_ids, right_ids, self.num_perm)
        X = pair_feature_matrix(l, r, self.cache, extras=self.extras)
        cols = [pa.array(left_ids, type=pa.int64()), pa.array(right_ids, type=pa.int64())]
        names = ["left_id", "right_id"]
        for j, fn in enumerate(self.feature_names):
            cols.append(pa.array(X[:, j], type=pa.float32()))
            names.append("feat_" + fn)
        if self.model is not None:
            prob = apply_model(X, self.model, self.prefilter, feature_names=self.feature_names)
            cols.append(pa.array(prob, type=pa.float32()))
            names.append("prob")
            cols.append(pa.array(prob >= self.model.threshold))
            names.append("match")
        return pa.Table.from_arrays(cols, names=names)


def _prefixed_features(doc_features_ds, prefix: str, num_perm: int):
    """Side-prefixed doc_features for the join plan, with list-typed payloads
    packed to binary: Acero hash joins reject list columns as non-key fields
    ("Data type fixed_size_list<...> is not supported"), so the MinHash
    signature ships as fixed_size_binary and the sparse TF-IDF idx/val pairs
    as variable binary.  Unpacked zero-copy in _JoinedPairScorer."""
    from ..rayops import pack_matrix, pack_ragged_column

    def ren(batch: pa.Table) -> pa.Table:
        n = len(batch)
        sigs = np.asarray(
            batch["minhash_sig"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        ).reshape(n, num_perm)
        return pa.table(
            {
                prefix + "doc_id": batch["doc_id"],
                prefix + "title": batch["title"],
                prefix + "domain": batch["domain"],
                prefix + "token_count": batch["token_count"],
                prefix + "sig": pack_matrix(sigs),
                # flat-buffer list→binary pack: no per-row pylist on the
                # 100-TB scoring path
                prefix + "tfidf_idx": pack_ragged_column(batch["tfidf_idx"], np.uint32),
                prefix + "tfidf_val": pack_ragged_column(batch["tfidf_val"], np.float32),
            }
        )

    return doc_features_ds.map_batches(ren, batch_format="pyarrow")


class _JoinedPairScorer:
    """Stateless scorer for the join plan: both sides' payloads arrive as
    columns of the enriched batch."""

    def __init__(self, model_json: str | None, num_perm: int, prefilter=None,
                 extras: dict | None = None, feature_names: list | None = None):
        self.model = LRModel.from_json(model_json) if model_json else None
        self.num_perm = num_perm
        self.prefilter = prefilter
        self.cache = _StringSimCache()
        self.extras = extras or {}
        self.feature_names = feature_names if feature_names is not None else list(FEATURE_NAMES)

    def _side(self, batch: pa.Table, prefix: str) -> dict:
        from ..rayops import unpack_matrix, unpack_ragged

        return {
            "title": [t or "" for t in batch[prefix + "title"].to_pylist()],
            "domain": [d or "" for d in batch[prefix + "domain"].to_pylist()],
            "token_count": np.nan_to_num(batch[prefix + "token_count"].to_numpy(zero_copy_only=False)).astype(np.int64),
            "sig": unpack_matrix(batch[prefix + "sig"], np.uint64, self.num_perm),
            "tfidf_idx": unpack_ragged(batch[prefix + "tfidf_idx"], np.uint32),
            "tfidf_val": unpack_ragged(batch[prefix + "tfidf_val"], np.float32),
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        left = self._side(batch, "l_")
        right = self._side(batch, "r_")
        X = pair_feature_matrix(left, right, self.cache, extras=self.extras)
        cols = [batch["left_id"].combine_chunks(), batch["right_id"].combine_chunks()]
        names = ["left_id", "right_id"]
        for j, fn in enumerate(self.feature_names):
            cols.append(pa.array(X[:, j], type=pa.float32()))
            names.append("feat_" + fn)
        if self.model is not None:
            prob = apply_model(X, self.model, self.prefilter, feature_names=self.feature_names)
            cols.append(pa.array(prob, type=pa.float32()))
            names.append("prob")
            cols.append(pa.array(prob >= self.model.threshold))
            names.append("match")
        return pa.Table.from_arrays(cols, names=names)


def score_pairs(
    pairs_ds,
    doc_features_ds,
    model: LRModel | None,
    cfg: ERConfig,
    *,
    num_docs: int | None = None,
    payload_ref=None,
):
    """pairs + doc_features → scores.  Plan choice: broadcast when the doc
    payload fits comfortably in the object store, else two hash joins.
    ``payload_ref``: pre-built broadcast payload (ray.put of
    payload_map_from_features) — pass it when scoring multiple pair sets
    against the same doc_features (training + production scoring) so the map
    is built and shipped once."""
    ex = cfg.execution
    num_perm = cfg.minhash.num_perm
    model_json = model.to_json() if model is not None else None
    # driver-side snapshot of the extension registry: worker processes
    # re-import this module and would see the registry empty
    extras = dict(EXTRA_PAIR_FEATURES)
    fnames = list(FEATURE_NAMES)
    if payload_ref is None and num_docs is None:
        num_docs = doc_features_ds.count()
    if payload_ref is not None or num_docs <= scale_gate(ex.broadcast_threshold_rows):
        if payload_ref is None:
            payload_ref = ray.put(payload_map_from_features(doc_features_ds))
        from ..rayops import actor_num_cpus, actor_pool_bounds

        lo, hi = actor_pool_bounds(ex.scorer_concurrency)
        try:
            # split a pair set with too few blocks so the map can parallelize
            nb = pairs_ds.num_blocks()
            if nb is not None and 0 < nb < lo:
                pairs_ds = pairs_ds.repartition(hi).materialize()
        except Exception:
            pass

        def score_batch(batch: pa.Table) -> pa.Table:
            scorer = _cached_build(
                ("scorer", payload_ref.hex(), model_json, num_perm, str(cfg.prefilter), tuple(fnames)),
                lambda: BroadcastPairScorer(
                    payload_ref, model_json, num_perm, cfg.prefilter,
                    extras=extras, feature_names=fnames,
                ),
            )
            return scorer(batch)

        return pairs_ds.map_batches(
            score_batch,
            batch_format="pyarrow",
            batch_size=ex.scorer_batch_size,
        )
    # join plan (the at-scale path): pairs ⋈ docs ON left_id, then ON right_id.
    # Partition count is adaptive: each hash-shuffle partition is an aggregator
    # ACTOR, and a static 32-partition join on a small session deadlocks
    # (aggregators reserve every CPU before any map task can run).
    from ..rayops import adaptive_partitions, safe_join

    nparts = adaptive_partitions(num_docs, cap=ex.join_num_partitions)
    lf = _prefixed_features(doc_features_ds, "l_", num_perm)
    rf = _prefixed_features(doc_features_ds, "r_", num_perm)
    enriched = safe_join(
        safe_join(pairs_ds, lf, num_partitions=nparts, on=("left_id",), right_on=("l_doc_id",)),
        rf,
        num_partitions=nparts,
        on=("right_id",),
        right_on=("r_doc_id",),
    )
    from ..rayops import actor_num_cpus, actor_pool_bounds

    # barrier: chaining the join's hash-shuffle aggregator actors directly into
    # the scorer actor pool starves small CPU budgets (both reserve CPUs);
    # see run_er_pipeline's pairs.materialize() for the same pattern
    enriched = enriched.materialize()
    return enriched.map_batches(
        _JoinedPairScorer,
        fn_constructor_args=(model_json, num_perm, cfg.prefilter, extras, fnames),
        batch_format="pyarrow",
        batch_size=ex.scorer_batch_size,
        concurrency=actor_pool_bounds(ex.scorer_concurrency),
        num_cpus=actor_num_cpus(),
    )

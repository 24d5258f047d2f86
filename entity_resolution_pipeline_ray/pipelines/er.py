"""Flagship entity-resolution pipeline: pages → docs → signatures → blocking →
pairwise scoring → transitive clusters.

Ray-Data-native re-expression of the reference's 8-stage flow
(/root/reference/src/pipeline.py:66-120): preprocessing → embedding → indexing →
querying → feature engineering → classification → clustering, with the
external OpenAI/Weaviate stages replaced by self-contained MinHash/TF-IDF
stages and the (missing) candidate-generation stage implemented via LSH
blocking.  Every stage is a streaming Dataset transform; the only driver-side
work is the (small) model fit and the per-round convergence check.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_CONFIG, ERConfig
from ..sources.pages import PagesSpec, labeled_pairs_table, labels_table, pages_dataset
from ..stages.blocking import candidate_pairs, emit_block_keys
from ..stages.clustering import cluster_labels, edges_from_scores
from ..stages.extract import extract_docs
from ..stages.scoring import score_pairs
from ..stages.signatures import compute_doc_features
from ..stages.training import train_matcher
from ..state.model import LRModel
from ..config import scale_gate


def run_er_pipeline(
    pages_ds,
    labeled_pairs: pa.Table,
    cfg: ERConfig = DEFAULT_CONFIG,
    *,
    model: LRModel | None = None,
    materialize_intermediate: bool = True,
    docs_ds=None,
):
    """Full ER run.  Returns dict with clusters Dataset, model, and stage handles.

    ``materialize_intermediate`` pins docs/doc_features in the object store —
    right when they fit (they are consumed 2-3 times: vocabulary pass,
    vectorize, training, scoring).  At 100 TB set False: stages re-execute
    upstream reads instead of pinning, trading recompute for memory; the
    streaming executor pipelines each consumer independently.
    """
    import os as _os
    import sys as _sys
    import time as _time

    _t0 = [_time.time()]

    def _tick(name):
        if _os.environ.get("GRAFT_TIMING"):
            print(f"[er] {name}: {_time.time()-_t0[0]:.1f}s", file=_sys.stderr, flush=True)
        _t0[0] = _time.time()

    # docs_ds short-circuits extraction for callers that already hold
    # extracted docs (e.g. the query gate sharing one corpus across queries)
    docs = docs_ds if docs_ds is not None else extract_docs(pages_ds)
    if materialize_intermediate:
        docs = docs.materialize()
    _tick("extract")
    doc_features = compute_doc_features(
        docs,
        cfg.minhash,
        cfg.tfidf,
        concurrency=cfg.execution.scorer_concurrency,
        batch_size=cfg.execution.batch_size,
    )
    if materialize_intermediate:
        doc_features = doc_features.materialize()
    _tick("doc_features")
    # Broadcast the doc payload once; training featurization and production
    # scoring share it (the reference rebuilt per-stage state each time).
    # Payload assembly (driver ray.get + concat + ray.put) and training (task
    # fan-out + tiny driver GD fit) are both independent of block/pair
    # generation, so on a multi-core budget the whole payload→train chain runs
    # in a background thread CONCURRENTLY with the block/pair path (elastic
    # scorer tasks backfill whatever the pair sort leaves idle — both sides
    # are pure tasks, no reserved actors, so neither can starve the other).
    # Tiny sessions keep the sequential path: nothing to backfill below a
    # handful of CPUs.
    import ray as _ray

    from ..stages.scoring import payload_map_from_features

    payload_ref = None
    bg_ex = bg_fut = None
    want_payload = (
        materialize_intermediate
        and doc_features.count() <= scale_gate(cfg.execution.broadcast_threshold_rows)
    )
    overlap = want_payload and _ray.cluster_resources().get("CPU", 0) >= 8
    if overlap:
        from concurrent.futures import ThreadPoolExecutor

        def _payload_then_train():
            ref = _ray.put(payload_map_from_features(doc_features))
            m = (
                train_matcher(labeled_pairs, doc_features, cfg, payload_ref=ref)
                if model is None
                else model
            )
            return ref, m

        bg_ex = ThreadPoolExecutor(max_workers=1)
        bg_fut = bg_ex.submit(_payload_then_train)
        _tick("payload_train_submit")
    else:
        if want_payload:
            payload_ref = _ray.put(payload_map_from_features(doc_features))
        _tick("payload")
        if model is None:
            model = train_matcher(labeled_pairs, doc_features, cfg, payload_ref=payload_ref)
        _tick("train")
    blocks = emit_block_keys(doc_features, cfg.minhash, cfg.blocking)
    if materialize_intermediate:
        # blocks are consumed twice (size census + self-join) and are slim
        # (two int64s per row) — pin them instead of re-running key emission
        blocks = blocks.materialize()
        from ..rayops import adaptive_partitions

        pair_partitions = adaptive_partitions(blocks.count(), cap=cfg.execution.join_num_partitions)
    else:
        pair_partitions = cfg.execution.join_num_partitions
    _tick("blocks")
    # scale mode goes straight to the distributed census (no driver-side
    # partial merge); the materialized mode keeps auto (driver merge with the
    # bail-out to distributed past DRIVER_CENSUS_MAX_ROWS partial rows)
    pairs = candidate_pairs(
        blocks,
        cfg.blocking,
        num_partitions=pair_partitions,
        census="auto" if materialize_intermediate else "distributed",
    )
    if materialize_intermediate:
        # barrier between the pair shuffle and the scorer actor pool: chaining
        # a hash-shuffle's aggregator actors into an actor-pool map in one
        # execution can starve on small CPU budgets (both pools reserve CPUs);
        # pairs are slim (two int64s), so the pin is cheap
        pairs = pairs.materialize()
    _tick("pairs")
    if bg_fut is not None:
        payload_ref, model = bg_fut.result()
        bg_ex.shutdown(wait=False)
        _tick("payload_train_join")
    scores = score_pairs(pairs, doc_features, model, cfg, payload_ref=payload_ref)
    if materialize_intermediate:
        scores = scores.materialize()
    _tick("scores")
    edges = edges_from_scores(scores, cfg.clustering.min_edge_weight)
    all_ids = doc_features.select_columns(["doc_id"])
    clusters = cluster_labels(edges, all_ids, cfg.clustering, num_partitions=cfg.execution.join_num_partitions)
    if cfg.clustering.min_cluster_size > 1:
        from ..stages.clustering import cluster_sizes, filter_min_cluster_size

        clusters = clusters.materialize()
        clusters = filter_min_cluster_size(
            clusters, cluster_sizes(clusters), cfg.clustering.min_cluster_size
        )
    _tick("cluster")
    return {
        "docs": docs,
        "doc_features": doc_features,
        "pairs": pairs,
        "scores": scores,
        "clusters": clusters,
        "model": model,
    }


def pairwise_f1_against_gold(clusters_ds, labeled_pairs: pa.Table) -> dict:
    """The BASELINE.json quality gate: predicted same-cluster vs gold match over
    the labeled pairs.  Only the LABELED docs' cluster rows come to the driver:
    the labeled doc_id set is broadcast and filters the cluster stream, so the
    driver working set is labeled-set-proportional even on a trillion-doc
    corpus (the full cluster map never leaves the object store)."""
    import ray

    from ..functions.hashing import doc_id_for_urls

    li = doc_id_for_urls(labeled_pairs["left_url"].to_pylist()).astype(np.int64)
    ri = doc_id_for_urls(labeled_pairs["right_url"].to_pylist()).astype(np.int64)
    if len(li) == 0:  # no labeled pairs: zero-count metrics, not a task crash
        return {"precision": 0.0, "recall": 0.0, "f1": 0.0, "tp": 0, "fp": 0, "fn": 0, "n_pairs": 0}
    wanted = np.unique(np.concatenate([li, ri]))
    wanted_ref = ray.put(wanted)

    def only_labeled(t: pa.Table) -> pa.Table:
        w = ray.get(wanted_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(w, ids), 0, len(w) - 1)
        return t.filter(pa.array(w[pos] == ids))

    cl = clusters_ds.map_batches(only_labeled, batch_format="pyarrow").to_pandas()
    # sorted-array gather (no per-row dict); docs absent from the cluster map
    # count as their own singleton (left side) / no-cluster (right side)
    k = cl["doc_id"].to_numpy(dtype=np.int64)
    v = cl["cluster_id"].to_numpy(dtype=np.int64)
    order = np.argsort(k, kind="mergesort")
    k, v = k[order], v[order]

    def gather(ids: np.ndarray, default: np.ndarray) -> np.ndarray:
        if len(k) == 0:
            return default
        pos = np.clip(np.searchsorted(k, ids), 0, len(k) - 1)
        hit = k[pos] == ids
        return np.where(hit, v[pos], default)

    y = labeled_pairs["match"].to_numpy(zero_copy_only=False).astype(bool)
    pred = gather(li, li) == gather(ri, np.full(len(ri), -1, dtype=np.int64))
    tp = int((pred & y).sum())
    fp = int((pred & ~y).sum())
    fn = int((~pred & y).sum())
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"precision": prec, "recall": rec, "f1": f1, "tp": tp, "fp": fp, "fn": fn, "n_pairs": int(len(y))}


def run_er_on_spec(spec: PagesSpec, cfg: ERConfig = DEFAULT_CONFIG, **kw):
    """Convenience: generate the deterministic corpus for spec and run ER."""
    pages = pages_dataset(spec)
    pairs = labeled_pairs_table(spec)
    return run_er_pipeline(pages, pairs, cfg, **kw)


def run_er_pipeline_checkpointed(
    pages_ds,
    labeled_pairs: pa.Table,
    workdir: str,
    cfg: ERConfig = DEFAULT_CONFIG,
    *,
    stop_after: str | None = None,
):
    """Checkpointed/resumable ER run (BASELINE.md resumability target).

    Each stage is compute-or-load via its lineage manifest
    (state/manifest.py — analog of the reference's per-stage pickle
    checkpoints, /root/reference/src/utils.py:47-86, done batch-native: atomic
    partitioned Parquet + JSON lineage).  A killed run re-executes only stages
    without a complete manifest; ``stop_after`` simulates the kill in tests.
    Returns (result dict, dict stage -> resumed_from_checkpoint bool).
    """
    import os

    import numpy as np

    from ..stages.blocking import candidate_pairs as _cand
    from ..state.manifest import StageCheckpoint, run_stage
    from ..state.model import LRModel as _LRModel

    resumed: dict[str, bool] = {}
    out: dict = {}

    docs, resumed["docs"] = run_stage(workdir, "docs", lambda: extract_docs(pages_ds))
    out["docs"] = docs
    if stop_after == "docs":
        return out, resumed

    def _feats_with_pinned_vocab():
        # build + persist the vocabulary/IDF as a first-class artifact (like
        # model.json) so incremental appends can featurize NEW docs with the
        # base run's frozen featurizer (er_incremental_append)
        from ..stages.signatures import build_vocabulary

        vocab = build_vocabulary(docs, cfg.tfidf, max(1, docs.count()))
        _save_vocab(os.path.join(workdir, "vocab.json"), vocab)
        return compute_doc_features(
            docs,
            cfg.minhash,
            cfg.tfidf,
            concurrency=cfg.execution.scorer_concurrency,
            batch_size=cfg.execution.batch_size,
            vocab=vocab,
        )

    feats, resumed["doc_features"] = run_stage(workdir, "doc_features", _feats_with_pinned_vocab)
    out["doc_features"] = feats
    if stop_after == "doc_features":
        return out, resumed

    model_path = os.path.join(workdir, "model.json")
    if os.path.exists(model_path):
        model = _LRModel.load(model_path)
        resumed["model"] = True
    else:
        model = train_matcher(labeled_pairs, feats, cfg)
        model.save(model_path)
        resumed["model"] = False
    out["model"] = model
    if stop_after == "model":
        return out, resumed

    # adaptive join width: a 32-partition hash shuffle on a tiny corpus starves
    # a small CPU budget (aggregator actors + map tasks compete); ~200k block
    # rows per partition is the scale target
    from ..rayops import adaptive_partitions

    n_docs = feats.count()
    n_block_rows = n_docs * (cfg.minhash.num_bands + 1)
    pair_partitions = adaptive_partitions(n_block_rows, cap=cfg.execution.join_num_partitions)
    pairs, resumed["pairs"] = run_stage(
        workdir,
        "pairs",
        lambda: _cand(emit_block_keys(feats, cfg.minhash, cfg.blocking), cfg.blocking,
                      num_partitions=pair_partitions),
    )
    out["pairs"] = pairs
    if stop_after == "pairs":
        return out, resumed

    def _score_hist(ds):
        """Per-stage metrics incl. the manifest score histogram (10 bins)."""
        hist = np.zeros(10, dtype=np.int64)
        for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
            p = b["prob"].to_numpy(zero_copy_only=False)
            hist += np.histogram(p, bins=10, range=(0.0, 1.0))[0]
        return {"score_hist": hist.tolist()}

    scores, resumed["scores"] = run_stage(
        workdir, "scores", lambda: score_pairs(pairs, feats, model, cfg), metrics_fn=_score_hist
    )
    out["scores"] = scores
    if stop_after == "scores":
        return out, resumed

    def _clusters():
        edges = edges_from_scores(scores, cfg.clustering.min_edge_weight)
        all_ids = feats.select_columns(["doc_id"])
        return cluster_labels(edges, all_ids, cfg.clustering, num_partitions=cfg.execution.join_num_partitions)

    clusters, resumed["clusters"] = run_stage(workdir, "clusters", _clusters)
    out["clusters"] = clusters
    return out, resumed


def er_clusters_with_urls(spec: PagesSpec, cfg: ERConfig = DEFAULT_CONFIG):
    """Run ER on the spec corpus and return clusters keyed by url
    (url, cluster_id) — the reference's cluster export shape
    (/root/reference/src/batch_parallel_classification.py:955-961)."""
    return _attach_urls(run_er_on_spec(spec, cfg), spec.num_pages, cfg)


def er_clusters_from_docs(docs_ds, labeled_pairs: pa.Table, cfg: ERConfig = DEFAULT_CONFIG):
    """`er_clusters_with_urls` for callers that already hold EXTRACTED docs
    (the driver query gate shares one extracted corpus across er_extract and
    er_clusters)."""
    res = run_er_pipeline(None, labeled_pairs, cfg, docs_ds=docs_ds)
    return _attach_urls(res, docs_ds.count(), cfg)


def _attach_urls(res: dict, n_rows: int, cfg: ERConfig):
    from ..rayops import adaptive_partitions, safe_join

    url_map = res["docs"].select_columns(["doc_id", "url"])
    if n_rows <= scale_gate(cfg.execution.broadcast_threshold_rows):
        # broadcast gather: the url map fits the object store comfortably —
        # ship (sorted ids, fixed-width url array) once and searchsorted-gather
        # per batch.  Avoids a hash-join aggregator-actor ramp that dominates
        # the query gate (~3s on small sessions).
        import ray as _ray

        um = url_map.to_pandas()
        ids = um["doc_id"].to_numpy(np.int64)
        order = np.argsort(ids, kind="stable")
        # U-dtype (fixed-width) numpy strings are zero-copy from plasma;
        # object arrays would re-pickle per consumer
        map_ref = _ray.put((ids[order], um["url"].to_numpy(dtype="U")[order]))

        def attach(t: pa.Table) -> pa.Table:
            sids, urls = _ray.get(map_ref)
            pos = np.searchsorted(sids, t["doc_id"].to_numpy(zero_copy_only=False))
            return pa.table({"url": pa.array(urls[pos]), "cluster_id": t["cluster_id"]})

        return res["clusters"].map_batches(attach, batch_format="pyarrow")
    # at-scale plan: both sides are corpus-sized — hash join on doc_id
    joined = safe_join(
        res["clusters"],
        url_map,
        num_partitions=adaptive_partitions(n_rows, cap=cfg.execution.join_num_partitions),
        on=("doc_id",),
        right_on=("doc_id",),
    )
    return joined.select_columns(["url", "cluster_id"])


# canonical-URL rule shared by url_snapshot_dedup / url_snapshot_thinning:
# strip the trailing numeric version segment.  The __ray_entry__ oracle SQL
# restates it as '/[0-9]+$' (oracles are independent restatements by design);
# a change here must be mirrored there.
CANON_URL_VERSION_RE = r"/\d+$"


def url_snapshot_dedup(pages_ds):
    """Latest-crawl-wins URL snapshot dedup over a web-pages Dataset: the
    canonical URL is the page URL with its trailing version segment stripped,
    and per canonical URL the row with the greatest (warc_ts, url asc
    tiebreak) survives — the "keep the newest snapshot of each page" step in
    front of any crawl-corpus pipeline.  ONE range shuffle of slim
    (canon_url, url, epoch_us) rows via the boundary-aware top-1-per-key
    kernel; warc_ts shuffles as int64 epoch-us (Ray's sort-boundary sampling
    of timestamp keys round-trips through numpy datetime64 and warns — same
    fix as relational.q_events_hourly)."""
    import pyarrow.compute as pc

    from ..rayops import head_k_per_key

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "canon_url": pc.replace_substring_regex(t["url"], pattern=CANON_URL_VERSION_RE, replacement=""),
                "url": t["url"],
                "ts_us": pc.cast(t["warc_ts"], pa.int64()),
            }
        )

    slim = pages_ds.select_columns(["url", "warc_ts"]).map_batches(prep, batch_format="pyarrow")
    kept = head_k_per_key(slim, "canon_url", ["ts_us", "url"], 1, descending=[True, False])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "canon_url": t["canon_url"],
                "url": t["url"],
                "warc_ts": pc.cast(t["ts_us"], pa.timestamp("us")),
            }
        )

    return kept.map_batches(finish, batch_format="pyarrow")


def url_snapshot_thinning(pages_ds):
    """Temporal snapshot THINNING: keep the newest snapshot of each canonical
    URL per ISO week — the "retain weekly history" retention policy of a
    continuously re-crawled corpus (contrast ``url_snapshot_dedup``, which
    keeps only the single global-latest snapshot).  Same ONE-range-shuffle
    ``head_k_per_key`` shape on slim (key, url, epoch-us) rows; the key packs
    (canon_url, week) into one string so the boundary-aware top-1 kernel needs
    no composite-key support.  The week bucket is computed in pure int64
    epoch-day arithmetic — Monday-start truncation identical to DuckDB
    ``date_trunc('week', ts)`` (epoch day 0 = Thursday, so day+3 ≡ 0 mod 7 on
    Mondays; parity pinned in tests/test_round5_ops.py) — keeping the shuffle
    key float- and timezone-free.  Output (canon_url, week_us, url, warc_ts)."""
    import pyarrow.compute as pc

    from ..rayops import head_k_per_key

    US_DAY = 86_400_000_000

    def prep(t: pa.Table) -> pa.Table:
        canon = pc.replace_substring_regex(t["url"], pattern=CANON_URL_VERSION_RE, replacement="")
        ts_us = pc.cast(t["warc_ts"], pa.int64()).to_numpy(zero_copy_only=False)
        week_us = (((ts_us // US_DAY + 3) // 7) * 7 - 3) * US_DAY
        week_arr = pa.array(week_us, type=pa.int64())
        key = pc.binary_join_element_wise(canon, pc.cast(week_arr, pa.string()), "|")
        return pa.table(
            {
                "canon_week": key,
                "canon_url": canon,
                "week_us": week_arr,
                "url": t["url"],
                "ts_us": pa.array(ts_us, type=pa.int64()),
            }
        )

    slim = pages_ds.select_columns(["url", "warc_ts"]).map_batches(prep, batch_format="pyarrow")
    kept = head_k_per_key(slim, "canon_week", ["ts_us", "url"], 1, descending=[True, False])

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "canon_url": t["canon_url"],
                "week_us": t["week_us"],
                "url": t["url"],
                "warc_ts": pc.cast(t["ts_us"], pa.timestamp("us")),
            }
        )

    return kept.map_batches(finish, batch_format="pyarrow")


def _save_vocab(path: str, vocab: dict) -> None:
    import json
    import os

    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({t: [int(i), float(w)] for t, (i, w) in vocab.items()}, f)
    os.replace(tmp, path)


def _load_vocab(path: str) -> dict:
    import json

    with open(path) as f:
        return {t: (int(i), float(w)) for t, (i, w) in json.load(f).items()}


def er_incremental_append(
    workdir: str,
    new_pages_ds,
    cfg: ERConfig = DEFAULT_CONFIG,
    *,
    out_workdir: str | None = None,
):
    """Append a new crawl shard to a finished checkpointed ER run — the
    web-scale operational pattern: a new WARC lands daily against a corpus
    whose extraction/featurization already cost days of compute.

    Only the NEW pages are extracted and featurized (with the base run's
    PINNED vocabulary + model, the production frozen-featurizer discipline);
    candidate enumeration is restricted to blocks containing at least one new
    doc (new↔new and new↔old pairs only — old↔old pairs in those blocks were
    already scored in the base run, since blocking keys are pure functions of
    a doc's own signature); clustering re-runs over the UNION of old and new
    scored edges.  doc_id is a stable hash of url (stages/extract.py:37), so
    identities never shift between epochs.

    State: reads ``doc_features``/``scores`` checkpoints + ``model.json`` +
    ``vocab.json`` from ``workdir``; writes the unioned epoch state to
    ``out_workdir`` (streaming — the safe mode for chained appends) or, when
    ``out_workdir`` is None, back in place (materializes the unions first,
    since StageCheckpoint.write clears its data dir before executing the
    lazy reader over it).

    Exactness contract: equal to a from-scratch run over old∪new pages with
    the same pinned vocab/model, PROVIDED no block exceeds
    ``blocking.max_block_size`` (the hot-block pair-budget subsample is a
    per-epoch budget, not a semantic filter — a grown hot block re-samples).
    Pinned in tests/test_incremental.py.  Re-crawled URLs (same url — hence
    same doc_id — in both the base epoch and the append shard) are dropped
    first-crawl-wins before epoch state is unioned, so chained appends never
    accumulate duplicate doc_id rows.

    Reference analog: the reference re-runs its whole pipeline per corpus
    drop (src/pipeline.py); incremental append is parity-plus enabled by
    deterministic per-doc signatures.
    """
    import os

    import ray as _ray

    from ..rayops import adaptive_partitions
    from ..state.manifest import StageCheckpoint

    old_feats = StageCheckpoint(workdir, "doc_features").load()
    old_scores = StageCheckpoint(workdir, "scores").load()
    model = LRModel.load(os.path.join(workdir, "model.json"))
    vocab_path = os.path.join(workdir, "vocab.json")
    if not os.path.exists(vocab_path):
        # backfill for base runs checkpointed before vocab.json became a
        # first-class artifact: the vocabulary is a deterministic function of
        # the docs checkpoint, so rebuild-and-save reproduces it exactly
        from ..stages.signatures import build_vocabulary

        base_docs = StageCheckpoint(workdir, "docs").load()
        _save_vocab(vocab_path, build_vocabulary(base_docs, cfg.tfidf, max(1, base_docs.count())))
    vocab = _load_vocab(vocab_path)

    new_docs = extract_docs(new_pages_ds)
    new_feats = compute_doc_features(
        new_docs,
        cfg.minhash,
        cfg.tfidf,
        concurrency=cfg.execution.scorer_concurrency,
        batch_size=cfg.execution.batch_size,
        vocab=vocab,
    ).materialize()

    def _in_sorted(arr: np.ndarray, sorted_vals: np.ndarray) -> np.ndarray:
        if len(sorted_vals) == 0:
            return np.zeros(len(arr), dtype=bool)
        pos = np.searchsorted(sorted_vals, arr)
        pos_c = np.minimum(pos, len(sorted_vals) - 1)
        return (pos < len(sorted_vals)) & (sorted_vals[pos_c] == arr)

    # Re-crawl guard: doc_id is a stable hash of url, so a URL present in BOTH
    # the base epoch and the append shard (the normal case for a daily crawl)
    # would otherwise yield duplicate doc_id rows in features/scores/clusters
    # that silently accumulate across chained appends.  First-crawl-wins: drop
    # appended rows whose doc_id already exists in the base epoch.  Scale
    # shape: broadcast the APPEND-side id set (bounded by the shard, never the
    # corpus), stream the base ids through a membership filter (no shuffle),
    # and gather only the overlap (<= |append|) back to the driver.
    append_ids = np.sort(
        np.concatenate(
            [
                b["doc_id"].to_numpy(zero_copy_only=False)
                for b in new_feats.select_columns(["doc_id"]).iter_batches(
                    batch_size=1 << 20, batch_format="pyarrow"
                )
            ]
            or [np.empty(0, np.int64)]
        ).astype(np.int64)
    )
    if len(append_ids):
        aref = _ray.put(append_ids)

        def _overlap_rows(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            return t.filter(pa.array(_in_sorted(ids, _ray.get(aref))))

        overlap = np.unique(
            np.concatenate(
                [
                    b["doc_id"].to_numpy(zero_copy_only=False)
                    for b in old_feats.select_columns(["doc_id"])
                    .map_batches(_overlap_rows, batch_format="pyarrow")
                    .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
                ]
                or [np.empty(0, np.int64)]
            ).astype(np.int64)
        )
        if len(overlap):
            oref = _ray.put(overlap)

            def _drop_recrawled(t: pa.Table) -> pa.Table:
                ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                return t.filter(pa.array(~_in_sorted(ids, _ray.get(oref))))

            new_feats = new_feats.map_batches(_drop_recrawled, batch_format="pyarrow").materialize()

    n_new = new_feats.count()
    if n_new == 0:
        clusters = StageCheckpoint(workdir, "clusters").load()
        if out_workdir is not None and out_workdir != workdir:
            # chained appends expect a complete epoch dir either way: carry
            # the base epoch's state + artifacts forward unchanged
            import shutil

            os.makedirs(out_workdir, exist_ok=True)
            for art in ("model.json", "vocab.json"):
                shutil.copyfile(os.path.join(workdir, art), os.path.join(out_workdir, art))
            for stage, ds in (
                ("doc_features", old_feats),
                ("scores", old_scores),
                ("clusters", clusters),
            ):
                ck = StageCheckpoint(out_workdir, stage)
                os.makedirs(ck.dir, exist_ok=True)
                ds = ck.write(ds, {"epoch_appended_docs": 0, "epoch_new_pairs": 0})
                if stage == "clusters":
                    clusters = ds
        return {"clusters": clusters, "n_new_docs": 0, "n_new_pairs": 0}

    # new-doc id set and the block keys they touch: both O(|new shard|) —
    # bounded by the append size, never the corpus — broadcast once.
    # (At extreme append sizes swap these for semi-joins; the base-corpus
    # side is never driver-resident either way.)
    new_ids = np.sort(
        np.concatenate(
            [
                b["doc_id"].to_numpy(zero_copy_only=False)
                for b in new_feats.select_columns(["doc_id"]).iter_batches(
                    batch_size=1 << 20, batch_format="pyarrow"
                )
            ]
        ).astype(np.int64)
    )
    new_blocks = emit_block_keys(new_feats, cfg.minhash, cfg.blocking)
    touched_keys = np.unique(
        np.concatenate(
            [
                b["block_key"].to_numpy(zero_copy_only=False)
                for b in new_blocks.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
            ]
            or [np.empty(0, np.int64)]
        ).astype(np.int64)
    )
    ids_ref = _ray.put(new_ids)
    keys_ref = _ray.put(touched_keys)

    all_feats = old_feats.union(new_feats)

    def only_touched(t: pa.Table) -> pa.Table:
        ks = _ray.get(keys_ref)
        m = _in_sorted(t["block_key"].to_numpy(zero_copy_only=False).astype(np.int64), ks)
        return t.filter(pa.array(m))

    blocks_sel = emit_block_keys(all_feats, cfg.minhash, cfg.blocking).map_batches(
        only_touched, batch_format="pyarrow"
    )
    n_block_rows = n_new * (cfg.minhash.num_bands + 1)
    pairs = candidate_pairs(
        blocks_sel,
        cfg.blocking,
        num_partitions=adaptive_partitions(n_block_rows, cap=cfg.execution.join_num_partitions),
    )

    def only_new_pairs(t: pa.Table) -> pa.Table:
        ids = _ray.get(ids_ref)
        a = t["left_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["right_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _in_sorted(a, ids) | _in_sorted(b, ids)
        return t.filter(pa.array(m))

    new_pairs = pairs.map_batches(only_new_pairs, batch_format="pyarrow").materialize()
    n_new_pairs = new_pairs.count()
    new_scores = score_pairs(new_pairs, all_feats, model, cfg)
    # pin the unions BEFORE deriving edges/clusters: clustering consumes the
    # pinned handle (one scoring pass, not one per consumer), the checkpoint
    # writes below reuse the same pins, and the in-place mode overwrites the
    # very parquet dirs the lazy plan reads from.  (A production epoch writer
    # would instead stream each stage once into a fresh epoch directory via
    # out_workdir.)
    all_feats = all_feats.materialize()
    scores_all = old_scores.union(new_scores).materialize()

    edges = edges_from_scores(scores_all, cfg.clustering.min_edge_weight)
    clusters = cluster_labels(
        edges,
        all_feats.select_columns(["doc_id"]),
        cfg.clustering,
        num_partitions=cfg.execution.join_num_partitions,
    ).materialize()
    if out_workdir is None:
        out_workdir = workdir
    else:
        os.makedirs(out_workdir, exist_ok=True)
        import shutil

        for art in ("model.json", "vocab.json"):
            shutil.copyfile(os.path.join(workdir, art), os.path.join(out_workdir, art))
    for stage, ds in (("doc_features", all_feats), ("scores", scores_all), ("clusters", clusters)):
        ck = StageCheckpoint(out_workdir, stage)
        os.makedirs(ck.dir, exist_ok=True)
        ds = ck.write(ds, {"epoch_appended_docs": int(n_new), "epoch_new_pairs": int(n_new_pairs)})
        if stage == "clusters":
            clusters = ds

    return {"clusters": clusters, "n_new_docs": int(n_new), "n_new_pairs": int(n_new_pairs)}

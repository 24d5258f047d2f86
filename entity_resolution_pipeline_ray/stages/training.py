"""Match-classifier training: seeded split, mini-batch GD logistic regression
with balanced class weights, threshold sweep, metrics.

Reference analogs (/root/reference/src/batch_parallel_classification.py):
- seeded shuffle + 70/30 split :396-430 (seed /root/reference/config.yml:15, ratio :22)
- mini-batch GD trainer :456-536 (balanced class weights :470-483, L2, tol 1e-4)
- evaluation + threshold sweep :538-626
- weighted binary cross-entropy :983-1009

The labeled pair set is small (reference: ≈77.5k pairs) — training runs on the
driver over a NumPy matrix collected from the distributed featurizer, exactly
as the reference trains driver-side; the resulting model is broadcast to the
scorer actor pool.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import ClassifierConfig, ERConfig
from ..functions.hashing import doc_id_for_urls
from ..functions.similarity import sigmoid
from ..state.model import LRModel
from .scoring import FEATURE_NAMES, score_pairs, select_feature_names


def labeled_pair_ids(labeled_pairs: pa.Table) -> pa.Table:
    """(left_url, right_url, match) → (left_id, right_id, match) with canonical
    left_id < right_id ordering (ids are hashes, so re-canonicalize)."""
    li = doc_id_for_urls(labeled_pairs["left_url"].to_pylist())
    ri = doc_id_for_urls(labeled_pairs["right_url"].to_pylist())
    lo = np.minimum(li, ri)
    hi = np.maximum(li, ri)
    return pa.table(
        {
            "left_id": pa.array(lo, type=pa.int64()),
            "right_id": pa.array(hi, type=pa.int64()),
            "match": labeled_pairs["match"],
        }
    )


def features_for_labeled_pairs(labeled_pairs: pa.Table, doc_features_ds, cfg: ERConfig, *, payload_ref=None):
    """Run the distributed featurizer over the ground-truth pairs (no model) and
    collect (X, y) driver-side.  Same code path as production scoring —
    train/serve skew is structurally impossible."""
    import ray.data as rd

    ids = labeled_pair_ids(labeled_pairs)
    cap = getattr(cfg.classifier, "max_training_pairs", 0)
    if cap and ids.num_rows > cap:
        # seeded subsample: GD cost is linear in pairs and the model saturates
        # long before 10^5 pairs (reference trained on ~77.5k)
        rng = np.random.RandomState(cfg.classifier.random_seed)
        keep = np.sort(rng.choice(ids.num_rows, size=cap, replace=False))
        ids = ids.take(keep)
    # from_arrow yields ONE block; without splitting, the whole featurization
    # runs as a single task on one actor (map bundling is per input block)
    from ..rayops import adaptive_partitions

    pairs_ds = rd.from_arrow(ids.select(["left_id", "right_id"]))
    # ~5k pairs per task: the per-pair string DPs are the cost, so spread the
    # (at most max_training_pairs) rows wide — 25k-row partitions left a
    # 32-CPU session 4/32 busy and made training the overlap straggler
    nparts = adaptive_partitions(ids.num_rows, rows_per_partition=5_000)
    import ray as _r

    if int(_r.cluster_resources().get("CPU", 8)) > 1 and nparts > 1:
        # single-CPU sessions: repartition's full-CPU split tasks cannot
        # co-schedule with the pool's resident actor — and parallelism is moot.
        # materialize = barrier so the scorer pool (which reserves nearly all
        # CPUs) never shares an execution with the split tasks
        pairs_ds = pairs_ds.repartition(nparts).materialize()
    feats = score_pairs(pairs_ds, doc_features_ds, None, cfg, payload_ref=payload_ref)
    fdf = feats.to_pandas()
    # align labels by (left,right)
    ldf = ids.to_pandas()
    merged = fdf.merge(ldf, on=["left_id", "right_id"], how="inner")
    X = merged[["feat_" + f for f in FEATURE_NAMES]].to_numpy(dtype=np.float64)
    y = merged["match"].to_numpy(dtype=np.float64)
    return X, y, merged


def train_test_split(X: np.ndarray, y: np.ndarray, ratio: float, seed: int):
    """Seeded permutation split (reference :396-430)."""
    rng = np.random.RandomState(seed)
    idx = rng.permutation(len(y))
    n_train = int(len(y) * ratio)
    tr, te = idx[:n_train], idx[n_train:]
    return X[tr], y[tr], X[te], y[te]


def class_weights(y: np.ndarray) -> np.ndarray:
    """Inverse-frequency 'balanced' weights (reference :470-483)."""
    n = len(y)
    n_pos = max(1.0, float(y.sum()))
    n_neg = max(1.0, float(n - y.sum()))
    w_pos = n / (2.0 * n_pos)
    w_neg = n / (2.0 * n_neg)
    return np.where(y > 0.5, w_pos, w_neg)


def train_logistic(X: np.ndarray, y: np.ndarray, cfg: ClassifierConfig) -> tuple[np.ndarray, float]:
    """Mini-batch gradient descent with L2 and balanced weights (reference :456-536)."""
    rng = np.random.RandomState(cfg.random_seed)
    n, d = X.shape
    w = np.zeros(d, dtype=np.float64)
    b = 0.0
    sw = class_weights(y)
    for _ in range(cfg.max_iterations):
        order = rng.permutation(n)
        w_prev = w.copy()
        for start in range(0, n, cfg.batch_size):
            sel = order[start : start + cfg.batch_size]
            Xb, yb, swb = X[sel], y[sel], sw[sel]
            p = sigmoid(Xb @ w + b)
            g = (p - yb) * swb
            gw = Xb.T @ g / len(sel) + cfg.l2_lambda * w
            gb = float(g.mean())
            w -= cfg.learning_rate * gw
            b -= cfg.learning_rate * gb
        if np.abs(w - w_prev).max() < cfg.convergence_tolerance:
            break
    return w, b


def roc_auc(y: np.ndarray, p: np.ndarray) -> float:
    """Rank-based AUC (Mann-Whitney U), ties averaged — no sklearn needed.
    Tie runs are found vectorized (boundary flags + repeat), not by a Python
    scan: at 10^5+ test pairs the scan alone cost ~40 ms per call."""
    if len(p) == 0:
        return 0.5
    order = np.argsort(p, kind="mergesort")
    sp = p[order]
    n = len(sp)
    starts = np.flatnonzero(np.r_[True, sp[1:] != sp[:-1]])
    ends = np.r_[starts[1:], n]
    avg = (starts + ends - 1) / 2.0 + 1.0  # average 1-based rank per tie run
    ranks = np.empty(n, dtype=np.float64)
    ranks[order] = np.repeat(avg, ends - starts)
    n_pos = y.sum()
    n_neg = len(y) - n_pos
    if n_pos == 0 or n_neg == 0:
        return 0.5
    return float((ranks[y > 0.5].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))


def evaluate(y: np.ndarray, p: np.ndarray, threshold: float, *, auc: float | None = None) -> dict:
    """Precision/recall/F1/accuracy/AUC + confusion counts (reference :538-626).
    ``auc`` is threshold-independent — pass a precomputed value when sweeping
    thresholds over the same (y, p) so the ranking runs once, not per point."""
    pred = p >= threshold
    tp = int(((pred == 1) & (y > 0.5)).sum())
    fp = int(((pred == 1) & (y <= 0.5)).sum())
    fn = int(((pred == 0) & (y > 0.5)).sum())
    tn = int(((pred == 0) & (y <= 0.5)).sum())
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    acc = (tp + tn) / len(y) if len(y) else 0.0
    return {
        "precision": prec,
        "recall": rec,
        "f1": f1,
        "accuracy": acc,
        "auc": roc_auc(y, p) if auc is None else auc,
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "tn": tn,
        "threshold": threshold,
    }


def confidence_histogram(y: np.ndarray, p: np.ndarray, threshold: float, bins: int = 20) -> dict:
    """Binned confidence-of-the-predicted-class split by correctness — the
    data behind the reference's confidence_by_correctness figure
    (/root/reference/src/reporting.py:1075-1091) without retaining per-pair rows."""
    pred = p >= threshold
    conf = np.where(pred, p, 1.0 - p)
    correct = pred == (y > 0.5)
    edges = np.linspace(0.0, 1.0, bins + 1)
    hc, _ = np.histogram(conf[correct], bins=edges)
    hi, _ = np.histogram(conf[~correct], bins=edges)
    return {
        "bin_edges": [round(float(e), 4) for e in edges[:-1]],
        "correct": hc.astype(int).tolist(),
        "incorrect": hi.astype(int).tolist(),
    }


def feature_separation(X: np.ndarray, y: np.ndarray, names: list[str]) -> dict[str, float]:
    """|mean_match - mean_non_match| / pooled std per feature — the reference's
    separation-power ranking (/root/reference/src/reporting.py:404-435)."""
    pos, neg = X[y > 0.5], X[y <= 0.5]
    if not len(pos) or not len(neg):
        return {n: 0.0 for n in names}
    pooled = (pos.std(axis=0) + neg.std(axis=0)) / 2.0
    sep = np.abs(pos.mean(axis=0) - neg.mean(axis=0)) / np.where(pooled < 1e-12, 1.0, pooled)
    return {n: round(float(s), 6) for n, s in zip(names, sep)}


def threshold_sweep(y: np.ndarray, p: np.ndarray, thresholds=None) -> dict:
    """Pick the F1-best threshold over 0.1..0.9 (reference :577-617)."""
    thresholds = thresholds if thresholds is not None else [round(0.1 * k, 1) for k in range(1, 10)]
    auc = roc_auc(y, p)  # threshold-independent: rank once for the whole sweep
    best = None
    for t in thresholds:
        m = evaluate(y, p, t, auc=auc)
        if best is None or m["f1"] > best["f1"]:
            best = m
    return best


def _rfe_elimination_order(X: np.ndarray, y: np.ndarray, ccfg: ClassifierConfig, step: int) -> list[int]:
    """Recursive feature elimination: repeatedly fit, drop the ``step`` weakest
    features by |weight|.  Returns column indices weakest-first."""
    active = list(range(X.shape[1]))
    order: list[int] = []
    while len(active) > 1:
        w, _ = train_logistic(X[:, active], y, ccfg)
        k = min(step, len(active) - 1)
        weakest = np.argsort(np.abs(w), kind="mergesort")[:k]
        for j in sorted(weakest, reverse=True):
            order.append(active.pop(int(j)))
    order.append(active[0])
    return order


def rfecv_select(
    X: np.ndarray,
    y: np.ndarray,
    ccfg: ClassifierConfig,
    *,
    step: int = 1,
    cv_folds: int = 3,
    max_rows: int = 10_000,
) -> list[int]:
    """Recursive feature elimination with cross-validation, from scratch
    (reference analog: sklearn RFECV at
    /root/reference/src/batch_parallel_feature_engineering.py:969-1048, step/cv/f1
    from config).  Per fold: rank features by RFE on the train split, score
    validation F1 at every kept-feature count; the count with the best mean CV
    F1 wins, and the final feature set is the strongest-k from an RFE ranking
    on all rows.  Returns selected column indices (ascending)."""
    rng = np.random.RandomState(ccfg.random_seed)
    if len(y) > max_rows:
        keep = rng.choice(len(y), size=max_rows, replace=False)
        X, y = X[keep], y[keep]
    d = X.shape[1]
    folds = np.arange(len(y)) % cv_folds
    folds = folds[rng.permutation(len(y))]
    scores = np.zeros(d + 1, dtype=np.float64)  # scores[k] = mean CV F1 with k features
    for f in range(cv_folds):
        tr, va = folds != f, folds == f
        order = _rfe_elimination_order(X[tr], y[tr], ccfg, step)
        for k in range(1, d + 1):
            cols = sorted(order[d - k :])  # strongest k
            w, b = train_logistic(X[tr][:, cols], y[tr], ccfg)
            p = sigmoid(X[va][:, cols] @ w + b)
            scores[k] += evaluate(y[va], p, ccfg.decision_threshold)["f1"]
    scores /= cv_folds
    best_k = int(np.argmax(scores[1:]) + 1)  # ties → fewest features
    final_order = _rfe_elimination_order(X, y, ccfg, step)
    return sorted(final_order[d - best_k :])


def train_matcher(labeled_pairs: pa.Table, doc_features_ds, cfg: ERConfig, *, payload_ref=None) -> LRModel:
    """End-to-end: featurize ground truth → config feature selection → seeded
    split → (optional) scaler fit on train → GD train → threshold sweep."""
    ccfg = cfg.classifier
    fcfg = getattr(cfg, "features", None)
    selected = select_feature_names(fcfg)
    sel_idx = [FEATURE_NAMES.index(n) for n in selected]
    X_full, y, _ = features_for_labeled_pairs(labeled_pairs, doc_features_ds, cfg, payload_ref=payload_ref)
    X = X_full[:, sel_idx]
    Xtr, ytr, Xte, yte = train_test_split(X, y, ccfg.train_ratio, ccfg.random_seed)
    if fcfg is not None and getattr(fcfg, "rfecv", False):
        # G4: narrow the config-selected set by CV'd recursive elimination
        # (fit on the TRAIN split only — the test split stays untouched)
        rfe_cols = rfecv_select(Xtr, ytr, ccfg, step=fcfg.rfe_step, cv_folds=fcfg.rfe_cv_folds)
        selected = [selected[i] for i in rfe_cols]
        sel_idx = [FEATURE_NAMES.index(n) for n in selected]
        X = X_full[:, sel_idx]
        Xtr, ytr, Xte, yte = train_test_split(X, y, ccfg.train_ratio, ccfg.random_seed)
    mean = std = None
    if fcfg is not None and fcfg.standardize:
        mean = Xtr.mean(axis=0)
        std = Xtr.std(axis=0)
        std = np.where(std < 1e-12, 1.0, std)
        Xtr = (Xtr - mean) / std
        Xte_t = (Xte - mean) / std
    else:
        Xte_t = Xte
    w, b = train_logistic(Xtr, ytr, ccfg)
    p_te = sigmoid(Xte_t @ w + b)
    best = threshold_sweep(yte, p_te)
    sweep_ts = [round(0.1 * k, 1) for k in range(1, 10)]
    metrics = {
        "test": best,
        # full P/R/F1 curve behind the F1-best pick (figure input; O(9 x n));
        # the curve keeps no AUC, so skip the ranking entirely (auc=best's)
        "threshold_curve": [
            {k: m[k] for k in ("threshold", "precision", "recall", "f1")}
            for m in (evaluate(yte, p_te, t, auc=best["auc"]) for t in sweep_ts)
        ],
        "train_rows": int(len(ytr)),
        "test_rows": int(len(yte)),
        # figure inputs (pipelines/figures.py) — both O(n_features)/O(bins)
        # summaries of the splits, NOT per-pair retention
        "test_confidence_hist": confidence_histogram(yte, p_te, best["threshold"]),
        "feature_separation": feature_separation(Xtr, ytr, selected),
    }
    return LRModel(
        feature_names=selected,
        weights=w,
        bias=b,
        threshold=best["threshold"],
        metrics=metrics,
        scaler_mean=mean,
        scaler_std=std,
    )

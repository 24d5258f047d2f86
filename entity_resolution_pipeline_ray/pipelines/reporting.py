"""Reporting aggregates and report sinks.

Reference analogs (/root/reference/src/reporting.py and
/root/reference/src/batch_parallel_classification.py):
- cluster statistics: sizes mean/median/min/max/std + bucketed histogram +
  top-k clusters (/root/reference/src/reporting.py:1148-1222)
- feature statistics grouped by match label
  (/root/reference/src/batch_parallel_feature_engineering.py:1116-1181)
- feature importance (/root/reference/src/batch_parallel_classification.py:1011-1042)
- md/json report sinks (/root/reference/src/reporting.py:72-166,
  /root/reference/src/batch_parallel_classification.py:628-754)

The wide parts (cluster sizes, histograms) run as Ray aggregates; only the
tiny final tables come to the driver.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.clustering import cluster_sizes

_HIST_BUCKETS = [1, 2, 3, 5, 10, 20, 50, 100]


def cluster_report(clusters_ds) -> dict:
    """Distributed cluster statistics: count/mean/std/min/max via Ray
    aggregates over the sizes table; histogram via vectorized partials;
    top-10 via sort+limit (O2)."""
    from ray.data.aggregate import Count, Max, Mean, Min, Std

    sizes = cluster_sizes(clusters_ds).materialize()
    agg = sizes.aggregate(
        Count(alias_name="n_clusters"),
        Mean("cluster_size", alias_name="mean_size"),
        Min("cluster_size", alias_name="min_size"),
        Max("cluster_size", alias_name="max_size"),
        Std("cluster_size", ddof=0, alias_name="std_size"),
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        s = t["cluster_size"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(_HIST_BUCKETS, s, side="right")
        counts = np.bincount(idx, minlength=len(_HIST_BUCKETS) + 1).astype(np.int64)
        return pa.table({"bucket": np.arange(len(counts), dtype=np.int64), "n": counts})

    hp = sizes.map_batches(hist_partial, batch_format="pyarrow").to_pandas()
    hist = hp.groupby("bucket")["n"].sum()
    labels = [f"<={b}" for b in _HIST_BUCKETS] + [f">{_HIST_BUCKETS[-1]}"]
    histogram = {labels[i]: int(hist.get(i, 0)) for i in range(len(labels))}

    top = sizes.sort(["cluster_size", "cluster_id"], descending=[True, False]).limit(10).to_pandas()
    n_docs = int(clusters_ds.count())
    return {
        "n_docs": n_docs,
        "n_clusters": int(agg["n_clusters"]),
        "mean_size": float(agg["mean_size"]),
        "min_size": int(agg["min_size"]),
        "max_size": int(agg["max_size"]),
        "std_size": float(agg["std_size"]),
        "size_histogram": histogram,
        "top_clusters": [
            {"cluster_id": int(r.cluster_id), "size": int(r.cluster_size)} for r in top.itertuples()
        ],
    }


def feature_stats_by_label(labeled_features: pd.DataFrame) -> pd.DataFrame:
    """Per-feature mean/median/min/max/std × {overall, match, non_match}
    (reference :1116-1181).  Input: the merged frame from
    training.features_for_labeled_pairs (feat_* columns + ``match``)."""
    feat_cols = [c for c in labeled_features.columns if c.startswith("feat_")]
    rows = []
    groups = {
        "overall": labeled_features,
        "match": labeled_features[labeled_features["match"]],
        "non_match": labeled_features[~labeled_features["match"].astype(bool)],
    }
    for gname, g in groups.items():
        for c in feat_cols:
            v = g[c].to_numpy(dtype=np.float64)
            rows.append(
                {
                    "feature": c[5:],
                    "group": gname,
                    "mean": float(v.mean()) if len(v) else 0.0,
                    "median": float(np.median(v)) if len(v) else 0.0,
                    "min": float(v.min()) if len(v) else 0.0,
                    "max": float(v.max()) if len(v) else 0.0,
                    "std": float(v.std()) if len(v) else 0.0,
                }
            )
    return pd.DataFrame(rows)


def er_report(res: dict, pairwise_metrics: dict | None = None) -> dict:
    """Full run report: model metrics + importance + cluster stats."""
    model = res["model"]
    rep = {
        "model": {
            "feature_names": model.feature_names,
            "threshold": model.threshold,
            "metrics": model.metrics,
            "feature_importance": model.feature_importance(),
            "weights": {n: float(w) for n, w in zip(model.feature_names, model.weights)},
        },
        "clusters": cluster_report(res["clusters"]),
    }
    if pairwise_metrics:
        rep["pairwise_vs_gold"] = pairwise_metrics
    return rep


def render_markdown(report: dict) -> str:
    """Human-facing md report (reference md sinks, /root/reference/src/reporting.py:72-166)."""
    lines = ["# Entity Resolution Run Report", ""]
    t = report["model"]["metrics"].get("test", {})
    lines += [
        "## Classification",
        f"- precision: {t.get('precision', 0):.4f}",
        f"- recall: {t.get('recall', 0):.4f}",
        f"- f1: {t.get('f1', 0):.4f}",
        f"- auc: {t.get('auc', 0):.4f}",
        f"- decision threshold: {report['model']['threshold']}",
        "",
        "## Feature importance (top 5)",
    ]
    for name, v in list(report["model"]["feature_importance"].items())[:5]:
        lines.append(f"- {name}: {v:.3f}")
    c = report["clusters"]
    lines += [
        "",
        "## Clusters",
        f"- docs: {c['n_docs']}, clusters: {c['n_clusters']}",
        f"- size mean {c['mean_size']:.2f} / min {c['min_size']} / max {c['max_size']} / std {c['std_size']:.2f}",
        f"- histogram: {c['size_histogram']}",
    ]
    if "pairwise_vs_gold" in report:
        p = report["pairwise_vs_gold"]
        lines += ["", "## Pairwise vs gold", f"- precision {p['precision']:.4f} recall {p['recall']:.4f} f1 {p['f1']:.4f}"]
    return "\n".join(lines) + "\n"


def save_report(report: dict, json_path: str, md_path: str | None = None, figures_dir: str | None = None) -> list[str]:
    """json + optional md + optional SVG figures dir (reference's reports/ +
    figures/ layout, /root/reference/src/reporting.py:56-108).  Returns the
    list of figure paths written (empty when figures_dir is None)."""
    with open(json_path, "w") as f:
        json.dump(report, f, indent=1)
    if md_path:
        with open(md_path, "w") as f:
            f.write(render_markdown(report))
    if figures_dir:
        from .figures import save_figures

        return save_figures(report, figures_dir)
    return []

"""SVG report figures (S7 parity with /root/reference/src/reporting.py's
matplotlib figures) — pure-unit, no Ray."""

import numpy as np

from entity_resolution_pipeline_ray.pipelines.figures import (
    barh_svg,
    confusion_svg,
    grouped_hist_svg,
    save_figures,
    vbar_svg,
)
from entity_resolution_pipeline_ray.stages.training import (
    confidence_histogram,
    feature_separation,
)


def _is_svg(s: str) -> bool:
    return s.startswith("<svg") and s.rstrip().endswith("</svg>")


def test_barh_plain_and_diverging():
    svg = barh_svg([("cosine_tfidf", 0.41), ("jw_title", 0.09)], "Top features")
    assert _is_svg(svg) and "cosine_tfidf" in svg and "0.410" in svg
    d = barh_svg([("a", 1.5), ("b", -0.7)], "Signed", diverging=True)
    assert _is_svg(d) and "#e34948" in d  # negative bar painted red
    # escaping: labels with <&> must not break the XML
    e = barh_svg([("a<&>b", 0.5)], "Esc")
    assert "a&lt;&amp;&gt;b" in e and "<&>" not in e.replace("a&lt;&amp;&gt;b", "")


def test_confusion_and_hist_and_vbar():
    c = confusion_svg(tn=900, fp=3, fn=7, tp=90)
    assert _is_svg(c) and "900" in c and "Predicted" in c
    # zero cell uses the lightest ramp step, max cell a dark one
    assert "#cde2fb" in confusion_svg(0, 0, 0, 5)

    h = grouped_hist_svg(
        [0.0, 0.25, 0.5, 0.75],
        {"correct": [1, 2, 3, 10], "incorrect": [0, 1, 0, 2]},
        "Confidence",
    )
    assert _is_svg(h) and "correct" in h and "incorrect" in h

    v = vbar_svg(["1", "2", "3+"], [10, 5, 2], "Cluster sizes")
    assert _is_svg(v) and "10" in v


def test_confidence_histogram_and_separation():
    y = np.array([1.0, 1.0, 0.0, 0.0])
    p = np.array([0.9, 0.4, 0.1, 0.8])
    ch = confidence_histogram(y, p, threshold=0.5, bins=10)
    assert len(ch["bin_edges"]) == 10
    assert sum(ch["correct"]) == 2 and sum(ch["incorrect"]) == 2
    # all confidences are of-the-predicted-class, i.e. >= 0 and <= 1
    X = np.array([[0.0, 5.0], [0.2, 5.1], [1.0, 4.9], [1.1, 5.0]])
    sep = feature_separation(X, y, ["f1", "const"])
    assert sep["f1"] > sep["const"]  # f1 separates the classes, const doesn't
    assert feature_separation(X, np.ones(4), ["f1", "const"]) == {"f1": 0.0, "const": 0.0}


def test_save_figures_partial_report(tmp_path):
    # a report with only cluster data yields only the cluster figure
    rep = {"clusters": {"size_histogram": {"1": 4, "2": 2}}}
    out = save_figures(rep, str(tmp_path / "figs"))
    assert [p.split("/")[-1] for p in out] == ["cluster_sizes.svg"]
    # empty report: no figures, no crash
    assert save_figures({}, str(tmp_path / "figs2")) == []


def test_line_svg_and_threshold_sweep_figure(tmp_path):
    from entity_resolution_pipeline_ray.pipelines.figures import line_svg

    xs = [0.1, 0.5, 0.9]
    svg = line_svg(xs, {"precision": [0.5, 0.9, 1.0], "recall": [1.0, 0.9, 0.4], "f1": [0.66, 0.9, 0.57]},
                   "Sweep", x_label="threshold")
    assert _is_svg(svg) and "precision" in svg and "polyline" in svg and "threshold" in svg
    rep = {"model": {"metrics": {"threshold_curve": [
        {"threshold": 0.1, "precision": 0.5, "recall": 1.0, "f1": 0.66},
        {"threshold": 0.9, "precision": 1.0, "recall": 0.4, "f1": 0.57},
    ]}}}
    out = save_figures(rep, str(tmp_path / "figs"))
    assert [p.split("/")[-1] for p in out] == ["threshold_sweep.svg"]

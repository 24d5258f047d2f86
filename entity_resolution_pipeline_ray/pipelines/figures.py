"""Report figures as dependency-free SVG.

Reference analog: the matplotlib/seaborn PNG figures of
/root/reference/src/reporting.py — feature importance bars (:800-843),
test confusion matrix + confidence-by-correctness histogram (:1050-1091),
feature separation power (:404-435) and cluster-size distribution.  This
container has no matplotlib, so the same figures are emitted as static SVG
written next to the json/md report sinks.  Everything is derived from the
report dict (pipelines/reporting.er_report) — no Dataset is touched here.

Visual spec: single-hue bars for magnitude, blue/red for signed weights,
a one-hue sequential ramp for the confusion heatmap, and a two-series
(correct/incorrect) histogram with a legend; values are direct-labeled and
text never wears the series color.
"""

from __future__ import annotations

import os
from xml.sax.saxutils import escape

# Validated reference palette (light mode): categorical slots 1-2, the
# blue<->red diverging pair, and the blue sequential ramp.
BLUE = "#2a78d6"
ORANGE = "#eb6834"
RED = "#e34948"
SEQ_RAMP = ["#cde2fb", "#9ec5f4", "#6da7ec", "#3987e5", "#256abf", "#184f95", "#0d366b"]
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK2 = "#52514e"
MUTED = "#898781"
GRID = "#e1e0d9"
AXIS = "#c3c2b7"
FONT = 'font-family="system-ui, -apple-system, Segoe UI, sans-serif"'


def _doc(w: int, h: int, body: list[str]) -> str:
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" height="{h}" '
        f'viewBox="0 0 {w} {h}" {FONT}>\n'
        f'<rect width="{w}" height="{h}" fill="{SURFACE}"/>\n' + "\n".join(body) + "\n</svg>\n"
    )


def _text(x: float, y: float, s: str, *, size: int = 11, fill: str = INK2, anchor: str = "start", weight: str = "normal") -> str:
    return (
        f'<text x="{x:.1f}" y="{y:.1f}" font-size="{size}" fill="{fill}" '
        f'text-anchor="{anchor}" font-weight="{weight}">{escape(str(s))}</text>'
    )


def _round_end_bar(x: float, y: float, w: float, h: float, fill: str, *, direction: str = "right") -> str:
    """Bar with a 4px-rounded DATA end and a square baseline end."""
    r = min(4.0, abs(w) / 2 if direction in ("right", "left") else abs(h) / 2, h / 2 if direction in ("right", "left") else abs(w) / 2)
    if direction == "right":
        d = (f"M{x:.1f},{y:.1f} H{x + w - r:.1f} Q{x + w:.1f},{y:.1f} {x + w:.1f},{y + r:.1f} "
             f"V{y + h - r:.1f} Q{x + w:.1f},{y + h:.1f} {x + w - r:.1f},{y + h:.1f} H{x:.1f} Z")
    elif direction == "left":
        d = (f"M{x:.1f},{y:.1f} H{x - w + r:.1f} Q{x - w:.1f},{y:.1f} {x - w:.1f},{y + r:.1f} "
             f"V{y + h - r:.1f} Q{x - w:.1f},{y + h:.1f} {x - w + r:.1f},{y + h:.1f} H{x:.1f} Z")
    else:  # up: (x, y)=baseline-left, w=bar width, h=bar height upward
        d = (f"M{x:.1f},{y:.1f} V{y - h + r:.1f} Q{x:.1f},{y - h:.1f} {x + r:.1f},{y - h:.1f} "
             f"H{x + w - r:.1f} Q{x + w:.1f},{y - h:.1f} {x + w:.1f},{y - h + r:.1f} V{y:.1f} Z")
    return f'<path d="{d}" fill="{fill}"/>'


def _x_ticks(lo: float, hi: float, n: int = 4) -> list[float]:
    if hi <= lo:
        hi = lo + 1.0
    import math

    raw = (hi - lo) / n
    mag = 10 ** math.floor(math.log10(raw))
    step = min(s * mag for s in (1, 2, 2.5, 5, 10) if s * mag >= raw)
    first = math.ceil(lo / step) * step
    out, v = [], first
    while v <= hi + 1e-12:
        out.append(round(v, 10))
        v += step
    return out


def barh_svg(items: list[tuple[str, float]], title: str, *, diverging: bool = False, value_fmt: str = "{:.3f}") -> str:
    """Horizontal bars, one row per item (top-N pre-sliced by the caller).
    diverging=True paints >=0 blue / <0 red with the baseline at zero."""
    label_w = min(220, max(90, 12 + 7 * max((len(l) for l, _ in items), default=6)))
    row_h, bar_h, top, right = 24, 14, 44, 56
    w = 640
    h = top + row_h * len(items) + 28
    vals = [v for _, v in items]
    lo = min(0.0, min(vals, default=0.0))
    hi = max(0.0, max(vals, default=1.0))
    span = (hi - lo) or 1.0
    plot_w = w - label_w - right

    def sx(v: float) -> float:
        return label_w + (v - lo) / span * plot_w

    body = [_text(16, 24, title, size=14, fill=INK, weight="600")]
    for t in _x_ticks(lo, hi):
        body.append(f'<line x1="{sx(t):.1f}" y1="{top - 6}" x2="{sx(t):.1f}" y2="{h - 24}" stroke="{GRID}" stroke-width="1"/>')
        body.append(_text(sx(t), h - 10, f"{t:g}", size=10, fill=MUTED, anchor="middle"))
    x0 = sx(0.0)
    body.append(f'<line x1="{x0:.1f}" y1="{top - 6}" x2="{x0:.1f}" y2="{h - 24}" stroke="{AXIS}" stroke-width="1"/>')
    for i, (label, v) in enumerate(items):
        y = top + i * row_h + (row_h - bar_h) / 2
        body.append(_text(label_w - 8, y + bar_h - 3, label, size=11, fill=INK2, anchor="end"))
        color = (RED if (diverging and v < 0) else BLUE)
        bw = abs(sx(v) - x0)
        if bw > 0.5:
            body.append(_round_end_bar(x0 if v >= 0 else x0, y, bw, bar_h, color, direction="right" if v >= 0 else "left"))
        vx = (sx(v) + 5) if v >= 0 else (sx(v) - 5)
        body.append(_text(vx, y + bar_h - 3, value_fmt.format(v), size=10, fill=INK2, anchor="start" if v >= 0 else "end"))
    return _doc(w, h, body)


def confusion_svg(tn: int, fp: int, fn: int, tp: int, title: str = "Test confusion matrix") -> str:
    """2x2 heatmap on the one-hue sequential ramp; counts direct-labeled."""
    cells = [[tn, fp], [fn, tp]]  # rows: true non-match / match; cols: predicted
    mx = max(tn, fp, fn, tp, 1)
    w, h, cell, left, top = 430, 330, 120, 150, 70
    body = [_text(16, 24, title, size=14, fill=INK, weight="600")]
    body.append(_text(left + cell, top - 40, "Predicted", size=11, fill=MUTED, anchor="middle"))
    for j, lab in enumerate(["Non-Match", "Match"]):
        body.append(_text(left + cell * j + cell / 2, top - 16, lab, size=11, fill=INK2, anchor="middle"))
    body.append(f'<text x="22" y="{top + cell}" font-size="11" fill="{MUTED}" text-anchor="middle" '
                f'transform="rotate(-90 22 {top + cell})">True</text>')
    for i, lab in enumerate(["Non-Match", "Match"]):
        body.append(_text(left - 10, top + cell * i + cell / 2 + 4, lab, size=11, fill=INK2, anchor="end"))
    for i in range(2):
        for j in range(2):
            v = cells[i][j]
            step = 0 if v == 0 else min(len(SEQ_RAMP) - 1, 1 + int(round((v / mx) * (len(SEQ_RAMP) - 2))))
            fill = SEQ_RAMP[step]
            x, y = left + j * cell, top + i * cell
            body.append(f'<rect x="{x + 1}" y="{y + 1}" width="{cell - 2}" height="{cell - 2}" fill="{fill}" rx="4"/>')
            ink = "#ffffff" if step >= 3 else INK
            body.append(_text(x + cell / 2, y + cell / 2 + 5, f"{v:,}", size=15, fill=ink, anchor="middle", weight="600"))
    return _doc(w, h, body)


def grouped_hist_svg(bin_edges: list[float], series: dict[str, list[int]], title: str, colors: tuple[str, str] = (BLUE, ORANGE)) -> str:
    """Two-series grouped histogram (e.g. confidence by correctness) with a
    legend; bars rounded at the data (top) end, 2px gaps everywhere."""
    names = list(series)
    assert len(names) == 2, "grouped_hist_svg draws exactly two series"
    a, b = (list(series[n]) for n in names)
    nbins = len(a)
    w, h, left, top, bottom = 640, 300, 56, 52, 36
    plot_w, plot_h = w - left - 20, h - top - bottom
    mx = max(max(a, default=0), max(b, default=0), 1)
    slot = plot_w / max(nbins, 1)
    bw = max(2.0, (slot - 6) / 2)
    body = [_text(16, 24, title, size=14, fill=INK, weight="600")]
    for n, c, dx in ((names[0], colors[0], 0), (names[1], colors[1], 110)):
        body.append(f'<rect x="{w - 250 + dx}" y="14" width="10" height="10" rx="2" fill="{c}"/>')
        body.append(_text(w - 236 + dx, 23, n, size=11, fill=INK2))
    for t in _x_ticks(0, mx):
        y = top + plot_h - (t / mx) * plot_h
        body.append(f'<line x1="{left}" y1="{y:.1f}" x2="{w - 20}" y2="{y:.1f}" stroke="{GRID}" stroke-width="1"/>')
        body.append(_text(left - 6, y + 3, f"{t:g}", size=10, fill=MUTED, anchor="end"))
    base = top + plot_h
    body.append(f'<line x1="{left}" y1="{base}" x2="{w - 20}" y2="{base}" stroke="{AXIS}" stroke-width="1"/>')
    for i in range(nbins):
        x = left + i * slot + 2
        for v, c, off in ((a[i], colors[0], 0.0), (b[i], colors[1], bw + 2)):
            bh = (v / mx) * plot_h
            if bh > 0.5:
                body.append(_round_end_bar(x + off, base, bw, bh, c, direction="up"))
        if nbins <= 10 or i % max(1, nbins // 10) == 0:
            body.append(_text(x + bw, base + 14, f"{bin_edges[i]:g}", size=10, fill=MUTED, anchor="middle"))
    return _doc(w, h, body)


def vbar_svg(labels: list[str], values: list[int], title: str) -> str:
    """Single-series vertical bars (cluster-size histogram)."""
    n = len(labels)
    w, h, left, top, bottom = 640, 300, 56, 44, 40
    plot_w, plot_h = w - left - 20, h - top - bottom
    mx = max(values, default=0) or 1
    slot = plot_w / max(n, 1)
    bw = max(3.0, slot - 10)
    body = [_text(16, 24, title, size=14, fill=INK, weight="600")]
    for t in _x_ticks(0, mx):
        y = top + plot_h - (t / mx) * plot_h
        body.append(f'<line x1="{left}" y1="{y:.1f}" x2="{w - 20}" y2="{y:.1f}" stroke="{GRID}" stroke-width="1"/>')
        body.append(_text(left - 6, y + 3, f"{t:g}", size=10, fill=MUTED, anchor="end"))
    base = top + plot_h
    body.append(f'<line x1="{left}" y1="{base}" x2="{w - 20}" y2="{base}" stroke="{AXIS}" stroke-width="1"/>')
    for i, (lab, v) in enumerate(zip(labels, values)):
        x = left + i * slot + (slot - bw) / 2
        bh = (v / mx) * plot_h
        if bh > 0.5:
            body.append(_round_end_bar(x, base, bw, bh, BLUE, direction="up"))
        body.append(_text(x + bw / 2, base - bh - 5, f"{v:,}", size=10, fill=INK2, anchor="middle"))
        body.append(_text(x + bw / 2, base + 15, lab, size=10, fill=MUTED, anchor="middle"))
    return _doc(w, h, body)


LINE_COLORS = [BLUE, ORANGE, "#1baf7a"]  # categorical slots 1-3 (all-pairs safe)


def line_svg(x_vals: list[float], series: dict[str, list[float]], title: str, *, x_label: str = "") -> str:
    """Up to three 2px lines with 8px point markers, legend + direct end
    labels (threshold sweep; reference :1429-1466)."""
    names = list(series)
    assert 1 <= len(names) <= 3, "line_svg draws one to three series"
    w, h, left, top, bottom, right = 640, 300, 56, 52, 40, 96
    plot_w, plot_h = w - left - right, h - top - bottom
    lo_x, hi_x = min(x_vals), max(x_vals)
    span_x = (hi_x - lo_x) or 1.0
    all_v = [v for vs in series.values() for v in vs]
    lo_y, hi_y = min(0.0, min(all_v, default=0.0)), max(1e-9, max(all_v, default=1.0))
    span_y = (hi_y - lo_y) or 1.0

    def sx(x: float) -> float:
        return left + (x - lo_x) / span_x * plot_w

    def sy(v: float) -> float:
        return top + plot_h - (v - lo_y) / span_y * plot_h

    body = [_text(16, 24, title, size=14, fill=INK, weight="600")]
    for i, n in enumerate(names):
        body.append(f'<rect x="{w - 250 + i * 90}" y="14" width="10" height="10" rx="2" fill="{LINE_COLORS[i]}"/>')
        body.append(_text(w - 236 + i * 90, 23, n, size=11, fill=INK2))
    for t in _x_ticks(lo_y, hi_y):
        body.append(f'<line x1="{left}" y1="{sy(t):.1f}" x2="{w - right}" y2="{sy(t):.1f}" stroke="{GRID}" stroke-width="1"/>')
        body.append(_text(left - 6, sy(t) + 3, f"{t:g}", size=10, fill=MUTED, anchor="end"))
    base = top + plot_h
    body.append(f'<line x1="{left}" y1="{base}" x2="{w - right}" y2="{base}" stroke="{AXIS}" stroke-width="1"/>')
    for t in _x_ticks(lo_x, hi_x):
        body.append(_text(sx(t), base + 14, f"{t:g}", size=10, fill=MUTED, anchor="middle"))
    if x_label:
        body.append(_text(left + plot_w / 2, h - 6, x_label, size=11, fill=MUTED, anchor="middle"))
    for i, n in enumerate(names):
        c = LINE_COLORS[i]
        pts = " ".join(f"{sx(x):.1f},{sy(v):.1f}" for x, v in zip(x_vals, series[n]))
        body.append(f'<polyline points="{pts}" fill="none" stroke="{c}" stroke-width="2" stroke-linejoin="round"/>')
        for x, v in zip(x_vals, series[n]):
            body.append(
                f'<circle cx="{sx(x):.1f}" cy="{sy(v):.1f}" r="4" fill="{c}" stroke="{SURFACE}" stroke-width="2">'
                f"<title>{escape(n)} @ {x:g}: {v:.4f}</title></circle>"
            )
        body.append(_text(sx(x_vals[-1]) + 8, sy(series[n][-1]) + 4, n, size=10, fill=INK2))
    return _doc(w, h, body)


def save_figures(report: dict, figures_dir: str) -> list[str]:
    """Write every figure derivable from an ``er_report`` dict; returns paths.
    Mirrors the reference's figures/ directory (src/reporting.py:56-108)."""
    os.makedirs(figures_dir, exist_ok=True)
    out: list[str] = []

    def put(name: str, svg: str) -> None:
        p = os.path.join(figures_dir, name)
        with open(p, "w") as f:
            f.write(svg)
        out.append(p)

    model = report.get("model", {})
    imp = list(model.get("feature_importance", {}).items())[:15]
    if imp:
        put("feature_importance.svg", barh_svg(imp, "Top features by importance"))
    weights = list(model.get("weights", {}).items())
    if weights:
        weights.sort(key=lambda kv: -abs(kv[1]))
        put("feature_weights.svg", barh_svg(weights[:15], "Top features by signed weight", diverging=True))
    sep = list(model.get("metrics", {}).get("feature_separation", {}).items())
    if sep:
        sep.sort(key=lambda kv: -kv[1])
        put("feature_separation.svg", barh_svg(sep[:15], "Feature separation power (train split)"))
    t = model.get("metrics", {}).get("test", {})
    if {"tp", "fp", "fn", "tn"} <= set(t):
        put("test_confusion_matrix.svg", confusion_svg(t["tn"], t["fp"], t["fn"], t["tp"]))
    ch = model.get("metrics", {}).get("test_confidence_hist")
    if ch:
        put(
            "confidence_by_correctness.svg",
            grouped_hist_svg(ch["bin_edges"], {"correct": ch["correct"], "incorrect": ch["incorrect"]},
                             "Confidence distribution by prediction correctness"),
        )
    curve = model.get("metrics", {}).get("threshold_curve")
    if curve:
        put(
            "threshold_sweep.svg",
            line_svg(
                [m["threshold"] for m in curve],
                {k: [m[k] for m in curve] for k in ("precision", "recall", "f1")},
                "Decision-threshold sweep (test split)",
                x_label="threshold",
            ),
        )
    c = report.get("clusters", {})
    hist = c.get("size_histogram")
    if hist:
        put("cluster_sizes.svg", vbar_svg(list(hist.keys()), list(hist.values()), "Cluster-size distribution"))
    return out

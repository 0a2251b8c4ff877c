"""SVG accuracy plots from ACCURACY.json — the reference's plot harness
(/root/reference/examples/accuracy.rs:67-384 draws error-vs-quantile and
error-vs-memory charts with plotters) re-expressed as a dependency-free
SVG writer over the same experiment grid tools/accuracy_report.py runs.

    python tools/accuracy_plots.py          # writes plots/*.svg

Per distribution: mean relative value error vs quantile and mean absolute
rank error vs quantile, one line per sketch config (log-y); plus one
error-vs-memory chart (log-log) across configs. ACCURACY.json is the
data-table companion for every figure.

Chart conventions: categorical series colors assigned in fixed slot
order (validated palette — adjacent-pair CVD ΔE ≥ 8, see repo docs),
text in ink colors never series colors, recessive grid, legend for
multi-series plus a direct label on the worst series, thin 2px lines.
"""

from __future__ import annotations

import json
import math
import os
from html import escape

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(ROOT, "plots")

# validated categorical palette (fixed slot order, never cycled)
SERIES = [
    "#2a78d6", "#eb6834", "#1baf7a", "#eda100",
    "#e87ba4", "#008300", "#4a3aa7", "#e34948",
]
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK_2 = "#52514e"
GRID = "#e4e3df"

W, H = 880, 520
ML, MR, MT, MB = 76, 220, 56, 64  # right margin holds the legend


def _fmt_q(q: float) -> str:
    if q >= 0.01:
        return f"{q:g}"
    return f"1e{int(round(math.log10(q)))}"


def _fmt_pow10(e: int) -> str:
    return f"1e{e}" if e < -1 or e > 3 else f"{10.0 ** e:g}"


def _fmt_bytes(n: float) -> str:
    if n >= 1 << 20:
        return f"{n / (1 << 20):.0f}M"
    if n >= 1 << 10:
        return f"{n / (1 << 10):.0f}K"
    return f"{n:.0f}"


class Svg:
    def __init__(self, title: str):
        self.parts = [
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" height="{H}" '
            f'viewBox="0 0 {W} {H}" font-family="Helvetica, Arial, sans-serif">',
            f'<rect width="{W}" height="{H}" fill="{SURFACE}"/>',
            f'<text x="{ML}" y="28" font-size="16" fill="{INK}">{escape(title)}</text>',
        ]

    def line(self, x1, y1, x2, y2, stroke, width=1.0, dash=None):
        d = f' stroke-dasharray="{dash}"' if dash else ""
        self.parts.append(
            f'<line x1="{x1:.1f}" y1="{y1:.1f}" x2="{x2:.1f}" y2="{y2:.1f}" '
            f'stroke="{stroke}" stroke-width="{width}"{d}/>'
        )

    def poly(self, pts, stroke):
        s = " ".join(f"{x:.1f},{y:.1f}" for x, y in pts)
        self.parts.append(
            f'<polyline points="{s}" fill="none" stroke="{stroke}" '
            f'stroke-width="2" stroke-linejoin="round" stroke-linecap="round"/>'
        )

    def dot(self, x, y, fill, r=3.0):
        # 2px surface ring so overlapping series stay separable
        self.parts.append(
            f'<circle cx="{x:.1f}" cy="{y:.1f}" r="{r}" fill="{fill}" '
            f'stroke="{SURFACE}" stroke-width="2"/>'
        )

    def text(self, x, y, s, size=11, fill=INK_2, anchor="start", rotate=None):
        t = f' transform="rotate({rotate} {x:.1f} {y:.1f})"' if rotate else ""
        self.parts.append(
            f'<text x="{x:.1f}" y="{y:.1f}" font-size="{size}" fill="{fill}" '
            f'text-anchor="{anchor}"{t}>{escape(s)}</text>'
        )

    def save(self, path: str):
        self.parts.append("</svg>")
        with open(path, "w") as f:
            f.write("\n".join(self.parts))


def _log_axis(svg: Svg, values: list[float]) -> tuple[float, float]:
    """Draw the y grid/labels for a log10 axis spanning the data; return
    (lo, hi) exponents. Zero errors are clamped to one decade below the
    smallest positive value (marked by the dashed floor line)."""
    pos = [v for v in values if v > 0]
    lo = math.floor(math.log10(min(pos))) if pos else -6
    hi = math.ceil(math.log10(max(pos))) if pos else 0
    if hi == lo:
        hi += 1
    for e in range(lo, hi + 1):
        y = _y_of(e, lo, hi)
        svg.line(ML, y, W - MR, y, GRID)
        svg.text(ML - 8, y + 4, _fmt_pow10(e), anchor="end")
    return lo, hi


def _y_of(exp_val: float, lo: float, hi: float) -> float:
    frac = (exp_val - lo) / (hi - lo)
    return H - MB - frac * (H - MT - MB)


def plot_metric_vs_quantile(results, dist, metric, label, fname, quantiles, meta):
    rows = [r for r in results if r["distribution"] == dist]
    rows.sort(key=lambda r: r["config"])
    svg = Svg(f"{label} vs quantile — {dist} "
              f"(n={meta['n']:,}, {meta['trials']} trials, mean)")
    all_vals = [v for r in rows for v in r[metric]]
    lo, hi = _log_axis(svg, all_vals)
    floor_exp = lo  # zeros land here

    nq = len(quantiles)
    xs = [ML + i * (W - ML - MR) / (nq - 1) for i in range(nq)]
    for i, q in enumerate(quantiles):
        svg.line(xs[i], H - MB, xs[i], H - MB + 4, INK_2)
        svg.text(xs[i], H - MB + 18, _fmt_q(q), anchor="middle")
    svg.text((ML + W - MR) / 2, H - 14, "quantile", size=12, anchor="middle")
    svg.text(18, (MT + H - MB) / 2, label, size=12, anchor="middle", rotate=-90)
    svg.line(ML, H - MB, W - MR, H - MB, INK_2)
    y_floor = _y_of(floor_exp, lo, hi)
    svg.line(ML, y_floor, W - MR, y_floor, INK_2, dash="3,3")

    worst = None
    for si, r in enumerate(rows):
        color = SERIES[si % len(SERIES)]
        pts = []
        for i, v in enumerate(r[metric]):
            e = math.log10(v) if v > 0 else floor_exp
            pts.append((xs[i], _y_of(e, lo, hi)))
        svg.poly(pts, color)
        for x, y in pts:
            svg.dot(x, y, color)
        peak = max(r[metric])
        if worst is None or peak > worst[0]:
            worst = (peak, r["config"], pts)

    # legend (fixed order = slot order); text in ink, identity by swatch
    ly = MT + 6
    for si, r in enumerate(rows):
        color = SERIES[si % len(SERIES)]
        svg.parts.append(
            f'<rect x="{W - MR + 18}" y="{ly - 9}" width="14" height="4" '
            f'rx="2" fill="{color}"/>'
        )
        svg.text(W - MR + 38, ly, f"{r['config']}  ({_fmt_bytes(r['nbytes'])}B)")
        ly += 20
    # selective direct label: the worst series at its peak
    if worst:
        _, cfg, pts = worst
        px, py = max(pts, key=lambda p: -p[1])
        svg.text(px + 4, py - 8, cfg, size=10)

    svg.save(os.path.join(OUT_DIR, fname))


def plot_error_vs_memory(results, quantiles, meta):
    """Log-log scatter: sketch size vs mean rank error at the median —
    the accuracy/memory trade-off chart (reference §2 of BASELINE.md)."""
    i50 = quantiles.index(0.5)
    by_cfg: dict[str, list] = {}
    for r in results:
        by_cfg.setdefault(r["config"], []).append(r)
    svg = Svg(f"rank error (p50, mean over {len({r['distribution'] for r in results})} "
              f"distributions) vs sketch size — n={meta['n']:,}")
    errs = []
    pts = []
    for cfg, rows in sorted(by_cfg.items()):
        err = sum(r["rank_abs_err_mean"][i50] for r in rows) / len(rows)
        nb = sum(r["nbytes"] for r in rows) / len(rows)
        errs.append(err)
        pts.append((cfg, nb, err))
    lo, hi = _log_axis(svg, errs)
    xlo = math.floor(math.log10(min(p[1] for p in pts)))
    xhi = math.ceil(math.log10(max(p[1] for p in pts)))
    for e in range(xlo, xhi + 1):
        x = ML + (e - xlo) / (xhi - xlo) * (W - ML - MR)
        svg.line(x, H - MB, x, H - MB + 4, INK_2)
        svg.text(x, H - MB + 18, _fmt_bytes(10.0 ** e), anchor="middle")
    svg.text((ML + W - MR) / 2, H - 14, "sketch size (bytes, log)", size=12,
             anchor="middle")
    svg.text(18, (MT + H - MB) / 2, "mean |rank err| at p50", size=12,
             anchor="middle", rotate=-90)
    svg.line(ML, H - MB, W - MR, H - MB, INK_2)
    for si, (cfg, nb, err) in enumerate(pts):
        color = SERIES[si % len(SERIES)]
        x = ML + (math.log10(nb) - xlo) / (xhi - xlo) * (W - ML - MR)
        y = _y_of(math.log10(err) if err > 0 else lo, lo, hi)
        svg.dot(x, y, color, r=5)
        svg.text(x + 8, y + 4, cfg, size=10)
    svg.save(os.path.join(OUT_DIR, "acc_vs_memory.svg"))


def main():
    with open(os.path.join(ROOT, "ACCURACY.json")) as f:
        acc = json.load(f)
    os.makedirs(OUT_DIR, exist_ok=True)
    results = acc["results"]
    quantiles = acc["quantiles"]
    meta = {"n": acc["n"], "trials": acc["trials"]}
    dists = sorted({r["distribution"] for r in results})
    for dist in dists:
        plot_metric_vs_quantile(
            results, dist, "value_rel_err_mean", "relative value error",
            f"acc_value_rel_err_{dist}.svg", quantiles, meta)
        plot_metric_vs_quantile(
            results, dist, "rank_abs_err_mean", "absolute rank error",
            f"acc_rank_abs_err_{dist}.svg", quantiles, meta)
    plot_error_vs_memory(results, quantiles, meta)
    print(f"wrote {2 * len(dists) + 1} SVGs to {OUT_DIR}")


if __name__ == "__main__":
    main()

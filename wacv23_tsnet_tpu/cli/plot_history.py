"""Render training-history / eval-metric CSVs as small-multiple curves.

    python -m wacv23_tsnet_tpu.cli.plot_history \
        --csv runs/sustained/history.csv --out artifacts/round2/loss_curves.png

One panel per column (losses/metrics have different scales — they never
share a y-axis), single series per panel (the panel title carries
identity, no legend needed), recessive grid, direct final-value label.
"""

from __future__ import annotations

import argparse
import csv
import math

INK = "#1f2430"        # primary text
MUTED = "#6b7280"      # secondary text / axis
GRID = "#e5e7eb"
LINE = "#2563eb"       # one categorical hue; single series per panel


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--csv", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--x", default=None,
                   help="x column (default: first column)")
    p.add_argument("--skip", default="seconds",
                   help="comma-separated columns to skip")
    p.add_argument("--title", default=None)
    args = p.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(args.csv) as fh:
        rows = list(csv.DictReader(fh))
    if not rows:
        raise SystemExit(f"{args.csv} is empty")
    cols = list(rows[0])
    xcol = args.x or cols[0]
    skip = set(args.skip.split(",")) | {xcol}
    ycols = [c for c in cols if c not in skip]
    xs = [float(r[xcol]) for r in rows]

    n = len(ycols)
    ncols = min(4, n)
    nrows = math.ceil(n / ncols)
    fig, axes = plt.subplots(nrows, ncols, figsize=(3.2 * ncols, 2.4 * nrows),
                             squeeze=False)
    fig.patch.set_facecolor("white")
    for i, c in enumerate(ycols):
        ax = axes[i // ncols][i % ncols]
        ys = [float(r[c]) for r in rows]
        ax.plot(xs, ys, color=LINE, linewidth=2)
        ax.set_title(c, fontsize=11, color=INK, loc="left")
        # direct label on the final value (selective, not every point)
        ax.annotate(f"{ys[-1]:.3g}", (xs[-1], ys[-1]), textcoords="offset points",
                    xytext=(-2, 6), ha="right", fontsize=9, color=INK)
        ax.grid(color=GRID, linewidth=0.8)
        ax.set_axisbelow(True)
        for spine in ("top", "right"):
            ax.spines[spine].set_visible(False)
        for spine in ("left", "bottom"):
            ax.spines[spine].set_color(MUTED)
        ax.tick_params(colors=MUTED, labelsize=8)
    for j in range(n, nrows * ncols):
        axes[j // ncols][j % ncols].axis("off")
    if args.title:
        fig.suptitle(args.title, fontsize=12, color=INK)
    fig.supxlabel(xcol, fontsize=10, color=MUTED)
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print(f"wrote {args.out} ({n} panels)")


if __name__ == "__main__":
    main()

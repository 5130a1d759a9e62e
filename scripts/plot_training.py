"""Render training curves (loss + val IoU) from a trainer metrics.jsonl.

Usage:
    python scripts/plot_training.py /tmp/lstpu_plateau_r3b/metrics.jsonl \
        docs/plateau_r3b_curves.png

Design: two panels (never a dual axis), categorical slots 1/2 of the
validated default palette (blue #2a78d6 / orange #eb6834, adjacent-pair
CVD checked), thin 2px lines, recessive grid, direct labels instead of a
legend box where there is a single series.
"""
from __future__ import annotations

import json
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

BLUE = "#2a78d6"
ORANGE = "#eb6834"
INK = "#3a3a3a"
MUTED = "#8a8a8a"
GRID = "#e3e3e3"


def main(metrics_path: str, out_path: str):
    rows = [json.loads(l) for l in open(metrics_path)]
    tr = [(r["step"], r["batch_loss"]) for r in rows if r["phase"] == "train"]
    va = [(r["step"], r["batch_loss"]) for r in rows if r["phase"] == "val"]
    iou = [(r["step"], r["iou"]) for r in rows
           if r["phase"] == "val" and "iou" in r]
    lr_steps = sorted({r["step"] for r in rows
                       if r["phase"] == "train" and r.get("lr") is not None})

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10.2, 3.6), dpi=160)
    for ax in (ax1, ax2):
        ax.spines[["top", "right"]].set_visible(False)
        ax.spines[["left", "bottom"]].set_color(MUTED)
        ax.grid(True, color=GRID, linewidth=0.7, zorder=0)
        ax.tick_params(colors=INK, labelsize=8)
        ax.set_xlabel("iteration", color=INK, fontsize=9)

    ts, tl = np.array(tr).T
    ax1.plot(ts, tl, color=BLUE, linewidth=2, zorder=3)
    if va:
        vs, vl = np.array(va).T
        ax1.plot(vs, vl, color=ORANGE, linewidth=2, zorder=3)
        # Direct labels at the curve ends (no legend box needed for 2).
        ax1.annotate("train", (ts[-1], tl[-1]), xytext=(4, 4),
                     textcoords="offset points", color=INK, fontsize=8)
        ax1.annotate("val", (vs[-1], vl[-1]), xytext=(4, 4),
                     textcoords="offset points", color=INK, fontsize=8)
    ax1.set_yscale("log")
    ax1.set_title("batch loss", color=INK, fontsize=10, loc="left")

    if iou:
        xs, ys = np.array(iou).T
        ax2.plot(xs, ys, color=BLUE, linewidth=2, zorder=3)
        best = int(np.argmax(ys))
        ax2.scatter([xs[best]], [ys[best]], s=22, color=BLUE, zorder=4)
        ax2.annotate(f"best {ys[best]:.3f} @ {int(xs[best])}",
                     (xs[best], ys[best]), xytext=(6, -10),
                     textcoords="offset points", color=INK, fontsize=8)
    ax2.set_ylim(0, 1)
    ax2.set_title("val IoU (occupancy @ 0.5, 2k eval pts)", color=INK,
                  fontsize=10, loc="left")

    fig.tight_layout()
    fig.savefig(out_path, facecolor="white")
    print("wrote", out_path)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

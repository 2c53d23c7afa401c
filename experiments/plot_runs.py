#!/usr/bin/env python
"""Render the training-run artifacts in docs/runs/ as PNG figures.

Three figures:
  docs/runs/flagship_elo_curves.png   — anchored-Elo curves of the four
      flagship training runs (one small-multiple panel per game; single
      series per panel, so the panel title carries identity).
  docs/runs/train_compare_curves.png  — the training-economy protocol
      comparison (experiments/train_compare.py) across three seeds, one
      panel per seed, fixed arm->color order with direct end labels.
  docs/runs/train_compare_summary.png — every measured arm's mean
      peak/final anchored Elo with its min-max seed range (the honest
      variance summary).

Anchored Elo is the Bradley-Terry fit against the pure-MCTS anchor
pinned at 0 (utils/elo.py::fit_elo) — the honest strength signal, not
the inflationary per-gate ladder. Colors are the documented adjacent-
pairlist-validated categorical order (slots 1-4); labels/values wear
text ink, never series color.
"""

from __future__ import annotations

import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

RUNS = os.path.join(os.path.dirname(__file__), "..", "docs", "runs")

# categorical slots 1-4 (validated adjacent order, light mode)
SERIES = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100", "#8f58d0"]
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK2 = "#52514e"
GRID = "#e4e3df"


def style_axes(ax):
    ax.set_facecolor(SURFACE)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(GRID)
    ax.grid(True, color=GRID, linewidth=0.8)
    ax.set_axisbelow(True)
    ax.tick_params(colors=INK2, labelsize=9)


def load_curve(name, key="anchored_elo"):
    xs, ys = [], []
    with open(os.path.join(RUNS, name)) as f:
        for line in f:
            r = json.loads(line)
            if r.get(key) is not None:
                xs.append(r["iteration"])
                ys.append(r[key])
    return xs, ys


def flagship():
    panels = [
        ("Connect-Four · ResNet-64x5 · 100 iters (TPU v5e)",
         "resnet_full_preset_100iter_anchored_folded_tpu_v5e.jsonl"),
        ("Othello 8x8 · ResNet-64x5 · 60 iters (TPU v5e)",
         "othello_resnet_continuous_60iter_anchored_folded_tpu_v5e.jsonl"),
        ("Gomoku 9x9 · ResNet-64x5 · 15 iters (TPU v5e)",
         "gomoku_resnet_full_15iter_tpu_v5e.jsonl"),
        ("Hex 7x7 · MLP · 24 iters (TPU v5e, hybrid engine)",
         "hex_mlp_preset_24iter_hybrid_tpu_v5e.jsonl"),
    ]
    # overlays: extra curves drawn into a named panel (panel index -> list
    # of (label, artifact)). The economy preset rides the connect-four
    # panel: same game/net, gumbel-32 search at 0.68x the steady-state
    # measured compute (docs/runs/economy_seeds_tpu.json); all three
    # hardware seeds are drawn, plus the full preset's second seed —
    # the round-4 replication (the labels carry the n).
    overlays = {
        0: [("economy · gumbel-32 (3 seeds, 0.68x steady compute)",
             "resnet_economy_preset_50iter_gumbel32_tpu_v5e.jsonl"),
            ("economy seed 1",
             "resnet_economy_preset_50iter_gumbel32_s1_tpu_v5e.jsonl"),
            ("economy seed 2",
             "resnet_economy_preset_50iter_gumbel32_s2_tpu_v5e.jsonl"),
            ("full seed 1",
             "resnet_full_preset_100iter_s1_tpu_v5e.jsonl")],
    }
    # overlay seeds share their arm's color at reduced opacity
    overlay_style = {
        (0, 1): {"color": SERIES[1], "alpha": 0.55},
        (0, 2): {"color": SERIES[1], "alpha": 0.55},
        (0, 3): {"color": SERIES[0], "alpha": 0.45},
    }
    fig, axes = plt.subplots(1, 4, figsize=(14, 3.2), sharey=False)
    fig.patch.set_facecolor(SURFACE)
    for i, (ax, (title, fname)) in enumerate(zip(axes, panels)):
        xs, ys = load_curve(fname)
        style_axes(ax)
        marker = "o" if len(xs) <= 6 else None
        base_label = "full · PUCT-100" if i in overlays else None
        ax.plot(xs, ys, color=SERIES[0], linewidth=2, marker=marker,
                markersize=4, label=base_label)
        ax.scatter(xs[-1:], ys[-1:], s=18, color=SERIES[0], zorder=3)
        ax.annotate(f"{ys[-1]:.0f}", (xs[-1], ys[-1]), textcoords="offset points",
                    xytext=(2, 6), fontsize=9, color=INK)
        for j, (label, oname) in enumerate(overlays.get(i, [])):
            if not os.path.exists(os.path.join(RUNS, oname)):
                continue  # seed artifacts land as their runs finish
            oxs, oys = load_curve(oname)
            style = overlay_style.get((i, j), {"color": SERIES[j + 1],
                                               "alpha": 1.0})
            omarker = "o" if len(oxs) <= 6 else None
            ax.plot(oxs, oys, linewidth=2, label=label,
                    marker=omarker, markersize=4, **style)
            ax.scatter(oxs[-1:], oys[-1:], s=18, color=style["color"],
                       alpha=style["alpha"], zorder=3)
            ax.annotate(f"{oys[-1]:.0f}", (oxs[-1], oys[-1]),
                        textcoords="offset points", xytext=(2, 6),
                        fontsize=9, color=INK)
        if i in overlays:
            ax.legend(fontsize=7.5, frameon=False, labelcolor=INK2)
        ax.set_title(title, fontsize=9.5, color=INK)
        ax.set_xlabel("iteration", fontsize=9, color=INK2)
    axes[0].set_ylabel("anchored Elo (pure MCTS = 0)", fontsize=9, color=INK2)
    fig.tight_layout()
    out = os.path.join(RUNS, "flagship_elo_curves.png")
    fig.savefig(out, dpi=160, facecolor=SURFACE)
    print("wrote", out)


def train_compare():
    seeds = [
        ("seed 0", "train_compare_cpu.json"),
        ("seed 1", "train_compare_cpu_s1.json"),
        ("seed 2", "train_compare_cpu_s2.json"),
        ("seed 3", "train_compare_cpu_s3.json"),
        ("seed 4", "train_compare_cpu_s4.json"),
    ]
    arms = ["baseline", "gumbel", "pcr", "economy", "reanalyze"]  # fixed color order
    fig, axes = plt.subplots(1, 5, figsize=(19, 3.6), sharey=True)
    fig.patch.set_facecolor(SURFACE)
    for ax, (label, fname) in zip(axes, seeds):
        d = json.load(open(os.path.join(RUNS, fname)))
        byarm = {r["arm"]: r for r in d["results"]}
        style_axes(ax)
        ends = []
        for i, arm in enumerate(arms):
            pts = [(c["iteration"], c["anchored_elo"])
                   for c in byarm[arm]["curve"] if c.get("anchored_elo") is not None]
            xs, ys = zip(*pts)
            ax.plot(xs, ys, color=SERIES[i], linewidth=2, label=arm)
            ends.append((arm, xs[-1], ys[-1]))
        # direct end labels in text ink (slot-4 yellow is sub-3:1 on this
        # surface; the label carries identity, not the color), vertically
        # de-collided so stacked endpoints stay readable
        ends.sort(key=lambda e: e[2])
        min_sep = 55.0  # Elo units, ~one label height at this figure size
        placed = []
        for arm, x, y in ends:
            ly = y if not placed else max(y, placed[-1] + min_sep)
            placed.append(ly)
            ax.annotate(arm, (x, ly), textcoords="offset points",
                        xytext=(4, -3), fontsize=8, color=INK)
        ax.set_title(label, fontsize=10, color=INK)
        ax.set_xlabel("iteration", fontsize=9, color=INK2)
    axes[0].set_ylabel("anchored Elo (pure MCTS = 0)", fontsize=9, color=INK2)
    leg = axes[0].legend(loc="upper left", fontsize=8, frameon=False)
    for t in leg.get_texts():
        t.set_color(INK)
    fig.suptitle("Training economy: baseline vs gumbel vs PCR vs economy vs reanalyze "
                 "(connect-four, 20-iteration CPU config; first 5 of 8 seeds — the summary figure aggregates all 8)", fontsize=10, color=INK)
    fig.tight_layout(rect=(0, 0, 1, 0.94))
    out = os.path.join(RUNS, "train_compare_curves.png")
    fig.savefig(out, dpi=160, facecolor=SURFACE)
    print("wrote", out)


def arm_summary():
    """All measured arms in one honest panel: per-arm mean peak and mean
    final anchored Elo as dots, with the min-max seed range as a line —
    the range IS the message (seed variance dominates at this config)."""
    agg = json.load(
        open(os.path.join(RUNS, "train_compare_cpu_seeds.json"))
    )["arms"]
    arms = sorted(agg, key=lambda a: -agg[a]["mean_peak"])
    fig, axes = plt.subplots(1, 2, figsize=(9.6, 3.4), sharey=True)
    fig.patch.set_facecolor(SURFACE)
    for ax, key, title in zip(
        axes,
        ("peak", "final"),
        ("peak anchored Elo", "final anchored Elo"),
    ):
        style_axes(ax)
        ax.grid(True, axis="x", color=GRID, linewidth=0.8)
        ax.grid(False, axis="y")
        for y, arm in enumerate(arms):
            seeds = agg[arm][f"{key}_per_seed"]
            mean = agg[arm][f"mean_{key}"]
            ax.plot(
                [min(seeds), max(seeds)], [y, y],
                color=GRID, linewidth=3, solid_capstyle="round", zorder=1,
            )
            ax.scatter(seeds, [y] * len(seeds), s=14, color=INK2, zorder=2)
            ax.scatter([mean], [y], s=60, color=SERIES[0], zorder=3)
            ax.annotate(
                f"{mean:.0f}", (mean, y), textcoords="offset points",
                xytext=(0, 7), ha="center", fontsize=8, color=INK,
            )
        ax.set_yticks(range(len(arms)))
        ax.set_yticklabels(arms, fontsize=9, color=INK)
        ax.set_title(title, fontsize=10, color=INK)
    # invert ONCE (sharey: a second invert would toggle it back)
    axes[0].invert_yaxis()
    fig.suptitle(
        "Training-economy arms over eight seeds — mean (blue), seeds "
        "(dots), seed range (bar).\nSeed-PAIRED differences vs baseline: "
        "gumbel +174 peak (t=2.7) / +179 final (t=2.1); others "
        "directionally positive but within noise.",
        fontsize=9.5, color=INK,
    )
    fig.tight_layout(rect=(0, 0, 1, 0.86))
    out = os.path.join(RUNS, "train_compare_summary.png")
    fig.savefig(out, dpi=160, facecolor=SURFACE)
    print("wrote", out)


if __name__ == "__main__":
    flagship()
    train_compare()
    arm_summary()

#!/usr/bin/env python
"""Summarize the flagship economy-vs-full hardware replication (VERDICT r3
item 3): per-seed peak anchored Elo (+/- the fit's SE at the peak), the
late-run settle band, cumulative measured compute (summed
self-play/train/arena/anchor phase timers), and true elapsed time (ts
span), for every economy-preset and full-preset run artifact.

The round-3 claim rested on one hardware seed; this script restates it
with n>=3 seed bands (README "economy preset at production scale").

Usage:
  python experiments/economy_seeds.py [--out docs/runs/economy_seeds_tpu.json]
"""

import argparse
import glob
import json
import os

RUNS = os.path.join(os.path.dirname(__file__), "..", "docs", "runs")

# every device-phase timer (matches the README economy paragraph's
# "cumulative measured compute": 476 s economy vs 912 s full-first-50)
PHASES = ("t_selfplay", "t_replay_insert", "t_train", "t_arena", "t_anchor")


def summarize(path, first_n=None):
    rows = [json.loads(l) for l in open(path)]
    if first_n is not None:
        rows = [r for r in rows if r["iteration"] <= first_n]
    anch = [
        (r["iteration"], r["anchored_elo"], r.get("anchored_elo_se"))
        for r in rows
        if r.get("anchored_elo") is not None
    ]
    if not anch:
        return None
    peak_it, peak, peak_se = max(anch, key=lambda a: a[1])
    tail = anch[-3:]  # settle band: last three anchored points
    compute = sum(sum(r.get(p, 0.0) for p in PHASES) for r in rows)
    elapsed = rows[-1]["ts"] - rows[0]["ts"] if "ts" in rows[0] else None
    # steady-state compute: raw totals are polluted by the iteration-1
    # compile (0-550 s depending on cache hits) and rare tunnel stalls
    # (full_s1 iter 15: 1211 s for the usual 5.7 s of self-play).
    # Exclude iteration 1 and clip any phase sample >10x that phase's
    # median to the median, reporting the clipped mass as stall_s.
    steady_rows = [r for r in rows if r["iteration"] > 1]
    steady = 0.0
    stall = 0.0
    for p in PHASES:
        vals = sorted(r.get(p, 0.0) for r in steady_rows)
        if not vals:
            continue
        med = vals[len(vals) // 2]
        for v in vals:
            if med > 0 and v > 10 * med:
                steady += med
                stall += v - med
            else:
                steady += v
    return {
        "artifact": os.path.basename(path),
        "iterations": rows[-1]["iteration"],
        "peak_elo": round(peak, 1),
        "peak_se": round(peak_se, 1) if peak_se is not None else None,
        "peak_iteration": peak_it,
        "settle_band": [round(min(e for _, e, _ in tail), 1),
                        round(max(e for _, e, _ in tail), 1)],
        "gates_accepted": sum(1 for r in rows if r.get("accepted")),
        "compute_s": round(compute, 1),
        "steady_compute_s": round(steady, 1),
        "stall_s": round(stall, 1),
        "elapsed_s": round(elapsed, 1) if elapsed is not None else None,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(RUNS, "economy_seeds_tpu.json"))
    args = ap.parse_args()

    econ = sorted(glob.glob(os.path.join(RUNS, "resnet_economy_preset_*.jsonl")))
    full = sorted(glob.glob(os.path.join(RUNS, "resnet_full_preset_*.jsonl")))
    out = {
        "economy": [summarize(p) for p in econ],
        # like-for-like: the full preset's FIRST 50 iterations
        "full_first50": [summarize(p, first_n=50) for p in full],
    }
    for k in list(out):
        rows = [r for r in out[k] if r]
        peaks = [r["peak_elo"] for r in rows]
        if peaks:
            out[f"{k}_peak_range"] = [min(peaks), max(peaks)]
    print(json.dumps(out, indent=1))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Flagship-tower MFU vs channel width (round-4 VERDICT item 2).

The round-4 roofline analysis (docs/ENGINES.md "Conv-eval headroom")
measured the folded bf16 AZResNet-64x5 at ~61% of the v5e MXU peak and
named the structural cause: a 64-wide channel dimension against 128-wide
MXU tiles. This measures the candidate fix — the same tower at
channels=128 (and a 128x10 depth variant) — reporting ms/forward,
TFLOP/s and %-of-peak for the folded inference path, plus the end-to-end
ms/move on the hybrid engine (connect-four, 100 sims, B=4096).

Protocol: chained 100-forward jitted program (each forward feeds a
dummy dependency into the next so XLA cannot overlap them away),
host-fetch sync (block_until_ready can return early over the axon
tunnel), median of 3. Same as round 2's roofline runs.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python experiments/mfu_channels.py
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from alphazero_tpu.config import MCTSConfig
from alphazero_tpu.games import ConnectFour
from alphazero_tpu.mcts.hybrid import make_hybrid_root_fn
from alphazero_tpu.models import AZResNet, init_flax_model, make_flax_apply_fn

V5E_BF16_PEAK_TFLOPS = 197.0  # one v5e chip


def conv_flops(B, H, W, cin, cout, k):
    return 2.0 * B * H * W * cin * cout * k * k


def tower_flops(B, H, W, C, blocks, A, value_hidden=256):
    f = conv_flops(B, H, W, 2, C, 3)  # stem
    f += blocks * 2 * conv_flops(B, H, W, C, C, 3)  # residual tower
    f += conv_flops(B, H, W, C, 2, 1) + conv_flops(B, H, W, C, 1, 1)  # heads
    f += 2.0 * B * (2 * H * W) * A  # policy dense
    f += 2.0 * B * (H * W) * value_hidden + 2.0 * B * value_hidden  # value
    return f


def bench_forward(apply_fn, params, feats, n=100, reps=3):
    def chained(p, x):
        out = None
        carry = x
        for _ in range(n):
            logits, v = apply_fn(p, carry)
            # feed a scalar of the output back so the forwards serialize
            carry = x + (v.sum() * 0.0).astype(x.dtype)
            out = (logits, v)
        return out

    jf = jax.jit(chained)
    r = jf(params, feats)
    np.asarray(jax.tree_util.tree_leaves(r)[0])  # warm + sync
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = jf(params, feats)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        ts.append((time.perf_counter() - t0) / n)
    return float(np.median(ts))


def main():
    game = ConnectFour()
    B = 4096
    H, W = 6, 7
    feats = jnp.zeros((B, H, W, 2), jnp.float32)
    results = []
    for channels, blocks in [(64, 5), (128, 5), (128, 10)]:
        model = AZResNet(
            num_actions=game.num_actions, channels=channels, blocks=blocks
        )
        apply_fn = make_flax_apply_fn(model)  # folded inference path
        params = init_flax_model(model, jax.random.key(0), game.feature_shape)
        ms = bench_forward(apply_fn, params, feats) * 1e3
        fl = tower_flops(B, H, W, channels, blocks, game.num_actions)
        tflops = fl / (ms / 1e3) / 1e12
        row = {
            "tower": f"{channels}x{blocks}",
            "ms_per_forward_B4096": round(ms, 3),
            "tflops": round(tflops, 1),
            "pct_of_bf16_peak": round(100 * tflops / V5E_BF16_PEAK_TFLOPS, 1),
            "gflop_per_forward": round(fl / 1e9, 2),
            "folded": bool(getattr(apply_fn, "folded", False)),
        }
        # end-to-end move on the hybrid engine
        cfg = MCTSConfig(num_sims=100, max_depth=48)
        hybrid = make_hybrid_root_fn(game, apply_fn, cfg)
        if hybrid is not None:
            state = jax.vmap(lambda _: game.init())(jnp.arange(B))
            jh = jax.jit(hybrid)
            np.asarray(jh(params, state))[0, 0]
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                r = jh(params, state)
                np.asarray(r)[0, 0]
                ts.append(time.perf_counter() - t0)
            row["move_ms_hybrid_100sims"] = round(
                float(np.median(ts)) * 1e3, 1
            )
        results.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Secondary benchmarks: reproduce the engine-comparison numbers in
README.md / docs/ENGINES.md (the driver-facing headline stays bench.py).

Prints one JSON line per measurement. Runs on the default backend —
numbers in the docs are from one TPU v5e chip. Select a subset with
AZ_BENCH_ONLY=substring.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from alphazero_tpu.config import MCTSConfig
from alphazero_tpu.games import ConnectFour, Othello
from alphazero_tpu.mcts.fused import make_fused_root_fn
from alphazero_tpu.mcts.hybrid import make_hybrid_root_fn
from alphazero_tpu.mcts.search import make_search_fn
from alphazero_tpu.models import (
    AZResNet,
    MLPNet,
    init_flax_model,
    make_flax_apply_fn,
    make_uniform_model,
)


def _sync(r):
    # a device->host fetch is the only reliable sync over the axon tunnel
    # (block_until_ready can return early there)
    import numpy as np

    return np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]


def timeit(f, n=3):
    _sync(f())
    t0 = time.perf_counter()
    for _ in range(n):
        r = f()
    _sync(r)
    return (time.perf_counter() - t0) / n


def emit(name, ms, **detail):
    print(json.dumps({"bench": name, "move_ms": round(ms, 1), **detail}))


def engines_for(game, apply_fn, cfg):
    out = {}
    fused = make_fused_root_fn(game, apply_fn, cfg)
    if fused is not None:
        out["fused"] = fused
    hybrid = make_hybrid_root_fn(game, apply_fn, cfg)
    if hybrid is not None:
        out["hybrid"] = hybrid
    search = make_search_fn(game, apply_fn, cfg)
    out["xla"] = lambda p, s, rng=None: search(p, s, rng=rng).root_counts()
    return out


def main():
    only = os.environ.get("AZ_BENCH_ONLY", "")
    cases = []

    c4 = ConnectFour()
    uni4 = make_uniform_model(c4)
    cases.append(("c4_uniform_B4096_100sims", c4, uni4.apply_fn, {}, 4096, {}))

    mlp = MLPNet(num_actions=c4.num_actions, hidden=(256, 256))
    mlp_apply = make_flax_apply_fn(mlp)
    mlp_params = init_flax_model(mlp, jax.random.key(0), c4.feature_shape)
    cases.append(("c4_mlp_B4096_100sims", c4, mlp_apply, mlp_params, 4096, {}))

    res = AZResNet(num_actions=c4.num_actions, channels=64, blocks=5)
    res_apply = make_flax_apply_fn(res)
    res_params = init_flax_model(res, jax.random.key(1), c4.feature_shape)
    cases.append(("c4_resnet_B4096_100sims", c4, res_apply, res_params, 4096, {}))

    oth = Othello()
    unio = make_uniform_model(oth)
    for B in (1024, 4096):
        cases.append(
            (f"oth_uniform_B{B}_100sims", oth, unio.apply_fn, {}, B,
             {"max_depth": 80})
        )
    cases.append(
        ("oth_uniform_B4096_100sims_K4", oth, unio.apply_fn, {}, 4096,
         {"max_depth": 80, "parallel_sims": 4})
    )

    from alphazero_tpu.games import Gomoku

    gmk = Gomoku()
    unig = make_uniform_model(gmk)
    cases.append(
        ("gomoku_uniform_B4096_100sims", gmk, unig.apply_fn, {}, 4096,
         {"max_depth": 48})
    )

    # Production 15x15 edition (A=225) + the within-family action-space
    # scaling set: Gomoku edges 7/9/15 -> A=49/81/225 share the same
    # dynamics code, so the per-sim cost ratio isolates the dense-plane
    # O(A*C) bet (round-4 VERDICT item 1). docs/ENGINES.md table.
    gmk15 = Gomoku(15)
    unig15 = make_uniform_model(gmk15)
    for B in (1024, 4096):
        cases.append(
            (f"gomoku15_uniform_B{B}_100sims", gmk15, unig15.apply_fn, {}, B,
             {"max_depth": 64})
        )
    g15mlp = MLPNet(num_actions=gmk15.num_actions, hidden=(256, 256))
    g15mlp_apply = make_flax_apply_fn(g15mlp)
    g15mlp_params = init_flax_model(
        g15mlp, jax.random.key(3), gmk15.feature_shape
    )
    cases.append(
        ("gomoku15_mlp_B1024_100sims", gmk15, g15mlp_apply, g15mlp_params,
         1024, {"max_depth": 64})
    )
    gmk7 = Gomoku(7)
    unig7 = make_uniform_model(gmk7)
    cases.append(
        ("gomoku7_uniform_B4096_100sims", gmk7, unig7.apply_fn, {}, 4096,
         {"max_depth": 48})
    )

    # Hex: the connection game — hybrid via parity-lane flat ops, the
    # flood-fill terminal in the engine's XLA stage (games/hex.py)
    from alphazero_tpu.games import Hex

    hx = Hex()
    unih = make_uniform_model(hx)
    for B in (1024, 4096):
        cases.append(
            (f"hex_uniform_B{B}_100sims", hx, unih.apply_fn, {}, B,
             {"max_depth": 56})
        )
    hmlp = MLPNet(num_actions=hx.num_actions, hidden=(256, 256))
    hmlp_apply = make_flax_apply_fn(hmlp)
    hmlp_params = init_flax_model(hmlp, jax.random.key(2), hx.feature_shape)
    cases.append(
        ("hex_mlp_B1024_100sims", hx, hmlp_apply, hmlp_params, 1024,
         {"max_depth": 56})
    )

    for name, game, apply_fn, params, B, over in cases:
        if only and only not in name:
            continue
        cfg = MCTSConfig(num_sims=100, max_depth=over.get("max_depth", 48),
                         parallel_sims=over.get("parallel_sims", 1))
        state = jax.vmap(lambda _: game.init())(jnp.arange(B))
        for ename, fn in engines_for(game, apply_fn, cfg).items():
            if over.get("parallel_sims", 1) > 1 and ename == "xla":
                continue  # the XLA engine has no leaf-parallel mode
            jfn = jax.jit(lambda p, s, _f=fn: _f(p, s))
            ms = timeit(lambda: jfn(params, state)) * 1e3
            emit(name, ms, engine=ename, batch=B,
                 backend=jax.default_backend())


if __name__ == "__main__":
    sys.exit(main())

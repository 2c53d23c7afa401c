#!/usr/bin/env python
"""parallel_sims=K quality measurement: fused K-round search vs exact
K=1 at EQUAL simulation budgets, head-to-head (seating-swapped lockstep
games, greedy argmax play). The numbers behind ENGINES.md's
"quality is measured, not assumed" table.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python bench_k.py \\
         [--k 2] [--games 1024] [--sims 100] [--seeds 2]
"""

import argparse
import json
import os

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
from alphazero_tpu.models import make_uniform_model
from alphazero_tpu.ops import action_probs


def head_to_head(game, k, sims, num_games, max_depth, seed, block=None, temp_moves=0):
    """Fused K-round player vs fused exact (K=1) player; returns
    (k_wins, exact_wins, draws)."""
    from alphazero_tpu.mcts.fused import make_fused_root_fn

    net = make_uniform_model(game)
    root_k = make_fused_root_fn(
        game,
        net.apply_fn,
        MCTSConfig(num_sims=sims, max_depth=max_depth, parallel_sims=k),
        block_size=block,
    )
    root_1 = make_fused_root_fn(
        game,
        net.apply_fn,
        MCTSConfig(num_sims=sims, max_depth=max_depth),
        block_size=block,
    )
    assert root_k is not None and root_1 is not None
    step_v = jax.vmap(game.step)
    term_v = jax.vmap(game.terminal)
    B = num_games
    T = game.max_moves

    def play(rng):
        k_first = jnp.arange(B) < (B + 1) // 2
        state = jax.vmap(lambda _: game.init())(jnp.arange(B))

        def ply(carry, t):
            state, done, k_to_move, winner_k, is_draw, rng = carry
            rng, k_tie, k_act = jax.random.split(rng, 3)
            counts = jnp.where(
                k_to_move[:, None], root_k({}, state), root_1({}, state)
            )
            # temp-1 opening diversity for the first temp_moves plies
            # (the TT-oracle match protocol), then greedy
            temp = jnp.where(t < temp_moves, 1.0, 0.0)
            pi = action_probs(counts, temp, k_tie)
            action = jax.random.categorical(
                k_act, jnp.log(pi + 1e-12), axis=-1
            )
            nxt = step_v(state, action)
            state = jax.tree_util.tree_map(
                lambda n, o: jnp.where(
                    done.reshape((-1,) + (1,) * (n.ndim - 1)), o, n
                ),
                nxt,
                state,
            )
            now_done, tv = term_v(state)
            ended = ~done & now_done
            mover_won = tv < -0.5
            to_move_won = tv > 0.5
            won_k = jnp.where(mover_won, k_to_move, ~k_to_move)
            winner_k = jnp.where(ended & (mover_won | to_move_won), won_k, winner_k)
            is_draw = jnp.where(ended & ~mover_won & ~to_move_won, True, is_draw)
            done = done | now_done
            k_to_move = jnp.where(done, k_to_move, ~k_to_move)
            return (state, done, k_to_move, winner_k, is_draw, rng), None

        carry0 = (
            state,
            jnp.zeros((B,), bool),
            k_first,
            jnp.zeros((B,), bool),
            jnp.zeros((B,), bool),
            rng,
        )
        (state, done, _, winner_k, is_draw, _), _ = jax.lax.scan(
            ply, carry0, jnp.arange(T)
        )
        decisive = done & ~is_draw
        return (
            jnp.sum(decisive & winner_k),
            jnp.sum(decisive & ~winner_k),
            jnp.sum(done & is_draw),
        )

    kw, ew, dr = jax.jit(play)(jax.random.key(seed))
    return int(kw), int(ew), int(dr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=2)
    ap.add_argument("--games", type=int, default=1024)
    ap.add_argument("--sims", type=int, default=100)
    ap.add_argument("--max-depth", type=int, default=48)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--block", type=int, default=None,
                    help="fused kernel block size override")
    ap.add_argument("--temp-moves", type=int, default=8,
                    help="temp-1 sampled opening plies (diversity; 0 = "
                    "pure greedy)")
    args = ap.parse_args()
    game = ConnectFour()

    kw = ew = dr = 0
    for s in range(args.seeds):
        a, b, c = head_to_head(
            game, args.k, args.sims, args.games, args.max_depth,
            seed=51 + s, block=args.block, temp_moves=args.temp_moves
        )
        kw, ew, dr = kw + a, ew + b, dr + c
    n = kw + ew + dr
    score = (kw + 0.5 * dr) / max(n, 1)
    eps = 1.0 / (2.0 * max(n, 1))
    s = min(max(score, eps), 1 - eps)
    elo = 400.0 * np.log10(s / (1 - s))
    se = np.sqrt(score * (1 - score) / max(n, 1))
    lo = 400.0 * np.log10(max(score - 1.96 * se, eps) / (1 - max(score - 1.96 * se, eps)))
    hi = 400.0 * np.log10(min(score + 1.96 * se, 1 - eps) / (1 - min(score + 1.96 * se, 1 - eps)))
    print(
        json.dumps(
            {
                "k": args.k,
                "sims": args.sims,
                "temp_moves": args.temp_moves,
                "games": n,
                "k_wins": kw,
                "exact_wins": ew,
                "draws": dr,
                "k_score": round(score, 4),
                "k_elo_delta": round(float(elo), 1),
                "elo_95ci": [round(float(lo), 1), round(float(hi), 1)],
            }
        )
    )


if __name__ == "__main__":
    main()

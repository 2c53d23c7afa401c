"""Arena + gating tests (the reference's arena.rs had zero coverage).

Includes a deterministic strength test: with num_sims=1 play is fully
prior-driven, so a rule-based 'tactical oracle' prior must sweep a
uniform-prior player (whose tie-broken PUCT degenerates to 'always play
the leftmost column')."""

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.arena import ArenaResult, gate, make_arena_fn
from alphazero_tpu.config import MCTSConfig
from alphazero_tpu.games import ConnectFour
from alphazero_tpu.games.connect_four import ROWS, _has_win
from alphazero_tpu.models import make_uniform_model

G = ConnectFour()
UNIFORM = make_uniform_model(G)


def oracle_apply(params, feats):
    """Rule-based prior: win now > block opponent's win > center columns."""
    del params
    board = (feats[..., 0] - feats[..., 1]).astype(jnp.int8)  # [B, 6, 7]

    def per_board(b):
        heights = jnp.sum(jnp.abs(b), axis=0).astype(jnp.int32)

        def try_move(col, player):
            row = jnp.minimum(heights[col], ROWS - 1)
            nb = b.at[row, col].set(player)
            return _has_win(nb, player) & (heights[col] < ROWS)

        cols = jnp.arange(7)
        wins = jax.vmap(lambda c: try_move(c, 1))(cols)
        blocks = jax.vmap(lambda c: try_move(c, -1))(cols)
        center = -jnp.abs(cols - 3).astype(jnp.float32)
        return wins * 100.0 + blocks * 50.0 + center

    logits = jax.vmap(per_board)(board)
    return logits * 10.0, jnp.zeros((feats.shape[0],), jnp.float32)


def run_arena(apply_cand, apply_inc, num_games=16, sims=1, seed=0):
    play = jax.jit(
        make_arena_fn(
            G, apply_cand, apply_inc, MCTSConfig(num_sims=sims, max_depth=16), num_games
        )
    )
    return play({}, {}, jax.random.key(seed))


def test_totals_and_no_unfinished():
    r = run_arena(UNIFORM.apply_fn, UNIFORM.apply_fn, num_games=16, sims=4)
    total = int(r.cand_wins) + int(r.inc_wins) + int(r.draws) + int(r.unfinished)
    assert total == 16
    assert int(r.unfinished) == 0


def test_oracle_sweeps_uniform():
    r = run_arena(oracle_apply, UNIFORM.apply_fn, num_games=16, sims=1)
    assert int(r.cand_wins) == 16, f"oracle should sweep: {r}"
    assert gate(r, 0.6)


def test_uniform_loses_to_oracle_as_incumbent():
    r = run_arena(UNIFORM.apply_fn, oracle_apply, num_games=16, sims=1)
    assert int(r.inc_wins) == 16
    assert not gate(r, 0.6)


def test_seating_swap_fairness_same_player():
    # identical players with real search: neither side should sweep
    r = run_arena(UNIFORM.apply_fn, UNIFORM.apply_fn, num_games=32, sims=25, seed=3)
    cw, iw = int(r.cand_wins), int(r.inc_wins)
    assert cw + iw + int(r.draws) == 32
    assert cw > 0 and iw > 0


def test_arena_deterministic():
    r1 = run_arena(UNIFORM.apply_fn, UNIFORM.apply_fn, num_games=8, sims=8, seed=5)
    r2 = run_arena(UNIFORM.apply_fn, UNIFORM.apply_fn, num_games=8, sims=8, seed=5)
    assert tuple(map(int, r1)) == tuple(map(int, r2))


def test_gate_thresholds():
    mk = lambda c, i, d: ArenaResult(
        jnp.int32(c), jnp.int32(i), jnp.int32(d), jnp.int32(0)
    )
    assert gate(mk(6, 4, 0), 0.6)
    assert not gate(mk(5, 4, 1), 0.6)  # 5/9 < 0.6
    assert not gate(mk(0, 0, 10), 0.6)  # no decisive games -> keep incumbent
    assert gate(mk(3, 2, 5), 0.6)

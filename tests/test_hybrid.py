"""Hybrid descend/merge-kernel search (mcts/hybrid.py) — bit-exact
equivalence against the XLA lockstep engine for ARBITRARY models (the
hybrid evaluates the same ``apply_fn`` in XLA, so even conv nets must
match exactly, unlike the fused kernel's in-VMEM MLP re-evaluation).

Runs the Pallas interpreter on the CPU test backend (explicit block_size
opts in off-TPU); on TPU the hybrid is the conv-model self-play hot path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.config import MCTSConfig
from alphazero_tpu.games import ConnectFour
from alphazero_tpu.mcts.hybrid import make_hybrid_root_fn
from alphazero_tpu.mcts.search import make_search_fn
from alphazero_tpu.models import (
    AZResNet,
    MLPNet,
    init_flax_model,
    make_flax_apply_fn,
    make_uniform_model,
)
from tests.test_fused import _random_positions


def _check_match(game, apply_fn, params, cfg, B=8, moves=6, seed=0, rng=None):
    search = make_search_fn(game, apply_fn, cfg)
    hybrid = make_hybrid_root_fn(game, apply_fn, cfg, block_size=4)
    assert hybrid is not None
    state = _random_positions(game, B, moves, seed=seed)
    c_xla = np.array(search(params, state, rng=rng).root_counts())
    c_hyb = np.array(hybrid(params, state, rng))
    np.testing.assert_array_equal(c_xla, c_hyb)


@pytest.mark.parametrize("moves", [0, 6, 14])
def test_hybrid_uniform_matches_xla_engine(moves):
    game = ConnectFour()
    net = make_uniform_model(game)
    cfg = MCTSConfig(num_sims=20, max_depth=48)
    _check_match(game, net.apply_fn, {}, cfg, moves=moves, seed=moves)


def test_hybrid_mlp_matches_xla_engine():
    game = ConnectFour()
    model = MLPNet(num_actions=game.num_actions, hidden=(32, 32))
    apply_fn = make_flax_apply_fn(model)
    params = init_flax_model(model, jax.random.key(0), game.feature_shape)
    cfg = MCTSConfig(num_sims=24, max_depth=48)
    _check_match(game, apply_fn, params, cfg, moves=4, seed=1)


def test_hybrid_resnet_matches_xla_engine():
    """The conv flagship (BASELINE config 3) — the model class the hybrid
    engine exists for."""
    game = ConnectFour()
    model = AZResNet(num_actions=game.num_actions, channels=8, blocks=1)
    apply_fn = make_flax_apply_fn(model)
    params = init_flax_model(model, jax.random.key(2), game.feature_shape)
    cfg = MCTSConfig(num_sims=16, max_depth=48)
    _check_match(game, apply_fn, params, cfg, moves=2, seed=2)


def test_hybrid_sorted_blocking_identical():
    """Depth-sorted blocking (hybrid.py run_search_sorted) is a pure
    wall-clock optimization: counts at B>256 match the unsorted path
    bit-exactly (per-game kernel lanes and the row-independent model
    forward make the permutation invisible)."""
    import os

    game = ConnectFour()
    net = make_uniform_model(game)
    cfg = MCTSConfig(num_sims=6, max_depth=24)
    hybrid = make_hybrid_root_fn(game, net.apply_fn, cfg, block_size=32)
    state = _random_positions(game, 288, 9, seed=5)
    os.environ["AZ_SORT_MIN_BATCH"] = "288"  # default 8192 (round-4 A/B)
    try:
        c_sorted = np.array(hybrid({}, state))
        os.environ["AZ_FUSED_NOSORT"] = "1"
        try:
            c_plain = np.array(hybrid({}, state))
        finally:
            del os.environ["AZ_FUSED_NOSORT"]
    finally:
        del os.environ["AZ_SORT_MIN_BATCH"]
    np.testing.assert_array_equal(c_sorted, c_plain)


def test_hybrid_capacity_limited_matches():
    game = ConnectFour()
    net = make_uniform_model(game)
    cfg = MCTSConfig(num_sims=20, max_depth=48, max_nodes=8)
    _check_match(game, net.apply_fn, {}, cfg, moves=4, seed=3)


def test_hybrid_dirichlet_matches():
    game = ConnectFour()
    model = MLPNet(num_actions=game.num_actions, hidden=(16,))
    apply_fn = make_flax_apply_fn(model)
    params = init_flax_model(model, jax.random.key(4), game.feature_shape)
    cfg = MCTSConfig(
        num_sims=16, max_depth=48, dirichlet_alpha=0.7, dirichlet_frac=0.25
    )
    _check_match(
        game, apply_fn, params, cfg, moves=2, seed=5, rng=jax.random.key(11)
    )


def test_hybrid_gating():
    """Hybrid rejects indivisible round configs and declines games
    without flat ops."""
    game = ConnectFour()
    net = make_uniform_model(game)
    cfg = MCTSConfig(num_sims=20, max_depth=48, parallel_sims=3)
    with pytest.raises(ValueError):
        make_hybrid_root_fn(game, net.apply_fn, cfg, block_size=4)

    from tests.dummy_game import CountingGame

    cfg_ok = MCTSConfig(num_sims=8, max_depth=8)
    assert (
        make_hybrid_root_fn(CountingGame(), net.apply_fn, cfg_ok, block_size=4)
        is None
    )


def test_arena_hybrid_matches_xla_engine():
    """The arena's hybrid branch (combined two-model forward between the
    kernels) produces the same result as its XLA-engine branch.

    Uses a CONV model: MLP apply_fns carry kernel_eval_factory, which
    routes the arena through its fused branch instead — a conv net is the
    model class whose arena games actually run the hybrid branch."""
    from alphazero_tpu.arena import make_arena_fn

    game = ConnectFour()
    model = AZResNet(num_actions=game.num_actions, channels=8, blocks=1)
    apply_fn = make_flax_apply_fn(model)
    p_cand = init_flax_model(model, jax.random.key(1), game.feature_shape)
    p_inc = init_flax_model(model, jax.random.key(2), game.feature_shape)
    cfg = MCTSConfig(num_sims=6, max_depth=48)

    play_xla = make_arena_fn(game, apply_fn, apply_fn, cfg, num_games=4, max_moves=8)
    play_hyb = make_arena_fn(
        game, apply_fn, apply_fn, cfg, num_games=4, max_moves=8, block_size=4
    )
    key = jax.random.key(9)
    r_xla = play_xla(p_cand, p_inc, key)
    r_hyb = play_hyb(p_cand, p_inc, key)
    assert tuple(map(int, r_xla)) == tuple(map(int, r_hyb))


def test_arena_hybrid_parallel_sims():
    """Regression: the arena hybrid branch with parallel_sims=K>1 evaluates
    K*B leaf rows per round — the combined two-model forward must tile its
    per-game row select to match (crashed at trace time before)."""
    from alphazero_tpu.arena import make_arena_fn

    game = ConnectFour()
    model = AZResNet(num_actions=game.num_actions, channels=8, blocks=1)
    apply_fn = make_flax_apply_fn(model)
    p_cand = init_flax_model(model, jax.random.key(1), game.feature_shape)
    p_inc = init_flax_model(model, jax.random.key(2), game.feature_shape)
    cfg = MCTSConfig(num_sims=8, max_depth=48, parallel_sims=2)

    play = make_arena_fn(
        game, apply_fn, apply_fn, cfg, num_games=4, max_moves=8, block_size=4
    )
    r = play(p_cand, p_inc, jax.random.key(9))
    total = int(r.cand_wins) + int(r.inc_wins) + int(r.draws) + int(r.unfinished)
    assert total == 4


# ---------------------------------------------------------------------------
# Othello on the hybrid engine (large action space, pass moves, nonzero
# depth-cutoff heuristic)
# ---------------------------------------------------------------------------

def _random_oth_positions(game, B, moves, seed):
    rng = np.random.default_rng(seed)
    state = jax.vmap(lambda _: game.init())(jnp.arange(B))
    step_v = jax.jit(jax.vmap(game.step))
    for _ in range(moves):
        vm = np.array(jax.vmap(game.valid_moves)(state))
        acts = np.array([rng.choice(np.nonzero(v)[0]) for v in vm])
        nxt = step_v(state, jnp.asarray(acts))
        done, _ = jax.vmap(game.terminal)(nxt)
        keep = np.array(done)[:, None, None]
        state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(keep, o, n), nxt, state
        )
    return state


def test_othello_flat_step_matches_game_step():
    """The kernel-friendly ray-walk step reproduces Othello.step exactly,
    for every action (incl. pass and illegal placements) on random
    midgame boards."""
    from alphazero_tpu.games import Othello

    game = Othello()
    ops = game.flat_ops()
    state = _random_oth_positions(game, 16, 11, seed=3)
    boards = ops.from_state(state)
    for a in range(game.num_actions):
        acts = jnp.full((16,), a, jnp.int32)
        ref = jax.vmap(game.step)(state, acts).board
        flat = ops.step(boards, jnp.full((16, 1), float(a)))
        np.testing.assert_array_equal(
            np.asarray(ref).reshape(16, 64), np.asarray(flat).astype(np.int8)
        )


@pytest.mark.parametrize("moves", [0, 8])
def test_hybrid_othello_uniform_matches_xla_engine(moves):
    from alphazero_tpu.games import Othello

    game = Othello()
    net = make_uniform_model(game)
    cfg = MCTSConfig(num_sims=10, max_depth=64)
    search = make_search_fn(game, net.apply_fn, cfg)
    hybrid = make_hybrid_root_fn(game, net.apply_fn, cfg, block_size=4)
    assert hybrid is not None
    state = _random_oth_positions(game, 4, moves, seed=moves)
    np.testing.assert_array_equal(
        np.array(search({}, state).root_counts()),
        np.array(hybrid({}, state)),
    )


def test_hybrid_othello_mlp_cutoff_matches_xla_engine():
    """Tiny max_depth forces depth-cutoff leaves: the hybrid must back up
    the same nonzero disc-differential heuristic as the XLA engine."""
    from alphazero_tpu.games import Othello

    game = Othello()
    model = MLPNet(num_actions=game.num_actions, hidden=(16,))
    apply_fn = make_flax_apply_fn(model)
    params = init_flax_model(model, jax.random.key(3), game.feature_shape)
    cfg = MCTSConfig(num_sims=12, max_depth=3)
    search = make_search_fn(game, apply_fn, cfg)
    hybrid = make_hybrid_root_fn(game, apply_fn, cfg, block_size=4)
    assert hybrid is not None
    state = _random_oth_positions(game, 4, 6, seed=9)
    np.testing.assert_array_equal(
        np.array(search(params, state).root_counts()),
        np.array(hybrid(params, state)),
    )


# ---------------------------------------------------------------------------
# Hex on the hybrid engine (connection goal: the flood-fill terminal runs
# in the XLA stage; the kernel-side step is the parity-lane remap —
# games/hex.py HexFlatOps)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("moves", [0, 9, 30])
def test_hybrid_hex_uniform_matches_xla_engine(moves):
    from alphazero_tpu.games import Hex

    game = Hex()
    net = make_uniform_model(game)
    cfg = MCTSConfig(num_sims=16, max_depth=49)
    search = make_search_fn(game, net.apply_fn, cfg)
    hybrid = make_hybrid_root_fn(game, net.apply_fn, cfg, block_size=4)
    assert hybrid is not None
    state = _random_oth_positions(game, 4, moves, seed=moves)
    np.testing.assert_array_equal(
        np.array(search({}, state).root_counts()),
        np.array(hybrid({}, state)),
    )


def test_hybrid_hex_mlp_matches_xla_engine():
    from alphazero_tpu.games import Hex

    game = Hex()
    model = MLPNet(num_actions=game.num_actions, hidden=(16,))
    apply_fn = make_flax_apply_fn(model)
    params = init_flax_model(model, jax.random.key(5), game.feature_shape)
    cfg = MCTSConfig(num_sims=12, max_depth=49)
    search = make_search_fn(game, apply_fn, cfg)
    hybrid = make_hybrid_root_fn(game, apply_fn, cfg, block_size=4)
    assert hybrid is not None
    state = _random_oth_positions(game, 4, 12, seed=11)
    np.testing.assert_array_equal(
        np.array(search(params, state).root_counts()),
        np.array(hybrid(params, state)),
    )


def test_hybrid_hex_gumbel_unaffected():
    """The gumbel engine ignores flat_ops; adding HexFlatOps must not
    break its Hex path (rng-stream compatibility invariant)."""
    from alphazero_tpu.games import Hex
    from alphazero_tpu.mcts.gumbel import make_gumbel_search_fn

    game = Hex()
    net = make_uniform_model(game)
    cfg = MCTSConfig(
        num_sims=8, max_depth=16, gumbel=True, dirichlet_alpha=None
    )
    gsearch = make_gumbel_search_fn(game, net.apply_fn, cfg)
    state = _random_oth_positions(game, 2, 4, seed=2)
    res = gsearch({}, state, jax.random.key(0), cfg.num_sims)
    assert np.array(res.action).shape == (2,)
    np.testing.assert_allclose(
        np.array(res.improved_pi).sum(axis=1), 1.0, rtol=1e-5
    )


# ---------------------------------------------------------------------------
# K-leaf-parallel rounds (parallel_sims > 1)
# ---------------------------------------------------------------------------

def test_hybrid_rounds_match_fused_rounds():
    """parallel_sims=K in the hybrid implements exactly the fused kernel's
    round semantics (virtual-loss runner-up rotation + duplicate-claim
    suppression) — cross-validated bit-for-bit on the same positions."""
    from alphazero_tpu.mcts.fused import make_fused_root_fn

    game = ConnectFour()
    net = make_uniform_model(game)
    cfg = MCTSConfig(num_sims=24, max_depth=48, parallel_sims=4)
    fused = make_fused_root_fn(game, net.apply_fn, cfg, block_size=4)
    hybrid = make_hybrid_root_fn(game, net.apply_fn, cfg, block_size=4)
    assert fused is not None and hybrid is not None
    state = _random_positions(game, 8, 6, seed=21)
    np.testing.assert_array_equal(
        np.array(fused({}, state)), np.array(hybrid({}, state))
    )


def test_hybrid_rounds_sim_budget_and_determinism():
    """Othello (large A, no fused counterpart): every round backs up K
    values — root visit counts sum to num_sims on fresh boards — and the
    search is deterministic."""
    from alphazero_tpu.games import Othello

    game = Othello()
    net = make_uniform_model(game)
    cfg = MCTSConfig(num_sims=12, max_depth=64, parallel_sims=3)
    hybrid = make_hybrid_root_fn(game, net.apply_fn, cfg, block_size=4)
    assert hybrid is not None
    state = jax.vmap(lambda _: game.init())(jnp.arange(4))
    c1 = np.array(hybrid({}, state))
    c2 = np.array(hybrid({}, state))
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(c1.sum(axis=1), 12)


def test_hybrid_rounds_capacity_limited_matches_fused():
    """Slot exhaustion inside a round (max_nodes < sims) degrades
    identically to the fused kernel's rounds."""
    from alphazero_tpu.mcts.fused import make_fused_root_fn

    game = ConnectFour()
    net = make_uniform_model(game)
    cfg = MCTSConfig(num_sims=24, max_depth=48, max_nodes=10, parallel_sims=4)
    fused = make_fused_root_fn(game, net.apply_fn, cfg, block_size=4)
    hybrid = make_hybrid_root_fn(game, net.apply_fn, cfg, block_size=4)
    state = _random_positions(game, 8, 4, seed=31)
    np.testing.assert_array_equal(
        np.array(fused({}, state)), np.array(hybrid({}, state))
    )


def test_hybrid_fuzz_random_configs():
    """Seeded fuzz: random (sims, cpuct, capacity, depth, K) configs must
    stay bit-exact across the engine pair on random midgame positions —
    broadens the certified envelope beyond the hand-picked cases."""
    import random

    rnd = random.Random(1234)
    game = ConnectFour()
    net = make_uniform_model(game)
    for trial in range(6):
        K = rnd.choice([1, 1, 2, 4])
        sims = K * rnd.randint(3, 8)
        cfg = MCTSConfig(
            num_sims=sims,
            cpuct=rnd.choice([0.5, 1.0, 2.5]),
            max_depth=rnd.choice([4, 16, 48]),
            max_nodes=rnd.choice([None, max(4, sims // 2)]),
            parallel_sims=K,
        )
        state = _random_positions(game, 8, rnd.randint(0, 16), seed=trial)
        hybrid = make_hybrid_root_fn(game, net.apply_fn, cfg, block_size=4)
        if K == 1:
            ref = make_search_fn(game, net.apply_fn, cfg)({}, state).root_counts()
        else:
            from alphazero_tpu.mcts.fused import make_fused_root_fn

            ref = make_fused_root_fn(game, net.apply_fn, cfg, block_size=4)({}, state)
        np.testing.assert_array_equal(
            np.array(ref), np.array(hybrid({}, state)),
            err_msg=f"trial {trial}: {cfg}",
        )


def test_hybrid_declines_host_callback_models():
    """pure_callback models serialize the search on the host round-trip;
    they stay on the XLA engine (the documented escape hatch)."""
    from alphazero_tpu.models.bridge import HostModelBridge

    game = ConnectFour()
    bridge = HostModelBridge(game.num_actions)
    cfg = MCTSConfig(num_sims=8, max_depth=16)
    assert make_hybrid_root_fn(game, bridge.apply_fn, cfg, block_size=4) is None

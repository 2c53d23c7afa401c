"""Fused VMEM-resident search kernel (mcts/fused.py) — bit-exact
equivalence against the XLA lockstep engine (which is itself verified
against the sequential C++ oracle in test_native.py).

Runs the Pallas interpreter on the CPU test backend (an explicit
block_size opts in off-TPU); on TPU hardware the same kernel is the
bench.py hot path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.config import MCTSConfig
from alphazero_tpu.games import ConnectFour
from alphazero_tpu.mcts.fused import make_fused_root_fn
from alphazero_tpu.mcts.search import make_search_fn
from alphazero_tpu.models import make_uniform_model


def _random_positions(game, B, moves, seed):
    """Play `moves` uniformly-random valid moves (done games freeze)."""
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


@pytest.mark.parametrize("moves", [0, 6, 14])
def test_fused_matches_xla_engine(moves):
    game = ConnectFour()
    net = make_uniform_model(game)
    cfg = MCTSConfig(num_sims=20, max_depth=48)
    search = make_search_fn(game, net.apply_fn, cfg)
    fused = make_fused_root_fn(game, net.apply_fn, cfg, block_size=4)
    assert fused is not None

    state = _random_positions(game, 8, moves, seed=moves)
    c_xla = np.array(search({}, state).root_counts())
    c_fused = np.array(fused({}, state))
    np.testing.assert_array_equal(c_xla, c_fused)


def test_fused_sorted_blocking_identical():
    """Depth-sorted blocking (fused.py run_kernel_sorted — groups
    like-depth games into the same block so one endgame board doesn't
    stall a block of opening boards) is a pure wall-clock optimization:
    counts at B>256 match the unsorted kernel bit-exactly."""
    import os

    game = ConnectFour()
    net = make_uniform_model(game)
    cfg = MCTSConfig(num_sims=8, max_depth=24)
    fused = make_fused_root_fn(game, net.apply_fn, cfg, block_size=32)
    state = _random_positions(game, 288, 9, seed=3)
    os.environ["AZ_SORT_MIN_BATCH"] = "288"  # default 8192 (round-4 A/B)
    try:
        c_sorted = np.array(fused({}, state))
        os.environ["AZ_FUSED_NOSORT"] = "1"
        try:
            c_plain = np.array(fused({}, state))
        finally:
            del os.environ["AZ_FUSED_NOSORT"]
    finally:
        del os.environ["AZ_SORT_MIN_BATCH"]
    np.testing.assert_array_equal(c_sorted, c_plain)
    # the proxy actually varied (the sort did something)
    from alphazero_tpu.games.connect_four import ConnectFourState

    stones = np.asarray(jnp.sum(jnp.abs(state.board), axis=(1, 2)))
    assert len(np.unique(stones)) > 1


def test_fused_capacity_limited_matches():
    """Slot exhaustion (max_nodes < sims) degrades identically."""
    game = ConnectFour()
    net = make_uniform_model(game)
    cfg = MCTSConfig(num_sims=20, max_depth=48, max_nodes=8)
    search = make_search_fn(game, net.apply_fn, cfg)
    fused = make_fused_root_fn(game, net.apply_fn, cfg, block_size=4)
    state = _random_positions(game, 8, 4, seed=3)
    np.testing.assert_array_equal(
        np.array(search({}, state).root_counts()), np.array(fused({}, state))
    )


def test_fused_dirichlet_matches():
    """Root Dirichlet noise path: same key -> same prior -> same counts."""
    game = ConnectFour()
    net = make_uniform_model(game)
    cfg = MCTSConfig(
        num_sims=16, max_depth=48, dirichlet_alpha=0.7, dirichlet_frac=0.25
    )
    search = make_search_fn(game, net.apply_fn, cfg)
    fused = make_fused_root_fn(game, net.apply_fn, cfg, block_size=4)
    state = _random_positions(game, 4, 2, seed=7)
    key = jax.random.key(11)
    np.testing.assert_array_equal(
        np.array(search({}, state, rng=key).root_counts()),
        np.array(fused({}, state, key)),
    )


def test_fused_declines_models_without_kernel_eval():
    """Models with neither a constant prior nor an in-kernel evaluator
    (e.g. conv nets) must fall back to the XLA engine."""
    game = ConnectFour()
    cfg = MCTSConfig(num_sims=8)

    def nn_apply(variables, feats):
        return jnp.zeros((feats.shape[0], game.num_actions)), jnp.zeros(
            feats.shape[0]
        )

    assert make_fused_root_fn(game, nn_apply, cfg, block_size=4) is None


def _mlp_setup():
    from alphazero_tpu.models import MLPNet, init_flax_model, make_flax_apply_fn

    game = ConnectFour()
    mlp = MLPNet(num_actions=game.num_actions, hidden=(32, 32))
    variables = init_flax_model(mlp, jax.random.key(0), game.feature_shape)
    apply_fn = make_flax_apply_fn(mlp)  # auto-attaches the kernel eval
    return game, variables, apply_fn


def test_fused_mlp_close_to_xla_engine():
    """NN-in-kernel path: Mosaic vs XLA bf16 rounding may flip rare PUCT
    argmax ties, so equality is statistical — most games bit-identical,
    visit-count mass within a small tolerance everywhere."""
    game, variables, apply_fn = _mlp_setup()
    cfg = MCTSConfig(num_sims=24, max_depth=48)
    search = make_search_fn(game, apply_fn, cfg)
    fused = make_fused_root_fn(game, apply_fn, cfg, block_size=4)
    assert fused is not None

    state = _random_positions(game, 16, 5, seed=2)
    c_xla = np.array(search(variables, state).root_counts())
    c_fused = np.array(fused(variables, state))
    assert (c_fused.sum(axis=1) == c_xla.sum(axis=1)).all()  # sims conserved
    rows_equal = (c_xla == c_fused).all(axis=1).mean()
    assert rows_equal >= 0.75, f"only {rows_equal:.0%} of games identical"
    # distributions stay close even where ties flipped
    p_x = c_xla / np.maximum(c_xla.sum(1, keepdims=True), 1)
    p_f = c_fused / np.maximum(c_fused.sum(1, keepdims=True), 1)
    assert np.abs(p_x - p_f).max() <= 0.25


def test_parallel_sims_sanity():
    """K leaf-parallel descents: sims conserved, deterministic, and the
    root spread stays sane (opt-in knob; K=1 remains the exact config)."""
    game = ConnectFour()
    net = make_uniform_model(game)
    cfg = MCTSConfig(num_sims=24, max_depth=48, parallel_sims=4)
    fused = make_fused_root_fn(game, net.apply_fn, cfg, block_size=4)
    assert fused is not None
    state = _random_positions(game, 8, 4, seed=5)
    c = np.array(fused({}, state))
    done = np.array(jax.vmap(game.terminal)(state)[0])
    assert (c.sum(axis=1)[~done] == cfg.num_sims).all()
    assert (c.sum(axis=1)[done] == 0).all()
    np.testing.assert_array_equal(c, np.array(fused({}, state)))


def test_parallel_sims_validation():
    game = ConnectFour()
    net = make_uniform_model(game)
    with pytest.raises(ValueError):
        make_fused_root_fn(
            game,
            net.apply_fn,
            MCTSConfig(num_sims=25, parallel_sims=4),
            block_size=4,
        )


def test_fused_mlp_deterministic():
    """Fused NN path is bit-deterministic under a fixed seed."""
    game, variables, apply_fn = _mlp_setup()
    cfg = MCTSConfig(num_sims=24, max_depth=48)
    fused = make_fused_root_fn(game, apply_fn, cfg, block_size=4)
    state = _random_positions(game, 8, 4, seed=9)
    a = np.array(fused(variables, state))
    b = np.array(fused(variables, state))
    np.testing.assert_array_equal(a, b)


def test_flat_ops_match_game_dynamics():
    """FlatOps step/valid/terminal == ConnectFour methods on random boards."""
    game = ConnectFour()
    ops = game.flat_ops()
    aux = ops.aux()
    state = _random_positions(game, 16, 9, seed=1)
    flat = ops.from_state(state)

    vm_ref = np.array(jax.vmap(game.valid_moves)(state))
    np.testing.assert_array_equal(np.array(ops.valid(flat)), vm_ref)

    done_ref, val_ref = jax.vmap(game.terminal)(state)
    done_f, val_f = ops.terminal(flat, aux)
    np.testing.assert_array_equal(np.array(done_f)[:, 0], np.array(done_ref))
    np.testing.assert_array_equal(np.array(val_f)[:, 0], np.array(val_ref))

    rng = np.random.default_rng(5)
    acts = np.array([rng.choice(np.nonzero(v)[0]) for v in vm_ref])
    nxt_ref = jax.vmap(game.step)(state, jnp.asarray(acts))
    nxt_flat = ops.step(flat, jnp.asarray(acts, jnp.float32)[:, None])
    np.testing.assert_array_equal(
        np.array(nxt_flat), np.array(ops.from_state(nxt_ref))
    )

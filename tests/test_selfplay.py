"""Self-play episode generation tests (coverage the reference lacked for
Coach::execute_episode, coach.rs:104-157)."""

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.config import MCTSConfig, SelfPlayConfig
from alphazero_tpu.games import ConnectFour
from alphazero_tpu.models import make_uniform_model
from alphazero_tpu.selfplay import make_actor_step_fn, make_selfplay_fn

G = ConnectFour()
NET = make_uniform_model(G)


def run_selfplay(B=8, sims=25, seed=0, temp_threshold=15):
    fn = jax.jit(
        make_selfplay_fn(
            G,
            NET.apply_fn,
            MCTSConfig(num_sims=sims, max_depth=48),
            SelfPlayConfig(batch_size=B, temp_threshold=temp_threshold),
        )
    )
    return fn({}, jax.random.key(seed))


def test_selfplay_shapes_and_termination():
    traj, stats = run_selfplay(B=8)
    T, B = 42, 8
    assert traj.features.shape == (T, B, 6, 7, 2)
    assert traj.pi.shape == (T, B, 7)
    assert traj.value.shape == (T, B)
    assert traj.valid.shape == (T, B)
    assert bool(np.asarray(stats.done).all())
    moves = np.asarray(stats.num_moves)
    assert np.all((moves >= 7) & (moves <= 42))
    # valid mask matches move counts exactly
    valid = np.asarray(traj.valid)
    np.testing.assert_array_equal(valid.sum(0), moves)


def test_value_targets_alternate_and_respect_outcome():
    traj, stats = run_selfplay(B=16, seed=3)
    value = np.asarray(traj.value)
    valid = np.asarray(traj.valid)
    moves = np.asarray(stats.num_moves)
    outcome = np.asarray(stats.outcome)
    for b in range(16):
        m = moves[b]
        if outcome[b] == 0.0:
            assert np.all(value[:, b] == 0.0)
            continue
        # the last mover won (outcome -1 from final to-move perspective)
        assert outcome[b] == -1.0
        assert value[m - 1, b] == 1.0  # winner's final sample
        if m >= 2:
            assert value[m - 2, b] == -1.0  # loser's final sample
        # strict alternation along the whole episode
        signs = value[:m, b]
        assert np.all(signs[:-1] == -signs[1:])
        # masked tail is zero
        assert np.all(value[m:, b] == 0.0)
        assert not valid[m:, b].any()


def test_policy_targets_are_distributions():
    traj, stats = run_selfplay(B=8, seed=1)
    pi = np.asarray(traj.pi)
    valid = np.asarray(traj.valid)
    sums = pi.sum(-1)[valid]
    np.testing.assert_allclose(sums, 1.0, atol=1e-5)


def test_selfplay_deterministic():
    t1, s1 = run_selfplay(B=4, seed=7)
    t2, s2 = run_selfplay(B=4, seed=7)
    np.testing.assert_array_equal(np.asarray(t1.pi), np.asarray(t2.pi))
    np.testing.assert_array_equal(
        np.asarray(s1.num_moves), np.asarray(s2.num_moves)
    )


def test_selfplay_seed_sensitivity():
    t1, s1 = run_selfplay(B=8, seed=0)
    t2, s2 = run_selfplay(B=8, seed=1)
    assert not np.array_equal(np.asarray(s1.num_moves), np.asarray(s2.num_moves)) or (
        not np.array_equal(np.asarray(t1.pi), np.asarray(t2.pi))
    )


def test_actor_step_recycles():
    B = 8
    init_carry, actor_step = make_actor_step_fn(
        G, NET.apply_fn, MCTSConfig(num_sims=15, max_depth=48), B, temp_threshold=15
    )
    step = jax.jit(actor_step)
    carry = init_carry()
    key = jax.random.key(0)
    total_height = []
    for i in range(60):
        key, sub = jax.random.split(key)
        carry, pi = step({}, carry, sub)
        state, move_count = carry
        heights = np.abs(np.asarray(state.board)).sum((1, 2))
        mc = np.asarray(move_count)
        # invariant: piece count equals move count (fresh games recycled to 0)
        np.testing.assert_array_equal(heights, mc)
        total_height.append(mc.copy())
    stacked = np.stack(total_height)
    # at least one game recycled within 60 plies
    assert (stacked[1:] < stacked[:-1]).any()

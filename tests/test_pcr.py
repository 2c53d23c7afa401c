"""Playout-cap randomization tests (KataGo, Wu 2020 §3.1 — a framework
extension; no reference analogue).

The contract: with ``SelfPlayConfig.full_search_prob = p``, each move-step
searches the full budget with probability p (policy target recorded) and
the cheap budget otherwise (value-only sample: pi target = all zeros).
``train.py`` normalizes the policy loss over policy-bearing rows only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from alphazero_tpu.config import (
    MCTSConfig,
    ReplayConfig,
    SelfPlayConfig,
    TrainConfig,
)
from alphazero_tpu.games import ConnectFour
from alphazero_tpu.models import MLPNet, make_uniform_model
from alphazero_tpu.replay import replay_init, replay_insert, replay_sample
from alphazero_tpu.selfplay import make_selfplay_fn
from alphazero_tpu.train import init_train_state, make_train_step

G = ConnectFour()
NET = make_uniform_model(G)


def play(p_full, cheap=4, sims=12, B=8, gumbel=False, seed=0):
    mcts = MCTSConfig(num_sims=sims, gumbel=gumbel)
    sp = SelfPlayConfig(
        batch_size=B, temp_threshold=5, full_search_prob=p_full,
        cheap_sims=cheap,
    )
    fn = jax.jit(make_selfplay_fn(G, NET.apply_fn, mcts, sp))
    return fn({}, jax.random.PRNGKey(seed))


def pi_row_kind(traj):
    """Per valid sample: True = policy-bearing (sums to 1), False =
    value-only (all zeros). Asserts nothing in between."""
    pi = np.asarray(traj.pi)
    valid = np.asarray(traj.valid)
    sums = pi[valid].sum(-1)
    full = sums > 0.5
    np.testing.assert_allclose(sums[full], 1.0, rtol=1e-4)
    np.testing.assert_allclose(sums[~full], 0.0, atol=1e-7)
    return full


def test_prob_one_matches_always_full():
    traj, stats = play(p_full=1.0)
    assert bool(np.asarray(stats.done).all())
    full = pi_row_kind(traj)
    assert full.all()


def test_prob_zero_emits_only_value_samples():
    traj, stats = play(p_full=0.0)
    assert bool(np.asarray(stats.done).all())
    full = pi_row_kind(traj)
    assert not full.any()
    # value targets still resolve through the outcome walk-back
    v = np.asarray(traj.value)[np.asarray(traj.valid)]
    assert np.any(v != 0)


@pytest.mark.parametrize("gumbel", [False, True])
def test_mixed_prob_produces_both_kinds(gumbel):
    traj, stats = play(p_full=0.5, gumbel=gumbel, seed=3)
    assert bool(np.asarray(stats.done).all())
    full = pi_row_kind(traj)
    assert full.any() and (~full).any()


@pytest.mark.parametrize("gumbel", [False, True])
def test_coin_is_per_game_and_stratified(gumbel):
    """KataGo §3.1's lever is per-position: within a move-step, EXACTLY
    round(p*B) games get the full budget (stratified split), and the
    assignment varies across steps — no batch-shared coin."""
    B, p = 8, 0.5
    traj, _ = play(p_full=p, gumbel=gumbel, seed=5, B=B)
    pi = np.asarray(traj.pi)
    valid = np.asarray(traj.valid)
    mixed_steps = 0
    patterns = set()
    for t in range(pi.shape[0]):
        if valid[t].all():  # full-batch steps: the count is exact
            kinds = pi[t].sum(-1) > 0.5
            assert kinds.sum() == round(p * B)
            patterns.add(tuple(kinds))
            if kinds.any() and not kinds.all():
                mixed_steps += 1
    assert mixed_steps > 0          # per-game, not per-step
    assert len(patterns) > 1        # assignment re-randomized per step


def test_value_only_rows_flow_through_replay():
    traj, _ = play(p_full=0.5, seed=3)
    replay = replay_insert(replay_init(G, ReplayConfig(capacity=4096)), G, traj)
    n_valid = int(np.asarray(traj.valid).sum())
    # symmetries double the samples; all valid rows inserted (incl. value-only)
    assert int(replay.size) == 2 * n_valid
    feats, pi, v = replay_sample(replay, jax.random.PRNGKey(0), 64, G)
    sums = np.asarray(pi).sum(-1)
    assert ((sums < 1e-6) | (np.abs(sums - 1.0) < 1e-4)).all()


def test_policy_loss_normalizes_over_policy_rows():
    """p_loss must equal the mean CE over pi-bearing rows only — adding
    value-only rows to the batch must not dilute it."""
    model = MLPNet(num_actions=G.num_actions, hidden=(16,))
    tcfg = TrainConfig(l2_scale=0.0)
    state = init_train_state(model, jax.random.PRNGKey(0), G.feature_shape, tcfg)
    step = jax.jit(make_train_step(model, tcfg))

    k = jax.random.PRNGKey(1)
    feats = jax.random.normal(k, (8,) + tuple(G.feature_shape))
    pi_t = jax.nn.softmax(jax.random.normal(k, (8, G.num_actions)))
    v_t = jnp.zeros((8,))
    _, m_all = step(state, feats, pi_t, v_t, k)

    # same 8 policy rows + 8 value-only rows appended
    feats2 = jnp.concatenate([feats, feats])
    pi_t2 = jnp.concatenate([pi_t, jnp.zeros_like(pi_t)])
    v_t2 = jnp.concatenate([v_t, v_t])
    _, m_mix = step(state, feats2, pi_t2, v_t2, k)
    np.testing.assert_allclose(
        float(m_mix.policy_loss), float(m_all.policy_loss), rtol=1e-5
    )


def test_validation_errors():
    with pytest.raises(ValueError):
        make_selfplay_fn(
            G, NET.apply_fn, MCTSConfig(num_sims=8),
            SelfPlayConfig(batch_size=2, full_search_prob=0.25),
        )
    with pytest.raises(ValueError):
        make_selfplay_fn(
            G, NET.apply_fn, MCTSConfig(num_sims=8, tree_reuse=True),
            SelfPlayConfig(batch_size=2, full_search_prob=0.25, cheap_sims=2),
        )


def test_coach_smoke_with_pcr():
    from alphazero_tpu.coach import Coach
    from alphazero_tpu.config import ArenaConfig, AZConfig

    cfg = AZConfig(
        mcts=MCTSConfig(num_sims=8),
        selfplay=SelfPlayConfig(
            batch_size=8, temp_threshold=5, full_search_prob=0.5, cheap_sims=3
        ),
        replay=ReplayConfig(capacity=2048),
        train=TrainConfig(batch_size=16, steps_per_iteration=4),
        arena=ArenaConfig(num_games=4),
        num_iterations=1,
    )
    coach = Coach(G, MLPNet(num_actions=G.num_actions, hidden=(16,)), cfg)
    (rec,) = coach.learn()
    assert rec["replay_size"] > 0

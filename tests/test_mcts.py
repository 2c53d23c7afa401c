"""Vectorized-MCTS unit tests.

The analogue of the reference's NodeStore/search coverage (reference:
node.rs:379-656) rebuilt for the array tree: structural invariants instead
of packed-counter decode checks, plus behavioral tests the reference lacked
entirely (AsyncMcts had zero tests — SURVEY.md §4): tactical win/block
finding, negamax backup, determinism, and the defect-D2 regression on
action_probs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.config import MCTSConfig
from alphazero_tpu.games import ConnectFour
from alphazero_tpu.mcts import make_search_fn
from alphazero_tpu.mcts.tree import init_tree
from alphazero_tpu.models import make_uniform_model
from alphazero_tpu.ops import action_probs, masked_policy

G = ConnectFour()
NET = make_uniform_model(G)


def batched_state(move_lists):
    """Stack the states reached by each scripted move list."""
    states = []
    for moves in move_lists:
        s = G.init()
        for m in moves:
            s = G.step(s, jnp.int32(m))
        states.append(s)
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def run_search(move_lists, num_sims=100, **kw):
    cfg = MCTSConfig(num_sims=num_sims, **kw)
    search = jax.jit(make_search_fn(G, NET.apply_fn, cfg))
    root = batched_state(move_lists)
    return search({}, root)


def test_root_counts_sum_to_num_sims():
    tree = run_search([[], [3], [3, 3]], num_sims=50)
    counts = np.asarray(tree.root_counts())
    np.testing.assert_array_equal(counts.sum(-1), [50, 50, 50])


def test_tree_structural_invariants():
    tree = run_search([[], [0, 1, 0]], num_sims=64)
    N, W, child = map(np.asarray, (tree.N, tree.W, tree.child))
    count = np.asarray(tree.count)
    C = tree.capacity
    assert np.all(count <= C)
    cursor = np.asarray(tree.cursor)
    assert np.all(cursor <= C)
    # children indices in range and only below the per-game slot cursor
    for b in range(N.shape[0]):
        kids = child[b][child[b] >= 0]
        assert np.all(kids < cursor[b])
        # no node is pointed at twice (pure tree, no DAG/transposition)
        assert len(kids) == len(np.unique(kids))
    # Q bounded by game value range
    q = W / np.maximum(N, 1)
    assert np.all(np.abs(q) <= 1.0 + 1e-5)
    # visit conservation: each sim adds exactly one root edge visit
    assert N[:, 0].sum() == 64 * 2


def test_finds_immediate_win():
    # player to move completes 4 vertically in column 0
    tree = run_search([[0, 1, 0, 1, 0, 1]], num_sims=100)
    counts = np.asarray(tree.root_counts())[0]
    assert counts.argmax() == 0
    # the winning edge's Q should be ~+1
    q = np.asarray(tree.root_q())[0]
    assert q[0] > 0.9


def test_blocks_immediate_threat():
    # opponent (-1) has three in column 0 and wins there next move;
    # with negamax backup the only non-losing reply is to block column 0.
    tree = run_search([[0, 1, 0, 1, 0]], num_sims=300, max_depth=16)
    counts = np.asarray(tree.root_counts())[0]
    assert counts.argmax() == 0, f"expected block at col 0, counts={counts}"


def test_full_column_never_visited():
    # regression: a root with an illegal move (full column) must never give
    # that action a visit — the -inf-times-zero NaN poisoning bug.
    tree = run_search([[2, 2, 2, 2, 2, 2, 0, 1]], num_sims=60, max_depth=16)
    counts = np.asarray(tree.root_counts())[0]
    assert counts[2] == 0, f"illegal column visited: {counts}"
    assert counts.sum() == 60
    assert np.isfinite(np.asarray(tree.W)).all()


def test_terminal_root_is_inert():
    # finished game: search must not crash and must not accumulate visits
    win = [0, 1, 0, 1, 0, 1, 0]
    tree = run_search([win, []], num_sims=20)
    counts = np.asarray(tree.root_counts())
    assert counts[0].sum() == 0      # terminal root: no sims ran
    assert counts[1].sum() == 20
    assert int(np.asarray(tree.count)[0]) == 1  # nothing expanded


def test_deterministic_under_jit():
    t1 = run_search([[3, 2], [0, 0]], num_sims=80)
    t2 = run_search([[3, 2], [0, 0]], num_sims=80)
    np.testing.assert_array_equal(np.asarray(t1.N), np.asarray(t2.N))
    np.testing.assert_array_equal(np.asarray(t1.W), np.asarray(t2.W))


def test_capacity_graceful_degradation():
    # max_nodes smaller than sims: search must not crash; count stays <= C
    tree = run_search([[]], num_sims=60, max_nodes=16)
    assert int(np.asarray(tree.count)[0]) <= 16
    counts = np.asarray(tree.root_counts())[0]
    assert counts.sum() == 60  # every sim still backs up


def test_depth_cutoff_heuristic():
    # max_depth=1: every sim expands/visits only root children
    tree = run_search([[]], num_sims=30, max_depth=1)
    child = np.asarray(tree.child)[0]
    # only root may have children
    assert np.all(child[1:] == -1)
    assert np.asarray(tree.root_counts())[0].sum() == 30


def test_masked_policy_fallback():
    logits = jnp.zeros((2, 7))
    valid = jnp.array([[True] * 7, [False, True, False, True] + [False] * 3])
    p = np.asarray(masked_policy(logits, valid))
    np.testing.assert_allclose(p[0], np.full(7, 1 / 7), rtol=1e-6)
    np.testing.assert_allclose(p[1, [1, 3]], [0.5, 0.5], rtol=1e-6)
    assert p[1, [0, 2, 4, 5, 6]].sum() == 0
    # degenerate logits: -inf rows fall back to uniform over valids
    bad = jnp.full((1, 7), -jnp.inf)
    p2 = np.asarray(masked_policy(bad, jnp.ones((1, 7), bool)))
    np.testing.assert_allclose(p2[0], np.full(7, 1 / 7), rtol=1e-6)


def test_action_probs_temperature():
    counts = jnp.array([[0.0, 10.0, 30.0, 0.0, 0.0, 0.0, 0.0]])
    rng = jax.random.key(0)
    # D2 regression: temp=1 must return normalized counts, not zeros
    p1 = np.asarray(action_probs(counts, 1.0, rng))
    np.testing.assert_allclose(p1[0], np.asarray(counts[0]) / 40.0, rtol=1e-5)
    assert p1.sum() > 0
    # temp=0: one-hot argmax
    p0 = np.asarray(action_probs(counts, 0.0, rng))
    assert p0[0, 2] == 1.0 and p0.sum() == 1.0
    # low temp sharpens
    ps = np.asarray(action_probs(counts, 0.25, rng))
    assert ps[0, 2] > p1[0, 2]


def test_action_probs_random_tie_break():
    counts = jnp.array([[5.0, 5.0, 0.0, 0.0, 0.0, 0.0, 0.0]])
    picks = set()
    for i in range(20):
        p = np.asarray(action_probs(counts, 0.0, jax.random.key(i)))
        picks.add(int(p[0].argmax()))
    assert picks == {0, 1}  # both tied actions get picked across seeds


def test_init_tree_root_install():
    root = batched_state([[2]])
    tree = init_tree(G, root, capacity=8)
    assert tree.capacity == 8
    assert int(np.asarray(tree.count)[0]) == 1
    v = np.asarray(tree.valid)[0, 0]
    assert v.all()
    assert not bool(np.asarray(tree.term)[0, 0])


@pytest.mark.parametrize("num_sims", [1, 7, 100])
def test_node_budget_never_exceeded(num_sims):
    tree = run_search([[], [3]], num_sims=num_sims)
    assert np.all(np.asarray(tree.count) <= num_sims + 1)


def test_frozen_goldens():
    """Fixed-seed pure-MCTS visit counts, frozen in tests/golden_counts.json
    (the BASELINE determinism contract: the reference itself cannot run, so
    the rebuild's own goldens are the baseline — SURVEY.md §8 note). Any
    drift in search semantics across versions fails here."""
    import json
    import os

    from alphazero_tpu.games import Othello

    with open(os.path.join(os.path.dirname(__file__), "golden_counts.json")) as f:
        golden = json.load(f)
    for game, nm in ((ConnectFour(), "connect_four"), (Othello(), "othello")):
        spec = golden[nm]
        net = make_uniform_model(game)
        search = make_search_fn(game, net.apply_fn, MCTSConfig(num_sims=50, max_depth=64))
        states = []
        for seq in spec["seqs"]:
            s = game.init()
            for a in seq:
                s = game.step(s, jnp.int32(a))
            states.append(s)
        batched = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
        counts = np.asarray(search({}, batched).root_counts()).astype(int)
        np.testing.assert_array_equal(counts, np.asarray(spec["counts"]), err_msg=nm)

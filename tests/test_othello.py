"""Othello game-kernel goldens + MCTS/self-play integration over the
generic Game protocol."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.games.othello import PASS, SIZE, Othello

G = Othello()


def board_str(state):
    chars = {1: "X", -1: "O", 0: "."}
    return "\n".join(
        "".join(chars[int(v)] for v in row) for row in np.asarray(state.board)
    )


def a(r, c):
    return r * SIZE + c


def test_init_position_and_opening_moves():
    s = G.init()
    b = np.asarray(s.board)
    assert b.sum() == 0 and np.abs(b).sum() == 4
    valid = np.asarray(G.valid_moves(s))
    # the four classic opening squares for the player to move
    expected = np.zeros(65, bool)
    for rc in [(2, 4), (3, 5), (4, 2), (5, 3)]:
        expected[a(*rc)] = True
    assert np.array_equal(valid, expected)
    done, v = G.terminal(s)
    assert not bool(done) and float(v) == 0.0


def test_step_flips_captured_discs():
    s = G.init()
    s2 = G.step(s, jnp.int32(a(2, 4)))  # flips (3,4)
    b = np.asarray(s2.board)  # canonical for the NEXT player
    # mover owned (2,4),(3,4),(3,3),(4,4) afterwards -> next player sees -1
    for rc in [(2, 4), (3, 4), (3, 3), (4, 4)]:
        assert b[rc] == -1, f"{rc}\n{board_str(s2)}"
    assert b[4, 3] == 1
    assert np.abs(b).sum() == 5


def test_pass_only_when_no_moves():
    s = G.init()
    valid = np.asarray(G.valid_moves(s))
    assert not valid[PASS]


def test_pass_flips_perspective_only():
    s = G.init()
    s2 = G.step(s, jnp.int32(PASS))
    np.testing.assert_array_equal(
        np.asarray(s2.board), -np.asarray(s.board)
    )


def test_terminal_full_board_counts():
    from alphazero_tpu.games.othello import OthelloState

    board = np.ones((8, 8), np.int8)
    board[:3] = -1  # 24 opponent discs vs 40 mine
    s = OthelloState(board=jnp.asarray(board))
    done, v = G.terminal(s)
    assert bool(done)
    assert float(v) == 1.0  # player to move has more discs
    done, v = G.terminal(OthelloState(board=jnp.asarray(-board)))
    assert float(v) == -1.0


def test_terminal_draw():
    from alphazero_tpu.games.othello import OthelloState

    board = np.ones((8, 8), np.int8)
    board[:4] = -1
    done, v = G.terminal(OthelloState(board=jnp.asarray(board)))
    assert bool(done) and float(v) == 0.0


def test_double_no_move_ends_game():
    """A sparse position where neither side can capture is terminal."""
    from alphazero_tpu.games.othello import OthelloState

    board = np.zeros((8, 8), np.int8)
    board[0, 0] = 1
    board[7, 7] = -1
    s = OthelloState(board=jnp.asarray(board))
    assert not np.asarray(G.valid_moves(s))[:PASS].any()
    done, v = G.terminal(s)
    assert bool(done)
    assert float(v) == 0.0


def test_symmetries_count_and_consistency():
    s = G.init()
    s = G.step(s, jnp.int32(a(2, 4)))
    f = G.to_features(s)
    pi = jnp.arange(65, dtype=jnp.float32) / 65.0
    feats, pis = G.symmetries(f, pi)
    assert feats.shape == (8, 8, 8, 2)
    assert pis.shape == (8, 65)
    np.testing.assert_array_equal(np.asarray(feats[0]), np.asarray(f))
    np.testing.assert_array_equal(np.asarray(pis[0]), np.asarray(pi))
    # pass logit invariant under all symmetries
    assert np.all(np.asarray(pis[:, PASS]) == float(pi[PASS]))
    # all 8 variants distinct for an asymmetric position
    flat = np.asarray(feats).reshape(8, -1)
    assert len({fv.tobytes() for fv in flat}) == 8


@pytest.mark.parametrize("seed", [0, 1])
def test_random_playout_legal_to_completion(seed):
    rng = np.random.RandomState(seed)
    s = G.init()
    filled_prev = 4
    for t in range(G.max_moves):
        done, v = G.terminal(s)
        if bool(done):
            assert float(v) in (-1.0, 0.0, 1.0)
            return
        valid = np.asarray(G.valid_moves(s))
        assert valid.any()
        act = rng.choice(np.nonzero(valid)[0])
        s = G.step(s, jnp.int32(act))
        filled = int(np.abs(np.asarray(s.board)).sum())
        if act == PASS:
            assert filled == filled_prev
        else:
            assert filled > filled_prev  # placement + flips never shrink
        filled_prev = filled
    raise AssertionError("game did not terminate within max_moves")


def test_mcts_on_othello():
    """The generic search runs on Othello unchanged (protocol proof)."""
    from alphazero_tpu.config import MCTSConfig
    from alphazero_tpu.mcts import make_search_fn
    from alphazero_tpu.models import make_uniform_model

    net = make_uniform_model(G)
    search = jax.jit(
        make_search_fn(G, net.apply_fn, MCTSConfig(num_sims=30, max_depth=24))
    )
    root = jax.vmap(lambda _: G.init())(jnp.arange(4))
    tree = search({}, root)
    counts = np.asarray(tree.root_counts())
    np.testing.assert_array_equal(counts.sum(-1), [30, 30, 30, 30])
    # only the 4 legal openings receive visits
    legal = np.asarray(jax.vmap(G.valid_moves)(root))
    assert np.all(counts[~legal] == 0)


def test_selfplay_on_othello():
    from alphazero_tpu.config import MCTSConfig, SelfPlayConfig
    from alphazero_tpu.models import make_uniform_model
    from alphazero_tpu.selfplay import make_selfplay_fn

    net = make_uniform_model(G)
    sp = jax.jit(
        make_selfplay_fn(
            G,
            net.apply_fn,
            MCTSConfig(num_sims=8, max_depth=16),
            SelfPlayConfig(batch_size=2, temp_threshold=10),
        )
    )
    traj, stats = sp({}, jax.random.key(0))
    assert bool(np.asarray(stats.done).all())
    moves = np.asarray(stats.num_moves)
    assert np.all(moves >= 55)  # full othello games
    assert traj.pi.shape == (G.max_moves, 2, 65)

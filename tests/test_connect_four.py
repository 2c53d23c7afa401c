"""Connect-Four game-kernel goldens.

Scripted-sequence tests in the spirit of the reference's
``test_win_diagonal`` (reference: connect_four_game.rs:244-264), plus cases
covering defect D11's missed windows (rightmost horizontal / topmost
vertical) which the rebuild must detect correctly.

Convention reminder: states are canonical, so after ``step`` the board is
from the *next* player's perspective and a win by the mover reads as
``value == -1`` ("the player to move has lost").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.games import ConnectFour
from alphazero_tpu.games.connect_four import heights

G = ConnectFour()


def play(moves):
    """Play a scripted move list from the initial board (host loop)."""
    s = G.init()
    for m in moves:
        s = G.step(s, jnp.int32(m))
    return s


def test_init():
    s = G.init()
    assert s.board.shape == (6, 7)
    assert np.all(np.asarray(s.board) == 0)
    done, value = G.terminal(s)
    assert not bool(done)
    assert float(value) == 0.0
    assert np.all(np.asarray(G.valid_moves(s)))


def test_step_alternation():
    s = play([3])
    # mover placed +1 at (0,3); canonical flip makes it -1 for the next player
    assert int(s.board[0, 3]) == -1
    s = play([3, 3])
    assert int(s.board[0, 3]) == 1  # first mover's piece, their view again
    assert int(s.board[1, 3]) == -1
    assert int(heights(s)[3]) == 2


def test_vertical_win():
    # P1: 0,0,0,0  P2: 1,1,1  -> P1 wins with 4 vertical in column 0
    s = play([0, 1, 0, 1, 0, 1, 0])
    done, value = G.terminal(s)
    assert bool(done)
    assert float(value) == -1.0  # player to move lost


def test_horizontal_win_rightmost_window():
    # Defect-D11 regression: a horizontal 4-in-a-row in columns 3..6 (ending
    # in the LAST column) — the reference scan missed this window.
    s = play([3, 0, 4, 0, 5, 1, 6])
    done, value = G.terminal(s)
    assert bool(done)
    assert float(value) == -1.0


def test_vertical_win_top_rows():
    # Defect-D11 regression: vertical win in rows 2..5 of column 0.
    # Fill col0 rows 0,1 with P2 pieces, then P1 stacks rows 2..5.
    s = play([1, 0, 2, 0, 0, 1, 0, 2, 0, 3, 0])
    done, value = G.terminal(s)
    assert bool(done)
    assert float(value) == -1.0


def test_diagonal_win():
    # Staircase for P1 at (0,0),(1,1),(2,2),(3,3)
    moves = [0, 1, 1, 2, 2, 3, 2, 3, 3, 6, 3]
    s = play(moves)
    done, value = G.terminal(s)
    assert bool(done)
    assert float(value) == -1.0


def test_anti_diagonal_win():
    # Mirror of the diagonal staircase: P1 at (0,6),(1,5),(2,4),(3,3)
    moves = [6, 5, 5, 4, 4, 3, 4, 3, 3, 0, 3]
    s = play(moves)
    done, value = G.terminal(s)
    assert bool(done)
    assert float(value) == -1.0


def test_draw_is_exact_zero():
    # A full board with no 4-in-a-row for either sign.
    board = np.array(
        [
            [1, 1, -1, 1, 1, -1, -1],
            [-1, -1, 1, -1, -1, 1, 1],
            [1, 1, -1, 1, 1, -1, -1],
            [-1, -1, 1, -1, -1, 1, 1],
            [1, 1, -1, 1, 1, -1, -1],
            [-1, -1, 1, -1, -1, 1, 1],
        ],
        dtype=np.int8,
    )
    from alphazero_tpu.games.connect_four import ConnectFourState, _has_win

    assert not bool(_has_win(jnp.asarray(board), 1))
    assert not bool(_has_win(jnp.asarray(board), -1))
    s = ConnectFourState(board=jnp.asarray(board))
    done, value = G.terminal(s)
    assert bool(done)
    assert float(value) == 0.0  # draws are exact zero (defect D7 fixed)


def test_valid_moves_mask():
    s = play([2, 2, 2, 2, 2, 2])
    valid = np.asarray(G.valid_moves(s))
    expected = np.ones(7, bool)
    expected[2] = False
    assert np.array_equal(valid, expected)


def test_features_layout():
    s = play([3, 4])
    f = np.asarray(G.to_features(s))
    assert f.shape == (6, 7, 2)
    # player to move (first mover again) owns (0,3); opponent owns (0,4)
    assert f[0, 3, 0] == 1.0 and f[0, 3, 1] == 0.0
    assert f[0, 4, 1] == 1.0 and f[0, 4, 0] == 0.0
    assert f.sum() == 2.0


def test_symmetries():
    s = play([0, 1])
    f = G.to_features(s)
    pi = jnp.arange(7, dtype=jnp.float32)
    feats, pis = G.symmetries(f, pi)
    assert feats.shape == (2, 6, 7, 2)
    np.testing.assert_array_equal(np.asarray(feats[0]), np.asarray(f))
    np.testing.assert_array_equal(np.asarray(feats[1]), np.asarray(f)[:, ::-1, :])
    np.testing.assert_array_equal(np.asarray(pis[1]), np.asarray(pi)[::-1])


def test_step_total_on_full_column():
    # stepping a full column must not raise (done-masked callers ignore it)
    s = play([2, 2, 2, 2, 2, 2])
    s2 = G.step(s, jnp.int32(2))
    assert s2.board.shape == (6, 7)
    assert int(heights(s2)[2]) == 6


def test_vmap_batched_dynamics():
    B = 32
    init_v = jax.vmap(lambda _: G.init())(jnp.arange(B))
    actions = jnp.arange(B, dtype=jnp.int32) % 7
    step_v = jax.vmap(G.step)
    s = step_v(init_v, actions)
    assert s.board.shape == (B, 6, 7)
    done, value = jax.vmap(G.terminal)(s)
    assert not bool(jnp.any(done))
    # second move on top of the same column
    s = step_v(s, actions)
    cols = np.asarray(actions)
    hb = np.asarray(jax.vmap(lambda st: heights(st))(s))
    assert np.all(hb[np.arange(B), cols] == 2)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_playout_terminates_legally(seed):
    """Random legal play always terminates within max_moves with a legal
    terminal value — exercising dynamics + terminality together."""
    rng = np.random.RandomState(seed)
    s = G.init()
    for t in range(G.max_moves):
        done, value = G.terminal(s)
        if bool(done):
            assert float(value) in (-1.0, 0.0, 1.0)
            return
        valid = np.asarray(G.valid_moves(s))
        a = rng.choice(np.nonzero(valid)[0])
        s = G.step(s, jnp.int32(a))
    done, value = G.terminal(s)
    assert bool(done)  # board full at move 42

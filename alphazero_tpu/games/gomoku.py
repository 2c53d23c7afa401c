"""Gomoku (free-style five-in-a-row) 9x9 as pure-JAX batched dynamics.

Third ``Game`` implementation — beyond the reference's scope (its only
game is Connect-Four, reference: examples/connect_four_lib/
connect_four_game.rs; the trait it fills is src/game.rs:8-28). Gomoku
exercises a corner neither other game does: a LARGE action space (81)
with free placement and a zero depth-cutoff heuristic — the combination
that routes self-play through the hybrid engine's dense-refresh path
(mcts/hybrid.py) with none of Othello's flip machinery.

Rules: players alternate placing stones on empty cells; five or more in
a row (horizontally, vertically or diagonally) wins; a full board with
no five is a draw. State is canonical (+1 = player to move) and ``step``
sign-flips, exactly like the other games.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

SIZE = 9
WIN = 5


class GomokuState(NamedTuple):
    """Canonical board: +1 = player to move, -1 = opponent."""

    board: jax.Array  # int8[SIZE, SIZE]


def _has_win(board: jax.Array, player: int) -> jax.Array:
    """True iff ``player`` has WIN in a row (any of 4 directions;
    inclusive window bounds — same pattern as connect_four._has_win)."""
    p = board == player
    M = SIZE - WIN + 1
    horiz = p[:, :M]
    vert = p[:M, :]
    diag = p[:M, :M]
    anti = p[WIN - 1 :, :M]
    for i in range(1, WIN):
        horiz = horiz & p[:, i : M + i]
        vert = vert & p[i : M + i, :]
        diag = diag & p[i : M + i, i : M + i]
        anti = anti & p[WIN - 1 - i : SIZE - i, i : M + i]
    return horiz.any() | vert.any() | diag.any() | anti.any()


class Gomoku:
    """``Game`` protocol implementation (see games/base.py)."""

    name = "gomoku"
    num_actions = SIZE * SIZE
    feature_shape = (SIZE, SIZE, 2)
    max_moves = SIZE * SIZE
    num_symmetries = 8  # dihedral group of the square board
    heuristic_is_zero = True

    def init(self) -> GomokuState:
        return GomokuState(board=jnp.zeros((SIZE, SIZE), jnp.int8))

    def step(self, state: GomokuState, action: jax.Array) -> GomokuState:
        """Place a +1 stone at ``action`` (row-major cell); return the
        flipped board. Total: placing on an occupied cell overwrites it
        with +1 (callers mask illegal actions).

        Dense one-hot write — per-game dynamic scatters miscompile on the
        TPU backend under vmap at large batch (see ConnectFour.step)."""
        r, c = action // SIZE, action % SIZE
        hit = (jnp.arange(SIZE)[:, None] == r) & (jnp.arange(SIZE)[None, :] == c)
        board = jnp.where(hit, jnp.int8(1), state.board)
        return GomokuState(board=(-board).astype(jnp.int8))

    def valid_moves(self, state: GomokuState) -> jax.Array:
        return (state.board == 0).reshape(-1)

    def terminal(self, state: GomokuState) -> Tuple[jax.Array, jax.Array]:
        """From the player-to-move's perspective: the previous mover owns
        the -1 stones, so a -1 five means value -1. Draws exact 0."""
        lose = _has_win(state.board, -1)
        win = _has_win(state.board, 1)
        full = jnp.all(state.board != 0)
        done = lose | win | full
        value = jnp.where(win, 1.0, jnp.where(lose, -1.0, 0.0))
        return done, value

    def to_features(self, state: GomokuState) -> jax.Array:
        return jnp.stack(
            [
                (state.board == 1).astype(jnp.float32),
                (state.board == -1).astype(jnp.float32),
            ],
            axis=-1,
        )

    def symmetries(self, features: jax.Array, pi: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """All 8 board symmetries (rotations x mirror), pi remapped as a
        SIZE x SIZE grid — the Othello pattern without a pass action."""
        grid = pi.reshape(SIZE, SIZE)
        feats, pis = [], []
        for k in range(4):
            f = jnp.rot90(features, k, axes=(0, 1))
            g = jnp.rot90(grid, k)
            for flip in (False, True):
                ff = f[:, ::-1, :] if flip else f
                gg = g[:, ::-1] if flip else g
                feats.append(ff)
                pis.append(gg.reshape(-1))
        return jnp.stack(feats), jnp.stack(pis)

    def eval_heuristic(self, state: GomokuState) -> jax.Array:
        return jnp.float32(0.0)

    def flat_ops(self) -> "GomokuFlatOps":
        """Flat-board dynamics for the hybrid search engine
        (mcts/hybrid.py). See ``GomokuFlatOps``."""
        return GomokuFlatOps()


def _win_line_matrix() -> jnp.ndarray:
    """f32[81, n_lines] incidence matrix of all five-in-a-row windows
    (rows 45 + cols 45 + diag 25 + anti 25 = 140);
    ``(board == player) @ M >= 5`` detects a win as one matmul."""
    import numpy as np

    M = SIZE - WIN + 1
    lines = []
    for r in range(SIZE):
        for c in range(M):
            lines.append([(r, c + i) for i in range(WIN)])
    for c in range(SIZE):
        for r in range(M):
            lines.append([(r + i, c) for i in range(WIN)])
    for r in range(M):
        for c in range(M):
            lines.append([(r + i, c + i) for i in range(WIN)])
    for r in range(WIN - 1, SIZE):
        for c in range(M):
            lines.append([(r - i, c + i) for i in range(WIN)])
    m = np.zeros((SIZE * SIZE, len(lines)), np.float32)
    for j, cells in enumerate(lines):
        for r, c in cells:
            m[r * SIZE + c, j] = 1.0
    return jnp.asarray(m)


class GomokuFlatOps:
    """Gomoku dynamics on FLAT batched boards ``f32[Bb, 81]``.

    ``step`` runs INSIDE the hybrid descend kernel (Mosaic-friendly:
    all-f32, per-game scalars as keepdims ``[Bb, 1]`` columns, no
    gathers); ``valid``/``terminal``/``to_features`` run in the engine's
    XLA stage. Semantics match ``Gomoku`` exactly (asserted in tests)."""

    size = SIZE * SIZE
    num_actions = SIZE * SIZE
    aux_lanes = 256  # 140 win lines, zero-padded (padding sums 0 < WIN)

    def aux(self) -> jax.Array:
        m = _win_line_matrix()
        return jnp.pad(m, ((0, 0), (0, self.aux_lanes - m.shape[1])))

    def from_state(self, state: GomokuState) -> jax.Array:
        return state.board.reshape(state.board.shape[0], -1).astype(jnp.float32)

    def step(self, board: jax.Array, action: jax.Array) -> jax.Array:
        """Place +1 at the action lane (occupied cells overwrite, like
        ``Gomoku.step``), sign-flip."""
        Bb = board.shape[0]
        lane_f = jax.lax.broadcasted_iota(jnp.int32, (Bb, self.size), 1).astype(
            jnp.float32
        )
        hit = (lane_f == action).astype(jnp.float32)
        placed = board + hit * (1.0 - board)
        return -placed

    def valid(self, board: jax.Array) -> jax.Array:
        return board == 0

    def to_features(self, board: jax.Array) -> jax.Array:
        b = board.reshape(board.shape[0], SIZE, SIZE)
        return jnp.stack(
            [(b == 1).astype(jnp.float32), (b == -1).astype(jnp.float32)],
            axis=-1,
        )

    def terminal(self, board: jax.Array, aux: jax.Array):
        """(done bool[Bb,1], value f32[Bb,1]) via one win-line matmul per
        sign (the XLA stage of the hybrid engine)."""
        pos = jnp.dot(
            (board == 1).astype(jnp.float32), aux,
            preferred_element_type=jnp.float32,
        )
        neg = jnp.dot(
            (board == -1).astype(jnp.float32), aux,
            preferred_element_type=jnp.float32,
        )
        win = jnp.any(pos >= WIN - 0.5, axis=1, keepdims=True)
        lose = jnp.any(neg >= WIN - 0.5, axis=1, keepdims=True)
        full = jnp.all(board != 0, axis=1, keepdims=True)
        done = win | lose | full
        value = jnp.where(win, 1.0, jnp.where(lose, -1.0, 0.0))
        return done, value

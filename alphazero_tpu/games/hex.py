"""Hex 7x7 as pure-JAX batched dynamics.

Fourth ``Game`` implementation — beyond the reference's scope (its only
game is Connect-Four, reference: examples/connect_four_lib/
connect_four_game.rs; the trait it fills is src/game.rs:8-28). Hex
exercises what no other game here does: a CONNECTION goal whose win
check is graph reachability (an iterative on-device flood fill, not a
fixed line scan), asymmetric player objectives reconciled by the
canonical form, and a no-draw guarantee (the Hex theorem: a full board
is always connected for exactly one player).

Board: the standard N x N rhombus with hex adjacency — cell (r, c)
neighbors (r±1, c), (r, c±1), (r-1, c+1), (r+1, c-1). The player to
move owns the +1 stones and aims to connect row 0 to row N-1; the
opponent's -1 stones aim left column to right column.

Canonical form: because the two goals differ, the usual sign-flip alone
would not preserve semantics. ``step`` therefore negates AND TRANSPOSES
the board: transposition swaps row-connectivity with column-connectivity
(and maps the hex adjacency onto itself), so in EVERY position the
player to move connects top-to-bottom with +1 stones. This is the
canonical trick the `Game` protocol's contract (+1 = player to move)
requires for goal-asymmetric games.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

SIZE = 7

# the six hex-grid neighbor offsets of the rhombus representation
_NEIGHBORS = ((-1, 0), (1, 0), (0, -1), (0, 1), (-1, 1), (1, -1))


class HexState(NamedTuple):
    """Canonical board: +1 = player to move (connects rows 0 and N-1),
    -1 = opponent (connects columns 0 and N-1)."""

    board: jax.Array  # int8[SIZE, SIZE]


def _neighbor_or(x: jax.Array) -> jax.Array:
    """bool[S,S] -> bool[S,S]: OR over the six hex neighbors of each cell
    (zero padding at the rim)."""
    padded = jnp.pad(x, ((1, 1), (1, 1)))
    out = jnp.zeros_like(x)
    for dr, dc in _NEIGHBORS:
        out = out | padded[1 + dr : 1 + dr + SIZE, 1 + dc : 1 + dc + SIZE]
    return out


def _connects_rows(p: jax.Array) -> jax.Array:
    """True iff the True cells of ``p`` form a chain from row 0 to row
    N-1 (hex adjacency). Iterated dilation to the fixpoint — the
    TPU-shaped form of the union-find/BFS a CPU implementation would use
    (dense [S,S] masks, no data-dependent indexing)."""
    reached = p & (jnp.arange(SIZE)[:, None] == 0)

    def cond(c):
        return c[1]

    def body(c):
        reached, _ = c
        nxt = (reached | _neighbor_or(reached)) & p
        return nxt, jnp.any(nxt != reached)

    reached, _ = jax.lax.while_loop(cond, body, (reached, jnp.any(reached)))
    return jnp.any(reached[SIZE - 1, :])


class Hex:
    """``Game`` protocol implementation (see games/base.py)."""

    name = "hex"
    num_actions = SIZE * SIZE
    feature_shape = (SIZE, SIZE, 2)
    max_moves = SIZE * SIZE  # the board fills in 49 moves and a full Hex
    #                          board is always decided (no draw exists)
    num_symmetries = 2  # identity + 180-degree rotation (the only board
    #                     symmetry preserving both players' goals)
    heuristic_is_zero = True

    def init(self) -> HexState:
        return HexState(board=jnp.zeros((SIZE, SIZE), jnp.int8))

    def step(self, state: HexState, action: jax.Array) -> HexState:
        """Place a +1 stone at ``action`` (row-major cell), then negate
        and TRANSPOSE (see module docstring). Total: occupied cells
        overwrite (callers mask illegal actions).

        Dense one-hot write — per-game dynamic scatters miscompile on
        the TPU backend under vmap at large batch (see
        ConnectFour.step)."""
        r, c = action // SIZE, action % SIZE
        hit = (jnp.arange(SIZE)[:, None] == r) & (jnp.arange(SIZE)[None, :] == c)
        board = jnp.where(hit, jnp.int8(1), state.board)
        return HexState(board=(-board.T).astype(jnp.int8))

    def valid_moves(self, state: HexState) -> jax.Array:
        return (state.board == 0).reshape(-1)

    def terminal(self, state: HexState) -> Tuple[jax.Array, jax.Array]:
        """From the player-to-move's perspective. The previous mover owns
        the -1 stones; in the canonical frame their goal is columns, so a
        -1 left-right chain means value -1. (+1 rows connected can only
        appear in hand-built states — the game would already have ended —
        but is checked for protocol totality.) No draw branch exists:
        that is Hex's theorem, asserted against random play in tests."""
        lose = _connects_rows((state.board == -1).T)
        win = _connects_rows(state.board == 1)
        done = lose | win
        value = jnp.where(win, 1.0, jnp.where(lose, -1.0, 0.0))
        return done, value

    def to_features(self, state: HexState) -> jax.Array:
        return jnp.stack(
            [
                (state.board == 1).astype(jnp.float32),
                (state.board == -1).astype(jnp.float32),
            ],
            axis=-1,
        )

    def symmetries(self, features: jax.Array, pi: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Identity + 180-degree rotation ((r,c) -> (N-1-r, N-1-c) maps
        the hex adjacency onto itself and fixes both edge pairs)."""
        grid = pi.reshape(SIZE, SIZE)
        feats = jnp.stack([features, features[::-1, ::-1, :]])
        pis = jnp.stack([pi, grid[::-1, ::-1].reshape(-1)])
        return feats, pis

    def eval_heuristic(self, state: HexState) -> jax.Array:
        return jnp.float32(0.0)

    def flat_ops(self) -> "HexFlatOps":
        """Flat-board dynamics for the hybrid search engine (mcts/hybrid.py).
        See ``HexFlatOps`` for the parity-lane trick that makes the
        negate-AND-TRANSPOSE canonical step Mosaic-safe."""
        return HexFlatOps()


class HexFlatOps:
    """Hex dynamics on FLAT batched boards ``f32[Bb, 50]``.

    The hybrid engine (mcts/hybrid.py) re-steps boards inside its descend
    Pallas kernel, so ``step`` must be Mosaic-friendly: dense all-f32
    arithmetic, no gathers, per-game scalars as keepdims ``[Bb, 1]``
    columns. Hex's canonical ``step`` negates AND TRANSPOSES the board
    (module docstring) — and a 7x7 transpose is a 49-lane permutation, a
    shape Mosaic has no native layout for. The kernel therefore never
    transposes: lanes 0..48 hold the board in a FIXED spatial frame and
    lane 49 holds a parity flag p, with the invariant

        stored = T^p(canonical)        (T = transpose, an involution)

    One canonical move (place ``a``, negate, transpose) becomes, in the
    stored frame,

        stored' = -(place at T^p(a) in stored),   p' = 1 - p

    i.e. the TRANSPOSE MOVES OFF THE BOARD AND ONTO THE ACTION INDEX:
    ``a -> (a%7)*7 + a//7`` when p is odd — scalar arithmetic on the
    ``[Bb, 1]`` action column, no data movement at all. The XLA stage
    (``valid``/``terminal``/``to_features``) reconstructs the canonical
    board with one transpose-select and vmaps the ``Hex`` game methods,
    so the data-dependent flood-fill ``while_loop`` never enters Mosaic
    (same split as ``OthelloFlatOps``). Semantics match ``Hex`` exactly;
    tests/test_hex.py asserts step-sequence and terminal equivalence and
    tests/test_hybrid.py asserts bit-exact root visit counts vs the XLA
    engine."""

    size = SIZE * SIZE + 1  # 49 board lanes + 1 parity lane
    num_actions = SIZE * SIZE

    def aux(self) -> jax.Array:
        """No kernel-side constant needed (terminality is resolved in the
        XLA stage); ship a minimal placeholder plane."""
        return jnp.zeros((8, 128), jnp.float32)

    def from_state(self, state: HexState) -> jax.Array:
        """Batched canonical states -> f32[B, 50] stored boards, parity 0."""
        b = state.board.reshape(state.board.shape[0], -1).astype(jnp.float32)
        return jnp.pad(b, ((0, 0), (0, 1)))

    def _canonical(self, board: jax.Array) -> HexState:
        """f32[Bb, 50] stored boards -> batched canonical ``HexState``
        (undo the parity transpose: canonical = T^p(stored))."""
        b = board[:, : SIZE * SIZE].reshape(-1, SIZE, SIZE)
        par = board[:, SIZE * SIZE] > 0.5
        c = jnp.where(par[:, None, None], jnp.swapaxes(b, 1, 2), b)
        return HexState(board=c.astype(jnp.int8))

    def valid(self, board: jax.Array) -> jax.Array:
        """bool[Bb, 49] in canonical action space (XLA stage)."""
        game = Hex()
        return jax.vmap(game.valid_moves)(self._canonical(board))

    def terminal(self, board: jax.Array, aux: jax.Array):
        """(done bool[Bb,1], value f32[Bb,1]) — XLA stage; runs the
        flood-fill fixpoint of ``Hex.terminal`` outside the kernel."""
        del aux
        game = Hex()
        done, value = jax.vmap(game.terminal)(self._canonical(board))
        return done[:, None], value[:, None]

    def to_features(self, board: jax.Array) -> jax.Array:
        game = Hex()
        return jax.vmap(game.to_features)(self._canonical(board))

    def step(self, board: jax.Array, action: jax.Array) -> jax.Array:
        """``Hex.step`` on stored boards (action exact-int f32[Bb, 1] in
        CANONICAL coordinates). Dense f32 arithmetic only — the transpose
        is an action-index remap gated by the parity lane (class
        docstring); occupied cells overwrite, like ``Hex.step``."""
        Bb = board.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (Bb, self.size), 1).astype(
            jnp.float32
        )
        is_par = (lane == float(SIZE * SIZE)).astype(jnp.float32)  # [Bb, 50]
        par = jnp.sum(board * is_par, axis=1, keepdims=True)       # [Bb, 1]
        r = jnp.floor((action + 0.5) / SIZE)
        c = action - SIZE * r
        a_eff = action + par * ((c * SIZE + r) - action)  # T^p(a)
        hit = (lane == a_eff).astype(jnp.float32)  # lane 49 > any a_eff
        placed = board + hit * (1.0 - board)
        negated = -placed
        # parity lane: don't negate, flip 0 <-> 1
        return negated + is_par * ((1.0 - par) - negated)

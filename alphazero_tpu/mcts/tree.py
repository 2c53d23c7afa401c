"""The batched array tree — the TPU-native NodeStore.

Re-design of the reference's lock-free node arena (reference:
src/node.rs:129-377 ``NodeStore``) and per-node packed atomic statistics
(node.rs:12-127 ``Node``). On TPU there is no concurrency to defend
against — every game advances exactly one simulation per lockstep step —
so the packed W/N/virtual-loss ``AtomicU64`` (node.rs:17) and the CAS
spinlock slot lifecycle (node.rs:328-341) dissolve into plain arrays and
masked scatters; virtual loss is unnecessary by construction (SURVEY.md
§2). ``push``'s bump allocation with a capacity assert (node.rs:234-244)
becomes a per-game ``count`` cursor with graceful out-of-capacity
degradation; the concurrent transposition table (node.rs:135) is
intentionally dropped (SURVEY.md §7 hard-parts (c)).

**Memory layout is the whole game on TPU.** Arrays are tiled on their two
minor dimensions ((8, 128) for f32, (32, 128) for int8); a tree stored as
``[B, C, A]`` with A = 7 actions would waste ~18x HBM capacity and
bandwidth on lane padding, and per-edge lanes of 4 would waste 32x. So the
tree is FLAT:

* ``stats: f32[B, 4*C*A]`` — four stat planes at offsets ``g*C*A`` for
  g in (N, W, P_masked, child); an edge (n, a) lives at ``n*A + a`` within
  each plane. One descent step = ONE fused gather of the 4A-lane row; one
  backup = ONE fused scatter-add into the N and W planes.
* ``node: f32[B, 2*C]`` — per-node (is_terminal, terminal_value) planes.
* ``state``: each game-state leaf ``[B, ...s]`` is stored ``[B, C*prod(s)]``
  and reshaped per-node on gather.

N and child indices live in f32 lanes — exact integers up to 2^24, far
beyond any visit count or node index here. Illegal actions carry
``P_masked = INVALID_P`` so the PUCT score needs no separate legality load
in the hot loop.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

UNVISITED = -1.0     # child plane sentinel (NodeState::PlaceHolder analogue)
INVALID_P = -1e30    # masked-prior sentinel for illegal actions

# stat plane indices within `stats`
PLANE_N, PLANE_W, PLANE_P, PLANE_CHILD = 0, 1, 2, 3


def leaf_size(x: jax.Array) -> int:
    """Per-node element count of an unbatched state leaf [...s]."""
    return int(jnp.size(jnp.zeros(x.shape[1:], x.dtype))) if x.ndim > 1 else 1


class Tree(NamedTuple):
    """Batched search trees. B games, C node slots each, A actions.

    Edge statistics live on the parent: plane N/W of edge ``(n, a)`` hold
    the visit count and total value (from node ``n``'s player-to-move
    perspective). ``Q = W / N`` replaces the reference's ``compute_q``
    (node.rs:51-58) without the fixed-point ``WIN_SCALE`` encoding
    (node.rs:13) — floats need no atomics here.
    """

    stats: jax.Array   # f32[B, 4*C*A] — (N | W | P_masked | child) planes
    node: jax.Array    # f32[B, 2*C]   — (is_terminal | terminal_value) planes
    state: Any         # game-state pytree, leaves flattened to [B, C*L]
    count: jax.Array   # i32[B] next free slot (root occupies slot 0)

    # --- static geometry (derived from array shapes) ---------------------
    @property
    def batch_size(self) -> int:
        return self.stats.shape[0]

    @property
    def capacity(self) -> int:
        return self.node.shape[1] // 2

    @property
    def num_actions(self) -> int:
        return self.stats.shape[1] // (4 * self.capacity)

    # --- decoded views (test/diagnostic surface; hot paths use planes) ---
    def _plane(self, g: int) -> jax.Array:
        ca = self.capacity * self.num_actions
        return self.stats[:, g * ca : (g + 1) * ca].reshape(
            self.batch_size, self.capacity, self.num_actions
        )

    @property
    def N(self) -> jax.Array:
        return self._plane(PLANE_N).astype(jnp.int32)

    @property
    def W(self) -> jax.Array:
        return self._plane(PLANE_W)

    @property
    def P(self) -> jax.Array:
        p = self._plane(PLANE_P)
        return jnp.where(p <= INVALID_P * 0.5, 0.0, p)

    @property
    def child(self) -> jax.Array:
        return self._plane(PLANE_CHILD).astype(jnp.int32)

    @property
    def valid(self) -> jax.Array:
        return self._plane(PLANE_P) > INVALID_P * 0.5

    @property
    def term(self) -> jax.Array:
        return self.node[:, : self.capacity] > 0.5

    @property
    def tval(self) -> jax.Array:
        return self.node[:, self.capacity :]

    def root_counts(self) -> jax.Array:
        """f32[B, A] root visit counts — the search output consumed by
        ``action_probs`` (the analogue of async_mcts.rs:84-94)."""
        return self.stats[:, : self.num_actions]

    def root_q(self) -> jax.Array:
        """f32[B, A] root edge Q values (diagnostics)."""
        ca = self.capacity * self.num_actions
        n = self.stats[:, : self.num_actions]
        w = self.stats[:, ca : ca + self.num_actions]
        return w / jnp.maximum(n, 1.0)


def flatten_state(state: Any) -> Any:
    """[B, C, ...s] leaves -> [B, C*L] (or pack fresh [B, ...s] per-node
    rows for scatters)."""
    return jax.tree_util.tree_map(
        lambda x: x.reshape(x.shape[0], -1), state
    )


def init_tree(game, root_state: Any, capacity: int) -> Tree:
    """Allocate trees with the (batched) root installed in slot 0.

    The analogue of ``NodeStore::from_root`` (node.rs:156-166), except the
    root's legality mask and terminality are computed here and its prior is
    installed by the search (fixing reference defect D1's never-initialized
    root policy, SURVEY.md §8).
    """
    leaves = jax.tree_util.tree_leaves(root_state)
    B = leaves[0].shape[0]
    A = game.num_actions
    C = capacity
    ca = C * A

    def alloc_leaf(x):
        L = int(np_prod(x.shape[1:]))
        buf = jnp.zeros((B, C * L), x.dtype)
        return buf.at[:, :L].set(x.reshape(B, L))

    state = jax.tree_util.tree_map(alloc_leaf, root_state)
    root_valid = jax.vmap(game.valid_moves)(root_state)
    root_done, root_tval = jax.vmap(game.terminal)(root_state)

    stats = jnp.zeros((B, 4 * ca), jnp.float32)
    stats = stats.at[:, PLANE_CHILD * ca :].set(UNVISITED)
    # root prior lanes start as "legal with prior 0"; the search overwrites
    # them with the masked NN prior before the first simulation.
    stats = stats.at[:, PLANE_P * ca : PLANE_P * ca + A].set(
        jnp.where(root_valid, 0.0, INVALID_P)
    )

    node = jnp.zeros((B, 2 * C), jnp.float32)
    node = node.at[:, 0].set(root_done.astype(jnp.float32))
    node = node.at[:, C].set(root_tval)

    return Tree(stats=stats, node=node, state=state, count=jnp.ones((B,), jnp.int32))


def np_prod(shape) -> int:
    out = 1
    for s in shape:
        out *= int(s)
    return out

"""The batched array tree — the TPU-native NodeStore.

Re-design of the reference's lock-free node arena (reference:
src/node.rs:129-377 ``NodeStore``) and per-node packed atomic statistics
(node.rs:12-127 ``Node``). On TPU there is no concurrency to defend
against: every game advances exactly one simulation per lockstep step, so

* the packed W/N/virtual-loss ``AtomicU64`` (node.rs:17, layout
  ``0xWWWWWWWW_NNNN_VVVV``) becomes a packed *vector* layout instead:
  ``stats[B, C, A, 4] = (N, W, P_masked, child)`` — one f32 lane-group per
  edge, so a whole descent step reads ONE gathered row per tree. (The
  reference packed for atomicity; this packs for HBM-transaction and
  kernel-launch economy — same trick, different hardware reason.)
  Virtual loss is unnecessary by construction (SURVEY.md §2).
* the CAS spinlock bit + PlaceHolder/Locked/Exists slot lifecycle
  (node.rs:328-341, 272-326) becomes masked scatter writes — a node exists
  iff some ``child`` entry points at it;
* ``push``'s bump allocation with a capacity assert (node.rs:234-244)
  becomes a per-game ``count`` cursor with graceful out-of-capacity
  degradation (the sim still backs up its NN value, it just doesn't
  materialize the node — see search.py);
* the concurrent transposition table ``seen: DHashMap`` (node.rs:135) is
  intentionally dropped: a pure tree is correct AlphaZero, and on-device
  state hashing would serialize the hot loop (SURVEY.md §7 hard-parts (c)).

Packing notes: N and child are stored in f32 lanes — exact integers up to
2^24, far beyond any per-edge visit count or node index here. Invalid
actions carry ``P_masked = INVALID_P`` (a large negative prior) so the PUCT
score needs no separate legal-move mask load in the hot loop. Per-node
terminality is packed the same way: ``node[B, C, 2] = (is_terminal,
terminal_value)``.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

UNVISITED = -1.0     # child lane sentinel (NodeState::PlaceHolder analogue)
INVALID_P = -1e30    # masked-prior sentinel for illegal actions

# stats lane indices
LANE_N, LANE_W, LANE_P, LANE_CHILD = 0, 1, 2, 3


class Tree(NamedTuple):
    """Batched search trees. B games, C node slots each, A actions.

    Edge statistics live on the parent: lane 0/1 of ``stats[b, n, a]`` are
    the visit count and total value (from node ``n``'s player-to-move
    perspective) of the edge ``n --a-->``. ``Q = W / N`` replaces the
    reference's ``compute_q`` (node.rs:51-58) without the fixed-point
    ``WIN_SCALE`` encoding (node.rs:13) — floats need no atomics here.
    """

    stats: jax.Array   # f32[B, C, A, 4] — (N, W, P_masked, child)
    node: jax.Array    # f32[B, C, 2]   — (is_terminal, terminal_value)
    state: Any         # game-state pytree, leaves [B, C, ...]
    count: jax.Array   # i32[B] next free slot (root occupies slot 0)

    # --- decoded views (test/diagnostic surface; hot paths read lanes) ---
    @property
    def N(self) -> jax.Array:
        return self.stats[..., LANE_N].astype(jnp.int32)

    @property
    def W(self) -> jax.Array:
        return self.stats[..., LANE_W]

    @property
    def P(self) -> jax.Array:
        p = self.stats[..., LANE_P]
        return jnp.where(p <= INVALID_P * 0.5, 0.0, p)

    @property
    def child(self) -> jax.Array:
        return self.stats[..., LANE_CHILD].astype(jnp.int32)

    @property
    def valid(self) -> jax.Array:
        return self.stats[..., LANE_P] > INVALID_P * 0.5

    @property
    def term(self) -> jax.Array:
        return self.node[..., 0] > 0.5

    @property
    def tval(self) -> jax.Array:
        return self.node[..., 1]

    @property
    def batch_size(self) -> int:
        return self.stats.shape[0]

    @property
    def capacity(self) -> int:
        return self.stats.shape[1]

    @property
    def num_actions(self) -> int:
        return self.stats.shape[2]

    def root_counts(self) -> jax.Array:
        """f32[B, A] root visit counts — the search output consumed by
        ``action_probs`` (the analogue of async_mcts.rs:84-94)."""
        return self.stats[:, 0, :, LANE_N]

    def root_q(self) -> jax.Array:
        """f32[B, A] root edge Q values (diagnostics)."""
        n = self.stats[:, 0, :, LANE_N]
        return self.stats[:, 0, :, LANE_W] / jnp.maximum(n, 1.0)


def pack_stats_row(n, w, p_masked, child) -> jax.Array:
    """Assemble an edge-stats row [..., A, 4] from its lanes."""
    return jnp.stack(
        [n, w, p_masked, child.astype(jnp.float32) if child.dtype != jnp.float32 else child],
        axis=-1,
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

    state = jax.tree_util.tree_map(
        lambda x: jnp.zeros((B, C) + x.shape[1:], x.dtype).at[:, 0].set(x),
        root_state,
    )
    root_valid = jax.vmap(game.valid_moves)(root_state)
    root_done, root_tval = jax.vmap(game.terminal)(root_state)

    stats = jnp.zeros((B, C, A, 4), jnp.float32)
    stats = stats.at[..., LANE_CHILD].set(UNVISITED)
    # root prior lanes start as "legal with prior 0"; the search overwrites
    # them with the masked NN prior before the first simulation.
    stats = stats.at[:, 0, :, LANE_P].set(jnp.where(root_valid, 0.0, INVALID_P))

    node = jnp.zeros((B, C, 2), jnp.float32)
    node = node.at[:, 0, 0].set(root_done.astype(jnp.float32))
    node = node.at[:, 0, 1].set(root_tval)

    return Tree(stats=stats, node=node, state=state, count=jnp.ones((B,), jnp.int32))

"""The batched array tree — the TPU-native NodeStore.

Re-design of the reference's lock-free node arena (reference:
src/node.rs:129-377 ``NodeStore``) and per-node packed atomic statistics
(node.rs:12-127 ``Node``). On TPU there is no concurrency to defend
against: every game advances exactly one simulation per lockstep step, so

* the packed W/N/virtual-loss ``AtomicU64`` (node.rs:17, layout
  ``0xWWWWWWWW_NNNN_VVVV``) becomes two plain SoA arrays ``N``/``W`` holding
  *edge* statistics ``[B, C, A]`` — virtual loss is unnecessary by
  construction (SURVEY.md §2, parallelism table);
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

Layout: everything is structure-of-arrays with the game batch ``B`` as the
leading (shardable) axis, node capacity ``C`` second, action ``A`` last —
so one simulation step is a handful of row gathers/scatters of shape
``[B, A]``, which XLA fuses into a few VPU passes over contiguous HBM.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

UNVISITED = -1  # child slot sentinel (the analogue of NodeState::PlaceHolder)


class Tree(NamedTuple):
    """Batched search trees. B games, C node slots each, A actions.

    Edge statistics live on the parent: ``N[b, n, a]`` / ``W[b, n, a]`` are
    the visit count and total value (from node ``n``'s player-to-move
    perspective) of the edge ``n --a-->``. ``Q = W / N`` replaces the
    reference's ``compute_q`` (node.rs:51-58) without the fixed-point
    ``WIN_SCALE`` encoding (node.rs:13) — floats are atomic-free here.
    """

    N: jax.Array       # i32[B, C, A] edge visit counts
    W: jax.Array       # f32[B, C, A] edge total value (parent perspective)
    P: jax.Array       # f32[B, C, A] edge priors
    child: jax.Array   # i32[B, C, A] child node index, UNVISITED if none
    state: Any         # game-state pytree, leaves [B, C, ...]
    valid: jax.Array   # bool[B, C, A] legal-action mask per node
    term: jax.Array    # bool[B, C] node is terminal
    tval: jax.Array    # f32[B, C] terminal value (node's to-move perspective)
    count: jax.Array   # i32[B] next free slot (root occupies slot 0)

    @property
    def batch_size(self) -> int:
        return self.N.shape[0]

    @property
    def capacity(self) -> int:
        return self.N.shape[1]

    @property
    def num_actions(self) -> int:
        return self.N.shape[2]

    def root_counts(self) -> jax.Array:
        """f32[B, A] root visit counts — the search output consumed by
        ``action_probs`` (the analogue of async_mcts.rs:84-94)."""
        return self.N[:, 0, :].astype(jnp.float32)

    def root_q(self) -> jax.Array:
        """f32[B, A] root edge Q values (diagnostics)."""
        n = self.N[:, 0, :]
        return self.W[:, 0, :] / jnp.maximum(n, 1).astype(jnp.float32)


def init_tree(game, root_state: Any, capacity: int) -> Tree:
    """Allocate trees with the (batched) root installed in slot 0.

    The analogue of ``NodeStore::from_root`` (node.rs:156-166), except the
    root's valid mask and terminality are computed here and its prior is
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

    return Tree(
        N=jnp.zeros((B, C, A), jnp.int32),
        W=jnp.zeros((B, C, A), jnp.float32),
        P=jnp.zeros((B, C, A), jnp.float32),
        child=jnp.full((B, C, A), UNVISITED, jnp.int32),
        state=state,
        valid=jnp.zeros((B, C, A), bool).at[:, 0].set(root_valid),
        term=jnp.zeros((B, C), bool).at[:, 0].set(root_done),
        tval=jnp.zeros((B, C), jnp.float32).at[:, 0].set(root_tval),
        count=jnp.ones((B,), jnp.int32),
    )

"""Lockstep vectorized PUCT search — the TPU-native AsyncMcts.

Re-design of the reference's parallel tree search (reference:
src/async_mcts.rs:14-372). The reference keeps a CPU busy around a slow NN
by running ``num_threads`` searcher threads against one batching inference
service thread connected by channels (async_mcts.rs:117-217). On TPU the
whole construction inverts: ``B`` independent game trees advance **one
simulation per step, in lockstep, under one ``jit``** — selection is a
batched PUCT argmax, expansion is a masked scatter, the NN forward pass on
all ``B`` leaves is *inlined* (replacing the channel round-trip
async_mcts.rs:305-315), and backup is one scatter-add along the recorded
paths. No locks, no virtual loss, no queues.

Hot-loop economics (see tree.py for the flat layout): every descent step
issues ONE gathered 4A-lane row per tree plus one 2-lane node-info gather
and one 2-lane path-record scatter; expansion writes one 4A-lane row; the
backup is ONE fused scatter-add covering both N and W planes. All indices
are minor-dimension (lane) offsets into flat [B, M] arrays, so nothing
tile-pads and nothing serializes.

Intended-semantics fidelity (SURVEY.md §8): the PUCT formula is
node.rs:352-356 verbatim (``Q + cpuct * P[a] * sqrt(N_parent + EPS) /
(1 + N_child)`` with EPS = 1e-6); depth cutoff backs up ``eval_heuristic``
(async_mcts.rs:241-243); terminal nodes break the descent and back up
their stored value (async_mcts.rs:246-249); masked-softmax priors with
uniform-over-valids fallback (async_mcts.rs:319-345). Backup applies
**negamax sign alternation** — fixing defect D5 (async_mcts.rs:361-370
applied the same value at every level).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from alphazero_tpu.config import MCTSConfig, PUCT_EPS
from alphazero_tpu.mcts.tree import (
    INVALID_P,
    Tree,
    init_tree,
    np_prod,
)
from alphazero_tpu.ops import masked_policy

# apply_fn(params, features[B, ...]) -> (logits[B, A], value[B])
ApplyFn = Callable[[Any, jax.Array], Tuple[jax.Array, jax.Array]]


def puct_scores(
    n_row: jax.Array, w_row: jax.Array, p_row: jax.Array, cpuct: float
) -> jax.Array:
    """Batched PUCT over one node's edge rows [B, A]
    (node.rs:343-370 best_child).

    Q of an unvisited edge is 0. Illegal actions carry the INVALID_P prior
    sentinel and are forced to -inf after the fused formula."""
    q = w_row / jnp.maximum(n_row, 1.0)
    n_parent = jnp.sum(n_row, axis=-1, keepdims=True)
    u = cpuct * p_row * jnp.sqrt(n_parent + PUCT_EPS) / (1.0 + n_row)
    return jnp.where(p_row <= INVALID_P * 0.5, -jnp.inf, q + u)


def make_search_fn(
    game,
    apply_fn: ApplyFn,
    cfg: MCTSConfig,
):
    """Build ``search(params, root_state, rng) -> Tree``.

    ``root_state`` is a batched game-state pytree (leaves ``[B, ...]``).
    The returned function is jit/vmap/shard_map-friendly: fixed shapes,
    ``lax`` control flow only. Root priors are installed up front
    (async_mcts.rs's intended first-expansion of the root, defect D1), with
    optional Dirichlet exploration noise (not present in the reference;
    off by default).
    """
    A = game.num_actions
    C = cfg.nodes
    D = cfg.max_depth
    CA = C * A
    cpuct = float(cfg.cpuct)

    step_v = jax.vmap(game.step)
    valid_v = jax.vmap(game.valid_moves)
    term_v = jax.vmap(game.terminal)
    feat_v = jax.vmap(game.to_features)
    heur_v = jax.vmap(game.eval_heuristic)

    a_iota = jnp.arange(A)[None, :]          # [1, A]
    plane4 = jnp.arange(4)[None, :, None] * CA  # [1, 4, 1]

    def gather_rows(arr, idx):
        """take_along_axis over the flat (lane) dim."""
        return jnp.take_along_axis(arr, idx, axis=1)

    # per-leaf unbatched shapes, captured once from a template state
    template = game.init()
    t_leaves, t_def = jax.tree_util.tree_flatten(template)
    leaf_shapes = [tuple(x.shape) for x in t_leaves]

    def gather_node_state(state, n):
        """Unflatten one node's game state for every tree: [B] -> pytree."""
        leaves = jax.tree_util.tree_leaves(state)
        out = []
        for leaf, shape in zip(leaves, leaf_shapes):
            L = np_prod(shape)
            idx = n[:, None] * L + jnp.arange(L)[None, :]
            out.append(gather_rows(leaf, idx).reshape((n.shape[0],) + shape))
        return jax.tree_util.tree_unflatten(t_def, out)

    def _select(tree: Tree):
        """Descend every tree to its frontier; record paths."""
        B = tree.stats.shape[0]
        bidx = jnp.arange(B)

        def cond(c):
            return jnp.any(c["active"])

        def body(c):
            n = c["node"]
            edge0 = n[:, None] * A + a_iota                       # [B, A]
            idx4 = (edge0[:, None, :] + plane4).reshape(B, 4 * A)  # [B, 4A]
            row = gather_rows(tree.stats, idx4)                    # ONE gather
            n_row = row[:, :A]
            w_row = row[:, A : 2 * A]
            p_row = row[:, 2 * A : 3 * A]
            c_row = row[:, 3 * A :]

            score = puct_scores(n_row, w_row, p_row, cpuct)
            a = jnp.argmax(score, axis=-1).astype(jnp.int32)
            child_f = jnp.take_along_axis(c_row, a[:, None], axis=1)[:, 0]

            active = c["active"]
            # record the edge taken at slot `depth` (sentinel 2D drops)
            slot = jnp.where(active, c["depth"], 2 * D)
            rec_idx = jnp.stack([slot, D + jnp.minimum(slot, D)], -1)  # [B,2]
            rec_val = jnp.stack([n, a], -1)
            path = c["path"].at[bidx[:, None], rec_idx].set(
                rec_val, mode="drop"
            )
            depth1 = c["depth"] + 1

            unexp = child_f < 0.0
            child_c = jnp.maximum(child_f, 0.0).astype(jnp.int32)
            cterm_f = jnp.take_along_axis(tree.node, child_c[:, None], axis=1)[:, 0]
            cterm = ~unexp & (cterm_f > 0.5)
            cutoff = ~unexp & ~cterm & (depth1 >= D)
            go = active & ~unexp & ~cterm & ~cutoff

            exp_now = active & unexp
            stop_leaf = active & (cterm | cutoff)
            return {
                "node": jnp.where(go, child_c, n),
                "depth": jnp.where(active, depth1, c["depth"]),
                "active": go,
                "path": path,
                "exp_mask": c["exp_mask"] | exp_now,
                "exp_parent": jnp.where(exp_now, n, c["exp_parent"]),
                "exp_action": jnp.where(exp_now, a, c["exp_action"]),
                "term_mask": c["term_mask"] | (active & cterm),
                "cut_mask": c["cut_mask"] | (active & cutoff),
                "leaf_node": jnp.where(stop_leaf, child_c, c["leaf_node"]),
            }

        B_ = tree.stats.shape[0]
        init = {
            "node": jnp.zeros((B_,), jnp.int32),
            "depth": jnp.zeros((B_,), jnp.int32),
            "active": tree.node[:, 0] < 0.5,  # terminal roots never search
            "path": jnp.zeros((B_, 2 * D), jnp.int32),  # [n-plane | a-plane]
            "exp_mask": jnp.zeros((B_,), bool),
            "exp_parent": jnp.zeros((B_,), jnp.int32),
            "exp_action": jnp.zeros((B_,), jnp.int32),
            "term_mask": jnp.zeros((B_,), bool),
            "cut_mask": jnp.zeros((B_,), bool),
            "leaf_node": jnp.zeros((B_,), jnp.int32),
        }
        return jax.lax.while_loop(cond, body, init)

    def _simulate(params, tree: Tree) -> Tree:
        """One simulation for every game: select -> expand -> evaluate ->
        backup (the vectorized search_iteration, async_mcts.rs:219-371)."""
        B = tree.stats.shape[0]
        bidx = jnp.arange(B)
        sel = _select(tree)

        # ---- EXPAND (async_mcts.rs:279-356, minus the lock protocol) ----
        parent_state = gather_node_state(tree.state, sel["exp_parent"])
        new_state = step_v(parent_state, sel["exp_action"])
        new_valid = valid_v(new_state)
        new_done, new_tval = term_v(new_state)

        new_idx = tree.count
        exp_ok = sel["exp_mask"] & (new_idx < C)  # graceful out-of-capacity
        # flat scatters below re-derive OOB sentinels per target array:
        # a clamped node index alone is NOT out of bounds in a flat layout.
        widx = jnp.where(exp_ok, new_idx, C)

        def write_state(state_bufs, xs):
            bufs = jax.tree_util.tree_leaves(state_bufs)
            vals = jax.tree_util.tree_leaves(xs)
            out = []
            for buf, x, shape in zip(bufs, vals, leaf_shapes):
                L = np_prod(shape)
                idx = widx[:, None] * L + jnp.arange(L)[None, :]
                out.append(
                    buf.at[bidx[:, None], idx].set(x.reshape(B, L), mode="drop")
                )
            return jax.tree_util.tree_unflatten(t_def, out)

        state = write_state(tree.state, new_state)
        count = tree.count + exp_ok.astype(jnp.int32)

        # ---- EVALUATE: NN fused into the step (vs async_mcts.rs:305-315's
        # channel round-trip to the inference service thread) ----
        logits, v_nn = apply_fn(params, feat_v(new_state))
        prior = masked_policy(logits, new_valid)
        p_masked = jnp.where(new_valid, prior, INVALID_P)

        # one fused row write: N = 0, W = 0, P_masked, child = UNVISITED
        zeros = jnp.zeros_like(prior)
        new_row = jnp.concatenate(
            [zeros, zeros, p_masked, jnp.full_like(prior, -1.0)], axis=1
        )  # [B, 4A]
        widx_edge0 = widx[:, None] * A + a_iota
        widx4 = (widx_edge0[:, None, :] + plane4).reshape(B, 4 * A)
        widx4 = jnp.where(exp_ok[:, None], widx4, 4 * CA)  # OOB -> dropped
        stats = tree.stats.at[bidx[:, None], widx4].set(new_row, mode="drop")
        # node info planes (term | tval) in one scatter
        node_idx = jnp.where(
            exp_ok[:, None],
            jnp.stack([widx, C + widx], -1),
            2 * C,  # OOB -> dropped
        )
        node = tree.node.at[bidx[:, None], node_idx].set(
            jnp.stack([new_done.astype(jnp.float32), new_tval], -1), mode="drop"
        )
        # link parent -> child (single lane scatter into the child plane)
        link_idx = jnp.where(
            exp_ok, 3 * CA + sel["exp_parent"] * A + sel["exp_action"], 4 * CA
        )
        stats = stats.at[bidx, link_idx].set(
            new_idx.astype(jnp.float32), mode="drop"
        )

        # leaf value, from the leaf's player-to-move perspective
        v_expand = jnp.where(new_done, new_tval, v_nn)
        leaf_state = gather_node_state(state, sel["leaf_node"])
        v_cut = heur_v(leaf_state)
        v_term = jnp.take_along_axis(
            tree.node, C + sel["leaf_node"][:, None], axis=1
        )[:, 0]
        v_leaf = jnp.where(
            sel["exp_mask"],
            v_expand,
            jnp.where(sel["term_mask"], v_term, v_cut),
        )

        # ---- BACKUP: one fused scatter-add over the N and W planes with
        # negamax alternation (fixing D5; replaces the per-node atomic
        # unvisit walk, async_mcts.rs:361-370 / node.rs:83-92) ----
        depth = sel["depth"]  # number of edges on the path
        did_sim = sel["exp_mask"] | sel["term_mask"] | sel["cut_mask"]
        d_pos = jnp.arange(D)[None, :]
        on_path = (d_pos < depth[:, None]) & did_sim[:, None]
        # edge d's node player sits (depth - d) plies above the leaf:
        # odd distance flips the sign once.
        sign = jnp.where((depth[:, None] - d_pos) % 2 == 1, -1.0, 1.0)
        vals = sign * v_leaf[:, None]
        path_n = sel["path"][:, :D]
        path_a = sel["path"][:, D:]
        edge = path_n * A + path_a
        on_path2 = jnp.concatenate([on_path, on_path], axis=1)
        idx_nw = jnp.where(
            on_path2,
            jnp.concatenate([edge, CA + edge], axis=1),
            4 * CA,  # OOB -> dropped
        )
        upd = jnp.concatenate([on_path.astype(jnp.float32), vals], axis=1)
        stats = stats.at[bidx[:, None], idx_nw].add(upd, mode="drop")

        return Tree(stats=stats, node=node, state=state, count=count)

    def search(
        params,
        root_state: Any,
        rng: Optional[jax.Array] = None,
        num_sims: Optional[int] = None,
    ) -> Tree:
        sims = cfg.num_sims if num_sims is None else num_sims
        tree = init_tree(game, root_state, C)

        # install root prior (the intended-but-broken first root expansion,
        # defect D1) + optional Dirichlet noise
        root_valid = jax.vmap(game.valid_moves)(root_state)
        logits, _ = apply_fn(params, feat_v(root_state))
        prior = masked_policy(logits, root_valid)
        if cfg.dirichlet_alpha is not None:
            if rng is None:
                raise ValueError("dirichlet noise requires an rng key")
            noise = jax.random.dirichlet(
                rng, jnp.full((A,), cfg.dirichlet_alpha), prior.shape[:1]
            )
            noise = masked_policy(jnp.log(noise + 1e-12), root_valid)
            prior = (1.0 - cfg.dirichlet_frac) * prior + cfg.dirichlet_frac * noise
        p_masked = jnp.where(root_valid, prior, INVALID_P)
        tree = tree._replace(
            stats=tree.stats.at[:, 2 * CA : 2 * CA + A].set(p_masked)
        )

        return jax.lax.fori_loop(0, sims, lambda i, t: _simulate(params, t), tree)

    return search

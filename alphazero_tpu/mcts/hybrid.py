"""Hybrid Pallas/XLA PUCT search — fused scaffolding around any model.

The fully fused kernel (mcts/fused.py) keeps whole trees in VMEM for all
simulations, but that requires the model to evaluate INSIDE the kernel
(constant priors or a VMEM-resident MLP). Conv nets (AZResNet — BASELINE
config 3) don't fit that mold, and measurement showed the XLA engine's
bottleneck is not the NN at all: at B=4096 the ResNet forward is a fraction
of the step while the XLA search scaffolding (dense score pass, lane
selects, einsum backup — several full traversals of the ``[B, 4, A, C]``
stat planes per simulation) dominates.

This engine splits the difference. Tree stat planes live in HBM; each
simulation is:

1. **descend kernel** (Pallas): the whole descent along the precomputed
   per-node PUCT argmax planes (thin ``[B, C]`` — the big stat planes are
   not read here; boards are carried as flat VMEM lanes, exactly like
   mcts/fused.py) plus the compressed path record. Outputs the
   frontier/leaf board and the tiny per-game record planes.
2. **XLA**: legality/terminality of the leaf boards and the model forward
   (full-batch MXU conv/matmul — anything ``apply_fn`` can express),
   leaf-value resolution, slot bookkeeping.
3. **merge kernel** (Pallas): ONE read-modify-write pass installing the
   new rows, the parent->child link, and the path backup into the planes
   (aliased in-place — no copy), then the PUCT refresh on the just-merged
   stats while they sit in VMEM, emitting the next descent's argmax planes.

So the big stat planes touch HBM exactly once per simulation (the merge
RMW — it also computes the next descent's PUCT argmax planes while the
stats sit in VMEM), and the NN stays a first-class XLA program. Works
for ANY apply_fn on any game exposing ``flat_ops`` (nonzero depth-cutoff
heuristics evaluate on the carried leaf board via ``ops.heuristic``).
``parallel_sims=K`` runs K leaf-parallel descents per round sharing one
merge and one K*B-board model forward — the same in-round virtual-loss
semantics as mcts/fused.py's rounds (cross-validated bit-exact), without
its (K+1)^A packing restriction.

Semantics are bit-identical to mcts/search.py (same PUCT formula
node.rs:343-370 incl. EPS, same first-max tie-breaking, same lockstep
slot-cursor allocation, same negamax backup): the descent/merge math is
the K=1 fused-kernel body (mcts/fused.py ``sim_body``) split at the
evaluation point, and the model forward runs through the SAME XLA
``apply_fn`` as the reference engine — tests/test_hybrid.py asserts exact
root-visit-count equality for MLP and conv models.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alphazero_tpu.config import MCTSConfig, PUCT_EPS
from alphazero_tpu.mcts.fused import _pick_block
from alphazero_tpu.mcts.tree import INVALID_P
from alphazero_tpu.ops import masked_policy, root_prior

# meta lanes out of the descend kernel
_M_EXP, _M_TERM, _M_PSIGN, _M_VTERM, _M_CUT, _M_DUP = 0, 1, 2, 3, 4, 5
# meta lanes into the merge kernel
_M2_MVAL, _M2_EXPOK, _M2_LINKP1, _M2_CDONE, _M2_CTVAL = 0, 1, 2, 3, 4


def make_hybrid_root_fn(
    game,
    apply_fn,
    cfg: MCTSConfig,
    block_size: Optional[int] = None,
    mesh=None,
    data_axis: str = "data",
) -> Optional[Callable[[Any, Any, Optional[jax.Array]], jax.Array]]:
    """Build ``root_counts(params, root_state, rng) -> f32[B, A]`` on the
    hybrid engine, or None when the configuration can't use it (no flat
    ops; nonzero heuristics need ``ops.heuristic``).

    ``mesh`` makes the search multi-chip: root priors (incl. Dirichlet
    noise) are computed in plain sharded XLA — bit-identical to the
    single-device path — and the whole simulation loop (Pallas kernels +
    the per-shard model forward with replicated params) runs under
    ``shard_map`` over ``data_axis``."""
    if os.environ.get("AZ_DISABLE_HYBRID"):
        return None
    if block_size is None and jax.default_backend() != "tpu":
        return None  # same TPU-only auto rule as mcts/fused.py
    if getattr(apply_fn, "host_callback", False):
        return None  # host round-trip per sim: the XLA engine handles it
    flat_ops_factory = getattr(game, "flat_ops", None)
    if flat_ops_factory is None:
        return None
    ops = flat_ops_factory()
    if not hasattr(ops, "to_features"):
        return None
    # nonzero depth-cutoff heuristics are supported when the flat ops can
    # evaluate them on the leaf board (the XLA stage applies them)
    zero_heuristic = bool(getattr(game, "heuristic_is_zero", False))
    if not zero_heuristic and not hasattr(ops, "heuristic"):
        return None
    K = int(getattr(cfg, "parallel_sims", 1) or 1)
    if K > 1 and cfg.num_sims % K != 0:
        raise ValueError(
            f"num_sims={cfg.num_sims} must be divisible by parallel_sims={K}"
        )

    A = game.num_actions
    C = cfg.nodes
    D = cfg.max_depth
    L = ops.size
    cpuct = float(cfg.cpuct)
    aux = ops.aux()
    aux_shape = tuple(aux.shape)

    # ------------------------------------------------------------------
    # shared PUCT refresh (runs INSIDE the merge kernel, and once in XLA
    # to seed the initial best planes — same ops, so bit-identical)
    # ------------------------------------------------------------------
    def _refresh(n, w, p, code_pl):
        """(best_a, best_code) [.., C] from stat planes [.., A, C] —
        mcts/fused.py refresh_best semantics: PUCT node.rs:343-370 with
        first-max tie-breaking."""
        Bb = n.shape[0]
        sqrt_npar = jnp.sqrt(jnp.sum(n, axis=1, keepdims=True) + PUCT_EPS)[
            :, 0, :
        ]
        if A <= 8:
            # small action spaces: per-action unroll, no [Bb, A, C] score
            # plane ever materialized
            def edge_score(a):
                na = n[:, a, :]
                pa = p[:, a, :]
                qa = w[:, a, :] / jnp.maximum(na, 1.0)
                ua = cpuct * pa * sqrt_npar / (1.0 + na)
                return jnp.where(
                    pa <= INVALID_P * 0.5, jnp.float32(-1e30), qa + ua
                )

            best = edge_score(0)
            best_a = jnp.zeros((Bb, C), jnp.float32)
            best_code = code_pl[:, 0, :]
            for a in range(1, A):
                sa = edge_score(a)
                better = sa > best
                best = jnp.where(better, sa, best)
                best_a = jnp.where(better, jnp.float32(a), best_a)
                best_code = jnp.where(better, code_pl[:, a, :], best_code)
            return best_a, best_code
        # large action spaces (Othello: 65): dense score plane + axis-1
        # reductions — same arithmetic and the same first-max tie-break
        # (smallest action index among exact ties)
        q = w / jnp.maximum(n, 1.0)
        u = cpuct * p * sqrt_npar[:, None, :] / (1.0 + n)
        score = jnp.where(
            p <= INVALID_P * 0.5, jnp.float32(-1e30), q + u
        )                                          # [Bb, A, C]
        best = jnp.max(score, axis=1)              # [Bb, C]
        a_iota3 = jax.lax.broadcasted_iota(
            jnp.int32, (Bb, A, C), 1
        ).astype(jnp.float32)
        best_a = jnp.min(
            jnp.where(score == best[:, None, :], a_iota3, jnp.float32(A)),
            axis=1,
        )
        on_best = (a_iota3 == best_a[:, None, :]).astype(jnp.float32)
        best_code = jnp.sum(code_pl * on_best, axis=1)
        return best_a, best_code

    def _refresh2(n, w, p, code_pl):
        """(best_a, best_code, sec_a, sec_code) — the top-2 variant for
        K-leaf-parallel rounds (mcts/fused.py round_body's refresh: the
        runner-up is the in-round virtual-loss fallback; sec_a = -1 when
        no legal runner-up exists)."""
        Bb = n.shape[0]
        sqrt_npar = jnp.sqrt(jnp.sum(n, axis=1, keepdims=True) + PUCT_EPS)[
            :, 0, :
        ]
        if A <= 8:
            def edge_score(a):
                na = n[:, a, :]
                pa = p[:, a, :]
                qa = w[:, a, :] / jnp.maximum(na, 1.0)
                ua = cpuct * pa * sqrt_npar / (1.0 + na)
                return jnp.where(
                    pa <= INVALID_P * 0.5, jnp.float32(-1e30), qa + ua
                )

            best = edge_score(0)
            best_a = jnp.zeros((Bb, C), jnp.float32)
            best_code = code_pl[:, 0, :]
            second = jnp.full((Bb, C), -1e30)
            sec_a = jnp.full((Bb, C), -1.0)
            sec_code = jnp.full((Bb, C), -1.0)
            for a in range(1, A):
                sa = edge_score(a)
                ca = code_pl[:, a, :]
                b1 = sa > best
                b2 = (~b1) & (sa > second)
                second = jnp.where(b1, best, jnp.where(b2, sa, second))
                sec_a = jnp.where(
                    b1, best_a, jnp.where(b2, jnp.float32(a), sec_a)
                )
                sec_code = jnp.where(b1, best_code, jnp.where(b2, ca, sec_code))
                best = jnp.where(b1, sa, best)
                best_a = jnp.where(b1, jnp.float32(a), best_a)
                best_code = jnp.where(b1, ca, best_code)
            sec_a = jnp.where(second > -1e29, sec_a, -1.0)
            return best_a, best_code, sec_a, sec_code
        # dense top-2 for large A: exclude the argmax lane, re-reduce
        q = w / jnp.maximum(n, 1.0)
        u = cpuct * p * sqrt_npar[:, None, :] / (1.0 + n)
        score = jnp.where(p <= INVALID_P * 0.5, jnp.float32(-1e30), q + u)
        a_iota3 = jax.lax.broadcasted_iota(jnp.int32, (Bb, A, C), 1).astype(
            jnp.float32
        )
        best = jnp.max(score, axis=1)
        best_a = jnp.min(
            jnp.where(score == best[:, None, :], a_iota3, jnp.float32(A)),
            axis=1,
        )
        on_best = (a_iota3 == best_a[:, None, :]).astype(jnp.float32)
        best_code = jnp.sum(code_pl * on_best, axis=1)
        score2 = jnp.where(on_best > 0.5, jnp.float32(-1e30), score)
        sec = jnp.max(score2, axis=1)
        sec_a = jnp.min(
            jnp.where(score2 == sec[:, None, :], a_iota3, jnp.float32(A)),
            axis=1,
        )
        on_sec = (a_iota3 == sec_a[:, None, :]).astype(jnp.float32)
        sec_code = jnp.sum(code_pl * on_sec, axis=1)
        has2 = sec > -1e29
        sec_a = jnp.where(has2, sec_a, -1.0)
        sec_code = jnp.where(has2, sec_code, -1.0)
        return best_a, best_code, sec_a, sec_code

    # ------------------------------------------------------------------
    # descend kernel: consumes the [Bb, C] best-action planes the previous
    # merge produced — the big [Bb, A, C] stat planes are NOT read here, so
    # per simulation HBM sees the stats exactly once (the merge RMW)
    # ------------------------------------------------------------------
    def descend_kernel(
        besta_ref,  # f32[Bb, C] per-node PUCT argmax action
        bestc_ref,  # f32[Bb, C] its child code
        done_ref,   # f32[Bb, C]
        tval_ref,   # f32[Bb, C]
        board_ref,  # f32[Bb, L] root boards
        aux_ref,    # f32[L, K] game constant
        bd_ref,     # OUT f32[Bb, L] leaf board
        patha_ref,  # OUT f32[Bb, C] compressed path record: action+1 at lane=node
        psgn_ref,   # OUT f32[Bb, C] root-parity sign at lane=node
        ohpa_ref,   # OUT f32[Bb, A] expansion-action one-hot
        ohpp_ref,   # OUT f32[Bb, C] expansion-parent one-hot
        meta_ref,   # OUT f32[Bb, 8] (exp | term | psign | v_term | cut)
        st_ref,     # scratch f32[8, Bb, C]
    ):
        # Mosaic layout rules as in mcts/fused.py: scratch-resident descent
        # state, one f32 scalar while_loop carry, arithmetic blends, no i1
        # vectors, [Bb, 1] columns only as keepdims-reduce -> broadcast.
        Bb = board_ref.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (Bb, C), 1)
        lane_f = lane.astype(jnp.float32)
        act_iota_f = jax.lax.broadcasted_iota(jnp.int32, (Bb, A), 1).astype(
            jnp.float32
        )
        del aux_ref  # terminality of the leaf is resolved by the XLA stage

        best_a = besta_ref[...]
        best_code = bestc_ref[...]

        ones_c = jnp.ones((Bb, C), jnp.float32)
        zero_c = jnp.zeros((Bb, C), jnp.float32)
        root_live_f = 1.0 - jnp.max(
            done_ref[...] * (lane == 0).astype(jnp.float32),
            axis=1,
            keepdims=True,
        )
        st_ref[0] = zero_c                     # node
        st_ref[1] = zero_c                     # depth
        st_ref[2] = root_live_f * ones_c       # active
        st_ref[3] = ones_c                     # psign = (-1)^depth
        st_ref[4] = zero_c                     # exp_mask
        st_ref[5] = zero_c                     # term_mask
        st_ref[6] = zero_c                     # leaf one-hot
        st_ref[7] = zero_c                     # cut_mask (depth cutoff)
        patha_ref[...] = zero_c
        psgn_ref[...] = zero_c
        bd_ref[...] = board_ref[...]
        ohpa_ref[...] = jnp.zeros((Bb, A), jnp.float32)
        ohpp_ref[...] = zero_c

        def dcond(t):
            return t > 0.5

        def dbody(t):
            node = st_ref[0]
            depth = st_ref[1]
            act = st_ref[2]
            psign = st_ref[3]
            act_col = jnp.max(act, axis=1, keepdims=True)      # [Bb, 1]
            psign_col = jnp.max(psign, axis=1, keepdims=True)

            oh = (lane_f == node).astype(jnp.float32)          # [Bb, C]
            a_col = jnp.sum(best_a * oh, axis=1, keepdims=True)
            code = jnp.sum(best_code * oh, axis=1, keepdims=True) * ones_c

            oh_a = (act_iota_f == a_col).astype(jnp.float32)   # [Bb, A]
            patha_ref[...] = patha_ref[...] + (act_col * (a_col + 1.0)) * oh
            psgn_ref[...] = psgn_ref[...] + (act_col * psign_col) * oh

            board = bd_ref[...]
            stepped = ops.step(board, a_col)
            bd_ref[...] = board + act_col * (stepped - board)

            depth1 = depth + 1.0
            cterm = (code < -1.5).astype(jnp.float32)
            unexp = (code < -0.5).astype(jnp.float32) * (1.0 - cterm)
            child = code + cterm * (-2.0 - 2.0 * code)  # -2-code if cterm
            live = (1.0 - unexp) * (1.0 - cterm)
            cutoff = live * (depth1 >= D).astype(jnp.float32)
            go = act * live * (1.0 - cutoff)
            exp_now = act * unexp
            exp_now_col = jnp.max(exp_now, axis=1, keepdims=True)
            stop_leaf = act * jnp.maximum(cterm, cutoff)
            oh_child = (lane_f == child).astype(jnp.float32)

            st_ref[0] = node + go * (child - node)
            st_ref[1] = depth + act
            st_ref[2] = go
            st_ref[3] = psign * (1.0 - 2.0 * act)
            st_ref[4] = jnp.maximum(st_ref[4], exp_now)
            st_ref[5] = jnp.maximum(st_ref[5], act * cterm)
            st_ref[6] = st_ref[6] + stop_leaf * (oh_child - st_ref[6])
            st_ref[7] = jnp.maximum(st_ref[7], act * cutoff)
            ohpa_ref[...] = (
                ohpa_ref[...] + exp_now_col * (oh_a - ohpa_ref[...])
            )
            ohpp_ref[...] = ohpp_ref[...] + exp_now * (oh - ohpp_ref[...])
            return jnp.max(go)

        jax.lax.while_loop(dcond, dbody, jnp.max(st_ref[2]))

        exp_mask = jnp.max(st_ref[4], axis=1, keepdims=True)   # [Bb, 1]
        term_mask = jnp.max(st_ref[5], axis=1, keepdims=True)
        cut_mask = jnp.max(st_ref[7], axis=1, keepdims=True)
        psign = jnp.max(st_ref[3], axis=1, keepdims=True)
        v_term = jnp.sum(tval_ref[...] * st_ref[6], axis=1, keepdims=True)

        meta_iota = jax.lax.broadcasted_iota(jnp.int32, (Bb, 8), 1)
        meta_ref[...] = (
            (meta_iota == _M_EXP).astype(jnp.float32) * exp_mask
            + (meta_iota == _M_TERM).astype(jnp.float32) * term_mask
            + (meta_iota == _M_PSIGN).astype(jnp.float32) * psign
            + (meta_iota == _M_VTERM).astype(jnp.float32) * v_term
            + (meta_iota == _M_CUT).astype(jnp.float32) * cut_mask
        )

    # ------------------------------------------------------------------
    # merge kernel: one RMW pass (planes aliased in-place) + the PUCT
    # refresh on the just-merged stats (they're in VMEM anyway — the next
    # descend then needs only the thin [Bb, C] best planes)
    # ------------------------------------------------------------------
    def merge_kernel(
        n_ref,      # f32[Bb, A, C] (aliased to n_out)
        w_ref,
        p_ref,
        code_ref,
        done_ref,   # f32[Bb, C]
        tval_ref,
        pm_ref,     # f32[Bb, A] masked leaf prior
        patha_ref,  # f32[Bb, C]
        psgn_ref,   # f32[Bb, C]
        ohpa_ref,   # f32[Bb, A]
        ohpp_ref,   # f32[Bb, C]
        slot_ref,   # f32[1, C] one-hot of the lockstep slot s
        meta2_ref,  # f32[Bb, 8] (mval | exp_ok | linkp1 | cdone | ctval)
        n_out,
        w_out,
        p_out,
        code_out,
        done_out,
        tval_out,
        besta_out,  # OUT f32[Bb, C] refreshed PUCT argmax planes
        bestc_out,
    ):
        Bb = pm_ref.shape[0]
        act_iota_f = jax.lax.broadcasted_iota(jnp.int32, (Bb, A), 1).astype(
            jnp.float32
        )
        meta2 = meta2_ref[...]
        mval = meta2[:, _M2_MVAL : _M2_MVAL + 1]          # [Bb, 1]
        exp_ok = meta2[:, _M2_EXPOK : _M2_EXPOK + 1]
        linkp1 = meta2[:, _M2_LINKP1 : _M2_LINKP1 + 1]
        cdone = meta2[:, _M2_CDONE : _M2_CDONE + 1]
        ctval = meta2[:, _M2_CTVAL : _M2_CTVAL + 1]

        nm_f = exp_ok * slot_ref[...]                      # [Bb, C]
        wm_f = nm_f[:, None, :]                            # [Bb, 1, C]
        keep = 1.0 - wm_f
        patha = patha_ref[...]
        on_a = (
            act_iota_f[:, :, None] + 1.0 == patha[:, None, :]
        ).astype(jnp.float32)                              # [Bb, A, C]
        n2 = n_ref[...] * keep + on_a
        w2 = (
            w_ref[...] * keep
            + mval[:, :, None] * (psgn_ref[...][:, None, :] * on_a)
        )
        p2 = p_ref[...] * keep + wm_f * pm_ref[...][:, :, None]
        link_add = (linkp1 * ohpa_ref[...])[:, :, None] * (
            ohpp_ref[...][:, None, :]
        )
        code2 = code_ref[...] * keep - wm_f + link_add
        n_out[...] = n2
        w_out[...] = w2
        p_out[...] = p2
        code_out[...] = code2
        done_out[...] = done_ref[...] * (1.0 - nm_f) + nm_f * cdone
        tval_out[...] = tval_ref[...] * (1.0 - nm_f) + nm_f * ctval
        best_a, best_code = _refresh(n2, w2, p2, code2)
        besta_out[...] = best_a
        bestc_out[...] = best_code

    # ------------------------------------------------------------------
    # K>1 leaf-parallel round kernels — the lockstep virtual-loss analogue
    # of the reference's num_sim_threads searchers (async_mcts.rs:191-217,
    # node.rs:77-92), with the SAME round semantics as mcts/fused.py
    # round_body: K descents share one merge + one refresh; a descent whose
    # top PUCT action has more in-round in-flight visits than the runner-up
    # takes the runner-up; duplicate claims of an unexpanded edge install
    # nothing but still back up. In-round in-flight counts live in two
    # [Bb, C] scratch planes (count of best-action takes / runner-up takes
    # per node — sufficient, since only those two actions are choosable
    # within a round), which removes the fused kernel's (K+1)^A < 2^24
    # packing restriction and so works for large action spaces too.
    # ------------------------------------------------------------------
    def descend_round_kernel(
        besta_ref,  # f32[Bb, C]
        bestc_ref,  # f32[Bb, C]
        seca_ref,   # f32[Bb, C] runner-up action (-1 = none)
        secc_ref,   # f32[Bb, C]
        done_ref,   # f32[Bb, C]
        tval_ref,   # f32[Bb, C]
        board_ref,  # f32[Bb, L]
        aux_ref,    # f32 game constant
        bd_ref,     # OUT f32[K, Bb, L]
        patha_ref,  # OUT f32[K, Bb, C]
        psgn_ref,   # OUT f32[K, Bb, C]
        ohpa_ref,   # OUT f32[K, Bb, A]
        ohpp_ref,   # OUT f32[K, Bb, C]
        meta_ref,   # OUT f32[K, Bb, 8]
        st_ref,     # scratch f32[8, Bb, C]
        vlb_ref,    # scratch f32[Bb, C] in-round best-action takes per node
        vls_ref,    # scratch f32[Bb, C] in-round runner-up takes per node
    ):
        Bb = board_ref.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (Bb, C), 1)
        lane_f = lane.astype(jnp.float32)
        act_iota_f = jax.lax.broadcasted_iota(jnp.int32, (Bb, A), 1).astype(
            jnp.float32
        )
        del aux_ref

        best_a = besta_ref[...]
        best_code = bestc_ref[...]
        sec_a = seca_ref[...]
        sec_code = secc_ref[...]

        ones_c = jnp.ones((Bb, C), jnp.float32)
        zero_c = jnp.zeros((Bb, C), jnp.float32)
        root_live_f = 1.0 - jnp.max(
            done_ref[...] * (lane == 0).astype(jnp.float32),
            axis=1,
            keepdims=True,
        )
        vlb_ref[...] = zero_c
        vls_ref[...] = zero_c

        for k in range(K):
            st_ref[0] = zero_c                     # node
            st_ref[1] = zero_c                     # depth
            st_ref[2] = root_live_f * ones_c       # active
            st_ref[3] = ones_c                     # psign
            st_ref[4] = zero_c                     # exp_mask
            st_ref[5] = zero_c                     # term_mask
            st_ref[6] = zero_c                     # leaf one-hot
            st_ref[7] = zero_c                     # cut_mask
            patha_ref[k] = zero_c
            psgn_ref[k] = zero_c
            bd_ref[k] = board_ref[...]
            ohpa_ref[k] = jnp.zeros((Bb, A), jnp.float32)
            ohpp_ref[k] = zero_c
            # term and dup share st_ref[5] (encoded term=1, dup=2): a
            # descent ends at EITHER a terminal/cutoff leaf or an
            # expansion, so the two flags are mutually exclusive.

            def dcond(t):
                return t > 0.5

            def dbody(t):
                node = st_ref[0]
                depth = st_ref[1]
                act = st_ref[2]
                psign = st_ref[3]
                act_col = jnp.max(act, axis=1, keepdims=True)
                psign_col = jnp.max(psign, axis=1, keepdims=True)

                oh = (lane_f == node).astype(jnp.float32)
                a1 = jnp.sum(best_a * oh, axis=1, keepdims=True)
                c1 = jnp.sum(best_code * oh, axis=1, keepdims=True)
                a2 = jnp.sum(sec_a * oh, axis=1, keepdims=True)
                c2 = jnp.sum(sec_code * oh, axis=1, keepdims=True)
                cnt1 = jnp.sum(vlb_ref[...] * oh, axis=1, keepdims=True)
                cnt2 = jnp.sum(vls_ref[...] * oh, axis=1, keepdims=True)

                has2 = (a2 > -0.5).astype(jnp.float32)
                use2 = has2 * (cnt2 < cnt1).astype(jnp.float32)
                a_col = a1 + use2 * (a2 - a1)
                code = (c1 + use2 * (c2 - c1)) * ones_c
                v_cho = cnt1 + use2 * (cnt2 - cnt1)

                oh_a = (act_iota_f == a_col).astype(jnp.float32)
                patha_ref[k] = patha_ref[k] + (act_col * (a_col + 1.0)) * oh
                psgn_ref[k] = psgn_ref[k] + (act_col * psign_col) * oh
                vlb_ref[...] = vlb_ref[...] + (act_col * (1.0 - use2)) * oh
                vls_ref[...] = vls_ref[...] + (act_col * use2) * oh

                board = bd_ref[k]
                stepped = ops.step(board, a_col)
                bd_ref[k] = board + act_col * (stepped - board)

                depth1 = depth + 1.0
                cterm = (code < -1.5).astype(jnp.float32)
                unexp = (code < -0.5).astype(jnp.float32) * (1.0 - cterm)
                child = code + cterm * (-2.0 - 2.0 * code)
                live = (1.0 - unexp) * (1.0 - cterm)
                cutoff = live * (depth1 >= D).astype(jnp.float32)
                go = act * live * (1.0 - cutoff)
                exp_now = act * unexp
                exp_now_col = jnp.max(exp_now, axis=1, keepdims=True)
                stop_leaf = act * jnp.maximum(cterm, cutoff)
                oh_child = (lane_f == child).astype(jnp.float32)
                dup_now = exp_now * (v_cho > 0.5).astype(jnp.float32)

                st_ref[0] = node + go * (child - node)
                st_ref[1] = depth + act
                st_ref[2] = go
                st_ref[3] = psign * (1.0 - 2.0 * act)
                st_ref[4] = jnp.maximum(st_ref[4], exp_now)
                st_ref[5] = jnp.maximum(
                    st_ref[5], act * cterm + 2.0 * dup_now
                )  # term in bit {1}, dup in {>=2}
                st_ref[6] = st_ref[6] + stop_leaf * (oh_child - st_ref[6])
                st_ref[7] = jnp.maximum(st_ref[7], act * cutoff)
                ohpa_ref[k] = ohpa_ref[k] + exp_now_col * (oh_a - ohpa_ref[k])
                ohpp_ref[k] = ohpp_ref[k] + exp_now * (oh - ohpp_ref[k])
                return jnp.max(go)

            jax.lax.while_loop(dcond, dbody, jnp.max(st_ref[2]))

            exp_mask = jnp.max(st_ref[4], axis=1, keepdims=True)
            td = jnp.max(st_ref[5], axis=1, keepdims=True)
            dup_mask = (td >= 1.5).astype(jnp.float32)
            term_mask = td - 2.0 * dup_mask  # recover the {0,1} term bit
            cut_mask = jnp.max(st_ref[7], axis=1, keepdims=True)
            psign = jnp.max(st_ref[3], axis=1, keepdims=True)
            v_term = jnp.sum(tval_ref[...] * st_ref[6], axis=1, keepdims=True)

            meta_iota = jax.lax.broadcasted_iota(jnp.int32, (Bb, 8), 1)
            meta_ref[k] = (
                (meta_iota == _M_EXP).astype(jnp.float32) * exp_mask
                + (meta_iota == _M_TERM).astype(jnp.float32) * term_mask
                + (meta_iota == _M_PSIGN).astype(jnp.float32) * psign
                + (meta_iota == _M_VTERM).astype(jnp.float32) * v_term
                + (meta_iota == _M_CUT).astype(jnp.float32) * cut_mask
                + (meta_iota == _M_DUP).astype(jnp.float32) * dup_mask
            )

    def merge_round_kernel(
        n_ref,      # f32[Bb, A, C] (aliased)
        w_ref,
        p_ref,
        code_ref,
        done_ref,   # f32[Bb, C]
        tval_ref,
        pm_ref,     # f32[K, Bb, A]
        patha_ref,  # f32[K, Bb, C]
        psgn_ref,   # f32[K, Bb, C]
        ohpa_ref,   # f32[K, Bb, A]
        ohpp_ref,   # f32[K, Bb, C]
        slot_ref,   # f32[K, C] one-hots of slots s0..s0+K-1
        meta2_ref,  # f32[K, Bb, 8]
        n_out,
        w_out,
        p_out,
        code_out,
        done_out,
        tval_out,
        besta_out,
        bestc_out,
        seca_out,
        secc_out,
    ):
        Bb = n_ref.shape[0]
        act_iota_f = jax.lax.broadcasted_iota(jnp.int32, (Bb, A), 1).astype(
            jnp.float32
        )
        keep = jnp.ones((Bb, 1, C), jnp.float32)
        n_add = jnp.zeros((Bb, A, C), jnp.float32)
        w_add = jnp.zeros((Bb, A, C), jnp.float32)
        p_inst = jnp.zeros((Bb, A, C), jnp.float32)
        code_delta = jnp.zeros((Bb, A, C), jnp.float32)
        zero_c = jnp.zeros((Bb, C), jnp.float32)
        dn_new = zero_c
        dt_new = zero_c
        nm_all = zero_c
        for k in range(K):
            meta2 = meta2_ref[k]
            mval = meta2[:, _M2_MVAL : _M2_MVAL + 1]
            inst = meta2[:, _M2_EXPOK : _M2_EXPOK + 1]  # exp*(1-dup)*s_ok
            linkp1 = meta2[:, _M2_LINKP1 : _M2_LINKP1 + 1]
            cdone = meta2[:, _M2_CDONE : _M2_CDONE + 1]
            ctval = meta2[:, _M2_CTVAL : _M2_CTVAL + 1]
            nm_k = inst * slot_ref[k : k + 1, :]           # [Bb, C]
            wm_k = nm_k[:, None, :]
            keep = keep * (1.0 - wm_k)
            on_a = (
                act_iota_f[:, :, None] + 1.0 == patha_ref[k][:, None, :]
            ).astype(jnp.float32)
            n_add = n_add + on_a
            w_add = w_add + mval[:, :, None] * (
                psgn_ref[k][:, None, :] * on_a
            )
            p_inst = p_inst + wm_k * pm_ref[k][:, :, None]
            code_delta = (
                code_delta
                - wm_k
                + ((linkp1 * ohpa_ref[k])[:, :, None] * ohpp_ref[k][:, None, :])
            )
            dn_new = dn_new + nm_k * cdone
            dt_new = dt_new + nm_k * ctval
            nm_all = nm_all + nm_k
        n2 = n_ref[...] * keep + n_add
        w2 = w_ref[...] * keep + w_add
        p2 = p_ref[...] * keep + p_inst
        code2 = code_ref[...] * keep + code_delta
        n_out[...] = n2
        w_out[...] = w2
        p_out[...] = p2
        code_out[...] = code2
        done_out[...] = done_ref[...] * (1.0 - nm_all) + dn_new
        tval_out[...] = tval_ref[...] * (1.0 - nm_all) + dt_new
        best_a, best_code, sec_a, sec_code = _refresh2(n2, w2, p2, code2)
        besta_out[...] = best_a
        bestc_out[...] = best_code
        seca_out[...] = sec_a
        secc_out[...] = sec_code

    # ------------------------------------------------------------------
    # pallas_call wrappers
    # ------------------------------------------------------------------
    # large-A games (Othello: [Bb, 72, 128]-padded plane blocks) exceed the
    # default 16MB scoped-vmem limit once the pipeline double-buffers the
    # plane IO; raise the per-kernel limit (v5e has 128MB VMEM)
    _compiler_params = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

    def _specs(Bb):
        plane = pl.BlockSpec((Bb, A, C), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
        col = pl.BlockSpec((Bb, C), lambda g: (g, 0), memory_space=pltpu.VMEM)
        row_a = pl.BlockSpec((Bb, A), lambda g: (g, 0), memory_space=pltpu.VMEM)
        row_l = pl.BlockSpec((Bb, L), lambda g: (g, 0), memory_space=pltpu.VMEM)
        row_m = pl.BlockSpec((Bb, 8), lambda g: (g, 0), memory_space=pltpu.VMEM)
        return plane, col, row_a, row_l, row_m

    def descend_call(besta, bestc, done, tval, boards, Bb, interpret):
        B = boards.shape[0]
        plane, col, row_a, row_l, row_m = _specs(Bb)
        aux_spec = pl.BlockSpec(
            aux_shape, lambda g: (0, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            descend_kernel,
            grid=(B // Bb,),
            in_specs=[col] * 4 + [row_l, aux_spec],
            out_specs=[row_l, col, col, row_a, col, row_m],
            out_shape=[
                jax.ShapeDtypeStruct((B, L), jnp.float32),
                jax.ShapeDtypeStruct((B, C), jnp.float32),
                jax.ShapeDtypeStruct((B, C), jnp.float32),
                jax.ShapeDtypeStruct((B, A), jnp.float32),
                jax.ShapeDtypeStruct((B, C), jnp.float32),
                jax.ShapeDtypeStruct((B, 8), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((8, Bb, C), jnp.float32)],
            compiler_params=None if interpret else _compiler_params,
            interpret=interpret,
        )(besta, bestc, done, tval, boards, aux)

    def merge_call(planes, pm, patha, psgn, ohpa, ohpp, slotoh, meta2, Bb, interpret):
        B = pm.shape[0]
        plane, col, row_a, _, row_m = _specs(Bb)
        slot_spec = pl.BlockSpec((1, C), lambda g: (0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            merge_kernel,
            grid=(B // Bb,),
            in_specs=[plane] * 4
            + [col] * 2
            + [row_a, col, col, row_a, col, slot_spec, row_m],
            out_specs=[plane] * 4 + [col] * 4,
            out_shape=[
                jax.ShapeDtypeStruct((B, A, C), jnp.float32),
                jax.ShapeDtypeStruct((B, A, C), jnp.float32),
                jax.ShapeDtypeStruct((B, A, C), jnp.float32),
                jax.ShapeDtypeStruct((B, A, C), jnp.float32),
                jax.ShapeDtypeStruct((B, C), jnp.float32),
                jax.ShapeDtypeStruct((B, C), jnp.float32),
                jax.ShapeDtypeStruct((B, C), jnp.float32),
                jax.ShapeDtypeStruct((B, C), jnp.float32),
            ],
            input_output_aliases={i: i for i in range(6)},
            compiler_params=None if interpret else _compiler_params,
            interpret=interpret,
        )(*planes, pm, patha, psgn, ohpa, ohpp, slotoh, meta2)

    def _kspecs(Bb):
        kcol = pl.BlockSpec((K, Bb, C), lambda g: (0, g, 0), memory_space=pltpu.VMEM)
        krow_a = pl.BlockSpec((K, Bb, A), lambda g: (0, g, 0), memory_space=pltpu.VMEM)
        krow_l = pl.BlockSpec((K, Bb, L), lambda g: (0, g, 0), memory_space=pltpu.VMEM)
        krow_m = pl.BlockSpec((K, Bb, 8), lambda g: (0, g, 0), memory_space=pltpu.VMEM)
        return kcol, krow_a, krow_l, krow_m

    def descend_round_call(best4, done, tval, boards, Bb, interpret):
        B = boards.shape[0]
        plane, col, row_a, row_l, row_m = _specs(Bb)
        kcol, krow_a, krow_l, krow_m = _kspecs(Bb)
        aux_spec = pl.BlockSpec(
            aux_shape, lambda g: (0, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            descend_round_kernel,
            grid=(B // Bb,),
            in_specs=[col] * 6 + [row_l, aux_spec],
            out_specs=[krow_l, kcol, kcol, krow_a, kcol, krow_m],
            out_shape=[
                jax.ShapeDtypeStruct((K, B, L), jnp.float32),
                jax.ShapeDtypeStruct((K, B, C), jnp.float32),
                jax.ShapeDtypeStruct((K, B, C), jnp.float32),
                jax.ShapeDtypeStruct((K, B, A), jnp.float32),
                jax.ShapeDtypeStruct((K, B, C), jnp.float32),
                jax.ShapeDtypeStruct((K, B, 8), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((8, Bb, C), jnp.float32),
                pltpu.VMEM((Bb, C), jnp.float32),
                pltpu.VMEM((Bb, C), jnp.float32),
            ],
            compiler_params=None if interpret else _compiler_params,
            interpret=interpret,
        )(*best4, done, tval, boards, aux)

    def merge_round_call(
        planes, pm, patha, psgn, ohpa, ohpp, slotoh, meta2, Bb, interpret
    ):
        B = planes[0].shape[0]
        plane, col, row_a, _, row_m = _specs(Bb)
        kcol, krow_a, _, krow_m = _kspecs(Bb)
        slot_spec = pl.BlockSpec((K, C), lambda g: (0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            merge_round_kernel,
            grid=(B // Bb,),
            in_specs=[plane] * 4
            + [col] * 2
            + [krow_a, kcol, kcol, krow_a, kcol, slot_spec, krow_m],
            out_specs=[plane] * 4 + [col] * 6,
            out_shape=[
                jax.ShapeDtypeStruct((B, A, C), jnp.float32),
                jax.ShapeDtypeStruct((B, A, C), jnp.float32),
                jax.ShapeDtypeStruct((B, A, C), jnp.float32),
                jax.ShapeDtypeStruct((B, A, C), jnp.float32),
            ]
            + [jax.ShapeDtypeStruct((B, C), jnp.float32)] * 6,
            input_output_aliases={i: i for i in range(6)},
            compiler_params=None if interpret else _compiler_params,
            interpret=interpret,
        )(*planes, pm, patha, psgn, ohpa, ohpp, slotoh, meta2)

    # ------------------------------------------------------------------
    # the driver: init planes, loop sims, read root counts
    # ------------------------------------------------------------------
    def run_search(boards: jax.Array, p_masked: jax.Array, params) -> jax.Array:
        """All simulations for one (shard-local) batch of root boards with
        installed root priors; returns root visit counts [B, A]."""
        B = boards.shape[0]
        Bb = block_size or _pick_block(B, A, C)
        if B % Bb != 0:
            Bb = max(b for b in range(1, min(Bb, B) + 1) if B % b == 0)
        interpret = jax.default_backend() == "cpu"

        rdone, rtval = ops.terminal(boards, aux)            # [B, 1]
        n0 = jnp.zeros((B, A, C), jnp.float32)
        w0 = jnp.zeros((B, A, C), jnp.float32)
        p0 = n0.at[:, :, 0].set(p_masked)
        code0 = jnp.full((B, A, C), -1.0, jnp.float32)
        done0 = jnp.zeros((B, C), jnp.float32).at[:, 0].set(
            rdone[:, 0].astype(jnp.float32)
        )
        tval0 = jnp.zeros((B, C), jnp.float32).at[:, 0].set(rtval[:, 0])

        if K > 1:
            return _run_rounds(
                boards, (n0, w0, p0, code0, done0, tval0), params, Bb, interpret
            )
        # seed the best planes (the in-kernel refresh on the init stats,
        # run once in XLA — the merge kernel maintains them from here on)
        besta0, bestc0 = _refresh(n0, w0, p0, code0)

        def body(i, planes):
            n, w, p, code, done, tval, besta, bestc = planes
            bd, patha, psgn, ohpa, ohpp, meta = descend_call(
                besta, bestc, done, tval, boards, Bb, interpret
            )
            vm = ops.valid(bd)
            cdone_b, ctval = ops.terminal(bd, aux)           # [B, 1]
            if getattr(apply_fn, "needs_features", True):
                feats = ops.to_features(bd)
            else:
                feats = jnp.zeros((B, 1), jnp.float32)
            logits, v_nn = apply_fn(params, feats)
            prior = masked_policy(logits, vm)
            pm = jnp.where(vm, prior, INVALID_P)

            exp = meta[:, _M_EXP : _M_EXP + 1]
            term = meta[:, _M_TERM : _M_TERM + 1]
            psign = meta[:, _M_PSIGN : _M_PSIGN + 1]
            vterm = meta[:, _M_VTERM : _M_VTERM + 1]
            cdone = cdone_b.astype(jnp.float32)
            v_expand = ctval + (1.0 - cdone) * (v_nn[:, None] - ctval)
            v_leaf = exp * v_expand + (1.0 - exp) * term * vterm
            if not zero_heuristic:
                # depth-cutoff leaves back up the heuristic of the carried
                # leaf board (async_mcts.rs:241-243's eval_heuristic)
                cut = meta[:, _M_CUT : _M_CUT + 1]
                v_leaf = v_leaf + (1.0 - exp) * cut * ops.heuristic(bd)
            mval = v_leaf * psign

            s = i + 1
            s_ok = (s < C).astype(jnp.float32)
            exp_ok = exp * s_ok
            s_f = s.astype(jnp.float32)
            link_code = s_f + cdone * (-2.0 - 2.0 * s_f)     # -2-s if cdone
            linkp1 = (link_code + 1.0) * exp_ok
            meta2 = jnp.concatenate(
                [mval, exp_ok, linkp1, cdone, ctval, jnp.zeros((B, 3))],
                axis=1,
            )
            slotoh = (jnp.arange(C) == s).astype(jnp.float32)[None, :]
            return merge_call(
                (n, w, p, code, done, tval),
                pm, patha, psgn, ohpa, ohpp, slotoh, meta2, Bb, interpret,
            )

        planes = jax.lax.fori_loop(
            0,
            cfg.num_sims,
            body,
            (n0, w0, p0, code0, done0, tval0, besta0, bestc0),
        )
        return planes[0][:, :, 0]

    def _run_rounds(boards, planes0, params, Bb, interpret):
        """K>1 leaf-parallel rounds (num_sims // K of them)."""
        B = boards.shape[0]
        n0, w0, p0, code0, done0, tval0 = planes0
        best40 = _refresh2(n0, w0, p0, code0)

        def round_body(r, carry):
            n, w, p, code, done, tval, ba, bc, sa2, sc2 = carry
            bd, patha, psgn, ohpa, ohpp, meta = descend_round_call(
                (ba, bc, sa2, sc2), done, tval, boards, Bb, interpret
            )
            bdf = bd.reshape(K * B, L)
            vm = ops.valid(bdf)
            cdone_b, ctval = ops.terminal(bdf, aux)
            if getattr(apply_fn, "needs_features", True):
                feats = ops.to_features(bdf)
            else:
                feats = jnp.zeros((K * B, 1), jnp.float32)
            logits, v_nn = apply_fn(params, feats)
            prior = masked_policy(logits, vm)
            pm = jnp.where(vm, prior, INVALID_P).reshape(K, B, A)

            cdone = cdone_b.astype(jnp.float32).reshape(K, B, 1)
            ctval = ctval.reshape(K, B, 1)
            v_nn = v_nn.reshape(K, B, 1)
            exp = meta[:, :, _M_EXP : _M_EXP + 1]
            term = meta[:, :, _M_TERM : _M_TERM + 1]
            psign = meta[:, :, _M_PSIGN : _M_PSIGN + 1]
            vterm = meta[:, :, _M_VTERM : _M_VTERM + 1]
            dup = meta[:, :, _M_DUP : _M_DUP + 1]
            v_expand = ctval + (1.0 - cdone) * (v_nn - ctval)
            v_leaf = exp * v_expand + (1.0 - exp) * term * vterm
            if not zero_heuristic:
                cut = meta[:, :, _M_CUT : _M_CUT + 1]
                h = ops.heuristic(bdf).reshape(K, B, 1)
                v_leaf = v_leaf + (1.0 - exp) * cut * h
            mval = v_leaf * psign

            s_k = r * K + 1 + jnp.arange(K)                  # [K]
            s_ok = (s_k < C).astype(jnp.float32)[:, None, None]
            inst = exp * (1.0 - dup) * s_ok
            s_f = s_k.astype(jnp.float32)[:, None, None]
            link_code = s_f + cdone * (-2.0 - 2.0 * s_f)
            linkp1 = (link_code + 1.0) * inst
            meta2 = jnp.concatenate(
                [mval, inst, linkp1, cdone, ctval, jnp.zeros((K, B, 3))],
                axis=2,
            )
            slotoh = (jnp.arange(C)[None, :] == s_k[:, None]).astype(
                jnp.float32
            )
            return merge_round_call(
                (n, w, p, code, done, tval),
                pm, patha, psgn, ohpa, ohpp, slotoh, meta2, Bb, interpret,
            )

        planes = jax.lax.fori_loop(
            0, cfg.num_sims // K, round_body, planes0 + best40
        )
        return planes[0][:, :, 0]

    def run_search_sorted(boards, p_masked, params):
        """Depth-sorted blocking, same rationale as fused.py
        ``run_kernel_sorted``: the descend kernel's while_loop runs to
        the deepest game in each block, so stable-sorting games by stone
        count groups like-depth games and stops one endgame board from
        stalling a block of opening boards. Per-game lanes never
        interact (and the model forward is row-independent), so counts
        are bit-identical to the unsorted call — asserted by
        tests/test_hybrid.py. Threshold rationale in fused.py
        ``run_kernel_sorted``: sorting wins +17% at B=65536 but costs
        ~3% at the NN-bound full preset's B=2048 (round-4 A/B), so it
        engages only at AZ_SORT_MIN_BATCH (default 8192) games — a
        PER-SHARD count under shard_map, on purpose: the block
        economics are per device (see fused.py for the arithmetic)."""
        min_b = int(os.environ.get("AZ_SORT_MIN_BATCH", "8192"))
        if boards.shape[0] < min_b or os.environ.get("AZ_FUSED_NOSORT"):
            return run_search(boards, p_masked, params)
        depth_proxy = jnp.sum(jnp.abs(boards), axis=-1)
        order = jnp.argsort(depth_proxy)  # stable -> deterministic
        counts = run_search(boards[order], p_masked[order], params)
        return counts[jnp.argsort(order)]

    def root_counts(params, root_state, rng: Optional[jax.Array] = None) -> jax.Array:
        boards = ops.from_state(root_state)

        # root prior (identical to mcts/search.py's search root install)
        prior, root_valid = root_prior(game, apply_fn, cfg, params, root_state, rng)
        p_masked = jnp.where(root_valid, prior, INVALID_P)

        if mesh is not None and mesh.shape.get(data_axis, 1) > 1:
            from jax.sharding import PartitionSpec as P

            sharded = jax.shard_map(
                run_search_sorted,
                mesh=mesh,
                in_specs=(P(data_axis), P(data_axis), P()),
                out_specs=P(data_axis),
                # pallas_call out_shapes carry no varying-mesh-axes info
                check_vma=False,
            )
            return sharded(boards, p_masked, params)
        return run_search_sorted(boards, p_masked, params)

    return root_counts

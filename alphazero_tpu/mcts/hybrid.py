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

1. **descend kernel** (Pallas): ONE read pass over the stat planes —
   dense PUCT refresh, the whole descent (boards carried as flat VMEM
   lanes, exactly like mcts/fused.py), and the compressed path record.
   Outputs the frontier/leaf board plus the tiny per-game record planes.
2. **XLA**: legality/terminality of the leaf boards and the model forward
   (full-batch MXU conv/matmul — anything ``apply_fn`` can express),
   leaf-value resolution, slot bookkeeping.
3. **merge kernel** (Pallas): ONE read-modify-write pass installing the
   new rows, the parent->child link, and the path backup into the planes
   (aliased in-place — no copy).

So the per-simulation plane traffic drops from "several XLA passes +
0.4-4 ms gathers" to exactly two streaming passes at HBM speed, and the
NN stays a first-class XLA program. Works for ANY apply_fn on any game
exposing ``flat_ops`` with a zero cutoff heuristic.

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
from alphazero_tpu.ops import masked_policy

# meta lanes out of the descend kernel
_M_EXP, _M_TERM, _M_PSIGN, _M_VTERM, _M_CUT = 0, 1, 2, 3, 4
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
    ops, nonzero heuristic, K>1 leaf parallelism).

    ``mesh`` makes the search multi-chip: root priors (incl. Dirichlet
    noise) are computed in plain sharded XLA — bit-identical to the
    single-device path — and the whole simulation loop (Pallas kernels +
    the per-shard model forward with replicated params) runs under
    ``shard_map`` over ``data_axis``."""
    if os.environ.get("AZ_DISABLE_HYBRID"):
        return None
    if block_size is None and jax.default_backend() != "tpu":
        return None  # same TPU-only auto rule as mcts/fused.py
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
    if int(getattr(cfg, "parallel_sims", 1) or 1) != 1:
        return None  # leaf-parallel rounds are a fused-kernel feature

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

    def root_counts(params, root_state, rng: Optional[jax.Array] = None) -> jax.Array:
        boards = ops.from_state(root_state)
        B = boards.shape[0]

        # root prior (identical to mcts/search.py's search root install)
        root_valid = jax.vmap(game.valid_moves)(root_state)
        if getattr(apply_fn, "needs_features", True):
            feats = jax.vmap(game.to_features)(root_state)
        else:
            feats = jnp.zeros((B, 1), jnp.float32)
        logits, _ = apply_fn(params, feats)
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

        if mesh is not None and mesh.shape.get(data_axis, 1) > 1:
            from jax.sharding import PartitionSpec as P

            sharded = jax.shard_map(
                run_search,
                mesh=mesh,
                in_specs=(P(data_axis), P(data_axis), P()),
                out_specs=P(data_axis),
                # pallas_call out_shapes carry no varying-mesh-axes info
                check_vma=False,
            )
            return sharded(boards, p_masked, params)
        return run_search(boards, p_masked, params)

    return root_counts

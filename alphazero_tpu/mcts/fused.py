"""VMEM-resident fused PUCT search — the Pallas hot kernel.

The XLA lockstep engine (mcts/search.py) streams the full tree stat
planes (`[B, 4, A, C]`, ~100 MB at B=8192) through HBM on EVERY
simulation: each sim is a handful of dense passes, and at 100 sims/move
the whole move step is HBM-bandwidth-bound. This kernel removes that
traffic entirely: the trees of a BLOCK of games live in VMEM scratch for
the duration of ALL simulations, and HBM sees only the root boards in
and the root visit counts out (a few hundred KB per move instead of tens
of GB).

Design (per grid program = one block of ``Bb`` games):

* tree planes as VMEM scratch: N/W/P/child ``f32[Bb, A, C]`` plus the
  per-node (terminal, value) planes ``f32[Bb, C]`` — ~6.5 MB at Bb=256,
  C=128;
* game states are NOT stored per node: the descent CARRIES the board
  (flat ``f32[Bb, L]`` lanes) and re-steps it at each level, so the
  frontier board IS the expansion state (the XLA engine's per-node state
  planes and their per-sim select pass disappear);
* backup is accumulated DURING the descent into two scratch planes
  (visit increments and root-parity-signed value weights); the leaf
  value multiplies in afterwards — negamax sign alternation is
  ``(-1)^depth · (-1)^d`` ≡ the engine's ``(-1)^(depth-d)``;
* win/termination checks are one small MXU matmul against the game's
  win-window incidence matrix (games/connect_four.py ``FlatOps``);
* all writes are dense masked passes over VMEM-resident planes — the
  same gather/scatter-free discipline as the XLA engine, but at VMEM
  bandwidth instead of HBM.

Scope: games exposing ``flat_ops()`` with a zero cutoff heuristic, and
models that can evaluate INSIDE the kernel — either a CONSTANT
prior/value (``UniformModel`` — the pure-MCTS baseline, reference
examples/connect_four.rs:12-43, BASELINE config 1) or a model
registering a ``kernel_eval_factory`` (``MLPNet`` — its weights live in
VMEM next to the trees and the forward pass runs on the MXU between
expand and backup; BASELINE config 2). Large conv nets keep the XLA
engine. Root priors (including optional Dirichlet noise) are computed
OUTSIDE and shipped in, so the kernel consumes no RNG.

Semantics are bit-compatible with mcts/search.py (same PUCT formula
node.rs:343-370 incl. EPS, same first-max argmax tie-breaking, same
slot-cursor allocation, same terminal-child codes); tests/test_fused.py
asserts exact visit-count equality against the XLA engine for the
constant-prior path (the XLA engine is itself verified bit-exact
against the sequential C++ oracle, csrc/mcts_oracle.cpp). The
NN-in-kernel path is numerically equivalent: Mosaic and XLA may round
bf16 matmuls at different points, so rare PUCT argmax ties can resolve
differently — the tests bound the count divergence statistically and
freeze fused-path goldens for determinism.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alphazero_tpu.config import MCTSConfig, PUCT_EPS
from alphazero_tpu.mcts.tree import INVALID_P
from alphazero_tpu.ops import masked_policy, root_prior

# VMEM budget for the tree scratch planes (leave room for temporaries,
# double-buffered IO and the compiler's own working set).
_SCRATCH_BYTES_BUDGET = 8 * 1024 * 1024


def _pick_block(B: int, A: int, C: int, K: int = 1) -> int:
    """Largest power-of-two game block whose scratch fits the budget."""
    a_pad = max(8, -(-A // 8) * 8)          # sublane padding
    c_pad = max(128, -(-C // 128) * 128)    # lane padding
    # N/W/P/child [A,C] planes + node/descent/one-hot [C] planes; K>1
    # keeps ~3 extra [C] planes per in-flight descent live at the merge
    per_game = (4 * a_pad * c_pad + (19 + 3 * K) * c_pad) * 4
    bb = 256
    while bb > 8 and bb * per_game > _SCRATCH_BYTES_BUDGET:
        bb //= 2
    while bb > 8 and B % bb != 0:
        bb //= 2
    return bb


def make_fused_root_fn(
    game,
    apply_fn,
    cfg: MCTSConfig,
    block_size: Optional[int] = None,
    mesh=None,
    data_axis: str = "data",
) -> Optional[Callable[[Any, Any, Optional[jax.Array]], jax.Array]]:
    """Build ``root_counts(params, root_state, rng) -> f32[B, A]`` on the
    fused kernel, or return None when the configuration needs the general
    XLA engine (NN priors, games without flat ops, nonzero heuristics).

    ``mesh`` makes the kernel invocation multi-chip: root priors (and any
    Dirichlet noise) are computed in plain sharded XLA — bit-identical to
    the single-device path — and the Pallas call itself runs per-shard
    under ``shard_map`` over ``data_axis`` (a Pallas kernel is a
    single-device program; shard_map is how it rides a sharded jit).
    """
    if os.environ.get("AZ_DISABLE_FUSED"):
        return None
    if block_size is None and jax.default_backend() != "tpu":
        # auto-selection is TPU-only: off-TPU the kernel runs in the slow
        # Pallas interpreter (callers that want it anyway — e.g. the
        # equivalence tests — pass an explicit block_size)
        return None
    uval = getattr(apply_fn, "uniform_value", None)
    eval_factory = getattr(apply_fn, "kernel_eval_factory", None)
    if uval is None and eval_factory is None:
        return None  # model has no in-kernel evaluator -> XLA engine
    if not getattr(game, "heuristic_is_zero", False):
        return None
    if game.num_actions > 16:
        # the kernel unrolls the per-action PUCT refresh and (for K>1)
        # packs per-round counts base-(K+1) into one lane — both sized for
        # small action spaces. Large-A flat-ops games (Gomoku's 81) take
        # the hybrid engine, whose refresh has a dense large-A path.
        return None
    flat_ops_factory = getattr(game, "flat_ops", None)
    if flat_ops_factory is None:
        return None
    ops = flat_ops_factory()
    if eval_factory is not None:
        extract_weights, kernel_eval = eval_factory(ops)
    else:
        extract_weights, kernel_eval = None, None

    A = game.num_actions
    C = cfg.nodes
    D = cfg.max_depth
    L = ops.size
    K = int(getattr(cfg, "parallel_sims", 1) or 1)
    if K > 1:
        if cfg.num_sims % K != 0:
            raise ValueError(
                f"num_sims={cfg.num_sims} must be divisible by "
                f"parallel_sims={K}"
            )
        if (K + 1) ** A >= 1 << 24:
            # per-round virtual-loss counts are packed base-(K+1) into one
            # f32 lane per node; they must stay exactly representable
            raise ValueError(
                f"parallel_sims={K} too large for {A} actions "
                f"(needs (K+1)^A < 2^24)"
            )
    cpuct = float(cfg.cpuct)
    uval = float(uval) if uval is not None else 0.0
    aux = ops.aux()
    aux_shape = tuple(aux.shape)

    def kernel(
        board_ref,   # f32[Bb, L]   root boards
        prior_ref,   # f32[Bb, A]   masked root priors (INVALID_P on illegal)
        aux_ref,     # f32[L, K]    game constant (win-line matrix)
        *rest_refs,
        # rest_refs = [*weight_refs (kernel_eval consts, VMEM-resident),
        #              counts_ref, rootw_ref (outputs),
        #              n/w/p/code (f32[Bb,A,C] tree stat planes),
        #              done/tval (f32[Bb,C] node planes),
        #              st (f32[14,Bb,C] descent state planes),
        #              bd (f32[Bb,L] descent board),
        #              ohpa (f32[Bb,A]), ohpp, ohleaf (f32[Bb,C])]
    ):
        n_weights = kernel.n_weights
        weight_refs = rest_refs[:n_weights]
        (
            counts_ref,
            rootw_ref,
            n_ref,
            w_ref,
            p_ref,
            code_ref,
            done_ref,
            tval_ref,
            st_ref,
            bd_ref,
            ohpa_ref,
            ohpp_ref,
            ohleaf_ref,
        ) = rest_refs[n_weights:]
        # Mosaic layout-robustness rules used throughout (each violation
        # was observed as "Not implemented: Lane broadcast" on v5e):
        # * NO non-scalar carries through lax.while_loop — descent state
        #   lives in scratch refs as lane-REPLICATED [Bb, C] planes and the
        #   loop carries one f32 scalar;
        # * no i1 vectors: flags are 0/1 floats, selects are arithmetic
        #   blends ``x + flag * (y - x)``;
        # * [Bb, 1] columns only as keepdims-reduce results immediately
        #   consumed by a broadcast (the native softmax pattern).
        Bb = board_ref.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (Bb, C), 1)
        lane_f = lane.astype(jnp.float32)
        lane0 = lane == 0
        act_iota_f = jax.lax.broadcasted_iota(jnp.int32, (Bb, A), 1).astype(
            jnp.float32
        )
        root = board_ref[...]
        aux_m = aux_ref[...]

        # ---- init: root in slot 0 (init_tree analogue); mixed-shape
        # selects are written as arithmetic blends (mask multiplies) —
        # Mosaic's select requires operands already in the result layout ----
        lane0_f = lane0.astype(jnp.float32)
        zero_plane = jnp.zeros((Bb, A, C), jnp.float32)
        n_ref[...] = zero_plane
        w_ref[...] = zero_plane
        p_ref[...] = lane0_f[:, None, :] * prior_ref[...][:, :, None]
        code_ref[...] = jnp.full((Bb, A, C), -1.0)
        rdone, rtval = ops.terminal(root, aux_m)  # [Bb, 1]
        rdone_f = rdone.astype(jnp.float32)
        done_ref[...] = lane0_f * rdone_f
        tval_ref[...] = lane0_f * rtval
        root_live_f = 1.0 - rdone_f

        def refresh_best():
            """Dense PUCT scores + first-max argmax over A, fused and
            unrolled per action (A is tiny) — the [Bb, A, C] score plane is
            never materialized. Writes the winning action / child-code
            planes into st_ref[8]/st_ref[9]. Called right after each merge
            so the stat-plane reads sit next to the merge's writes (one
            plane traversal per sim instead of two)."""
            n = n_ref[...]
            w = w_ref[...]
            p = p_ref[...]
            code_pl = code_ref[...]
            sqrt_npar = jnp.sqrt(
                jnp.sum(n, axis=1, keepdims=True) + PUCT_EPS
            )[:, 0, :]  # [Bb, C]

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
            if K == 1:
                for a in range(1, A):
                    sa = edge_score(a)
                    better = sa > best
                    best = jnp.where(better, sa, best)
                    best_a = jnp.where(better, jnp.float32(a), best_a)
                    best_code = jnp.where(better, code_pl[:, a, :], best_code)
                st_ref[8] = best_a
                st_ref[9] = best_code
                return
            # K > 1: track the runner-up too (contended nodes rotate
            # between their top-2 PUCT actions within a round)
            second = jnp.full((Bb, C), -1e30)
            sec_a = jnp.full((Bb, C), -1.0)
            sec_code = jnp.full((Bb, C), -1.0)
            for a in range(1, A):
                sa = edge_score(a)
                ca = code_pl[:, a, :]
                b1 = sa > best
                b2 = (~b1) & (sa > second)
                second = jnp.where(b1, best, jnp.where(b2, sa, second))
                sec_a = jnp.where(b1, best_a, jnp.where(b2, jnp.float32(a), sec_a))
                sec_code = jnp.where(b1, best_code, jnp.where(b2, ca, sec_code))
                best = jnp.where(b1, sa, best)
                best_a = jnp.where(b1, jnp.float32(a), best_a)
                best_code = jnp.where(b1, ca, best_code)
            # a runner-up only counts if it is a legal edge
            sec_a = jnp.where(second > -1e29, sec_a, -1.0)
            st_ref[8] = best_a
            st_ref[9] = best_code
            st_ref[10] = sec_a
            st_ref[11] = sec_code

        refresh_best()

        def sim_body(i, _):
            s = i + 1  # lockstep slot cursor (root occupies 0)
            best_a = st_ref[8]
            best_code = st_ref[9]

            # ---- descent: state in scratch refs (lane-replicated [Bb, C]
            # planes), while_loop carries ONE f32 scalar. The path is
            # recorded COMPRESSED into two [Bb, C] planes — at lane=node,
            # (action+1) and the root-parity sign — exploiting that a
            # descent visits each node at most once (pure tree, no
            # transpositions). Per level that is two [Bb, C] adds instead
            # of two full [Bb, A, C] plane passes (8x less VMEM traffic);
            # the [Bb, A, C] edge one-hots are reconstructed ONCE by the
            # merge pass below. ----
            ones_c = jnp.ones((Bb, C), jnp.float32)
            st_ref[0] = jnp.zeros((Bb, C), jnp.float32)          # node
            st_ref[1] = jnp.zeros((Bb, C), jnp.float32)          # depth
            st_ref[2] = root_live_f * ones_c                     # active
            st_ref[3] = ones_c                                   # psign=(-1)^depth
            st_ref[4] = jnp.zeros((Bb, C), jnp.float32)          # exp_mask
            st_ref[5] = jnp.zeros((Bb, C), jnp.float32)          # term_mask
            st_ref[6] = jnp.zeros((Bb, C), jnp.float32)          # path action+1
            st_ref[7] = jnp.zeros((Bb, C), jnp.float32)          # path parity
            bd_ref[...] = root
            ohpa_ref[...] = jnp.zeros((Bb, A), jnp.float32)
            ohpp_ref[...] = jnp.zeros((Bb, C), jnp.float32)
            ohleaf_ref[...] = jnp.zeros((Bb, C), jnp.float32)

            def dcond(t):
                return t > 0.5

            def dbody(t):
                node = st_ref[0]
                depth = st_ref[1]
                act = st_ref[2]
                psign = st_ref[3]
                act_col = jnp.max(act, axis=1, keepdims=True)    # [Bb, 1]
                psign_col = jnp.max(psign, axis=1, keepdims=True)

                oh = (lane_f == node).astype(jnp.float32)        # [Bb, C]
                a_col = jnp.sum(best_a * oh, axis=1, keepdims=True)
                code = jnp.sum(best_code * oh, axis=1, keepdims=True) * ones_c

                # record this edge for the backup: +1 visit, (-1)^depth
                # value weight (final sign multiplies (-1)^depth_total in)
                oh_a = (act_iota_f == a_col).astype(jnp.float32)  # [Bb, A]
                # compressed path record at lane=node (see init note)
                st_ref[6] = st_ref[6] + (act_col * (a_col + 1.0)) * oh
                st_ref[7] = st_ref[7] + (act_col * psign_col) * oh

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
                ohpa_ref[...] = (
                    ohpa_ref[...] + exp_now_col * (oh_a - ohpa_ref[...])
                )
                ohpp_ref[...] = ohpp_ref[...] + exp_now * (oh - ohpp_ref[...])
                ohleaf_ref[...] = (
                    ohleaf_ref[...] + stop_leaf * (oh_child - ohleaf_ref[...])
                )
                return jnp.max(go)

            jax.lax.while_loop(dcond, dbody, jnp.max(st_ref[2]))

            exp_mask = jnp.max(st_ref[4], axis=1, keepdims=True)  # f32 0/1
            term_mask = jnp.max(st_ref[5], axis=1, keepdims=True)
            psign = jnp.max(st_ref[3], axis=1, keepdims=True)

            # ---- expand at slot s (frontier board == child state) ----
            s_ok = (s < C).astype(jnp.float32)             # scalar
            exp_ok = exp_mask * s_ok                       # f32 0/1 [Bb,1]
            child_board = bd_ref[...]
            vm = ops.valid(child_board)                    # bool[Bb, A]
            cdone_b, ctval = ops.terminal(child_board, aux_m)
            cdone = cdone_b.astype(jnp.float32)            # f32 0/1 [Bb,1]

            # ---- evaluate: constant prior/value OR the in-kernel NN
            # (MXU matmuls on VMEM-resident weights — replaces the XLA
            # engine's full-batch forward AND its HBM tree streaming) ----
            if kernel_eval is None:
                nval = jnp.sum(vm, axis=1, keepdims=True)
                prior = vm.astype(jnp.float32) / jnp.maximum(nval, 1)
                v_nn = uval
            else:
                logits, v_nn = kernel_eval(
                    child_board, vm, *[r[...] for r in weight_refs]
                )
                prior = masked_policy(logits, vm)
            pm = jnp.where(vm, prior, INVALID_P)

            # ---- leaf value ----
            v_term = jnp.sum(
                tval_ref[...] * ohleaf_ref[...], axis=1, keepdims=True
            )
            v_expand = ctval + (1.0 - cdone) * (v_nn - ctval)
            v_leaf = exp_mask * v_expand + (1.0 - exp_mask) * term_mask * v_term
            # psign flipped once per traversed edge: it IS (-1)^depth
            mval = v_leaf * psign                          # [Bb, 1]

            # ---- merge: install new rows + child link + backup, one pass
            # per plane over VMEM-resident stats (arithmetic blends) ----
            nm_f = exp_ok * (lane == s).astype(jnp.float32)   # [Bb, C]
            wm_f = nm_f[:, None, :]                           # [Bb, 1, C]
            keep = 1.0 - wm_f
            # reconstruct the path edge one-hots from the compressed record
            on_a = (
                act_iota_f[:, :, None] + 1.0 == st_ref[6][:, None, :]
            ).astype(jnp.float32)                           # [Bb, A, C]
            n_ref[...] = n_ref[...] * keep + on_a
            w_ref[...] = (
                w_ref[...] * keep
                + mval[:, :, None] * (st_ref[7][:, None, :] * on_a)
            )
            p_ref[...] = p_ref[...] * keep + wm_f * pm[:, :, None]

            s_f = (i + 1).astype(jnp.float32)
            link_code = s_f + cdone * (-2.0 - 2.0 * s_f)   # -2-s if cdone
            link_add = (
                ((link_code + 1.0) * exp_ok * ohpa_ref[...])
            )[:, :, None] * ohpp_ref[...][:, None, :]
            code_ref[...] = code_ref[...] * keep - wm_f + link_add

            done_ref[...] = done_ref[...] * (1.0 - nm_f) + nm_f * cdone
            tval_ref[...] = tval_ref[...] * (1.0 - nm_f) + nm_f * ctval
            refresh_best()
            return 0

        def round_body(r, _):
            """K leaf-parallel descents sharing ONE stat-plane merge and
            ONE score refresh — the lockstep virtual-loss analogue of the
            reference's num_sim_threads searchers (async_mcts.rs:191-217):
            per-round in-flight visit counts are packed base-(K+1) into
            one f32 lane per node (st_ref[12]); a descent whose top PUCT
            action has more in-flight visits than the runner-up takes the
            runner-up instead (the virtual-loss deterrent, node.rs:77-92).
            Duplicate expansions of the same placeholder are detected
            exactly (any prior in-round visit of an unexpanded edge IS a
            prior claim) and install nothing — their backup still counts,
            matching visit semantics. Slots base+1+k are burned in
            lockstep like the K=1 path."""
            best_a = st_ref[8]
            best_code = st_ref[9]
            sec_a = st_ref[10]
            sec_code = st_ref[11]
            ones_c = jnp.ones((Bb, C), jnp.float32)
            zero_c = jnp.zeros((Bb, C), jnp.float32)
            # powers of (K+1) per action lane, built exactly
            pow_row = jnp.ones((Bb, A), jnp.float32)
            for j in range(1, A):
                pow_row = jnp.where(act_iota_f >= j, pow_row * (K + 1), pow_row)
            st_ref[12] = zero_c  # packed per-round virtual-loss counts

            per_k = []
            for k in range(K):
                st_ref[0] = zero_c                      # node
                st_ref[1] = zero_c                      # depth
                st_ref[2] = root_live_f * ones_c        # active
                st_ref[3] = ones_c                      # psign
                st_ref[4] = zero_c                      # exp_mask
                st_ref[5] = zero_c                      # term_mask
                st_ref[6] = zero_c                      # path action+1
                st_ref[7] = zero_c                      # path parity
                st_ref[13] = zero_c                     # duplicate-claim flag
                bd_ref[...] = root
                ohpa_ref[...] = jnp.zeros((Bb, A), jnp.float32)
                ohpp_ref[...] = zero_c
                ohleaf_ref[...] = zero_c

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

                    # in-flight counts at this node: unpack base-(K+1)
                    vp = jnp.sum(st_ref[12] * oh, axis=1, keepdims=True)
                    dig = jnp.floor(vp / pow_row)
                    dig = dig - (K + 1) * jnp.floor(dig / (K + 1))  # [Bb, A]
                    oh_a1 = (act_iota_f == a1).astype(jnp.float32)
                    oh_a2 = (act_iota_f == a2).astype(jnp.float32)
                    v1 = jnp.sum(dig * oh_a1, axis=1, keepdims=True)
                    v2 = jnp.sum(dig * oh_a2, axis=1, keepdims=True)
                    has2 = (a2 > -0.5).astype(jnp.float32)
                    use2 = has2 * (v2 < v1).astype(jnp.float32)

                    a_col = a1 + use2 * (a2 - a1)
                    code = (c1 + use2 * (c2 - c1)) * ones_c
                    oh_a = oh_a1 + use2 * (oh_a2 - oh_a1)
                    v_cho = v1 + use2 * (v2 - v1)

                    # record the edge (path compression as in sim_body)
                    st_ref[6] = st_ref[6] + (act_col * (a_col + 1.0)) * oh
                    st_ref[7] = st_ref[7] + (act_col * psign_col) * oh
                    # bump the packed in-flight count
                    vp_add = jnp.sum(oh_a * pow_row, axis=1, keepdims=True)
                    st_ref[12] = st_ref[12] + (act_col * vp_add) * oh

                    board = bd_ref[...]
                    stepped = ops.step(board, a_col)
                    bd_ref[...] = board + act_col * (stepped - board)

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

                    # an unexpanded edge already visited this round was
                    # claimed by an earlier descent: duplicate expansion
                    dup_now = exp_now * (v_cho > 0.5).astype(jnp.float32)

                    st_ref[0] = node + go * (child - node)
                    st_ref[1] = depth + act
                    st_ref[2] = go
                    st_ref[3] = psign * (1.0 - 2.0 * act)
                    st_ref[4] = jnp.maximum(st_ref[4], exp_now)
                    st_ref[5] = jnp.maximum(st_ref[5], act * cterm)
                    st_ref[13] = jnp.maximum(st_ref[13], dup_now)
                    ohpa_ref[...] = (
                        ohpa_ref[...] + exp_now_col * (oh_a - ohpa_ref[...])
                    )
                    ohpp_ref[...] = (
                        ohpp_ref[...] + exp_now * (oh - ohpp_ref[...])
                    )
                    ohleaf_ref[...] = (
                        ohleaf_ref[...] + stop_leaf * (oh_child - ohleaf_ref[...])
                    )
                    return jnp.max(go)

                jax.lax.while_loop(dcond, dbody, jnp.max(st_ref[2]))

                exp_mask = jnp.max(st_ref[4], axis=1, keepdims=True)
                term_mask = jnp.max(st_ref[5], axis=1, keepdims=True)
                dup = jnp.max(st_ref[13], axis=1, keepdims=True)
                psign = jnp.max(st_ref[3], axis=1, keepdims=True)

                child_board = bd_ref[...]
                vm = ops.valid(child_board)
                cdone_b, ctval = ops.terminal(child_board, aux_m)
                cdone = cdone_b.astype(jnp.float32)
                if kernel_eval is None:
                    nval = jnp.sum(vm, axis=1, keepdims=True)
                    prior = vm.astype(jnp.float32) / jnp.maximum(nval, 1)
                    v_nn = uval
                else:
                    logits, v_nn = kernel_eval(
                        child_board, vm, *[rr[...] for rr in weight_refs]
                    )
                    prior = masked_policy(logits, vm)
                pm = jnp.where(vm, prior, INVALID_P)

                v_term = jnp.sum(
                    tval_ref[...] * ohleaf_ref[...], axis=1, keepdims=True
                )
                v_expand = ctval + (1.0 - cdone) * (v_nn - ctval)
                v_leaf = (
                    exp_mask * v_expand
                    + (1.0 - exp_mask) * term_mask * v_term
                )
                per_k.append(
                    dict(
                        patha=st_ref[6][...],
                        psgn=st_ref[7][...],
                        ohpa=ohpa_ref[...],
                        ohpp=ohpp_ref[...],
                        pm=pm,
                        cdone=cdone,
                        mval=v_leaf * psign,
                        ctval=ctval,
                        # install only for non-duplicate expansions
                        inst=exp_mask * (1.0 - dup),
                    )
                )

            # ---- shared merge: one RMW pass per stat plane for all K
            # descents ----
            s0 = r * K + 1
            keep = jnp.ones((Bb, 1, C), jnp.float32)
            n_add = jnp.zeros((Bb, A, C), jnp.float32)
            w_add = jnp.zeros((Bb, A, C), jnp.float32)
            p_inst = jnp.zeros((Bb, A, C), jnp.float32)
            code_delta = jnp.zeros((Bb, A, C), jnp.float32)
            dn_new = zero_c
            dt_new = zero_c
            nm_all = zero_c
            for k in range(K):
                d = per_k[k]
                s = s0 + k
                s_ok = (s < C).astype(jnp.float32)
                inst = d["inst"] * s_ok                      # [Bb, 1]
                nm_k = inst * (lane == s).astype(jnp.float32)  # [Bb, C]
                wm_k = nm_k[:, None, :]
                keep = keep * (1.0 - wm_k)
                on_a = (
                    act_iota_f[:, :, None] + 1.0 == d["patha"][:, None, :]
                ).astype(jnp.float32)
                n_add = n_add + on_a
                w_add = w_add + d["mval"][:, :, None] * (
                    d["psgn"][:, None, :] * on_a
                )
                p_inst = p_inst + wm_k * d["pm"][:, :, None]
                s_f = (s0 + k).astype(jnp.float32)
                link_code = s_f + d["cdone"] * (-2.0 - 2.0 * s_f)
                code_delta = (
                    code_delta
                    - wm_k
                    + (
                        (link_code + 1.0) * inst * d["ohpa"]
                    )[:, :, None] * d["ohpp"][:, None, :]
                )
                dn_new = dn_new + nm_k * d["cdone"]
                dt_new = dt_new + nm_k * d["ctval"]
                nm_all = nm_all + nm_k

            n_ref[...] = n_ref[...] * keep + n_add
            w_ref[...] = w_ref[...] * keep + w_add
            p_ref[...] = p_ref[...] * keep + p_inst
            code_ref[...] = code_ref[...] * keep + code_delta
            done_ref[...] = done_ref[...] * (1.0 - nm_all) + dn_new
            tval_ref[...] = tval_ref[...] * (1.0 - nm_all) + dt_new
            refresh_best()
            return 0

        if K == 1:
            jax.lax.fori_loop(0, cfg.num_sims, sim_body, 0)
        else:
            jax.lax.fori_loop(0, cfg.num_sims // K, round_body, 0)

        counts_ref[...] = jnp.sum(
            n_ref[...] * lane0.astype(jnp.float32)[:, None, :], axis=2
        )
        rootw_ref[...] = jnp.sum(
            w_ref[...] * lane0.astype(jnp.float32)[:, None, :], axis=2
        )

    def run_kernel(boards: jax.Array, priors: jax.Array, weights=()):
        B = boards.shape[0]
        Bb = block_size or _pick_block(B, A, C, K)
        if B % Bb != 0:
            Bb = max(b for b in range(1, min(Bb, B) + 1) if B % b == 0)
        grid = (B // Bb,)
        interpret = jax.default_backend() == "cpu"
        kernel.n_weights = len(weights)

        def bcast_spec(arr):
            nd = arr.ndim
            return pl.BlockSpec(
                tuple(arr.shape),
                lambda g, _nd=nd: (0,) * _nd,
                memory_space=pltpu.VMEM,
            )

        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((Bb, L), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Bb, A), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(aux_shape, lambda g: (0, 0), memory_space=pltpu.VMEM),
                *[bcast_spec(w) for w in weights],
            ],
            out_specs=[
                pl.BlockSpec((Bb, A), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Bb, A), lambda g: (g, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, A), jnp.float32),
                jax.ShapeDtypeStruct((B, A), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((Bb, A, C), jnp.float32),  # N
                pltpu.VMEM((Bb, A, C), jnp.float32),  # W
                pltpu.VMEM((Bb, A, C), jnp.float32),  # P
                pltpu.VMEM((Bb, A, C), jnp.float32),  # child code
                pltpu.VMEM((Bb, C), jnp.float32),     # done
                pltpu.VMEM((Bb, C), jnp.float32),     # tval
                pltpu.VMEM((14, Bb, C), jnp.float32),  # descent state planes
                pltpu.VMEM((Bb, L), jnp.float32),     # descent board
                pltpu.VMEM((Bb, A), jnp.float32),     # expand-action one-hot
                pltpu.VMEM((Bb, C), jnp.float32),     # expand-parent one-hot
                pltpu.VMEM((Bb, C), jnp.float32),     # leaf one-hot
            ],
            interpret=interpret,
            # K>1 rounds carry extra scratch planes that can nudge a block
            # past the default 16 MB scoped-vmem stack (measured: 16.48 MB
            # at K=4, Bb=256); v5e has 128 MB VMEM — same headroom as the
            # hybrid kernel
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )(boards, priors, aux, *weights)

    feat_dummy = getattr(apply_fn, "needs_features", True)

    def run_kernel_sorted(boards: jax.Array, priors: jax.Array, weights=()):
        """Depth-sorted blocking: the descent while_loop runs until the
        DEEPEST game in a block finishes, so one endgame board (narrow
        deep tree) stalls its whole 256-game block at the opening boards'
        expense — measured ~18% of steady-state wall (bench.py warmup
        note). Stable-sorting games by a depth proxy (stone count read
        off the board lanes) groups like-depth games into the same block,
        turning sum-over-blocks-of-max-depth into near-quantile maxes.
        Results are scattered back to the original order — per-game lanes
        never interact inside the kernel, so counts are bit-identical to
        the unsorted call (asserted by tests/test_fused.py).

        Threshold (round-4 A/B, docs/ROUND4.md): +17% at B=65536 on the
        actor mix, but −3% at the full preset's B=2048 where the NN
        forward dominates and only 8 blocks exist — the gather/argsort
        overhead outweighs the blocking win below ~8k games. Default
        AZ_SORT_MIN_BATCH=8192; AZ_FUSED_NOSORT disables outright.

        Under shard_map this compares the PER-SHARD batch (global /
        data-axis size) — deliberately: the block economics the A/B
        measured live per device (each device sorts and blocks only its
        own games), so a global batch of 32768 over 8 chips is 4096
        games/device = 16 blocks/device, below the measured crossover.
        The knob therefore means games-per-device everywhere."""
        min_b = int(os.environ.get("AZ_SORT_MIN_BATCH", "8192"))
        if boards.shape[0] < min_b or os.environ.get("AZ_FUSED_NOSORT"):
            return run_kernel(boards, priors, weights)
        depth_proxy = jnp.sum(jnp.abs(boards), axis=-1)
        order = jnp.argsort(depth_proxy)  # stable -> deterministic
        counts, rootw = run_kernel(boards[order], priors[order], weights)
        inv = jnp.argsort(order)
        return counts[inv], rootw[inv]

    def root_counts(params, root_state, rng: Optional[jax.Array] = None) -> jax.Array:
        """Fused-search root visit counts; root-prior path (masked softmax
        of the model's constant logits + optional Dirichlet) mirrors
        mcts/search.py's ``search`` exactly."""
        boards = ops.from_state(root_state)
        prior, root_valid = root_prior(game, apply_fn, cfg, params, root_state, rng)
        p_masked = jnp.where(root_valid, prior, INVALID_P)
        weights = () if extract_weights is None else tuple(extract_weights(params))
        if mesh is not None and mesh.shape.get(data_axis, 1) > 1:
            from jax.sharding import PartitionSpec as P

            sharded = jax.shard_map(
                lambda b, pr, *w: run_kernel_sorted(b, pr, w)[0],
                mesh=mesh,
                in_specs=(P(data_axis), P(data_axis)) + (P(),) * len(weights),
                out_specs=P(data_axis),
                # pallas_call out_shapes carry no varying-mesh-axes info
                check_vma=False,
            )
            return sharded(boards, p_masked, *weights)
        counts, _ = run_kernel_sorted(boards, p_masked, weights)
        return counts

    return root_counts

"""On-device replay ring buffer.

Re-design of the reference's replay machinery: ``Coach.history`` — a deque
of per-iteration sample deques with FIFO trimming (reference:
src/coach.rs:18-34, 275-289) that is flattened, shuffled and AOS->SOA
converted on every train call (coach.rs:296-326). Here the replay is a
single fixed-capacity SoA ring buffer that lives in HBM: insertion is one
masked scatter (with symmetry expansion fused in — coach.rs:130-135 stored
symmetries at episode time), sampling is one gather with a fresh PRNG key.
Nothing ever crosses the host boundary.

FIFO semantics: the ring overwrite IS the history eviction — capacity plays
the role of ``max_history_length × max_queue_length``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from alphazero_tpu.config import ReplayConfig
from alphazero_tpu.selfplay import Trajectory


_LIMB_BITS = 30  # total = hi * 2^30 + lo; both limbs stay far from i32 range


class ReplayState(NamedTuple):
    features: jax.Array  # f32[Cap, ...feature_shape]
    pi: jax.Array        # f32[Cap, A]
    value: jax.Array     # f32[Cap]
    pos: jax.Array       # i32[] next write slot
    size: jax.Array      # i32[] live sample count (<= Cap)
    total: jax.Array     # i32[2] lifetime samples as (hi, lo) base-2^30
    #                      limbs — a week-long multi-chip run exceeds i32,
    #                      and JAX's default 32-bit mode silently downgrades
    #                      int64, so the wide counter is kept in two limbs


def replay_total(replay: ReplayState) -> int:
    """Lifetime inserted-sample count as a Python int."""
    hi, lo = (int(x) for x in replay.total)
    return (hi << _LIMB_BITS) | lo


def replay_init(game, cfg: ReplayConfig) -> ReplayState:
    cap = cfg.capacity
    return ReplayState(
        features=jnp.zeros((cap,) + tuple(game.feature_shape), jnp.float32),
        pi=jnp.zeros((cap, game.num_actions), jnp.float32),
        value=jnp.zeros((cap,), jnp.float32),
        pos=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
        total=jnp.zeros((2,), jnp.int32),
    )


def replay_insert(
    replay: ReplayState, game, traj: Trajectory
) -> ReplayState:
    """Insert all valid samples of a trajectory, expanded through
    ``game.symmetries`` (the vectorized coach.rs:130-135).

    Valid samples are compacted to consecutive ring slots via a prefix sum,
    so insertion order (and therefore eviction order) is deterministic:
    time-major, then batch, then symmetry index.
    """
    cap = replay.features.shape[0]

    sym_v = jax.vmap(game.symmetries)  # over flattened samples
    T, B = traj.valid.shape
    flat = lambda x: x.reshape((T * B,) + x.shape[2:])
    feats, pis = sym_v(flat(traj.features), flat(traj.pi))
    S = feats.shape[1]
    n = T * B * S
    feats = feats.reshape((n,) + feats.shape[2:])
    pis = pis.reshape((n, pis.shape[-1]))
    vals = jnp.repeat(flat(traj.value), S)
    valid = jnp.repeat(flat(traj.valid), S)

    offs = jnp.cumsum(valid.astype(jnp.int32)) - 1
    idx = jnp.where(valid, (replay.pos + offs) % cap, cap)  # cap -> dropped
    num = valid.sum().astype(jnp.int32)

    lo = replay.total[1] + num
    total = jnp.stack(
        [replay.total[0] + (lo >> _LIMB_BITS), lo & ((1 << _LIMB_BITS) - 1)]
    )
    return ReplayState(
        features=replay.features.at[idx].set(feats, mode="drop"),
        pi=replay.pi.at[idx].set(pis, mode="drop"),
        value=replay.value.at[idx].set(vals, mode="drop"),
        pos=(replay.pos + num) % cap,
        size=jnp.minimum(replay.size + num, cap),
        total=total,
    )


def replay_sample(
    replay: ReplayState, rng: jax.Array, batch_size: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Uniform sample with replacement over the live region — the analogue
    of the reference's shuffle-then-epoch pass (coach.rs:311-315 +
    connect_four_net.py:127-151's minibatch loop)."""
    idx = jax.random.randint(
        rng, (batch_size,), 0, jnp.maximum(replay.size, 1)
    )
    return replay.features[idx], replay.pi[idx], replay.value[idx]

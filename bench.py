#!/usr/bin/env python
"""Headline benchmark: MCTS-backed env-steps/s/chip on connect-four.

Runs the steady-state self-play actor (BASELINE config 1 semantics: pure
MCTS, uniform prior, 100 simulations per move) on the default backend (the
real TPU chip under the driver) and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the 100k env-steps/s/chip north-star target
(BASELINE.md — the reference itself publishes no numbers).

Batch size is the TPU-native operating point (thousands of lockstep games);
override with AZ_BENCH_BATCH / AZ_BENCH_SIMS / AZ_BENCH_STEPS.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: first-compile over the remote tunnel is
# slow; later rounds reuse it.
cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from alphazero_tpu.config import MCTSConfig
from alphazero_tpu.games import ConnectFour
from alphazero_tpu.models import make_uniform_model
from alphazero_tpu.selfplay import make_actor_step_fn

BASELINE_TARGET = 100_000.0  # env-steps/s/chip (BASELINE.json north_star)


def tunnel_sync(x):
    """Wait for ``x``'s computation, tunnel-safe: block_until_ready can
    return early over the axon tunnel, but a one-row host fetch cannot
    complete before the computation (the row is data-dependent on the
    whole step chain). Shared by every bench harness."""
    import numpy as np

    jax.block_until_ready(x)
    np.asarray(x[:1])


def main():
    # backend init watchdog: with the axon tunnel down, device discovery
    # hangs indefinitely — fail fast with a reason instead of eating the
    # caller's whole timeout. (No CPU fallback on purpose: a CPU number
    # must never be recorded as the chip metric.)
    import threading

    devs = []
    t = threading.Thread(target=lambda: devs.extend(jax.devices()), daemon=True)
    t.start()
    t.join(timeout=float(os.environ.get("AZ_BENCH_INIT_TIMEOUT", 300)))
    if not devs:
        print(
            "bench.py: backend init timed out — TPU tunnel down? "
            "(no metric emitted; set AZ_BENCH_INIT_TIMEOUT to wait longer)",
            file=sys.stderr,
        )
        return 1

    # measured on v5e: 8192 games -> ~272k env-steps/s, 32768 -> ~288k,
    # 65536 -> ~292k (fixed per-move costs amortize across more lockstep
    # games; the curve is flat past ~49k)
    batch = int(os.environ.get("AZ_BENCH_BATCH", 65536))
    sims = int(os.environ.get("AZ_BENCH_SIMS", 100))
    steps = int(os.environ.get("AZ_BENCH_STEPS", 20))

    game = ConnectFour()
    net = make_uniform_model(game)
    cfg = MCTSConfig(num_sims=sims, max_depth=48)
    init_carry, actor_step = make_actor_step_fn(
        game, net.apply_fn, cfg, batch_size=batch, temp_threshold=15
    )
    step = jax.jit(actor_step)

    carry = init_carry()
    key = jax.random.key(0)
    sync = tunnel_sync

    # warmup: compile + enough steps to reach the actor's STEADY STATE.
    # The first ~20 moves after a cold start are all lockstep opening
    # positions — wide shallow trees, short PUCT descents — and run ~18%
    # faster than the steady-state mix that includes endgame boards
    # (narrow deep trees -> longer descents). Rounds 1-3 measured that
    # transient (2-step warmup); per-window timing shows 4.74s for steps
    # 2-22 then a tight 5.55-5.62s plateau from step ~40 on. The honest
    # metric is the plateau.
    warmup = int(os.environ.get("AZ_BENCH_WARMUP", 40))
    for i in range(warmup):
        key, sub = jax.random.split(key)
        carry, pi = step({}, carry, sub)
    sync(pi)

    # variance protocol: round-over-round single shots were
    # indistinguishable from tunnel noise (±few %), so the headline is
    # the MEDIAN of `repeats` timed windows, with the min/max spread
    # reported alongside — a real regression must clear the spread.
    repeats = int(os.environ.get("AZ_BENCH_REPEATS", 3))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for i in range(steps):
            key, sub = jax.random.split(key)
            carry, pi = step({}, carry, sub)
        sync(pi)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]

    env_steps = steps * batch
    eps = env_steps / dt
    n_chips = max(jax.device_count(), 1)
    eps_per_chip = eps / n_chips
    eps_min = env_steps / max(times) / n_chips
    eps_max = env_steps / min(times) / n_chips

    print(
        json.dumps(
            {
                "metric": "mcts_env_steps_per_sec_per_chip_connect4",
                "value": round(eps_per_chip, 1),
                "unit": "env_steps/s/chip",
                "vs_baseline": round(eps_per_chip / BASELINE_TARGET, 3),
                "detail": {
                    "batch_games": batch,
                    "sims_per_move": sims,
                    "timed_moves": steps,
                    "warmup_moves": warmup,
                    "repeats": repeats,
                    "seconds_median": round(dt, 3),
                    "seconds_all": [round(t, 3) for t in times],
                    "eps_spread": [round(eps_min, 1), round(eps_max, 1)],
                    # drift visibility: previous rounds' recorded values.
                    # NOT directly comparable — r1-r3 used a 2-step warmup
                    # and so timed the ~18%-cheaper cold-start transient
                    # (lockstep opening moves only); r4+ time the
                    # steady-state plateau (see warmup comment).
                    "prev_rounds": {"r1": 287843.1, "r2": 279010.7,
                                    "r3": 276878.8},
                    "protocol": "steady_state_median",
                    "sims_per_sec": round(eps * sims, 0),
                    "backend": jax.default_backend(),
                    "devices": n_chips,
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())

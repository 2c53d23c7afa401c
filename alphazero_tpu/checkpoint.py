"""Checkpoint / resume.

The reference has two mechanisms (SURVEY.md §5): bincode'd replay-history
files ``{iteration}.examples`` picked up by numeric stem on restart
(reference: src/coach.rs:55-81, 159-167 — with defect D6's absolute-path
join writing to filesystem root), and per-model ``{model_id}.pth.tar``
files owned by the Python net (python_nnet.rs:65-82). Crucially the
reference never persists the iteration counter or model_id.

Here one Orbax checkpoint per iteration captures the WHOLE training state:
incumbent params + optimizer + batch stats, the on-device replay ring, the
PRNG key, and the iteration/model-id counters — so resume is exact. The
Elo/metrics history rides along as a JSON sidecar.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

_CKPT_RE = re.compile(r"^ckpt_(\d+)$")


def _ckpt_path(directory: str, step: int) -> str:
    return os.path.join(os.path.abspath(directory), f"ckpt_{step:06d}")


def save_checkpoint(
    directory: str, step: int, payload: Any, sidecar: Optional[dict] = None
) -> str:
    """Save a pytree payload as checkpoint ``step`` (+ JSON sidecar).

    Multi-controller: every process calls this (Orbax coordinates the
    distributed array save); the JSON sidecar is written by process 0.

    Ordering invariant: the sidecar is written BEFORE the Orbax save.
    Orbax finalizes atomically (tmp dir + rename), so a crash anywhere
    in this function leaves either (a) a dangling ``.json`` with no
    ``ckpt_*`` dir — invisible to ``latest_step``/``newest_ring_step``,
    which key off the dirs — or (b) a complete pair. The reverse order
    had a window where a LIGHT (``has_rings: false``) checkpoint existed
    without its sidecar and resume misclassified it as ring-bearing
    (round-4 ADVICE). ``Coach._maybe_resume`` additionally falls back to
    the light/ring-split plan if an exact restore fails, covering
    same-step resaves that flip lightness."""
    if jax.process_index() == 0:
        os.makedirs(directory, exist_ok=True)
    path = _ckpt_path(directory, step)
    if sidecar is not None and jax.process_index() == 0:
        with open(path + ".json", "w") as f:
            json.dump(sidecar, f)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def read_sidecar(directory: str, step: int) -> Optional[dict]:
    """The JSON sidecar for ``step``, or None. Cheap (no Orbax): used to
    decide the restore plan (``has_rings``) before any array reads."""
    path = _ckpt_path(directory, step) + ".json"
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def newest_ring_step(
    directory: str, exclude: Optional[int] = None
) -> Optional[int]:
    """Newest checkpoint whose sidecar does not mark it LIGHT
    (``has_rings: false``). Checkpoints written before the
    ``replay_save_stride`` feature carry no flag and count as
    ring-bearing (they always saved the rings). ``exclude`` skips one
    step whose classification is known-unreliable (a checkpoint whose
    exact restore just failed — its sidecar may be missing or describe
    a different same-step save)."""
    if not os.path.isdir(directory):
        return None
    steps = sorted(
        (
            int(m.group(1))
            for name in os.listdir(directory)
            if (m := _CKPT_RE.match(name))
        ),
        reverse=True,
    )
    for step in steps:
        if step == exclude:
            continue
        sidecar = read_sidecar(directory, step)
        if sidecar is None or sidecar.get("has_rings", True):
            return step
    return None


def prune_checkpoints(directory: str, keep: int) -> list:
    """Delete all but the newest ``keep`` checkpoints (and their JSON
    sidecars). Returns the pruned step numbers. Call from process 0 only
    in multi-controller runs — and only after the save is finished
    (``save_checkpoint`` blocks on wait_until_finished).

    The newest RING-BEARING checkpoint is never pruned, even when older
    than the retention window: with ``replay_save_stride > 1`` it is the
    only durable copy of the replay/reanalyze rings that resume needs."""
    import shutil

    if not os.path.isdir(directory) or keep < 1:
        return []
    steps = sorted(
        int(m.group(1))
        for name in os.listdir(directory)
        if (m := _CKPT_RE.match(name))
    )
    protect = newest_ring_step(directory)
    pruned = [s for s in steps[:-keep] if s != protect]
    for step in pruned:
        path = _ckpt_path(directory, step)
        shutil.rmtree(path, ignore_errors=True)
        try:
            os.remove(path + ".json")
        except FileNotFoundError:
            pass
    return pruned


def latest_step(directory: str) -> Optional[int]:
    """Newest checkpoint step by numeric stem (the resume rule of
    coach.rs:61-76, applied to whole-state checkpoints)."""
    if not os.path.isdir(directory):
        return None
    steps = [
        int(m.group(1))
        for name in os.listdir(directory)
        if (m := _CKPT_RE.match(name))
    ]
    return max(steps) if steps else None


def restore_checkpoint(
    directory: str, step: int, template: Any, partial: bool = False
) -> Tuple[Any, Optional[dict]]:
    """Restore payload (shaped like ``template``) + sidecar for ``step``.

    ``partial=True`` restores only the subtrees present in ``template``
    (e.g. just the incumbent params for inference/play tools, skipping the
    replay buffer).

    Template leaves that are committed ``jax.Array``s carry their sharding
    into the restore: a mesh-sharded Coach resumes with every leaf placed
    exactly where ``__init__`` put it (no unsafe host-side restore +
    implicit replication — required for multi-chip/multi-host resume)."""
    path = _ckpt_path(directory, step)

    def abstractify(x):
        if isinstance(x, jax.Array) and getattr(x, "committed", False):
            sharding = x.sharding
        else:
            # uncommitted templates restore to the default device; an
            # explicit sharding (instead of letting Orbax read the saved
            # one from file) keeps cross-backend restores working and
            # silences the unsafe-restore warning on the single-device path
            sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
        return jax.ShapeDtypeStruct(
            jnp.shape(x), jnp.asarray(x).dtype, sharding=sharding
        )

    abstract = jax.tree_util.tree_map(abstractify, template)
    if partial:
        ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
        # the template shardings must travel as explicit restore_args:
        # PyTreeRestore does not read ShapeDtypeStruct.sharding, and
        # without one a checkpoint saved on another backend (TPU run ->
        # CPU play tool) fails to map its recorded devices
        restore_args = ocp.checkpoint_utils.construct_restore_args(abstract)
        payload = ckptr.restore(
            path,
            args=ocp.args.PyTreeRestore(
                abstract, restore_args=restore_args, partial_restore=True
            ),
        )
    else:
        ckptr = ocp.StandardCheckpointer()
        payload = ckptr.restore(path, abstract)
    sidecar = None
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            sidecar = json.load(f)
    return payload, sidecar

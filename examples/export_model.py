#!/usr/bin/env python
"""Export a trained agent as a portable serving artifact (jax.export).

Production-deployment surface the reference lacks (its serving story is
the in-process inference thread, reference: src/async_mcts.rs:117-189):
the checkpoint's parameters are BAKED INTO a serialized StableHLO
function, so the artifact runs under any matching jax runtime with no
model code, no framework import, and no checkpoint plumbing:

    from jax import export
    agent = export.deserialize(open("agent.bin", "rb").read())
    logits, value = agent.call(features)            # kind=net
    action, counts = agent.call(*state_leaves)      # kind=policy

Two artifact kinds:

* ``--kind net``    — raw evaluator ``features[b, ...] -> (logits, value)``.
* ``--kind policy`` — the full agent: game-state arrays in (batched,
  canonical, tree-leaf order), greedy MCTS move + root visit counts out.
  The entire search (tree, descent, NN fused) is inside the artifact.

The batch dimension is exported symbolically — one artifact serves any
batch size. ``--check`` round-trips the artifact against the live
function before writing.

Usage:
  python examples/export_model.py --kind policy --sims 200 \
      --checkpoint-dir ckpt --model resnet --out agent.bin --check --cpu
"""

import argparse
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "examples")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--game", choices=("connect_four", "othello", "gomoku", "hex"),
        default="connect_four",
    )
    ap.add_argument("--kind", choices=("net", "policy"), default="policy")
    ap.add_argument("--sims", type=int, default=200)
    ap.add_argument("--max-depth", type=int, default=64)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--model", choices=("mlp", "resnet"), default="mlp")
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=5)
    ap.add_argument("--out", default="agent.bin")
    ap.add_argument("--check", action="store_true",
                    help="deserialize and compare vs the live fn before writing")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax import export

    from eval_checkpoints import load_side

    from alphazero_tpu.config import MCTSConfig
    from alphazero_tpu.games import ConnectFour, Gomoku, Hex, Othello
    from alphazero_tpu.mcts.search import make_search_fn

    game = {
        "connect_four": ConnectFour,
        "othello": Othello,
        "gomoku": Gomoku,
        "hex": Hex,
    }[args.game]()
    apply_fn, params, label = load_side(
        game, args.checkpoint_dir, args.model,
        args.hidden, args.channels, args.blocks,
    )

    b = export.symbolic_shape("b")[0]
    template = game.init()
    leaves, treedef = jax.tree_util.tree_flatten(template)

    if args.kind == "net":
        def fn(features):
            return apply_fn(params, features)  # params baked into the graph

        arg_specs = [
            jax.ShapeDtypeStruct((b,) + tuple(game.feature_shape), jnp.float32)
        ]
        sample_args = [
            np.stack([np.asarray(game.to_features(template))] * 2).astype(
                np.float32
            )
        ]
    else:
        cfg = MCTSConfig(
            num_sims=args.sims, max_depth=args.max_depth, dirichlet_alpha=None
        )
        search = make_search_fn(game, apply_fn, cfg)

        def fn(*state_leaves):
            state = jax.tree_util.tree_unflatten(treedef, list(state_leaves))
            tree = search(params, state)
            counts = tree.root_counts()
            return jnp.argmax(counts, axis=-1).astype(jnp.int32), counts

        arg_specs = [
            jax.ShapeDtypeStruct((b,) + tuple(x.shape), x.dtype)
            for x in leaves
        ]
        sample_args = [
            np.stack([np.asarray(x)] * 2) for x in leaves
        ]

    exp = export.export(jax.jit(fn))(*arg_specs)
    blob = exp.serialize()

    if args.check:
        live = jax.jit(fn)(*[jnp.asarray(a) for a in sample_args])
        roundtrip = export.deserialize(blob).call(*sample_args)
        for lv, rt in zip(
            jax.tree_util.tree_leaves(live), jax.tree_util.tree_leaves(roundtrip)
        ):
            np.testing.assert_allclose(
                np.asarray(lv), np.asarray(rt), rtol=1e-5, atol=1e-5
            )
        print("roundtrip check OK (batch=2)")

    with open(args.out, "wb") as f:
        f.write(blob)
    print(
        f"exported {args.kind} agent [{label}] for {game.name} "
        f"-> {args.out} ({len(blob)} bytes, symbolic batch, "
        f"platform {jax.default_backend()})"
    )


if __name__ == "__main__":
    main()

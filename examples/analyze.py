#!/usr/bin/env python
"""Analyze a position with any search engine — the framework's analysis
CLI (no reference analogue; the reference's closest surface is the
commented-out stdin player, examples/connect_four.rs:45-51).

Give a game, an optional move sequence from the initial position, and an
engine; prints the board, the raw net evaluation, and a per-action table
of prior / visits / Q — plus the improved policy when the engine is
gumbel. Works with a trained checkpoint or the pure-MCTS uniform prior.

Usage:
  python examples/analyze.py --game connect_four --moves "3 3 4" --sims 400
  python examples/analyze.py --game othello --engine tt --sims 800 --cpu
  python examples/analyze.py --game gomoku --engine gumbel \
      --checkpoint-dir .runs/gomoku --model resnet
"""

import argparse
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "examples")


from boardio import render


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--game", choices=("connect_four", "othello", "gomoku", "hex"),
        default="connect_four",
    )
    ap.add_argument(
        "--moves", default="",
        help="space-separated action indices applied from the initial "
        "position (connect_four: column; othello/gomoku: r*W+c)",
    )
    ap.add_argument("--engine", choices=("xla", "tt", "gumbel"), default="xla")
    ap.add_argument("--sims", type=int, default=400)
    ap.add_argument("--max-depth", type=int, default=64)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--model", choices=("mlp", "resnet"), default="mlp")
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from eval_checkpoints import load_side

    from alphazero_tpu.config import MCTSConfig
    from alphazero_tpu.games import ConnectFour, Gomoku, Hex, Othello
    from alphazero_tpu.mcts.gumbel import make_gumbel_search_fn
    from alphazero_tpu.mcts.search import make_search_fn
    from alphazero_tpu.mcts.tt import make_tt_search_fn
    from alphazero_tpu.ops import masked_policy

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

    # walk the move sequence on canonical states (player-to-move = +1)
    state = game.init()
    ply = 0
    for tok in args.moves.split():
        a = int(tok)
        valid = np.asarray(game.valid_moves(state))
        if not (0 <= a < game.num_actions and valid[a]):
            raise SystemExit(f"illegal move {a} at ply {ply}")
        done, _ = game.terminal(state)
        if bool(done):
            raise SystemExit(f"position already terminal at ply {ply}")
        state = game.step(state, jnp.int32(a))
        ply += 1

    side = "X" if ply % 2 == 0 else "O"
    print(f"{game.name} after [{args.moves.strip() or 'start'}], {side} to move")
    if ply % 2 == 0:
        display = np.asarray(state.board)
    else:
        # undo one canonical flip so X is always the first mover; hex's
        # canonical form also transposes (games/hex.py)
        display = -np.asarray(state.board)
        if args.game == "hex":
            display = display.T
    print(render(display, flip_rows=args.game == "connect_four"))

    done, value = game.terminal(state)
    if bool(done):
        v = float(value)
        print(f"\nterminal position: value {v:+.1f} (side to move)")
        return

    # raw net read at the root
    valid = np.asarray(game.valid_moves(state))
    if getattr(apply_fn, "needs_features", True):
        feats = game.to_features(state)[None]
    else:
        feats = jnp.zeros((1, 1), jnp.float32)
    logits, v_raw = apply_fn(params, feats)
    net_pi = np.asarray(masked_policy(logits, jnp.asarray(valid)[None]))[0]
    print(f"\nnet [{label}]: value {float(v_raw[0]):+.3f} (side to move)")

    cfg = MCTSConfig(
        num_sims=args.sims,
        max_depth=args.max_depth,
        transposition=args.engine == "tt",
        gumbel=args.engine == "gumbel",
        dirichlet_alpha=None,
    )
    root = jax.tree_util.tree_map(lambda x: x[None], state)
    improved = None
    if args.engine == "xla":
        tree = jax.jit(make_search_fn(game, apply_fn, cfg))(params, root)
        counts = np.asarray(tree.root_counts())[0]
        q = np.asarray(tree.root_q())[0]
    elif args.engine == "tt":
        tree = jax.jit(make_tt_search_fn(game, apply_fn, cfg))(params, root)
        counts = np.asarray(tree.root_counts())[0]
        # child W is stored from the parent-to-move (= root) perspective
        code = np.asarray(tree.pstats[0, 1, :, 0])
        idx = np.where(code < -1.5, -2.0 - code, code).astype(np.int32)
        n = np.asarray(tree.nstats[0, 0])
        w = np.asarray(tree.nstats[0, 1])
        idx = np.clip(idx, 0, n.shape[0] - 1)
        q = np.where(counts > 0, w[idx] / np.maximum(n[idx], 1.0), 0.0)
        print(f"transposition links made: {int(tree.dedup[0])}")
    else:
        res = jax.jit(
            make_gumbel_search_fn(game, apply_fn, cfg),
            static_argnames=("num_sims",),
        )(params, root)
        counts = np.asarray(res.tree.root_counts())[0]
        q = np.asarray(res.tree.root_q())[0]
        improved = np.asarray(res.improved_pi)[0]
        print(f"gumbel recommendation (eval mode): {int(res.action[0])}")

    total = max(counts.sum(), 1.0)
    hdr = f"{'a':>4} {'prior':>7} {'N':>7} {'N%':>6} {'Q':>7}"
    if improved is not None:
        hdr += f" {'pi_imp':>7}"
    print("\n" + hdr)
    order = np.argsort(-counts, kind="stable")
    for a in order:
        if not valid[a]:
            continue
        row = (
            f"{a:>4} {net_pi[a]:>7.3f} {int(counts[a]):>7} "
            f"{100.0 * counts[a] / total:>5.1f}% {q[a]:>+7.3f}"
        )
        if improved is not None:
            row += f" {improved[a]:>7.3f}"
        print(row)
    best = int(order[0])
    print(f"\nsearch best move: {best} (N={int(counts[best])}, Q={q[best]:+.3f})")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Play Othello 8x8 against the framework — human vs MCTS(+net).

The second-game sibling of examples/play_connect_four.py (the reference's
stdin player, examples/connect_four.rs:45-51). Loads a coach checkpoint
if given, else plays with the pure-MCTS uniform prior.

Usage:
  python examples/play_othello.py [--sims 200] [--checkpoint-dir DIR]
  python examples/play_othello.py --cpu               # force CPU backend
"""

import argparse
import sys

sys.path.insert(0, ".")


from boardio import render


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sims", type=int, default=200)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument(
        "--model",
        choices=["mlp", "resnet"],
        default="mlp",
        help="architecture the checkpoint was trained with "
        "(mlp preset = mlp, full preset = resnet)",
    )
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--human-first", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from eval_checkpoints import load_side

    from alphazero_tpu.config import MCTSConfig
    from alphazero_tpu.games import Othello
    from alphazero_tpu.games.othello import PASS
    from alphazero_tpu.mcts import make_search_fn

    game = Othello()
    apply_fn, params, label = load_side(
        game, args.checkpoint_dir, args.model, args.hidden, 64, 5,
        allow_missing=True,
    )
    print(f"model: {label}")

    search = jax.jit(
        make_search_fn(game, apply_fn, MCTSConfig(num_sims=args.sims, max_depth=96))
    )

    state = game.init()
    human_to_move = args.human_first
    print("you are X; enter moves as `row col` (or `pass`)\n")
    while True:
        display = state.board if human_to_move else -state.board
        done, value = game.terminal(state)
        if bool(done):
            print(render(display))
            v = float(value)
            diff = int(np.sum(np.asarray(display)))
            if v == 0.0:
                print("draw!")
            elif (v < 0) == human_to_move:
                print(f"engine wins by {abs(diff)} discs!")
            else:
                print(f"you win by {abs(diff)} discs!")
            return
        print(render(display))
        valid = np.asarray(game.valid_moves(state))
        if human_to_move:
            while True:
                try:
                    raw = input("your move (row col / pass): ").strip().lower()
                except EOFError:
                    print("\nbye")
                    return
                if raw in ("pass", "p"):
                    a = PASS
                else:
                    try:
                        r, c = map(int, raw.split())
                        a = r * 8 + c
                    except ValueError:
                        print("enter `row col` (0-7) or `pass`")
                        continue
                if 0 <= a <= PASS and valid[a]:
                    break
                print("illegal move")
        else:
            batched = jax.tree_util.tree_map(lambda x: x[None], state)
            tree = search(params, batched)
            counts = np.asarray(tree.root_counts())[0]
            a = int(np.argmax(counts))
            q = float(np.asarray(tree.root_q())[0, a])
            mv = "pass" if a == PASS else f"{a // 8} {a % 8}"
            print(f"engine plays {mv} (visits {int(counts[a])}, Q={q:+.2f})")
        import jax.numpy as jnp

        state = game.step(state, jnp.int32(a))
        human_to_move = not human_to_move


if __name__ == "__main__":
    main()

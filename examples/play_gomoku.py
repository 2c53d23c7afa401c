#!/usr/bin/env python
"""Play Gomoku 9x9 (five in a row) against the framework — human vs
MCTS(+net). Third-game sibling of examples/play_connect_four.py (the
reference's stdin player, examples/connect_four.rs:45-51). Loads a coach
checkpoint if given, else plays with the pure-MCTS uniform prior.

Usage:
  python examples/play_gomoku.py [--sims 400] [--checkpoint-dir DIR]
  python examples/play_gomoku.py --cpu               # force CPU backend
"""

import argparse
import sys

sys.path.insert(0, ".")


from boardio import render


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sims", type=int, default=400)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument(
        "--model",
        choices=["mlp", "resnet"],
        default="mlp",
        help="architecture the checkpoint was trained with",
    )
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--human-first", action="store_true")
    ap.add_argument(
        "--size", type=int, default=9, help="board edge (9 default, 15 standard)"
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from eval_checkpoints import load_side

    from alphazero_tpu.config import MCTSConfig
    from alphazero_tpu.games import Gomoku
    from alphazero_tpu.mcts import make_search_fn

    game = Gomoku(args.size)
    apply_fn, params, label = load_side(
        game, args.checkpoint_dir, args.model, args.hidden, 64, 5,
        allow_missing=True,
    )
    print(f"model: {label}")

    search = jax.jit(
        make_search_fn(game, apply_fn, MCTSConfig(num_sims=args.sims, max_depth=48))
    )

    state = game.init()
    human_to_move = args.human_first
    print("you are X; five in a row wins; enter moves as `row col`\n")
    while True:
        display = state.board if human_to_move else -state.board
        done, value = game.terminal(state)
        if bool(done):
            print(render(display))
            v = float(value)
            if v == 0.0:
                print("draw!")
            elif (v < 0) == human_to_move:
                print("engine wins!")
            else:
                print("you win!")
            return
        print(render(display))
        valid = np.asarray(game.valid_moves(state))
        if human_to_move:
            while True:
                try:
                    raw = input("your move (row col): ").strip()
                    r, c = map(int, raw.split())
                    a = r * game.size + c
                except EOFError:
                    print("\nbye")
                    return
                except ValueError:
                    print(f"enter `row col` (0-{game.size - 1})")
                    continue
                if 0 <= a < game.num_actions and valid[a]:
                    break
                print("illegal move")
        else:
            batched = jax.tree_util.tree_map(lambda x: x[None], state)
            tree = search(params, batched)
            counts = np.asarray(tree.root_counts())[0]
            a = int(np.argmax(counts))
            q = float(np.asarray(tree.root_q())[0, a])
            print(
                f"engine plays {a // game.size} {a % game.size} "
                f"(visits {int(counts[a])}, Q={q:+.2f})"
            )
        import jax.numpy as jnp

        state = game.step(state, jnp.int32(a))
        human_to_move = not human_to_move


if __name__ == "__main__":
    main()

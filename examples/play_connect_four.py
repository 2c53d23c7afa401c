#!/usr/bin/env python
"""Play Connect-Four against the framework — human vs MCTS(+net).

The analogue of the reference's stdin player and (commented-out)
human-vs-human loop (reference: examples/connect_four.rs:45-51, 79
``ask_for_action``). Loads a coach checkpoint if given, else plays with
the pure-MCTS uniform prior.

Usage:
  python examples/play_connect_four.py [--sims 200] [--checkpoint-dir DIR]
  python examples/play_connect_four.py --cpu          # force CPU backend
"""

import argparse
import sys

sys.path.insert(0, ".")


from boardio import render as _render


def render(board):
    return _render(board, flip_rows=True)


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
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--human-first", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from eval_checkpoints import load_side

    from alphazero_tpu.config import MCTSConfig
    from alphazero_tpu.games import ConnectFour
    from alphazero_tpu.mcts import make_search_fn

    game = ConnectFour()
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
    print("you are X; columns 0-6\n")
    while True:
        # canonical board: +1 = player to move. Render with X = human.
        display = state.board if human_to_move else -state.board
        done, value = game.terminal(state)
        if bool(done):
            print(render(display))
            v = float(value)
            if v == 0.0:
                print("draw!")
            elif (v < 0) == human_to_move:
                print("engine wins!")  # the player to move (human) lost
            else:
                print("you win!")
            return
        print(render(display))
        valid = np.asarray(game.valid_moves(state))
        if human_to_move:
            while True:
                try:
                    a = int(input("your column: "))
                except EOFError:
                    print("\nbye")
                    return
                except ValueError:
                    print("enter a column 0-6")
                    continue
                if 0 <= a < 7 and valid[a]:
                    break
                print("illegal move")
        else:
            root = jax.tree_util.tree_map(lambda x: x[None], state)
            tree = search(params, root)
            counts = np.asarray(tree.root_counts())[0]
            a = int(counts.argmax())
            q = np.asarray(tree.root_q())[0][a]
            print(f"engine plays {a} (visits {counts.astype(int).tolist()}, Q={q:+.2f})")
        state = game.step(state, jnp.int32(a))
        human_to_move = not human_to_move


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Play Hex 7x7 against the framework — human vs MCTS(+net).

Fourth-game sibling of examples/play_connect_four.py (the reference's
stdin player, examples/connect_four.rs:45-51). You are X and connect TOP
to BOTTOM; the engine (O) connects LEFT to RIGHT. Loads a coach
checkpoint if given, else plays with the pure-MCTS uniform prior.

Hex's canonical form negates AND TRANSPOSES each move (games/hex.py), so
this CLI maps the engine's frame back to your fixed view: at the
engine's turn the physical board is ``-board.T`` and its move (r, c) is
your (c, r).

Usage:
  python examples/play_hex.py [--sims 400] [--checkpoint-dir DIR]
  python examples/play_hex.py --cpu                # force CPU backend
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
    from alphazero_tpu.games import Hex
    from alphazero_tpu.games.hex import SIZE
    from alphazero_tpu.mcts import make_search_fn

    game = Hex()
    apply_fn, params, label = load_side(
        game, args.checkpoint_dir, args.model, args.hidden, 64, 5,
        allow_missing=True,
    )
    print(f"model: {label}")

    search = jax.jit(
        make_search_fn(game, apply_fn, MCTSConfig(num_sims=args.sims, max_depth=56))
    )

    state = game.init()
    human_to_move = args.human_first
    print(
        "you are X and connect TOP row to BOTTOM row; the engine (O)\n"
        "connects LEFT to RIGHT; enter moves as `row col`\n"
    )
    while True:
        # your fixed view: at your turn the canonical board IS the
        # physical board; at the engine's turn undo one negate+transpose
        board = np.asarray(state.board)
        display = board if human_to_move else -board.T
        done, value = game.terminal(state)
        if bool(done):
            print(render(display))
            v = float(value)
            if (v < 0) == human_to_move:
                print("engine wins!")  # the player to move lost
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
                    a = r * SIZE + c
                except EOFError:
                    print("\nbye")
                    return
                except ValueError:
                    print(f"enter `row col` (0-{SIZE - 1})")
                    continue
                if 0 <= r < SIZE and 0 <= c < SIZE and valid[a]:
                    break
                print("illegal move")
        else:
            batched = jax.tree_util.tree_map(lambda x: x[None], state)
            tree = search(params, batched)
            counts = np.asarray(tree.root_counts())[0]
            a = int(np.argmax(counts))
            q = float(np.asarray(tree.root_q())[0, a])
            # engine's canonical (r, c) is (c, r) in your view
            print(
                f"engine plays {a % SIZE} {a // SIZE} "
                f"(visits {int(counts[a])}, Q={q:+.2f})"
            )
        state = game.step(state, jnp.int32(a))
        human_to_move = not human_to_move


if __name__ == "__main__":
    main()

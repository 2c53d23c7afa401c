from alphazero_tpu.mcts.tree import Tree
from alphazero_tpu.mcts.search import make_search_fn

__all__ = ["Tree", "make_search_fn"]

from alphazero_tpu.mcts.tree import Tree
from alphazero_tpu.mcts.search import make_search_fn
from alphazero_tpu.mcts.gumbel import make_gumbel_search_fn

__all__ = ["Tree", "make_search_fn", "make_gumbel_search_fn"]

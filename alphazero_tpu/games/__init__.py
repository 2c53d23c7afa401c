from alphazero_tpu.games.base import Game
from alphazero_tpu.games.connect_four import ConnectFour

__all__ = ["Game", "ConnectFour"]

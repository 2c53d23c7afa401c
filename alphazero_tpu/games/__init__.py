from alphazero_tpu.games.base import Game
from alphazero_tpu.games.connect_four import ConnectFour
from alphazero_tpu.games.gomoku import Gomoku
from alphazero_tpu.games.hex import Hex
from alphazero_tpu.games.othello import Othello

__all__ = ["Game", "ConnectFour", "Gomoku", "Hex", "Othello"]

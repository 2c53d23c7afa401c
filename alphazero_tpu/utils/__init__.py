from alphazero_tpu.utils.elo import elo_from_match, EloTracker
from alphazero_tpu.utils.logging import MetricsLogger
from alphazero_tpu.utils.timing import PhaseTimer

__all__ = ["elo_from_match", "EloTracker", "MetricsLogger", "PhaseTimer"]

"""Elo rating curve over gated model generations.

The reference reports only raw arena win counts (reference:
src/coach.rs:376-381 info! of the Counter). BASELINE config 5 asks for a
full Elo curve, so gating results feed an incremental rating tracker here.
"""

from __future__ import annotations

import math
from typing import Dict, List


def elo_from_match(
    rating_inc: float, wins: int, losses: int, draws: int, clamp: float = 600.0
) -> float:
    """Estimate the candidate's rating from one head-to-head match against
    an incumbent of known rating, via the log-odds of the match score."""
    games = wins + losses + draws
    if games == 0:
        return rating_inc
    score = (wins + 0.5 * draws) / games
    eps = 1.0 / (2.0 * games)  # regularize 0%/100% sweeps
    score = min(max(score, eps), 1.0 - eps)
    diff = 400.0 * math.log10(score / (1.0 - score))
    return rating_inc + min(max(diff, -clamp), clamp)


class EloTracker:
    """Ratings per accepted model generation (model_id -> Elo)."""

    def __init__(self, base_rating: float = 0.0):
        self.ratings: Dict[int, float] = {0: base_rating}
        self.history: List[dict] = []

    def record_match(
        self, cand_id: int, inc_id: int, wins: int, losses: int, draws: int,
        accepted: bool,
    ) -> float:
        r_inc = self.ratings[inc_id]
        r_cand = elo_from_match(r_inc, wins, losses, draws)
        self.history.append(
            {
                "candidate": cand_id,
                "incumbent": inc_id,
                "wins": wins,
                "losses": losses,
                "draws": draws,
                "rating": r_cand,
                "accepted": accepted,
            }
        )
        if accepted:
            self.ratings[cand_id] = r_cand
        return r_cand

    def curve(self) -> List[tuple]:
        return sorted(self.ratings.items())

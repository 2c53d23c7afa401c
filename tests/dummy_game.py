"""CountingGame — trivial Game fixture (the analogue of the reference's
DummyGame test fixture, src/node/tests/dummy_game.rs: a one-counter state
whose step increments it), used to exercise the generic protocol without
real game logic."""

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class CountingState(NamedTuple):
    counter: jax.Array  # i32[]


class ToggleState(NamedTuple):
    parity: jax.Array  # i32[]


class ToggleGame:
    """Pathological CYCLIC fixture: two canonical states that toggle on
    every move (both actions), never terminating. Exercises the
    transposition engine's cycle handling — a descent revisits the same
    unexpanded edge until the depth cut, so link writes must be
    idempotent. No analogue in the reference (its games are acyclic)."""

    name = "toggle"
    num_actions = 2
    feature_shape = (2,)
    max_moves = 8
    num_symmetries = 1
    heuristic_is_zero = True

    def init(self) -> ToggleState:
        return ToggleState(parity=jnp.zeros((), jnp.int32))

    def step(self, state, action):
        del action
        return ToggleState(parity=1 - state.parity)

    def valid_moves(self, state):
        return jnp.ones((2,), bool)

    def terminal(self, state) -> Tuple[jax.Array, jax.Array]:
        return jnp.zeros((), bool), jnp.float32(0.0)

    def to_features(self, state):
        p = state.parity.astype(jnp.float32)
        return jnp.stack([p, 1.0 - p])

    def symmetries(self, features, pi):
        return features[None], pi[None]

    def eval_heuristic(self, state):
        return jnp.float32(0.0)


class CountingGame:
    """Two actions; action 0 increments, action 1 adds two; the game ends
    at counter >= horizon with value +1 iff the counter is even."""

    name = "counting"
    num_actions = 2
    feature_shape = (4,)
    max_moves = 16
    num_symmetries = 1
    heuristic_is_zero = True

    def __init__(self, horizon: int = 8):
        self.horizon = horizon

    def init(self) -> CountingState:
        return CountingState(counter=jnp.zeros((), jnp.int32))

    def step(self, state, action):
        return CountingState(counter=state.counter + 1 + action.astype(jnp.int32))

    def valid_moves(self, state):
        return jnp.ones((2,), bool)

    def terminal(self, state) -> Tuple[jax.Array, jax.Array]:
        done = state.counter >= self.horizon
        value = jnp.where(state.counter % 2 == 0, 1.0, -1.0) * done
        return done, value

    def to_features(self, state):
        c = state.counter.astype(jnp.float32)
        return jnp.stack([c, c / self.horizon, c % 2, jnp.float32(1.0)])

    def symmetries(self, features, pi):
        return features[None], pi[None]

    def eval_heuristic(self, state):
        return jnp.float32(0.0)

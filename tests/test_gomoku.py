"""Gomoku 9x9 (third game) — rules goldens, flat-ops equivalence, engine
parity. Exercises the protocol corner no other game covers: large action
space (81) + free placement + zero cutoff heuristic (the config that
must route to the hybrid engine, never the fused kernel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.config import MCTSConfig, SelfPlayConfig
from alphazero_tpu.games import Gomoku
from alphazero_tpu.games.gomoku import SIZE
from alphazero_tpu.mcts.hybrid import make_hybrid_root_fn
from alphazero_tpu.mcts.search import make_search_fn
from alphazero_tpu.models import (
    MLPNet,
    init_flax_model,
    make_flax_apply_fn,
    make_uniform_model,
)

G = Gomoku()


def play(moves):
    state = G.init()
    for m in moves:
        state = G.step(state, jnp.asarray(m))
    return state


def rc(r, c):
    return r * SIZE + c


class TestRules:
    def test_init_and_valid(self):
        s = G.init()
        assert np.asarray(s.board).sum() == 0
        assert np.asarray(G.valid_moves(s)).all()

    @pytest.mark.parametrize(
        "line",
        [
            [rc(4, c) for c in range(5)],              # horizontal
            [rc(r, 7) for r in range(3, 8)],            # vertical
            [rc(i, i) for i in range(2, 7)],            # diagonal
            [rc(8 - i, i) for i in range(5)],           # anti-diagonal
            [rc(0, c) for c in range(4, 9)],            # edge window (incl.)
            [rc(8, c) for c in range(5)],               # last-row window
        ],
    )
    def test_five_in_a_row_wins(self, line):
        # interleave loser moves far away so the winner places line[-1] last
        fillers = [rc(r, c) for r in range(SIZE) for c in range(SIZE)
                   if rc(r, c) not in line][: len(line) - 1]
        moves = []
        for w, f in zip(line[:-1], fillers):
            moves += [w, f]
        moves.append(line[-1])
        s = play(moves)
        done, v = G.terminal(s)
        assert bool(done) and float(v) == -1.0  # previous mover won

    def test_occupied_cells_invalid(self):
        s = play([rc(4, 4)])
        vm = np.asarray(G.valid_moves(s))
        assert not vm[rc(4, 4)]
        assert vm.sum() == SIZE * SIZE - 1

    def test_no_win_not_done(self):
        s = play([rc(0, 0), rc(1, 1), rc(0, 1), rc(2, 2)])
        done, v = G.terminal(s)
        assert not bool(done) and float(v) == 0.0

    def test_four_is_not_enough(self):
        line = [rc(4, c) for c in range(4)]
        fillers = [rc(0, c) for c in range(3)]
        moves = []
        for w, f in zip(line[:-1], fillers):
            moves += [w, f]
        moves.append(line[-1])
        done, _ = G.terminal(play(moves))
        assert not bool(done)

    def test_symmetries_consistent(self):
        key = jax.random.key(0)
        feats = jax.random.uniform(key, G.feature_shape)
        pi = jax.nn.softmax(jax.random.normal(jax.random.key(1), (G.num_actions,)))
        fs, ps = G.symmetries(feats, pi)
        assert fs.shape == (8,) + G.feature_shape
        assert ps.shape == (8, G.num_actions)
        # every symmetry preserves the probability mass and the multiset
        np.testing.assert_allclose(np.asarray(ps).sum(-1), 1.0, rtol=1e-5)
        for k in range(8):
            np.testing.assert_allclose(
                np.sort(np.asarray(ps[k])), np.sort(np.asarray(pi)), rtol=1e-6
            )
        # identity is symmetry 0
        np.testing.assert_array_equal(np.asarray(fs[0]), np.asarray(feats))


def _random_positions(B, moves, seed):
    rng = np.random.default_rng(seed)
    state = jax.vmap(lambda _: G.init())(jnp.arange(B))
    step_v = jax.jit(jax.vmap(G.step))
    for _ in range(moves):
        vm = np.array(jax.vmap(G.valid_moves)(state))
        acts = np.array([rng.choice(np.nonzero(v)[0]) for v in vm])
        nxt = step_v(state, jnp.asarray(acts))
        done, _ = jax.vmap(G.terminal)(nxt)
        keep = np.array(done)[:, None, None]
        state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(keep, o, n), nxt, state
        )
    return state


class TestFlatOps:
    def test_flat_step_matches_game_step(self):
        ops = G.flat_ops()
        state = _random_positions(8, 11, seed=3)
        boards = ops.from_state(state)
        for a in range(0, G.num_actions, 7):  # sampled actions incl. corners
            acts = jnp.full((8,), a, jnp.int32)
            ref = jax.vmap(G.step)(state, acts).board
            flat = ops.step(boards, jnp.full((8, 1), float(a)))
            np.testing.assert_array_equal(
                np.asarray(ref).reshape(8, -1), np.asarray(flat).astype(np.int8)
            )

    def test_flat_terminal_matches_game_terminal(self):
        ops = G.flat_ops()
        aux = ops.aux()
        # random NON-terminal positions + explicit won boards (the random
        # generator keeps the pre-terminal state by construction)
        state = _random_positions(32, 30, seed=5)
        win_seq = [rc(4, 2), rc(0, 0), rc(4, 3), rc(0, 1), rc(4, 4),
                   rc(0, 2), rc(4, 5), rc(0, 3), rc(4, 6)]
        won = play(win_seq)
        state = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a, b[None]]), state, won
        )
        done_ref, val_ref = jax.vmap(G.terminal)(state)
        boards = ops.from_state(state)
        done_f, val_f = ops.terminal(boards, aux)
        np.testing.assert_array_equal(
            np.asarray(done_ref), np.asarray(done_f)[:, 0]
        )
        np.testing.assert_array_equal(
            np.asarray(val_ref), np.asarray(val_f)[:, 0]
        )
        assert bool(np.asarray(done_ref)[-1]) and np.asarray(val_ref)[-1] == -1.0

    def test_flat_valid_and_features_match(self):
        ops = G.flat_ops()
        state = _random_positions(8, 9, seed=7)
        boards = ops.from_state(state)
        np.testing.assert_array_equal(
            np.asarray(jax.vmap(G.valid_moves)(state)),
            np.asarray(ops.valid(boards)),
        )
        np.testing.assert_array_equal(
            np.asarray(jax.vmap(G.to_features)(state)),
            np.asarray(ops.to_features(boards)),
        )


class TestEngines:
    def test_fused_declines_large_action_space(self):
        from alphazero_tpu.mcts.fused import make_fused_root_fn

        net = make_uniform_model(G)
        cfg = MCTSConfig(num_sims=8, max_depth=16)
        assert make_fused_root_fn(G, net.apply_fn, cfg, block_size=4) is None

    @pytest.mark.parametrize("moves", [0, 10])
    def test_hybrid_uniform_matches_xla_engine(self, moves):
        net = make_uniform_model(G)
        cfg = MCTSConfig(num_sims=12, max_depth=32)
        search = make_search_fn(G, net.apply_fn, cfg)
        hybrid = make_hybrid_root_fn(G, net.apply_fn, cfg, block_size=4)
        assert hybrid is not None
        state = _random_positions(4, moves, seed=moves)
        np.testing.assert_array_equal(
            np.asarray(search({}, state).root_counts()),
            np.asarray(hybrid({}, state)),
        )

    def test_hybrid_mlp_matches_xla_engine(self):
        model = MLPNet(num_actions=G.num_actions, hidden=(32,))
        apply_fn = make_flax_apply_fn(model)
        params = init_flax_model(model, jax.random.key(1), G.feature_shape)
        cfg = MCTSConfig(num_sims=10, max_depth=32)
        search = make_search_fn(G, apply_fn, cfg)
        hybrid = make_hybrid_root_fn(G, apply_fn, cfg, block_size=4)
        assert hybrid is not None
        state = _random_positions(4, 6, seed=9)
        np.testing.assert_array_equal(
            np.asarray(search(params, state).root_counts()),
            np.asarray(hybrid(params, state)),
        )

    def test_search_finds_open_four_completion(self):
        """Player to move has an open four: the search must complete it."""
        moves = []
        for i in range(4):
            moves += [rc(4, 2 + i), rc(0, i)]
        state = play(moves[:-1])  # drop the last filler: +1 to move with 4
        # re-play properly: winner placed 3, loser 3, winner to move with
        # stones at (4,2..4) needing (4,5) or (4,1)... build explicitly:
        s = G.init()
        seq = [rc(4, 2), rc(0, 0), rc(4, 3), rc(0, 1), rc(4, 4), rc(0, 2),
               rc(4, 5), rc(0, 3)]
        for m in seq:
            s = G.step(s, jnp.asarray(m))
        # player to move owns (4,2..5): wins at (4,1) or (4,6)
        net = make_uniform_model(G)
        search = make_search_fn(G, net.apply_fn, MCTSConfig(num_sims=200, max_depth=16))
        root = jax.tree_util.tree_map(lambda x: x[None], s)
        counts = np.asarray(jax.jit(search)({}, root).root_counts())[0]
        assert counts.argmax() in (rc(4, 1), rc(4, 6)), counts.argmax()


def test_selfplay_smoke():
    from alphazero_tpu.selfplay import make_selfplay_fn

    net = make_uniform_model(G)
    sp = jax.jit(
        make_selfplay_fn(
            G,
            net.apply_fn,
            MCTSConfig(num_sims=8, max_depth=16),
            SelfPlayConfig(batch_size=4, temp_threshold=6, max_moves=40),
        )
    )
    traj, stats = sp({}, jax.random.key(0))
    assert np.asarray(stats.num_moves).min() >= 9  # a win needs >= 9 plies
    v = np.asarray(traj.value)
    assert np.all(np.abs(v) <= 1.0)


class TestProductionSize15:
    """Gomoku(15): the production-board edition (A=225) — the scale test
    for the dense-plane engine bet (round-4 VERDICT item 1). Dynamics
    code is shared with the 9x9 edition; these tests pin the shapes and
    the flat-ops/engine parity at the larger action space."""

    G15 = Gomoku(15)

    def _positions15(self, B, moves, seed):
        G15 = self.G15
        rng = np.random.default_rng(seed)
        state = jax.vmap(lambda _: G15.init())(jnp.arange(B))
        step_v = jax.jit(jax.vmap(G15.step))
        for _ in range(moves):
            vm = np.array(jax.vmap(G15.valid_moves)(state))
            acts = np.array([rng.choice(np.nonzero(v)[0]) for v in vm])
            nxt = step_v(state, jnp.asarray(acts))
            done, _ = jax.vmap(G15.terminal)(nxt)
            keep = np.array(done)[:, None, None]
            state = jax.tree_util.tree_map(
                lambda n, o: jnp.where(keep, o, n), nxt, state
            )
        return state

    def test_shapes_and_aux(self):
        G15 = self.G15
        assert G15.num_actions == 225
        assert G15.feature_shape == (15, 15, 2)
        assert G15.name == "gomoku15"
        ops = G15.flat_ops()
        assert ops.size == 225
        # 2*15*11 + 2*11^2 = 572 win lines, padded to the lane multiple
        assert ops.aux_lanes == 640
        m = np.asarray(ops.aux())
        assert m.shape == (225, 640)
        assert m.sum() == 572 * 5  # every line covers win=5 cells

    def test_win_requires_five_at_15(self):
        G15 = self.G15
        s = G15.init()
        # winner fills (7, 3..7), loser (0, 0..3) interleaved
        seq = []
        for i in range(4):
            seq += [7 * 15 + 3 + i, i]
        s2 = s
        for m in seq:
            s2 = G15.step(s2, jnp.asarray(m))
        done, _ = G15.terminal(s2)
        assert not bool(done)  # four is not enough
        s3 = G15.step(s2, jnp.asarray(7 * 15 + 7))
        done, v = G15.terminal(s3)
        assert bool(done) and float(v) == -1.0

    def test_flat_ops_match_dense_at_15(self):
        G15 = self.G15
        ops = G15.flat_ops()
        aux = ops.aux()
        state = self._positions15(16, 40, seed=15)
        boards = ops.from_state(state)
        done_ref, val_ref = jax.vmap(G15.terminal)(state)
        done_f, val_f = ops.terminal(boards, aux)
        np.testing.assert_array_equal(
            np.asarray(done_ref), np.asarray(done_f)[:, 0]
        )
        np.testing.assert_array_equal(
            np.asarray(val_ref), np.asarray(val_f)[:, 0]
        )
        np.testing.assert_array_equal(
            np.asarray(jax.vmap(G15.valid_moves)(state)),
            np.asarray(ops.valid(boards)),
        )
        for a in (0, 112, 224):
            acts = jnp.full((16,), a, jnp.int32)
            ref = jax.vmap(G15.step)(state, acts).board
            flat = ops.step(boards, jnp.full((16, 1), float(a)))
            np.testing.assert_array_equal(
                np.asarray(ref).reshape(16, -1),
                np.asarray(flat).astype(np.int8),
            )

    def test_hybrid_matches_xla_engine_at_15(self):
        G15 = self.G15
        net = make_uniform_model(G15)
        cfg = MCTSConfig(num_sims=10, max_depth=32)
        search = make_search_fn(G15, net.apply_fn, cfg)
        hybrid = make_hybrid_root_fn(G15, net.apply_fn, cfg, block_size=4)
        assert hybrid is not None
        state = self._positions15(4, 8, seed=21)
        np.testing.assert_array_equal(
            np.asarray(search({}, state).root_counts()),
            np.asarray(hybrid({}, state)),
        )

    def test_editions_are_independent(self):
        """A 9x9 and a 15x15 instance coexist (no shared module state)."""
        g9, g15 = Gomoku(), self.G15
        assert g9.num_actions == 81 and g15.num_actions == 225
        done9, _ = g9.terminal(g9.init())
        done15, _ = g15.terminal(g15.init())
        assert not bool(done9) and not bool(done15)

"""Native component tests: the C++ example store and — the strong one —
bit-exact cross-validation of the vectorized JAX search against the
sequential C++ MCTS oracle (independent implementations of the same
intended semantics, SURVEY.md §8)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu import native
from alphazero_tpu.config import MCTSConfig
from alphazero_tpu.games import ConnectFour
from alphazero_tpu.games.connect_four import heights
from alphazero_tpu.mcts import make_search_fn
from alphazero_tpu.models import make_uniform_model

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no native toolchain"
)

G = ConnectFour()


def play(moves):
    s = G.init()
    for m in moves:
        s = G.step(s, jnp.int32(m))
    return s


class TestExampleStore:
    def make(self, cap=64):
        return native.ExampleStore(cap, feat_size=84, num_actions=7)

    def sample_batch(self, n, seed=0):
        rng = np.random.RandomState(seed)
        return (
            rng.rand(n, 84).astype(np.float32),
            rng.dirichlet(np.ones(7), n).astype(np.float32),
            rng.choice([-1.0, 1.0], n).astype(np.float32),
        )

    def test_append_read_roundtrip(self):
        store = self.make()
        f, p, v = self.sample_batch(10)
        store.append(f, p, v)
        assert len(store) == 10 and store.total == 10
        f2, p2, v2 = store.read(0, 10)
        np.testing.assert_array_equal(f, f2)
        np.testing.assert_array_equal(p, p2)
        np.testing.assert_array_equal(v, v2)

    def test_ring_eviction(self):
        store = self.make(cap=16)
        f, p, v = self.sample_batch(24, seed=1)
        store.append(f, p, v)
        assert len(store) == 16 and store.total == 24
        f2, _, v2 = store.read(0, 16)
        # oldest live sample is input row 8 (first 8 evicted FIFO)
        np.testing.assert_array_equal(f2[0], f[8])
        np.testing.assert_array_equal(v2[-1], v[-1])

    def test_save_load_checksummed(self, tmp_path):
        store = self.make()
        f, p, v = self.sample_batch(12, seed=2)
        store.append(f, p, v)
        path = str(tmp_path / "it3.examples")
        store.save(path)

        fresh = self.make()
        fresh.load(path)
        assert len(fresh) == 12
        f2, p2, v2 = fresh.read(0, 12)
        np.testing.assert_array_equal(f, f2)
        np.testing.assert_array_equal(v, v2)

        # corrupting the payload must fail the checksum
        blob = bytearray(open(path, "rb").read())
        blob[-2] ^= 0xFF
        bad = str(tmp_path / "bad.examples")
        open(bad, "wb").write(bytes(blob))
        with pytest.raises(IOError):
            self.make().load(bad)

    def test_geometry_mismatch_rejected(self, tmp_path):
        store = self.make()
        f, p, v = self.sample_batch(4, seed=3)
        store.append(f, p, v)
        path = str(tmp_path / "geom.examples")
        store.save(path)
        other = native.ExampleStore(64, feat_size=84, num_actions=9)
        with pytest.raises(IOError):
            other.load(path)


class TestOracleCrossValidation:
    """The JAX lockstep engine and the C++ sequential oracle must produce
    IDENTICAL root visit counts under the shared intended semantics (same
    PUCT arithmetic, uniform priors, first-index ties, negamax backup)."""

    POSITIONS = [
        [],                          # empty board
        [3],                         # single center move
        [0, 1, 0, 1, 0, 1],          # immediate win available
        [0, 1, 0, 1, 0],             # must-block position
        [3, 3, 2, 4, 1, 5],          # open middlegame
        [2, 2, 2, 2, 2, 2, 0, 1],    # full column (illegal-move masking)
    ]

    @pytest.mark.parametrize("sims", [1, 10, 100])
    def test_counts_match_exactly(self, sims):
        net = make_uniform_model(G)
        search = jax.jit(
            make_search_fn(G, net.apply_fn, MCTSConfig(num_sims=sims, max_depth=48))
        )
        states = [play(m) for m in self.POSITIONS]
        root = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)
        tree = search({}, root)
        jax_counts = np.asarray(tree.root_counts())
        for i, s in enumerate(states):
            oracle = native.oracle_search(
                np.asarray(s.board), np.asarray(heights(s)), sims, 1.0, 48
            )
            np.testing.assert_array_equal(
                jax_counts[i], oracle,
                err_msg=f"position {self.POSITIONS[i]} sims={sims}",
            )

    def test_cpuct_variation_matches(self):
        net = make_uniform_model(G)
        for cpuct in (0.5, 2.5):
            search = jax.jit(
                make_search_fn(
                    G, net.apply_fn, MCTSConfig(num_sims=50, max_depth=48, cpuct=cpuct)
                )
            )
            s = play([3, 3, 2])
            root = jax.tree_util.tree_map(lambda x: x[None], s)
            tree = search({}, root)
            oracle = native.oracle_search(
                np.asarray(s.board), np.asarray(heights(s)), 50, cpuct, 48
            )
            np.testing.assert_array_equal(
                np.asarray(tree.root_counts())[0], oracle, err_msg=f"cpuct={cpuct}"
            )


class TestTranspositionOracle:
    """SURVEY §7(c) quantification harness (csrc/tt_oracle.cpp): the
    node-stats oracle reduces EXACTLY to the edge-stats pure tree with the
    `seen` DAG off, and the dedup semantics behave (hits occur, the sim
    budget is conserved through redirects)."""

    def test_tree_mode_matches_edge_oracle(self):
        rng = np.random.default_rng(5)
        for trial in range(12):
            s = play([])
            # random legal playout prefix
            moves = []
            for _ in range(trial % 10):
                h = np.asarray(heights(s))
                legal = np.nonzero(h < 6)[0]
                m = int(rng.choice(legal))
                nxt = jax.vmap(G.step)(
                    jax.tree_util.tree_map(lambda x: x[None], s),
                    jnp.asarray([m]),
                )
                nxt = jax.tree_util.tree_map(lambda x: x[0], nxt)
                done, _ = G.terminal(nxt)
                if bool(done):
                    break
                s = nxt
                moves.append(m)
            sims = 10 + 31 * (trial % 4)
            edge = native.oracle_search(
                np.asarray(s.board), np.asarray(heights(s)), sims, 1.0, 48
            )
            res = native.tt_oracle_search(
                "connect_four", np.asarray(s.board), sims, 1.0, 48, use_tt=False
            )
            assert res is not None
            counts, hits = res
            assert hits == 0
            np.testing.assert_array_equal(edge, counts, err_msg=f"moves={moves}")

    def test_dag_mode_dedups_and_conserves_budget(self):
        s = play([])
        counts_tt, hits = native.tt_oracle_search(
            "connect_four", np.asarray(s.board), 200, 1.0, 48, use_tt=True
        )
        counts_tr, hits0 = native.tt_oracle_search(
            "connect_four", np.asarray(s.board), 200, 1.0, 48, use_tt=False
        )
        assert hits > 0 and hits0 == 0
        # every sim still passes through exactly one root child
        assert counts_tt.sum() == 200 == counts_tr.sum()

    def test_othello_oracle_runs(self):
        board = np.zeros((8, 8), np.int8)
        board[3, 3] = board[4, 4] = 1
        board[3, 4] = board[4, 3] = -1
        res = native.tt_oracle_search("othello", board, 60, 1.0, 64, use_tt=True)
        assert res is not None
        counts, hits = res
        assert counts.sum() == 60
        assert counts[64] == 0  # pass is illegal at the start

    def test_match_driver_seating_and_totals(self):
        r = native.tt_oracle_match(
            "connect_four", 20, 12, 1.0, 48, temp_moves=6, seed=3
        )
        assert r is not None
        assert sum(r) == 20

"""On-TPU smoke gate (run on the REAL chip; see docs/TPU_GATE.md).

The CPU suite exercises the Pallas engines only in interpreter mode, so
a Mosaic lowering regression (the "Not implemented: Lane broadcast"
class) would otherwise first surface as a broken round bench. These
tests execute one fused move, one hybrid move, one folded conv eval and
one tiny Coach iteration on the real backend and check frozen goldens.

Run:
    AZ_TPU_GATE=1 PYTHONPATH=/root/.axon_site:/root/repo \\
        python -m pytest tests/ -q -m tpu

Regenerate goldens (after an INTENTIONAL semantics change, on the chip):
    AZ_REGEN_GOLDENS=1 AZ_TPU_GATE=1 ... python -m pytest tests/ -q -m tpu
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_tpu.config import MCTSConfig

pytestmark = pytest.mark.tpu

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "tpu_goldens.json")
_REGEN = bool(os.environ.get("AZ_REGEN_GOLDENS"))


@pytest.fixture(scope="module")
def goldens():
    data = {}
    if os.path.exists(GOLDEN_PATH):
        with open(GOLDEN_PATH) as f:
            data = json.load(f)
    yield data
    if _REGEN:
        with open(GOLDEN_PATH, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)


def _check(goldens, key, value, exact=True, atol=0.0):
    value = np.asarray(value, np.float64).tolist()
    if _REGEN or key not in goldens:
        goldens[key] = value
        if not _REGEN:
            pytest.skip(f"no golden for {key}; run once with AZ_REGEN_GOLDENS=1")
        return
    got = np.asarray(value)
    want = np.asarray(goldens[key])
    if exact:
        np.testing.assert_array_equal(got, want, err_msg=key)
    else:
        np.testing.assert_allclose(got, want, atol=atol, err_msg=key)


def _positions(game, B, moves, seed):
    from tests.test_fused import _random_positions

    return _random_positions(game, B, moves, seed=seed)


def test_backend_is_tpu():
    assert jax.default_backend() == "tpu"


def test_fused_move_matches_golden(goldens):
    """One real-Mosaic fused-kernel move (uniform prior, production block
    shape): root visit counts frozen."""
    from alphazero_tpu.games import ConnectFour
    from alphazero_tpu.mcts.fused import make_fused_root_fn
    from alphazero_tpu.models import make_uniform_model

    game = ConnectFour()
    net = make_uniform_model(game)
    cfg = MCTSConfig(num_sims=32, max_depth=48)
    fused = make_fused_root_fn(game, net.apply_fn, cfg)
    assert fused is not None
    state = _positions(game, 256, 6, seed=11)
    counts = np.asarray(jax.jit(fused)({}, state))
    assert counts.sum(-1).min() == 32 or counts.sum(-1).max() <= 32
    _check(goldens, "fused_c4_uniform_counts_head", counts[:8])


def test_fused_mlp_move_matches_golden(goldens):
    """In-kernel MLP eval on the MXU (the bf16 path most sensitive to
    Mosaic changes)."""
    from alphazero_tpu.games import ConnectFour
    from alphazero_tpu.mcts.fused import make_fused_root_fn
    from alphazero_tpu.models import MLPNet, init_flax_model, make_flax_apply_fn

    game = ConnectFour()
    model = MLPNet(num_actions=game.num_actions, hidden=(32, 32))
    apply_fn = make_flax_apply_fn(model)
    params = init_flax_model(model, jax.random.key(0), game.feature_shape)
    cfg = MCTSConfig(num_sims=24, max_depth=48)
    fused = make_fused_root_fn(game, apply_fn, cfg)
    assert fused is not None
    state = _positions(game, 256, 4, seed=12)
    counts = np.asarray(jax.jit(fused)(params, state))
    _check(goldens, "fused_c4_mlp_counts_head", counts[:8])


def test_hybrid_move_matches_golden(goldens):
    """Descend/merge kernels around an XLA conv forward (the flagship
    self-play path)."""
    from alphazero_tpu.games import ConnectFour
    from alphazero_tpu.mcts.hybrid import make_hybrid_root_fn
    from alphazero_tpu.models import AZResNet, init_flax_model, make_flax_apply_fn

    game = ConnectFour()
    model = AZResNet(num_actions=game.num_actions, channels=16, blocks=2)
    apply_fn = make_flax_apply_fn(model)
    params = init_flax_model(model, jax.random.key(2), game.feature_shape)
    cfg = MCTSConfig(num_sims=16, max_depth=48)
    hybrid = make_hybrid_root_fn(game, apply_fn, cfg)
    assert hybrid is not None
    state = _positions(game, 256, 2, seed=13)
    counts = np.asarray(jax.jit(hybrid)(params, state))
    # conv arithmetic differs across compiler versions at the last ulp;
    # counts are integers downstream of it, frozen exactly
    _check(goldens, "hybrid_c4_resnet_counts_head", counts[:8])


def test_hybrid_gomoku_move_matches_golden(goldens):
    """Third game on the hybrid engine's dense large-A refresh path
    (81 actions) under real Mosaic."""
    from alphazero_tpu.games import Gomoku
    from alphazero_tpu.mcts.hybrid import make_hybrid_root_fn
    from alphazero_tpu.models import make_uniform_model

    game = Gomoku()
    net = make_uniform_model(game)
    cfg = MCTSConfig(num_sims=16, max_depth=32)
    hybrid = make_hybrid_root_fn(game, net.apply_fn, cfg)
    assert hybrid is not None
    state = jax.vmap(lambda _: game.init())(jnp.arange(256))
    counts = np.asarray(jax.jit(hybrid)({}, state))
    assert counts.sum(-1).max() == 16
    _check(goldens, "hybrid_gomoku_uniform_counts_head", counts[:4])


def test_hybrid_othello_move_matches_golden(goldens):
    """Othello on the hybrid engine under real Mosaic: the in-kernel
    flip-ray ``step`` (games/othello.py ``OthelloFlatOps`` — eight
    masked directional ray scans, the most intricate kernel-side
    dynamics in the repo) previously had only a step-level CPU-vs-TPU
    equality check; this freezes whole SEARCHES over it so a Mosaic
    lowering regression in the descend/merge path cannot pass the gate
    (round-4 VERDICT item 6). Both the pure-kernel (uniform) and
    model-forward (MLP) paths are frozen, from a mid-game position set
    so rays actually flip."""
    from alphazero_tpu.games import Othello
    from alphazero_tpu.mcts.hybrid import make_hybrid_root_fn
    from alphazero_tpu.models import (
        MLPNet,
        init_flax_model,
        make_flax_apply_fn,
        make_uniform_model,
    )

    game = Othello()
    cfg = MCTSConfig(num_sims=16, max_depth=80)
    state = _positions(game, 256, 7, seed=23)

    net = make_uniform_model(game)
    hybrid = make_hybrid_root_fn(game, net.apply_fn, cfg)
    assert hybrid is not None
    counts = np.asarray(jax.jit(hybrid)({}, state))
    assert counts.sum(-1).max() == 16
    _check(goldens, "hybrid_othello_uniform_counts_head", counts[:4])

    model = MLPNet(num_actions=game.num_actions, hidden=(32, 32))
    apply_fn = make_flax_apply_fn(model)
    params = init_flax_model(model, jax.random.key(5), game.feature_shape)
    hybrid_mlp = make_hybrid_root_fn(game, apply_fn, cfg)
    assert hybrid_mlp is not None
    counts_mlp = np.asarray(jax.jit(hybrid_mlp)(params, state))
    _check(goldens, "hybrid_othello_mlp_counts_head", counts_mlp[:4])


def test_hybrid_gomoku15_move_matches_golden(goldens):
    """The production 15x15 Gomoku edition (A=225) on the hybrid engine
    under real Mosaic — the largest action space the dense-plane layout
    serves (round-4 VERDICT item 1)."""
    from alphazero_tpu.games import Gomoku
    from alphazero_tpu.mcts.hybrid import make_hybrid_root_fn
    from alphazero_tpu.models import make_uniform_model

    game = Gomoku(15)
    net = make_uniform_model(game)
    cfg = MCTSConfig(num_sims=16, max_depth=64)
    hybrid = make_hybrid_root_fn(game, net.apply_fn, cfg)
    assert hybrid is not None
    state = _positions(game, 256, 9, seed=31)
    counts = np.asarray(jax.jit(hybrid)({}, state))
    assert counts.sum(-1).max() == 16
    _check(goldens, "hybrid_gomoku15_uniform_counts_head", counts[:4])


def test_hybrid_hex_move_matches_golden(goldens):
    """Fourth game on the hybrid engine under real Mosaic: the
    parity-lane flat ops (games/hex.py ``HexFlatOps``) keep the kernel
    side to dense f32 arithmetic — the data-dependent flood-fill
    terminal (games/hex.py:56-72) runs only in the engine's XLA stage.
    Both the pure-kernel (uniform) and model-forward (MLP) paths are
    frozen."""
    from alphazero_tpu.games import Hex
    from alphazero_tpu.mcts.hybrid import make_hybrid_root_fn
    from alphazero_tpu.models import (
        MLPNet,
        init_flax_model,
        make_flax_apply_fn,
        make_uniform_model,
    )

    game = Hex()
    cfg = MCTSConfig(num_sims=16, max_depth=56)
    state = _positions(game, 256, 5, seed=15)

    net = make_uniform_model(game)
    hybrid = make_hybrid_root_fn(game, net.apply_fn, cfg)
    assert hybrid is not None
    counts = np.asarray(jax.jit(hybrid)({}, state))
    assert counts.sum(-1).max() == 16
    _check(goldens, "hybrid_hex_uniform_counts_head", counts[:4])

    model = MLPNet(num_actions=game.num_actions, hidden=(32, 32))
    apply_fn = make_flax_apply_fn(model)
    params = init_flax_model(model, jax.random.key(4), game.feature_shape)
    hybrid_mlp = make_hybrid_root_fn(game, apply_fn, cfg)
    assert hybrid_mlp is not None
    counts_mlp = np.asarray(jax.jit(hybrid_mlp)(params, state))
    _check(goldens, "hybrid_hex_mlp_counts_head", counts_mlp[:4])


def test_gumbel_move_matches_golden(goldens):
    """Gumbel sequential-halving engine (mcts/gumbel.py — the engine the
    recommended economy preset selects) on the real chip: eval-mode
    (zero-Gumbel) root counts + winning actions frozen, plus a
    sampled-Gumbel arm to cover ``jax.random.gumbel`` on-device."""
    from alphazero_tpu.games import ConnectFour
    from alphazero_tpu.mcts.gumbel import make_gumbel_search_fn
    from alphazero_tpu.models import MLPNet, init_flax_model, make_flax_apply_fn

    game = ConnectFour()
    model = MLPNet(num_actions=game.num_actions, hidden=(32, 32))
    apply_fn = make_flax_apply_fn(model)
    params = init_flax_model(model, jax.random.key(5), game.feature_shape)
    cfg = MCTSConfig(
        num_sims=32, max_depth=48, gumbel=True, dirichlet_alpha=None
    )
    search = jax.jit(make_gumbel_search_fn(game, apply_fn, cfg))
    state = _positions(game, 256, 4, seed=16)
    res = search(params, state)  # rng=None -> eval mode (zero Gumbel)
    counts = np.asarray(res.tree.root_counts())
    assert counts.sum(-1).max() == 32
    _check(goldens, "gumbel_c4_mlp_eval_counts_head", counts[:8])
    _check(goldens, "gumbel_c4_mlp_eval_action_head", np.asarray(res.action)[:16])
    res2 = search(params, state, rng=jax.random.key(7))
    _check(goldens, "gumbel_c4_mlp_rng_action_head", np.asarray(res2.action)[:16])


def test_tt_move_matches_golden(goldens):
    """Transposition-DAG engine (mcts/tt.py — exact-state probe +
    dedup-continue descents) on the real chip: root counts and the
    per-game dedup-link diagnostic frozen."""
    from alphazero_tpu.games import ConnectFour
    from alphazero_tpu.mcts.tt import make_tt_search_fn
    from alphazero_tpu.models import make_uniform_model

    game = ConnectFour()
    net = make_uniform_model(game)
    cfg = MCTSConfig(num_sims=25, max_depth=48, transposition=True)
    search = jax.jit(make_tt_search_fn(game, net.apply_fn, cfg))
    state = _positions(game, 64, 6, seed=17)
    tree = search({}, state)
    counts = np.asarray(tree.root_counts())
    assert counts.sum(-1).max() == 25
    _check(goldens, "tt_c4_uniform_counts_head", counts[:8])
    _check(goldens, "tt_c4_uniform_dedup_head", np.asarray(tree.dedup)[:16])


def test_folded_eval_matches_golden(goldens):
    from alphazero_tpu.games import ConnectFour
    from alphazero_tpu.models import AZResNet, init_flax_model, make_flax_apply_fn

    game = ConnectFour()
    model = AZResNet(num_actions=game.num_actions, channels=16, blocks=2)
    variables = init_flax_model(model, jax.random.key(3), game.feature_shape)
    feats = jax.vmap(game.to_features)(_positions(game, 8, 5, seed=14))
    logits, v = jax.jit(make_flax_apply_fn(model, fold=True))(variables, feats)
    _check(goldens, "folded_resnet_logits", logits, exact=False, atol=2e-2)
    _check(goldens, "folded_resnet_value", v, exact=False, atol=1e-2)


def test_step_v_exact_at_large_batch():
    """Regression for a real TPU-backend miscompile: per-game dynamic
    gather/scatter in ``game.step`` silently dropped the placement for
    ~half of a B=4096 vmapped batch (correct at B<=512 and on CPU). The
    steps are now dense one-hot writes; this pins them against the host
    reference at the failing batch size, for all three games."""
    import numpy as np

    from alphazero_tpu.games import ConnectFour, Gomoku, Othello

    B = 4096
    rng = np.random.default_rng(7)

    # connect-four: host-built random positions + legal actions
    game = ConnectFour()
    boards = np.zeros((B, 6, 7), np.int8)
    heights = np.zeros((B, 7), np.int64)
    for b in range(B):
        for _ in range(rng.integers(0, 20)):
            legal = np.nonzero(heights[b] < 6)[0]
            c = int(rng.choice(legal))
            boards[b, heights[b, c], c] = 1
            heights[b, c] += 1
            boards[b] = -boards[b]
    actions = np.array(
        [int(rng.choice(np.nonzero(heights[b] < 6)[0])) for b in range(B)]
    )
    ref = boards.copy()
    for b in range(B):
        ref[b, heights[b, actions[b]], actions[b]] = 1
    from alphazero_tpu.games.connect_four import ConnectFourState

    out = jax.jit(jax.vmap(game.step))(
        ConnectFourState(board=jnp.asarray(boards)), jnp.asarray(actions)
    )
    np.testing.assert_array_equal(np.asarray(out.board), -ref)

    # gomoku: empty-cell placements
    gmk = Gomoku()
    gb = np.zeros((B, 9, 9), np.int8)
    occ = rng.integers(0, 81, (B, 10))
    for b in range(B):
        for j, cell in enumerate(occ[b]):
            gb[b, cell // 9, cell % 9] = 1 if j % 2 == 0 else -1
    acts = np.array(
        [int(rng.choice(np.nonzero(gb[b].reshape(-1) == 0)[0])) for b in range(B)]
    )
    gref = gb.copy()
    for b in range(B):
        gref[b, acts[b] // 9, acts[b] % 9] = 1
    from alphazero_tpu.games.gomoku import GomokuState

    gout = jax.jit(jax.vmap(gmk.step))(
        GomokuState(board=jnp.asarray(gb)), jnp.asarray(acts)
    )
    np.testing.assert_array_equal(np.asarray(gout.board), -gref)

    # othello: step at B=4096 must match the (flat-ops-verified) CPU step
    oth = Othello()
    state = jax.vmap(lambda _: oth.init())(jnp.arange(B))
    oacts = jnp.asarray(rng.integers(0, 65, B))
    got = jax.jit(jax.vmap(oth.step))(state, oacts)
    import jax as _jax

    cpu = _jax.jit(_jax.vmap(oth.step), backend="cpu")(
        _jax.device_put(state, _jax.devices("cpu")[0]),
        _jax.device_put(oacts, _jax.devices("cpu")[0]),
    )
    np.testing.assert_array_equal(np.asarray(got.board), np.asarray(cpu.board))


def test_coach_iteration_on_tpu():
    """A tiny but complete Coach iteration (self-play -> replay -> train
    -> arena gate) on the real chip."""
    from alphazero_tpu.coach import Coach
    from alphazero_tpu.config import (
        ArenaConfig,
        AZConfig,
        MCTSConfig as MC,
        ReplayConfig,
        SelfPlayConfig,
        TrainConfig,
    )
    from alphazero_tpu.games import ConnectFour
    from alphazero_tpu.models import MLPNet

    game = ConnectFour()
    model = MLPNet(num_actions=game.num_actions, hidden=(32,))
    cfg = AZConfig(
        mcts=MC(num_sims=16, max_depth=24),
        selfplay=SelfPlayConfig(batch_size=256, temp_threshold=6),
        replay=ReplayConfig(capacity=1 << 14),
        train=TrainConfig(batch_size=128, steps_per_iteration=8),
        arena=ArenaConfig(num_games=64, update_threshold=0.6, num_sims=8),
        seed=0,
    )
    rec = Coach(game, model, cfg).run_iteration()
    assert np.isfinite(rec["loss_last"])
    assert rec["arena_wins"] + rec["arena_losses"] + rec["arena_draws"] <= 64
    assert rec["selfplay_moves"] > 256  # games actually played out

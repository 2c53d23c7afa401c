"""Policy/value networks — the NNet family.

Re-design of the reference's NN stack: the ``NNet`` trait
(reference: src/nnet.rs:35-45), the embedded-Python bridge
(examples/utils/python_nnet.rs), the TF1 CNN spec
(examples/connect_four_lib/connect_four_net.py:20-100, treated as an
architecture/loss spec only — defect D10) and the uniform dummy net
(examples/connect_four.rs:12-43 ``DumbConnectFourNnet``).

Interface: every model exposes ``apply_fn(variables, features[B, ...]) ->
(policy_logits[B, A], value[B])`` — a pure function fused straight into the
search step (no inference service thread / channel hop,
async_mcts.rs:117-189). Variables are flax dicts ``{'params', ...,
'batch_stats', ...}``; model versioning is plain pytree substitution
(incumbent vs candidate live side by side), replacing the reference's
checkpoint-reload-on-model-id scheme (python_nnet.rs:65-75,106-117).

Compute dtype is bfloat16 on the matmul/conv path (MXU-native), float32 for
normalization statistics and head outputs.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class UniformModel:
    """Uniform policy, constant value — the pure-MCTS baseline net
    (examples/connect_four.rs:12-43). The reference's returned value 1.0 for
    every board; 0.0 (neutral) is this framework's default, configurable."""

    def __init__(self, num_actions: int, value: float = 0.0):
        self.num_actions = num_actions
        self.value = value

        def apply_fn(variables: Any, feats: jax.Array) -> Tuple[jax.Array, jax.Array]:
            del variables
            b = feats.shape[0]
            return (
                jnp.zeros((b, num_actions), jnp.float32),
                jnp.full((b,), value, jnp.float32),
            )

        # the search skips feature materialization for feature-free models
        apply_fn.needs_features = False
        # constant prior/value: eligible for the VMEM-resident fused search
        # kernel (mcts/fused.py)
        apply_fn.uniform_value = value
        self.apply_fn = apply_fn

    def init(self, rng: jax.Array, sample: jax.Array) -> Any:
        del rng, sample
        return {}


def make_uniform_model(game, value: float = 0.0) -> UniformModel:
    return UniformModel(game.num_actions, value)


class MLPNet(nn.Module):
    """Tiny MLP policy/value net (BASELINE config 2)."""

    num_actions: int
    hidden: Sequence[int] = (256, 256)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        del train
        x = x.reshape((x.shape[0], -1)).astype(self.dtype)
        for h in self.hidden:
            x = nn.Dense(h, dtype=self.dtype)(x)
            x = nn.relu(x)
        logits = nn.Dense(self.num_actions, dtype=jnp.float32, name="policy")(x)
        v = nn.Dense(1, dtype=jnp.float32, name="value")(x)
        return logits, jnp.tanh(v)[:, 0]


def attach_mlp_kernel_eval(model: MLPNet, apply_fn) -> None:
    """Register an IN-KERNEL evaluator so the fused VMEM-resident search
    (mcts/fused.py) can run this MLP on the MXU inside the Pallas kernel —
    the whole net (~0.5 MB of weights) lives in VMEM next to the trees, so
    NN-backed search keeps the fused kernel's throughput instead of
    falling back to the HBM-streaming XLA engine.

    The evaluator replays ``MLPNet.__call__`` exactly (bf16 hidden
    matmuls, f32 heads, tanh value). Features are derived from the flat
    board; the first layer's kernel rows are permuted host-side from the
    interleaved NHWC-flat order to the kernel's [+plane | -plane] concat
    order, which leaves each dot product's value set unchanged.
    """
    n_hidden = len(tuple(model.hidden))
    num_actions = int(model.num_actions)

    def factory(ops):
        L = ops.size
        # x_cat[:, j] = x_nhwc[:, 2j] for j < L (the +1 plane), else
        # x_nhwc[:, 2(j-L)+1] (the -1 plane)
        perm = jnp.asarray(
            [2 * j for j in range(L)] + [2 * j + 1 for j in range(L)],
            jnp.int32,
        )

        def extract(variables):
            p = variables["params"]
            arrs = []
            w0 = jnp.take(p["Dense_0"]["kernel"], perm, axis=0)
            arrs.append(w0)
            arrs.append(p["Dense_0"]["bias"][None, :])
            for i in range(1, n_hidden):
                arrs.append(p[f"Dense_{i}"]["kernel"])
                arrs.append(p[f"Dense_{i}"]["bias"][None, :])
            # fused policy|value head (column-independent, so identical
            # results to two separate f32 matmuls)
            wh = jnp.concatenate(
                [p["policy"]["kernel"], p["value"]["kernel"]], axis=1
            )
            bh = jnp.concatenate(
                [p["policy"]["bias"], p["value"]["bias"]], axis=0
            )[None, :]
            arrs.append(wh)
            arrs.append(bh)
            return arrs

        def eval_fn(board, vm, *arrs):
            del vm
            dt = model.dtype
            x = jnp.concatenate(
                [
                    (board == 1).astype(jnp.float32),
                    (board == -1).astype(jnp.float32),
                ],
                axis=1,
            ).astype(dt)
            for i in range(n_hidden):
                w, b = arrs[2 * i], arrs[2 * i + 1]
                # Mosaic requires 32-bit matmul accumulation; XLA's bf16
                # dot is f32-accumulate + round, so this matches exactly
                h32 = jnp.dot(
                    x, w.astype(dt), preferred_element_type=jnp.float32
                )
                x = jnp.maximum(h32.astype(dt) + b.astype(dt), 0)
            h = x.astype(jnp.float32)
            out = (
                jnp.dot(h, arrs[-2], preferred_element_type=jnp.float32)
                + arrs[-1]
            )
            logits = out[:, :num_actions]
            value = jnp.tanh(out[:, num_actions : num_actions + 1])
            return logits, value

        return extract, eval_fn

    apply_fn.kernel_eval_factory = factory


def _fold_conv_bn(kernel, bn_params, bn_stats, dtype, eps: float = 1e-5):
    """Fold an inference BatchNorm into the preceding bias-free conv/dense
    kernel: returns (W * gamma/sqrt(var+eps), beta - mean*gamma/sqrt(...))
    in the compute dtype. Scale applies to the output-channel (last) dim."""
    inv = 1.0 / jnp.sqrt(bn_stats["var"] + eps)
    scale = bn_params["scale"] * inv
    w = kernel * scale.reshape((1,) * (kernel.ndim - 1) + (-1,))
    b = bn_params["bias"] - bn_stats["mean"] * scale
    return w.astype(dtype), b.astype(dtype)


class _ResBlock(nn.Module):
    channels: int
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(y)
        return nn.relu(x + y.astype(x.dtype))


class AZResNet(nn.Module):
    """AlphaZero-style conv resnet — the flagship model (BASELINE config 3).

    Stem conv + residual tower + 1x1-conv policy/value heads, BN throughout
    (the modern successor of the reference's plain 4-conv CNN spec,
    connect_four_net.py:20-100: conv3x3x512 stack + BN + ReLU + dense heads,
    pi = softmax(Dense(A)), v = tanh(Dense(1))).
    """

    num_actions: int
    channels: int = 64
    blocks: int = 5
    value_hidden: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        x = nn.relu(x).astype(self.dtype)
        for _ in range(self.blocks):
            x = _ResBlock(self.channels, self.dtype)(x, train)

        p = nn.Conv(2, (1, 1), use_bias=False, dtype=self.dtype)(x)
        p = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(p)
        p = nn.relu(p).reshape((x.shape[0], -1))
        logits = nn.Dense(self.num_actions, dtype=jnp.float32, name="policy")(p)

        v = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype)(x)
        v = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(v)
        v = nn.relu(v).reshape((x.shape[0], -1))
        v = nn.relu(nn.Dense(self.value_hidden, dtype=self.dtype)(v))
        v = nn.Dense(1, dtype=jnp.float32, name="value")(v)
        return logits, jnp.tanh(v)[:, 0]

    def folded_apply(self, variables, feats):
        """BN-folded inference forward — the search-side eval path.

        Measured on the v5e chip, the unfolded eval tower is NOT
        MXU-bound: f32 runs as fast as bf16 because the separate
        f32-BatchNorm passes (plus their dtype conversions) dominate.
        Folding every BN into its conv (W' = W * gamma/sqrt(var+eps),
        b' = beta - mean * gamma/sqrt(var+eps)) removes those passes —
        ~1.2x on the forward, |delta logits| ~1e-2 (statistically
        equivalent for search; asserted in tests/test_fold.py). Training
        keeps real BatchNorm; this touches only inference."""
        p = variables["params"]
        bs = variables["batch_stats"]
        dt = self.dtype

        def conv(x, wb):
            w, b = wb
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=dt,
            )
            return y + b

        x = feats.astype(dt)
        x = nn.relu(
            conv(x, _fold_conv_bn(p["Conv_0"]["kernel"], p["BatchNorm_0"], bs["BatchNorm_0"], dt))
        )
        for i in range(self.blocks):
            bp = p[f"_ResBlock_{i}"]
            bss = bs[f"_ResBlock_{i}"]
            y = nn.relu(
                conv(x, _fold_conv_bn(bp["Conv_0"]["kernel"], bp["BatchNorm_0"], bss["BatchNorm_0"], dt))
            )
            y = conv(y, _fold_conv_bn(bp["Conv_1"]["kernel"], bp["BatchNorm_1"], bss["BatchNorm_1"], dt))
            x = nn.relu(x + y)

        pl = nn.relu(
            conv(x, _fold_conv_bn(p["Conv_1"]["kernel"], p["BatchNorm_1"], bs["BatchNorm_1"], dt))
        ).reshape((x.shape[0], -1))
        logits = (
            pl.astype(jnp.float32) @ p["policy"]["kernel"] + p["policy"]["bias"]
        )

        vl = nn.relu(
            conv(x, _fold_conv_bn(p["Conv_2"]["kernel"], p["BatchNorm_2"], bs["BatchNorm_2"], dt))
        ).reshape((x.shape[0], -1))
        vh = nn.relu(
            vl @ p["Dense_0"]["kernel"].astype(dt) + p["Dense_0"]["bias"].astype(dt)
        )
        v = vh.astype(jnp.float32) @ p["value"]["kernel"] + p["value"]["bias"]
        return logits, jnp.tanh(v)[:, 0]


class AZConvNet(nn.Module):
    """Plain conv net matching the reference's TF1 architecture spec
    (connect_four_net.py:20-100): 4 conv3x3 layers (SAME, SAME, VALID,
    VALID) + BN + ReLU, flatten, Dense(1024)+BN+ReLU+Dropout,
    Dense(512)+BN+ReLU+Dropout, then pi/v heads. Kept for parity with C11;
    AZResNet is the recommended flagship."""

    num_actions: int
    channels: int = 512          # num_channels (connect_four_net.py:14)
    dropout: float = 0.3         # (connect_four_net.py:13)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        x = x.astype(self.dtype)
        for pad in ("SAME", "SAME", "VALID", "VALID"):
            x = nn.Conv(self.channels, (3, 3), padding=pad, use_bias=False, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
            x = nn.relu(x).astype(self.dtype)
        x = x.reshape((x.shape[0], -1))
        for h in (1024, 512):
            x = nn.Dense(h, use_bias=False, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
            x = nn.relu(x).astype(self.dtype)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        logits = nn.Dense(self.num_actions, dtype=jnp.float32, name="policy")(x)
        v = nn.Dense(1, dtype=jnp.float32, name="value")(x)
        return logits, jnp.tanh(v)[:, 0]

    def folded_apply(self, variables, feats):
        """BN-folded inference forward (see AZResNet.folded_apply — same
        measured motivation; Dropout is identity at inference)."""
        p = variables["params"]
        bs = variables["batch_stats"]
        dt = self.dtype

        x = feats.astype(dt)
        for i, pad in enumerate(("SAME", "SAME", "VALID", "VALID")):
            w, b = _fold_conv_bn(
                p[f"Conv_{i}"]["kernel"], p[f"BatchNorm_{i}"], bs[f"BatchNorm_{i}"], dt
            )
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=dt,
            )
            x = nn.relu(y + b)
        x = x.reshape((x.shape[0], -1))
        for j in range(2):
            w, b = _fold_conv_bn(
                p[f"Dense_{j}"]["kernel"],
                p[f"BatchNorm_{4 + j}"],
                bs[f"BatchNorm_{4 + j}"],
                dt,
            )
            x = nn.relu(x @ w + b)
        logits = x.astype(jnp.float32) @ p["policy"]["kernel"] + p["policy"]["bias"]
        v = x.astype(jnp.float32) @ p["value"]["kernel"] + p["value"]["bias"]
        return logits, jnp.tanh(v)[:, 0]


def make_flax_apply_fn(model: nn.Module, fold: Optional[bool] = None) -> Callable:
    """Inference-mode apply: (variables, feats) -> (logits, value).

    Uses running BN statistics (train=False) — the search-side predict path
    (the analogue of PythonNNet::predict, python_nnet.rs:88-132).

    ``fold`` selects the BN-folded fast eval for models that provide one
    (AZResNet): None = auto (fold unless AZ_NO_FOLD is set), True/False =
    force. Folding is inference-only and statistically equivalent
    (tests/test_fold.py); training always uses the real module."""
    import os

    if fold is None:
        fold = not os.environ.get("AZ_NO_FOLD")
    use_folded = fold and hasattr(model, "folded_apply")

    if use_folded:
        def apply_fn(variables, feats):
            return model.folded_apply(variables, feats)
    else:
        def apply_fn(variables, feats):
            return model.apply(variables, feats, train=False)

    # Stamped into every Coach metrics record so cross-run Elo/loss curves
    # can be compared knowing which eval path (folded vs unfolded BN, ~1e-2
    # logit delta) produced them.
    apply_fn.folded = use_folded

    if isinstance(model, MLPNet):
        # MLPs additionally get an in-kernel evaluator so the fused
        # VMEM-resident search can run them on the MXU inside the kernel
        attach_mlp_kernel_eval(model, apply_fn)
    return apply_fn


def init_flax_model(model: nn.Module, rng: jax.Array, feature_shape) -> Any:
    sample = jnp.zeros((1,) + tuple(feature_shape), jnp.float32)
    return model.init(rng, sample, train=False)

"""MEASURED NEGATIVE RESULT (kept for reproducibility; see
docs/ENGINES.md "Conv-eval headroom"): whole ResNet tower as ONE Pallas
kernel, int8 MXU matmuls with in-epilogue requantization, activations
VMEM-resident across layers. Mosaic lowers the int8 matmuls exactly on
v5e — but the kernel measures 6.7 ms vs XLA's 1.06 ms bf16 conv tower
(B=4096): the per-layer im2col patch marshalling and int8<->f32 requant
conversions are pure VPU work that dwarfs the MXU saving at 6x7 spatial
dims. Run: PYTHONPATH=/root/.axon_site:/root/repo python
experiments/int8_fused_tower.py

Layout: activations as 2D [Bb*42, C] (game-major rows b*42 + r*7 + c).
A 3x3 SAME conv = 9 row-shifted copies of the activation matrix (shift
offset dr*7+dc with row/col boundary masks) concatenated to patches
[Bb*42, 9*C], then one int8 matmul [.,9C]@[9C,C].
"""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ROWS, COLS, CH, BLOCKS = 6, 7, 64, 5
CELLS = ROWS * COLS
WSCALE = 1.0 / 16.0   # weight quant scale (fake calib)
ASCALE = 32.0         # activation quant scale (fake calib)


def make_boundary_masks(Bb):
    # rows r*7+c within a game; masks[k] = 1 where neighbor (dr,dc) valid
    M = Bb * CELLS
    cell = np.arange(M) % CELLS
    r, c = cell // COLS, cell % COLS
    masks = []
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            ok = (r + dr >= 0) & (r + dr < ROWS) & (c + dc >= 0) & (c + dc < COLS)
            masks.append(ok.astype(np.float32))
    return np.stack(masks, 0)  # [9, M]


def tower_kernel(x_ref, masks_ref, *wrefs_and_out, n_layers):
    w_refs = wrefs_and_out[:n_layers]
    o_ref = wrefs_and_out[n_layers]
    M = x_ref.shape[0]

    def im2col_q(act_q):  # act_q int8 [M, CH] -> [M, 9*CH] int8
        cols = []
        k = 0
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                off = dr * COLS + dc
                if off == 0:
                    shifted = act_q
                elif off > 0:
                    # neighbor row = row + off: take rows [off:], pad bottom
                    shifted = jnp.concatenate(
                        [act_q[off:], jnp.zeros((off, CH), jnp.int8)], axis=0
                    )
                else:
                    shifted = jnp.concatenate(
                        [jnp.zeros((-off, CH), jnp.int8), act_q[:off]], axis=0
                    )
                m = masks_ref[k, :][:, None]  # f32 [M,1]
                cols.append((shifted.astype(jnp.float32) * m).astype(jnp.int8))
                k += 1
        return jnp.concatenate(cols, axis=1)

    def conv_q(act_q, w_ref, relu=True, res_f=None):
        patches = im2col_q(act_q)
        acc = jax.lax.dot_general(
            patches, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        f = acc.astype(jnp.float32) * (WSCALE / ASCALE)
        if res_f is not None:
            f = f + res_f
        if relu:
            f = jnp.maximum(f, 0.0)
        q = jnp.clip(jnp.round(f * ASCALE), -127.0, 127.0).astype(jnp.int8)
        return q, f

    x = x_ref[...]
    q = jnp.clip(jnp.round(x * ASCALE), -127.0, 127.0).astype(jnp.int8)
    q, f = conv_q(q, w_refs[0])           # stem (in-ch already CH for proto)
    li = 1
    for b in range(BLOCKS):
        q1, _ = conv_q(q, w_refs[li]); li += 1
        q, f = conv_q(q1, w_refs[li], res_f=f); li += 1
    o_ref[...] = f


def main():
    B = 4096
    Bb = 256
    M = Bb * CELLS
    n_layers = 1 + 2 * BLOCKS
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B * CELLS, CH)), jnp.float32)
    ws = [
        jnp.asarray(rng.integers(-16, 16, (9 * CH, CH)), jnp.int8)
        for _ in range(n_layers)
    ]
    masks = jnp.asarray(make_boundary_masks(Bb))

    kern = functools.partial(tower_kernel, n_layers=n_layers)
    grid = (B // Bb,)
    tower = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, CH), lambda i: (i, 0)),
            pl.BlockSpec((9, M), lambda i: (0, 0)),
        ]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0)) for w in ws],
        out_specs=pl.BlockSpec((M, CH), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * CELLS, CH), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )
    f = jax.jit(tower)
    out = f(x, masks, *ws)
    _ = np.asarray(out)
    print("compiled + ran; out mean", float(np.abs(np.asarray(out)).mean()))

    N = 30
    @jax.jit
    def many(x, masks, *ws):
        def body(c, _):
            o = tower(c, masks, *ws)
            return c + o.mean() * 1e-12, o[0, 0]
        c, vs = jax.lax.scan(body, x, jnp.arange(N))
        return vs.sum()
    _ = np.asarray(many(x, masks, *ws))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(many(x, masks, *ws))
        best = min(best, time.perf_counter() - t0)
    per = best / N
    flops = B * CELLS * 9 * CH * CH * 2 * n_layers
    print(f"int8 fused tower: {per*1e3:.3f} ms ({flops/per/1e12:.0f} TOPS)")


if __name__ == "__main__":
    main()

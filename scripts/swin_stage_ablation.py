"""Op-class attribution for the fused SwinIR block kernel (PERF.md evidence).

Times kernel variants with stages ablated, at the flagship config
(C=180, heads=6, head_dim=30, N=64 tokens, MLP hidden=720 = effective
mlp_ratio 4, 2048 windows = batch 8 of 128x128), chained over 36 blocks.
The deltas attribute time to QKV/attention/proj vs MLP vs LN overhead, and
an all-heads batched-dot variant retries the packed attention layout inside
the fused block (VERDICT.md round-1 item 6).

Usage: python scripts/swin_stage_ablation.py [variant ...]
  variants: full noattn attnonly mlponly allheads  (default: all but
  allheads)

allheads note: the packed layout is NOT lowerable by Mosaic at these
shapes — `tpu.matmul` supports one batch dim, and splitting heads via
reshape (blk,64,180)->(blk,64,6,30) hits an unsupported minor-dim split
(30 is not a lane multiple). The per-head lane-slice loop the production
kernel uses is the expressible form; `allheads` is kept for when Mosaic
grows support.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from superresolution_def_tpu.kernels.swin_block import _gelu_exact, _ln_f32

C, HEADS, N, HIDDEN = 180, 6, 64, 720
D = C // HEADS
SCALE = D**-0.5
BW = 8 * 256  # batch 8 x (128/8)^2 windows
BLK = 32
DTYPE = jnp.bfloat16


# ---- GELU cost attribution: alternative activations for the MLP tail ----
# (the A&S erf in _gelu_exact spends an exp + a divide + a 5-term poly in
# f32 on a (blk*64, 720) tensor — candidate VPU bottleneck)

def _gelu_tanh(x):
    xf = x.astype(jnp.float32)
    inner = 0.7978845608028654 * (xf + 0.044715 * xf * xf * xf)
    return 0.5 * xf * (1.0 + jnp.tanh(inner))


def _gelu_sigmoid(x):
    xf = x.astype(jnp.float32)
    return xf / (1.0 + jnp.exp(-1.702 * xf))


def _fit_erf_poly(degree=25, lim=4.0):
    """Odd Chebyshev fit of erf on [-lim, lim] (no transcendentals at
    eval time — pure FMAs after clamping)."""
    import numpy as _np
    from scipy.special import erf as _erf

    u = _np.linspace(-lim, lim, 4001)
    cheb = _np.polynomial.chebyshev.Chebyshev.fit(u, _erf(u), degree, domain=[-lim, lim])
    poly = cheb.convert(kind=_np.polynomial.Polynomial)
    coef = poly.coef.astype(_np.float32)
    err = float(_np.max(_np.abs(poly(u) - _erf(u))))
    return coef, err


_ERF_COEF, _ERF_POLY_ERR = _fit_erf_poly()


def _gelu_poly(x):
    xf = x.astype(jnp.float32)
    u = jnp.clip(xf * (2.0 ** -0.5), -4.0, 4.0)
    acc = jnp.full_like(u, float(_ERF_COEF[-1]))
    for c in _ERF_COEF[-2::-1]:
        acc = acc * u + float(c)
    return xf * 0.5 * (1.0 + acc)


_ACTIVATIONS = {
    "mlp_nogelu": lambda x: x.astype(jnp.float32),
    "mlp_tanhgelu": _gelu_tanh,
    "mlp_siggelu": _gelu_sigmoid,
    "mlp_polygelu": _gelu_poly,
}


def _make_kernel(mode: str):
    def kernel(
        x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, bias_ref,
        wproj_ref, bproj_ref, ln2s_ref, ln2b_ref, w1_ref, b1_ref,
        w2_ref, b2_ref, o_ref,
    ):
        x = x_ref[:]
        blk, n, _ = x.shape
        dt = x.dtype

        if mode == "mlponly":
            h = x.astype(jnp.float32).reshape(blk * n, C)
        else:
            xn = _ln_f32(x, ln1s_ref[:], ln1b_ref[:]).astype(dt)
            qkv = (
                jax.lax.dot_general(
                    xn.reshape(blk * n, C), wqkv_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + bqkv_ref[:].astype(jnp.float32)
            ).astype(dt).reshape(blk, n, 3 * C)

            if mode == "noattn":
                attn_out = qkv[:, :, :C].astype(jnp.float32)
            elif mode == "allheads":
                # packed layout: (blk, heads) flattened into the single
                # batch dim Mosaic supports; head split via transpose
                # instead of per-head lane slicing
                q4 = (
                    (qkv[:, :, :C] * jnp.asarray(SCALE, dt))
                    .reshape(blk, n, HEADS, D).transpose(0, 2, 1, 3)
                    .reshape(blk * HEADS, n, D)
                )
                k4 = (
                    qkv[:, :, C : 2 * C]
                    .reshape(blk, n, HEADS, D).transpose(0, 2, 1, 3)
                    .reshape(blk * HEADS, n, D)
                )
                v4 = (
                    qkv[:, :, 2 * C :]
                    .reshape(blk, n, HEADS, D).transpose(0, 2, 1, 3)
                    .reshape(blk * HEADS, n, D)
                )
                a = jax.lax.dot_general(
                    q4, k4, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # (blk*heads, n, n)
                a = a.reshape(blk, HEADS, n, n) + bias_ref[:].astype(jnp.float32)
                a = a.reshape(blk * HEADS, n, n)
                a = a - jnp.max(a, axis=-1, keepdims=True)
                a = jnp.exp(a)
                a = a / jnp.sum(a, axis=-1, keepdims=True)
                o4 = jax.lax.dot_general(
                    a.astype(dt), v4, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # (blk*heads, n, d)
                attn_out = (
                    o4.reshape(blk, HEADS, n, D).transpose(0, 2, 1, 3)
                    .reshape(blk, n, C)
                )
            else:
                outs = []
                for i in range(HEADS):
                    q = qkv[:, :, i * D : (i + 1) * D] * jnp.asarray(SCALE, dt)
                    k = qkv[:, :, C + i * D : C + (i + 1) * D]
                    v = qkv[:, :, 2 * C + i * D : 2 * C + (i + 1) * D]
                    a = jax.lax.dot_general(
                        q, k, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )
                    a = a + bias_ref[i].astype(jnp.float32)
                    a = a - jnp.max(a, axis=-1, keepdims=True)
                    a = jnp.exp(a)
                    a = a / jnp.sum(a, axis=-1, keepdims=True)
                    outs.append(
                        jax.lax.dot_general(
                            a.astype(dt), v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32,
                        )
                    )
                attn_out = jnp.concatenate(outs, axis=-1)

            proj = (
                jax.lax.dot_general(
                    attn_out.astype(dt).reshape(blk * n, C), wproj_ref[:],
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                )
                + bproj_ref[:].astype(jnp.float32)
            )
            h = x.astype(jnp.float32).reshape(blk * n, C) + proj

        if mode == "attnonly":
            out = h
        else:
            hn = _ln_f32(h.astype(dt).reshape(blk, n, C), ln2s_ref[:], ln2b_ref[:]).astype(dt)
            m = (
                jax.lax.dot_general(
                    hn.reshape(blk * n, C), w1_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + b1_ref[:].astype(jnp.float32)
            )
            m = _ACTIVATIONS.get(mode, _gelu_exact)(m).astype(dt)
            m = (
                jax.lax.dot_general(
                    m, w2_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + b2_ref[:].astype(jnp.float32)
            )
            out = h + m
        o_ref[:] = out.reshape(blk, n, C).astype(dt)

    return kernel


@functools.partial(jax.jit, static_argnames=("mode",))
def block(x, weights, mode: str):
    def tile(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _make_kernel(mode),
        out_shape=jax.ShapeDtypeStruct((BW, N, C), x.dtype),
        grid=(BW // BLK,),
        in_specs=[
            pl.BlockSpec((BLK, N, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            tile((C,)), tile((C,)), tile((C, 3 * C)), tile((3 * C,)),
            tile((HEADS, N, N)), tile((C, C)), tile((C,)),
            tile((C,)), tile((C,)), tile((C, HIDDEN)), tile((HIDDEN,)),
            tile((HIDDEN, C)), tile((C,)),
        ],
        out_specs=pl.BlockSpec((BLK, N, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )(x, *weights)


def main():
    which = sys.argv[1:] or ["full", "noattn", "attnonly", "mlponly"]
    rng = np.random.default_rng(0)

    def w(*shape):
        return jnp.asarray(rng.standard_normal(shape, np.float32) * 0.02, DTYPE)

    weights = (
        w(C), w(C), w(C, 3 * C), w(3 * C),
        jnp.asarray(rng.standard_normal((HEADS, N, N), np.float32) * 0.02),
        w(C, C), w(C), w(C), w(C), w(C, HIDDEN), w(HIDDEN), w(HIDDEN, C), w(C),
    )
    x = w(BW, N, C)

    # parity first: allheads must equal full
    if "allheads" in which:
        a = block(x, weights, "full")
        b = block(x, weights, "allheads")
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        print(f"allheads vs full max|err|: {err:.2e}")

    for mode in which:
        @jax.jit
        def chain(x0, mode=mode):
            def body(_, c):
                return block(c, weights, mode)

            out = jax.lax.fori_loop(0, 36, body, x0)
            # scalar that data-depends on the whole chain: fetching it is
            # the only reliable sync over the axon tunnel
            # (block_until_ready is not — STATUS.md round 2)
            return jnp.sum(out.astype(jnp.float32))

        float(chain(x))  # warmup + compile
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(chain(x))
            ts.append(time.perf_counter() - t0)
        dt = min(ts) / 36
        print(f"{mode:>13}: {dt*1e3:7.3f} ms/block  ({8/(dt*36):6.1f} p/s for 36 blocks)", flush=True)


if __name__ == "__main__":
    main()

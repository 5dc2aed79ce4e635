"""Fused ResidualDenseBlock v2 — channels-major, fully tile-aligned.

Second-generation kernel for the hybrid's RRDB trunk (reference
hybridmodels_hat.py:21-58). The channel-last v1 (fused_rdb.py) was correct
but slow: with C=48/24 on the lane dimension, every im2col write landed at
a non-128 lane offset and every (rows, cols, C) -> (rows*cols, C) reshape
forced a relayout. v2 fixes the layout instead of fighting it:

- activations live as 2-D ``(C, H*W)`` — channels on sublanes (48/24/96/120
  are all multiples of the 8-sublane tile), flattened pixels on lanes
  (W=256 is a multiple of the 128-lane tile, so every row offset h*W is
  lane-aligned);
- a 3x3 conv tap (dy, dx) is a lane-aligned row-window slice (dy) plus a
  lane ROTATION with edge masking (dx) — no relayouts anywhere;
- the 9 taps write into an im2col buffer at sublane offsets t*C (aligned),
  giving ONE matmul per source with full contraction depth K = 9*C
  (432/216) and output-packed N (144/120/96/72/48 on sublanes, where
  padding granularity is 8, not 128 — the packed-N trick costs nothing
  here);
- per-conv partial sums accumulate in an fp32 buffer; bias + LeakyReLU at
  completion; intermediates are zeroed outside the true image rows so
  chained convs keep the reference's zero-padding semantics (columns are
  handled exactly by the rotation masks).

Tiles span the FULL image width (no W halo at all — the dx rotation's
zero-fill IS the conv's W zero-padding) and ``tile_h`` rows with a 5-row
halo in H only. One DMA in, one block out per grid step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lrelu2(v):
    return jnp.where(v >= 0, v, v * 0.2)


def _make_kernel(th: int, w: int, f: int, g: int, h_img: int, ext_h: int):
    n_all = 4 * g + f  # 144

    def kernel(
        x_hbm,                      # (B, f, Hp*w) HBM, zero-padded rows
        w0_ref,                     # (4g+f, 9f)
        w1_ref, w2_ref, w3_ref, w4_ref,   # (N_s, 9g)
        b_ref,                      # (4g+f, 1)
        o_ref,                      # (1, f, th*w)
        xt, srcbuf, accbuf, imcol, sem,
    ):
        b = pl.program_id(0)
        gy = pl.program_id(1)

        copy = pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(gy * th * w, ext_h * w)], xt, sem
        )
        copy.start()
        copy.wait()

        dt = xt.dtype

        def lane_iota(m):
            return jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)

        def taps_matmul(src, rows, ch, w_ref, n_out):
            """im2col (9 aligned writes) + one matmul. src: (ch, rows*w)
            value; returns (n_out, (rows-2)*w) fp32."""
            oh = rows - 2
            m = oh * w
            col = lane_iota(m) % w
            for t in range(9):
                dy, dx = t // 3, t % 3
                v = src[:, dy * w : (dy + oh) * w]
                s_w = dx - 1
                if s_w != 0:
                    v = jnp.roll(v, -s_w, axis=1)
                    edge = (col == (w - 1)) if s_w > 0 else (col == 0)
                    v = jnp.where(edge, jnp.zeros_like(v), v)
                imcol[t * ch : (t + 1) * ch, 0:m] = v
            return jax.lax.dot_general(
                w_ref[:], imcol[0 : 9 * ch, 0:m],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )

        def h_mask(m, halo):
            row = lane_iota(m) // w + gy * th - halo
            return (row >= 0) & (row < h_img)

        bias = b_ref[:].astype(jnp.float32)  # (4g+f, 1)

        # stage 0: x -> conv1..conv5 contributions
        r0, r1, r2, r3, r4 = th + 10, th + 8, th + 6, th + 4, th + 2
        y0 = taps_matmul(xt[:, 0 : r0 * w], r0, f, w0_ref, n_all)  # (144, r1*w)
        x1 = _lrelu2(y0[0:g, :] + bias[0:g])
        x1 = jnp.where(h_mask(r1 * w, 4), x1, jnp.zeros_like(x1)).astype(dt)
        srcbuf[0:g, 0 : r1 * w] = x1
        accbuf[:, :] = y0[g:n_all, w : (1 + r2) * w]  # crop r1 -> r2

        # stage 1: x1 -> conv2..conv5
        y1 = taps_matmul(srcbuf[0:g, 0 : r1 * w], r1, g, w1_ref, 3 * g + f)
        accbuf[:, :] = accbuf[:, :] + y1
        x2 = _lrelu2(accbuf[0:g, :] + bias[g : 2 * g])
        x2 = jnp.where(h_mask(r2 * w, 3), x2, jnp.zeros_like(x2)).astype(dt)
        srcbuf[g : 2 * g, w : (1 + r2) * w] = x2

        # stage 2: x2 -> conv3..conv5
        y2 = taps_matmul(srcbuf[g : 2 * g, w : (1 + r2) * w], r2, g, w2_ref, 2 * g + f)
        accbuf[g:, w : (1 + r3) * w] = accbuf[g:, w : (1 + r3) * w] + y2
        x3 = _lrelu2(accbuf[g : 2 * g, w : (1 + r3) * w] + bias[2 * g : 3 * g])
        x3 = jnp.where(h_mask(r3 * w, 2), x3, jnp.zeros_like(x3)).astype(dt)
        srcbuf[2 * g : 3 * g, 2 * w : (2 + r3) * w] = x3

        # stage 3: x3 -> conv4..conv5
        y3 = taps_matmul(srcbuf[2 * g : 3 * g, 2 * w : (2 + r3) * w], r3, g, w3_ref, g + f)
        accbuf[2 * g :, 2 * w : (2 + r4) * w] = accbuf[2 * g :, 2 * w : (2 + r4) * w] + y3
        x4 = _lrelu2(accbuf[2 * g : 3 * g, 2 * w : (2 + r4) * w] + bias[3 * g : 4 * g])
        x4 = jnp.where(h_mask(r4 * w, 1), x4, jnp.zeros_like(x4)).astype(dt)
        srcbuf[3 * g : 4 * g, 3 * w : (3 + r4) * w] = x4

        # stage 4: x4 -> conv5; assemble
        y4 = taps_matmul(srcbuf[3 * g : 4 * g, 3 * w : (3 + r4) * w], r4, g, w4_ref, f)
        x5 = accbuf[3 * g :, 3 * w : (3 + th) * w] + y4 + bias[4 * g :]
        xc = xt[:, 5 * w : (5 + th) * w].astype(jnp.float32)
        o_ref[0, :, :] = (x5 * 0.2 + xc).astype(o_ref.dtype)

    return kernel


def _pick_tile(n: int, target: int) -> int:
    t = min(target, n)
    while n % t:
        t -= 1
    return t


@functools.partial(jax.jit, static_argnames=("h", "w", "tile_h", "interpret"))
def fused_rdb_cm(
    xf: jnp.ndarray,
    kernels,
    biases,
    *,
    h: int,
    w: int,
    tile_h: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """One dense block, channels-major flat layout.

    xf: (B, F, H*W). kernels/biases: reference HWIO conv1..conv5 weights.
    Requires W % 128 == 0 (flat row offsets stay lane-aligned).
    """
    assert w % 128 == 0, w
    bsz, f, _ = xf.shape
    g = kernels[0].shape[-1]
    th = _pick_tile(h, tile_h)
    ext_h = -(-(th + 10) // 8) * 8
    dt = xf.dtype

    offs = [0, f, f + g, f + 2 * g, f + 3 * g]
    sizes = [f, g, g, g, g]
    packs = []
    for s in range(5):
        pk = jnp.concatenate(
            [kernels[i][:, :, offs[s] : offs[s] + sizes[s], :] for i in range(s, 5)],
            axis=-1,
        )
        # A[n, t*C + c] = pk[dy, dx, c, n]
        packs.append(pk.transpose(3, 0, 1, 2).reshape(pk.shape[-1], 9 * sizes[s]).astype(dt))
    bias_col = jnp.concatenate([jnp.asarray(b) for b in biases]).reshape(-1, 1).astype(jnp.float32)

    # zero-pad rows: 5 on top, ext_h - th - 5 at the bottom
    x3 = xf.reshape(bsz, f, h, w)
    x3 = jnp.pad(x3, ((0, 0), (0, 0), (5, ext_h - th - 5), (0, 0)))
    xp = x3.reshape(bsz, f, (h + ext_h - th) * w)

    kern = _make_kernel(th, w, f, g, h, ext_h)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda bb, i: (0,) * len(shape), memory_space=pltpu.VMEM)

    m0 = (th + 8) * w
    return pl.pallas_call(
        kern,
        grid=(bsz, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            wspec(packs[0].shape), wspec(packs[1].shape), wspec(packs[2].shape),
            wspec(packs[3].shape), wspec(packs[4].shape), wspec(bias_col.shape),
        ],
        out_specs=pl.BlockSpec(
            (1, f, th * w), lambda bb, i: (bb, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, f, h * w), dt),
        scratch_shapes=[
            pltpu.VMEM((f, ext_h * w), dt),                     # xt
            pltpu.VMEM((4 * g, (th + 8) * w), dt),              # srcbuf
            pltpu.VMEM((3 * g + f, (th + 6) * w), jnp.float32), # accbuf
            pltpu.VMEM((9 * f, m0), dt),                        # imcol
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, *packs, bias_col)


def fused_rrdb_trunk_cm(
    params, x: jnp.ndarray, num_rrdb: int, *, tile_h: int = 64, interpret: bool = False
) -> jnp.ndarray:
    """Whole RRDB trunk channels-major. x: (B, H, W, F) NHWC in/out; the
    trunk stays (B, F, H*W) between blocks (one transpose in, one out)."""
    bsz, h, w, f = x.shape
    xf = x.transpose(0, 3, 1, 2).reshape(bsz, f, h * w)

    def one(p, v):
        ks = [p[f"conv{i}"]["conv"]["kernel"] for i in range(1, 6)]
        bs = [p[f"conv{i}"]["conv"]["bias"] for i in range(1, 6)]
        return fused_rdb_cm(v, ks, bs, h=h, w=w, tile_h=tile_h, interpret=interpret)

    t = xf
    for r in range(num_rrdb):
        p = params[f"rrdb_trunk_{r}"]
        u = one(p["rdb1"], t)
        u = one(p["rdb2"], u)
        u = one(p["rdb3"], u)
        t = u * 0.2 + t
    return t.reshape(bsz, f, h, w).transpose(0, 2, 3, 1)

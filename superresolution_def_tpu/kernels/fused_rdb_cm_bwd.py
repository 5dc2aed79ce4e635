"""Backward kernel for the channels-major fused dense block (fused_rdb_cm).

Gives the hybrid's RRDB trunk (reference hybridmodels_hat.py:21-58) a
Pallas forward AND backward, making the fused trunk differentiable for
training. Design:

- **Recompute, not stash**: the backward kernel re-derives x1..x4 from the
  input tile in VMEM (the fused forward is ~3x faster than XLA, so the
  recompute is cheap) — no activation memory between forward and backward,
  which on the accum-16 HAT step matters more than FLOPs (the un-fused
  step does not even fit HBM without remat).
- Same channels-major layout as the forward (kernels/fused_rdb_cm.py):
  activations (C, H*W), taps as lane rotations + edge masks, h-halos by
  row masking.
- The gradient chain runs top-down: d5 = 0.2*dy, then m_k =
  lrelu'(x_k) * dx_k with dx_k a transposed conv of the already-computed
  gradient stack. Gradients live in one (4g+f, ...) stack ordered
  [m1 m2 m3 m4 d5] so each source's destination-stack is a suffix slice —
  the mirror of the forward's packed-by-source accumulator.
- Transposed convs use the SAME packed weights, tap-flipped:
  B_s[t*ch+c, n] = packs_s[n, (8-t)*ch+c]; per-tap (ch, n)x(n, m) matmuls.
- Weight grads: dpacks_s = m_core_s @ im2col(src_s)^T — one matmul per
  source per tile, accumulated across the sequential TPU grid into the
  same output block. Bias grads are row-sums of the core gradient stack.

Extents (tile core = th rows): the deepest chain x->x1->x2->x3->x4->m4
needs an 8-row halo on x (th+16) and a 5-row halo on dy (th+10); each
derived stage erodes by 2 rows exactly like the forward.

bf16 gradient tolerance: in bf16 mode the weight-grad matmuls cast the
f32 cotangent stack to bf16 before the dot (MXU input dtype), so
gradients match the f32 chain only to bf16 precision. The exactness
tests (tests/test_fused_rdb_cm_bwd.py) run in fp32 where the kernel is
bit-consistent with autodiff of the reference chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_rdb_cm import _lrelu2, _pick_tile, fused_rdb_cm


def pack_weights(kernels, dtype):
    """Reference HWIO conv1..conv5 -> packed-by-source matmul weights.

    packs[s] has shape (n_s, 9*ch_s): n_s = total out-channels of the convs
    that read source s (convs s+1..5), A[n, t*ch + c] = K_i[dy, dx, c_s, n].
    """
    f = kernels[0].shape[2]
    g = kernels[0].shape[3]
    offs = [0, f, f + g, f + 2 * g, f + 3 * g]
    sizes = [f, g, g, g, g]
    packs = []
    for s in range(5):
        pk = jnp.concatenate(
            [kernels[i][:, :, offs[s] : offs[s] + sizes[s], :] for i in range(s, 5)],
            axis=-1,
        )
        packs.append(
            pk.transpose(3, 0, 1, 2).reshape(pk.shape[-1], 9 * sizes[s]).astype(dtype)
        )
    return packs


def unpack_weight_grads(dpacks, f, g):
    """Inverse of :func:`pack_weights` for gradients -> 5 HWIO kernel grads."""
    sizes = [f, g, g, g, g]
    outs = [g, g, g, g, f]  # out-channels of conv1..conv5
    dkernels = []
    for i in range(5):
        parts = []
        for s in range(i + 1):
            # conv i+1 occupies rows sum(outs[s:i]) .. +outs[i] of pack s
            row0 = sum(outs[j] for j in range(s, i))
            blk = dpacks[s][row0 : row0 + outs[i], :]  # (n_i, 9*ch_s)
            # A[n, t*ch+c] -> K[dy, dx, c, n]
            parts.append(
                blk.reshape(outs[i], 3, 3, sizes[s]).transpose(1, 2, 3, 0)
            )
        dkernels.append(jnp.concatenate(parts, axis=2))
    return dkernels


def _flip_packs(packs, dtype):
    """B_s[t*ch + c, n] = packs_s[n, (8-t)*ch + c] (tap-flipped transpose)."""
    bs = []
    for pk in packs:
        n, k9 = pk.shape
        ch = k9 // 9
        b = pk.reshape(n, 9, ch)[:, ::-1, :]          # flip taps
        b = b.transpose(1, 2, 0).reshape(9 * ch, n)   # (9*ch, n)
        bs.append(b.astype(dtype))
    return bs


def _make_bwd_kernel(th: int, w: int, f: int, g: int, h_img: int):
    n_all = 4 * g + f

    def kernel(
        x_hbm,                       # (B, f, Hp8*w) HBM, 8-row top pad
        dy_hbm,                      # (B, f, Hp5*w) HBM, 5-row top pad
        w0_ref, w1_ref, w2_ref, w3_ref, w4_ref,   # packs (n_s, 9*ch_s)
        b0_ref, b1_ref, b2_ref, b3_ref, b4_ref,   # flipped (9*ch_s, n_s)
        bias_ref,                    # (4g+f, 1)
        dx_ref,                      # out: (1, f, th*w)
        dp0_ref, dp1_ref, dp2_ref, dp3_ref, dp4_ref,  # out: dpacks, f32
        db_ref,                      # out: (4g+f, 1) f32
        xt, dyt, srcbuf, accbuf, mstack, imcol, sem, sem2,
    ):
        b = pl.program_id(0)
        gy = pl.program_id(1)
        e0 = -(-(th + 16) // 8) * 8
        ed = -(-(th + 10) // 8) * 8

        cp = pltpu.make_async_copy(x_hbm.at[b, :, pl.ds(gy * th * w, e0 * w)], xt, sem)
        cp.start()
        cp2 = pltpu.make_async_copy(dy_hbm.at[b, :, pl.ds(gy * th * w, ed * w)], dyt, sem2)
        cp2.start()
        cp.wait()
        cp2.wait()

        dt = xt.dtype
        f32 = jnp.float32

        def lane_iota(m):
            return jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)

        def h_mask(m, halo):
            row = lane_iota(m) // w + gy * th - halo
            return (row >= 0) & (row < h_img)

        def taps_matmul(src, rows, ch, w_ref):
            """forward conv: im2col + one matmul. -> (n, (rows-2)*w) f32."""
            oh = rows - 2
            m = oh * w
            col = lane_iota(m) % w
            for t in range(9):
                dy_, dx_ = t // 3, t % 3
                v = src[:, dy_ * w : (dy_ + oh) * w]
                s_w = dx_ - 1
                if s_w != 0:
                    v = jnp.roll(v, -s_w, axis=1)
                    edge = (col == (w - 1)) if s_w > 0 else (col == 0)
                    v = jnp.where(edge, jnp.zeros_like(v), v)
                imcol[t * ch : (t + 1) * ch, 0:m] = v
            return jax.lax.dot_general(
                w_ref[:], imcol[0 : 9 * ch, 0:m],
                (((1,), (0,)), ((), ())), preferred_element_type=f32,
            )

        def conv_t(m_in, rows, n_ch, b_ref, out_ch):
            """transposed conv of the gradient stack: 9 per-tap matmuls.
            m_in: (n_ch, rows*w) f32 value -> (out_ch, (rows-2)*w) f32."""
            oh = rows - 2
            m = oh * w
            col = lane_iota(m) % w
            acc = jnp.zeros((out_ch, m), f32)
            for t in range(9):
                dy_, dx_ = t // 3, t % 3
                v = m_in[:, dy_ * w : (dy_ + oh) * w]
                s_w = dx_ - 1
                if s_w != 0:
                    v = jnp.roll(v, -s_w, axis=1)
                    edge = (col == (w - 1)) if s_w > 0 else (col == 0)
                    v = jnp.where(edge, jnp.zeros_like(v), v)
                bt = b_ref[t * out_ch : (t + 1) * out_ch, :]
                acc = acc + jax.lax.dot_general(
                    bt, v.astype(dt), (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
            return acc

        bias = bias_ref[:].astype(f32)

        # ---- forward recompute (halo 8; mirrors fused_rdb_cm stages) ------
        r0, r1, r2, r3, r4 = th + 16, th + 14, th + 12, th + 10, th + 8
        y0 = taps_matmul(xt[:, 0 : r0 * w], r0, f, w0_ref)       # (144, r1*w)
        x1 = _lrelu2(y0[0:g, :] + bias[0:g])
        x1 = jnp.where(h_mask(r1 * w, 7), x1, jnp.zeros_like(x1)).astype(dt)
        srcbuf[0:g, 0 : r1 * w] = x1
        accbuf[:, :] = y0[g:n_all, w : (1 + r2) * w]

        y1 = taps_matmul(srcbuf[0:g, 0 : r1 * w], r1, g, w1_ref)
        accbuf[:, :] = accbuf[:, :] + y1
        x2 = _lrelu2(accbuf[0:g, :] + bias[g : 2 * g])
        x2 = jnp.where(h_mask(r2 * w, 6), x2, jnp.zeros_like(x2)).astype(dt)
        srcbuf[g : 2 * g, w : (1 + r2) * w] = x2

        y2 = taps_matmul(srcbuf[g : 2 * g, w : (1 + r2) * w], r2, g, w2_ref)
        accbuf[g:, w : (1 + r3) * w] = accbuf[g:, w : (1 + r3) * w] + y2
        x3 = _lrelu2(accbuf[g : 2 * g, w : (1 + r3) * w] + bias[2 * g : 3 * g])
        x3 = jnp.where(h_mask(r3 * w, 5), x3, jnp.zeros_like(x3)).astype(dt)
        srcbuf[2 * g : 3 * g, 2 * w : (2 + r3) * w] = x3

        y3 = taps_matmul(srcbuf[2 * g : 3 * g, 2 * w : (2 + r3) * w], r3, g, w3_ref)
        accbuf[2 * g :, 2 * w : (2 + r4) * w] = accbuf[2 * g :, 2 * w : (2 + r4) * w] + y3
        x4 = _lrelu2(accbuf[2 * g : 3 * g, 2 * w : (2 + r4) * w] + bias[3 * g : 4 * g])
        x4 = jnp.where(h_mask(r4 * w, 4), x4, jnp.zeros_like(x4)).astype(dt)
        srcbuf[3 * g : 4 * g, 3 * w : (3 + r4) * w] = x4

        # ---- gradient stack [m1 m2 m3 m4 d5], col 0 <-> image row -5 -----
        def lgrad(xk):
            # compare in f32: some Mosaic targets reject bf16 cmpf vectors
            xv = xk.astype(f32)
            return jnp.where(xv >= 0, jnp.full_like(xv, 1.0), jnp.full_like(xv, 0.2))

        d5 = dyt[:, 0 : (th + 10) * w].astype(f32) * 0.2
        d5 = jnp.where(h_mask((th + 10) * w, 5), d5, jnp.zeros_like(d5))
        mstack[4 * g : n_all, 0 : (th + 10) * w] = d5

        # m4 (rows -4 .. th+4), from convT of [d5]
        dx4 = conv_t(mstack[4 * g : n_all, 0 : (th + 10) * w], th + 10, f, b4_ref, g)
        m4 = lgrad(srcbuf[3 * g : 4 * g, 3 * w : (3 + th + 8) * w]) * dx4
        m4 = jnp.where(h_mask((th + 8) * w, 4), m4, jnp.zeros_like(m4))
        mstack[3 * g : 4 * g, w : (1 + th + 8) * w] = m4

        # m3 (rows -3 .. th+3), convT of [m4 d5] sliced rows -4..th+4
        dx3 = conv_t(mstack[3 * g :, w : (1 + th + 8) * w], th + 8, g + f, b3_ref, g)
        m3 = lgrad(srcbuf[2 * g : 3 * g, 4 * w : (4 + th + 6) * w]) * dx3
        m3 = jnp.where(h_mask((th + 6) * w, 3), m3, jnp.zeros_like(m3))
        mstack[2 * g : 3 * g, 2 * w : (2 + th + 6) * w] = m3

        # m2 (rows -2 .. th+2)
        dx2 = conv_t(mstack[2 * g :, 2 * w : (2 + th + 6) * w], th + 6, 2 * g + f, b2_ref, g)
        m2 = lgrad(srcbuf[g : 2 * g, 5 * w : (5 + th + 4) * w]) * dx2
        m2 = jnp.where(h_mask((th + 4) * w, 2), m2, jnp.zeros_like(m2))
        mstack[g : 2 * g, 3 * w : (3 + th + 4) * w] = m2

        # m1 (rows -1 .. th+1)
        dx1 = conv_t(mstack[g:, 3 * w : (3 + th + 4) * w], th + 4, 3 * g + f, b1_ref, g)
        m1 = lgrad(srcbuf[0:g, 6 * w : (6 + th + 2) * w]) * dx1
        m1 = jnp.where(h_mask((th + 2) * w, 1), m1, jnp.zeros_like(m1))
        mstack[0:g, 4 * w : (4 + th + 2) * w] = m1

        # dx core rows [0, th)
        dxv = conv_t(mstack[:, 4 * w : (4 + th + 2) * w], th + 2, n_all, b0_ref, f)
        dxv = dxv + dyt[:, 5 * w : (5 + th) * w].astype(f32)
        dx_ref[0, :, :] = dxv.astype(dx_ref.dtype)

        # ---- weight/bias grads over this tile's core rows -----------------
        first = (b == 0) & (gy == 0)
        mcore = mstack[:, 5 * w : (5 + th) * w]  # rows [0, th), all members

        @pl.when(first)
        def _init():
            dp0_ref[:, :] = jnp.zeros_like(dp0_ref)
            dp1_ref[:, :] = jnp.zeros_like(dp1_ref)
            dp2_ref[:, :] = jnp.zeros_like(dp2_ref)
            dp3_ref[:, :] = jnp.zeros_like(dp3_ref)
            dp4_ref[:, :] = jnp.zeros_like(dp4_ref)
            db_ref[:, :] = jnp.zeros_like(db_ref)

        db_ref[:, :] = db_ref[:, :] + jnp.sum(mcore, axis=1, keepdims=True)

        def dw_src(src_slice, ch, m_rows_from, dp_ref):
            """im2col of the source over out rows [0, th) then one matmul
            against the matching gradient-stack suffix core."""
            oh = th
            m = oh * w
            col = lane_iota(m) % w
            for t in range(9):
                dy_, dx_ = t // 3, t % 3
                v = src_slice[:, dy_ * w : (dy_ + oh) * w]
                s_w = dx_ - 1
                if s_w != 0:
                    v = jnp.roll(v, -s_w, axis=1)
                    edge = (col == (w - 1)) if s_w > 0 else (col == 0)
                    v = jnp.where(edge, jnp.zeros_like(v), v)
                imcol[t * ch : (t + 1) * ch, 0:m] = v
            contrib = jax.lax.dot_general(
                mcore[m_rows_from:, :].astype(dt), imcol[0 : 9 * ch, 0:m],
                (((1,), (1,)), ((), ())), preferred_element_type=f32,
            )  # (n_s, 9*ch)
            dp_ref[:, :] = dp_ref[:, :] + contrib

        # source slices at rows [-1, th+1)
        dw_src(xt[:, 7 * w : (7 + th + 2) * w], f, 0, dp0_ref)
        dw_src(srcbuf[0:g, 6 * w : (6 + th + 2) * w], g, g, dp1_ref)
        dw_src(srcbuf[g : 2 * g, 6 * w : (6 + th + 2) * w], g, 2 * g, dp2_ref)
        dw_src(srcbuf[2 * g : 3 * g, 6 * w : (6 + th + 2) * w], g, 3 * g, dp3_ref)
        dw_src(srcbuf[3 * g : 4 * g, 6 * w : (6 + th + 2) * w], g, 4 * g, dp4_ref)

    return kernel


@functools.partial(jax.jit, static_argnames=("h", "w", "tile_h", "interpret"))
def fused_rdb_cm_bwd(
    xf, dy, kernels, biases, *, h, w, tile_h=32, interpret=False
):
    """VJP of one channels-major dense block.

    xf, dy: (B, F, H*W). Returns (dx (B,F,H*W), dkernels HWIO list, dbiases).
    """
    assert w % 128 == 0, w
    bsz, f, _ = xf.shape
    g = kernels[0].shape[-1]
    th = _pick_tile(h, tile_h)
    e0 = -(-(th + 16) // 8) * 8
    ed = -(-(th + 10) // 8) * 8
    dt = xf.dtype

    packs = pack_weights(kernels, dt)
    flips = _flip_packs(packs, dt)
    bias_col = jnp.concatenate([jnp.asarray(b) for b in biases]).reshape(-1, 1).astype(jnp.float32)

    x3d = xf.reshape(bsz, f, h, w)
    x3d = jnp.pad(x3d, ((0, 0), (0, 0), (8, e0 - th - 8), (0, 0)))
    xp = x3d.reshape(bsz, f, (h + e0 - th) * w)
    dy3 = dy.reshape(bsz, f, h, w)
    dy3 = jnp.pad(dy3, ((0, 0), (0, 0), (5, ed - th - 5), (0, 0)))
    dyp = dy3.reshape(bsz, f, (h + ed - th) * w)

    kern = _make_bwd_kernel(th, w, f, g, h)
    n_all = 4 * g + f

    def wspec(shape):
        return pl.BlockSpec(shape, lambda bb, i: (0,) * len(shape), memory_space=pltpu.VMEM)

    dp_shapes = [pk.shape for pk in packs]
    out_shape = (
        jax.ShapeDtypeStruct((bsz, f, h * w), dt),
        *[jax.ShapeDtypeStruct(s, jnp.float32) for s in dp_shapes],
        jax.ShapeDtypeStruct((n_all, 1), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, f, th * w), lambda bb, i: (bb, 0, i), memory_space=pltpu.VMEM),
        *[wspec(s) for s in dp_shapes],
        wspec((n_all, 1)),
    )

    r1 = th + 14
    outs = pl.pallas_call(
        kern,
        grid=(bsz, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            *[wspec(pk.shape) for pk in packs],
            *[wspec(fl.shape) for fl in flips],
            wspec(bias_col.shape),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((f, e0 * w), dt),                        # xt
            pltpu.VMEM((f, ed * w), dt),                        # dyt
            pltpu.VMEM((4 * g, r1 * w), dt),                    # srcbuf
            pltpu.VMEM((3 * g + f, (th + 12) * w), jnp.float32),  # accbuf
            pltpu.VMEM((n_all, (th + 10) * w), jnp.float32),    # mstack
            pltpu.VMEM((9 * f, r1 * w), dt),                    # imcol
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, dyp, *packs, *flips, bias_col)

    dx = outs[0]
    dpacks = outs[1:6]
    db = outs[6][:, 0]
    dkernels = unpack_weight_grads(dpacks, f, g)
    sizes_out = [g, g, g, g, f]
    dbs = []
    o = 0
    for s in sizes_out:
        dbs.append(db[o : o + s])
        o += s
    return dx, dkernels, dbs


def make_rdb_cm_ad(h: int, w: int, tile_h: int = 64, bwd_tile_h: int = 32,
                   interpret: bool = False):
    """Differentiable fused dense block: pallas forward + pallas backward.

    Returns fn(xf, kernels, biases) -> (B, F, H*W) with a custom VJP wired
    to :func:`fused_rdb_cm_bwd` (recompute backward; no residual stash).
    Gradients w.r.t. xf, kernels and biases; fp32 weight/bias grads.
    """

    @jax.custom_vjp
    def rdb(xf, kernels, biases):
        return fused_rdb_cm(xf, kernels, biases, h=h, w=w, tile_h=tile_h,
                            interpret=interpret)

    def fwd(xf, kernels, biases):
        out = fused_rdb_cm(xf, kernels, biases, h=h, w=w, tile_h=tile_h,
                           interpret=interpret)
        return out, (xf, tuple(kernels), tuple(biases))

    def bwd(res, dy):
        xf, kernels, biases = res
        dx, dks, dbs = fused_rdb_cm_bwd(
            xf, dy, list(kernels), list(biases), h=h, w=w, tile_h=bwd_tile_h,
            interpret=interpret,
        )
        dks = [dk.astype(k.dtype) for dk, k in zip(dks, kernels)]
        dbs = [dbv.astype(b.dtype) for dbv, b in zip(dbs, biases)]
        return dx, tuple(dks), tuple(dbs)

    rdb.defvjp(fwd, bwd)
    return rdb


def fused_rrdb_trunk_cm_ad(
    params, x: jnp.ndarray, num_rrdb: int, *, tile_h: int = 64,
    bwd_tile_h: int = 32, interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable fused RRDB trunk. x: (B, H, W, F) NHWC in/out.

    Same structure as fused_rrdb_trunk_cm but every dense block carries the
    pallas custom VJP, so the whole trunk trains through the fused kernels
    (forward 2.9x XLA; backward recomputes in-VMEM — no activation stash).
    """
    bsz, h, w, f = x.shape
    rdb = make_rdb_cm_ad(h, w, tile_h=tile_h, bwd_tile_h=bwd_tile_h,
                         interpret=interpret)
    t = x.transpose(0, 3, 1, 2).reshape(bsz, f, h * w)
    for r in range(num_rrdb):
        p = params[f"rrdb_trunk_{r}"]
        u = t
        for sub in ("rdb1", "rdb2", "rdb3"):
            ks = tuple(p[sub][f"conv{i}"]["conv"]["kernel"] for i in range(1, 6))
            bs = tuple(p[sub][f"conv{i}"]["conv"]["bias"] for i in range(1, 6))
            u = rdb(u, ks, bs)
        t = u * 0.2 + t
    return t.reshape(bsz, f, h, w).transpose(0, 2, 3, 1)

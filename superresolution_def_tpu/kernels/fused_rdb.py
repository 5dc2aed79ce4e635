"""Fused ResidualDenseBlock — the whole 5-conv dense block in VMEM.

The hybrid's RRDB trunk (reference hybridmodels_hat.py:21-58) is the
dominant cost of HybridHATRealESRGAN: 36 dense blocks, each five 3x3 convs
with 24/48 output channels. Run conv-by-conv, every intermediate round-trips
HBM and every matmul uses <=37% of the MXU's 128 lanes. This kernel executes
one whole dense block per spatial tile with everything resident in VMEM:

- the input tile is DMA'd from HBM once with a 5-pixel halo (one halo pixel
  per chained conv);
- each source tensor (x, x1..x4) is expanded to im2col patches IN VMEM
  (contraction depth 9*C = 432/216, so the MXU K dimension is full), and
  multiplied against OUTPUT-PACKED weights: the source's contributions to
  every later conv fuse into one wide matmul (N = 144/120/96/72/48 instead
  of five matmuls at N = 24/48) — the same reassociation as
  models.hybrid.dense_block_packed, same math, same FLOPs;
- per-conv partial sums accumulate in an fp32 VMEM buffer; bias + LeakyReLU
  run at full precision when each conv completes;
- intermediates are zeroed outside the true image border so chained convs
  see exactly the reference's zero-padding semantics at image edges.

HBM traffic per block drops from ~9 tensor round-trips to in + out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lrelu2(v):
    return jnp.where(v >= 0, v, v * 0.2)


def _make_rdb_kernel(
    tile_h: int, tile_w: int, f: int, g: int, h_img: int, w_img: int,
    tap_matmul: bool = False,
):
    """Kernel for one (batch, tile_row, tile_col) grid step.

    Scratch layout (extents include shrinking halos; Ht=tile_h, Wt=tile_w):
      xt      (Ht+10, Wt+10, f)   bf16/f32  input tile (halo 5)
      srcbuf  (Ht+8,  Wt+8, 4g)   x1..x4, center-aligned per extent
      accbuf  (Ht+6,  Wt+6, 3g+f) fp32 partial sums for conv2..conv5
    """

    def kernel(
        x_hbm,                    # (B, H+10, W+10, f)  ANY/HBM
        w0_ref,                   # (9f, f+4g? no: 9f, 4g+f) packed source-x weights
        w1_ref, w2_ref, w3_ref, w4_ref,   # (9g, N_s) packed weights
        b_ref,                    # (4g+f,) biases [b1|b2|b3|b4|b5]
        o_ref,                    # (1, Ht, Wt, f) output block
        xt, srcbuf, accbuf, imbuf, sem,
    ):
        b = pl.program_id(0)
        gy = pl.program_id(1)
        gx = pl.program_id(2)

        # --- DMA the haloed input tile ------------------------------------
        # the W (sublane) slice extent must be 8-aligned; xt is padded to
        # dma_w >= tile_w+10 and only the first tile_w+10 columns are used
        dma_w = xt.shape[1]
        copy = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(gy * tile_h, tile_h + 10), pl.ds(gx * tile_w, dma_w), :],
            xt,
            sem,
        )
        copy.start()
        copy.wait()

        dt = xt.dtype
        ht, wt = tile_h, tile_w

        def border_mask(eh, ew, halo):
            """1.0 inside the true image, 0.0 in the halo beyond its border.
            Built as 3-D iotas directly — mosaic cannot reshape 2D->3D masks."""
            r = jax.lax.broadcasted_iota(jnp.int32, (eh, ew, 1), 0) + gy * ht - halo
            c = jax.lax.broadcasted_iota(jnp.int32, (eh, ew, 1), 1) + gx * wt - halo
            return (r >= 0) & (r < h_img) & (c >= 0) & (c < w_img)

        def im2col(src, eh, ew, ch):
            """Write 3x3 patches of src (eh, ew, ch) into imbuf; returns the
            (M, 9*ch) view with M = (eh-2)*(ew-2)."""
            m = (eh - 2) * (ew - 2)
            for t in range(9):
                dy, dx = t // 3, t % 3
                imbuf[0:m, t * ch : (t + 1) * ch] = src[
                    dy : dy + eh - 2, dx : dx + ew - 2, :
                ].reshape(m, ch)
            return imbuf[0:m, 0 : 9 * ch]

        def mm(a, w):
            return jax.lax.dot_general(
                a, w[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )

        def conv_packed(src, eh, ew, ch, w_ref):
            """conv as im2col matmul (default) or 9 tap-accumulated matmuls
            (tap_matmul=True: no patch buffer, K=ch per tap)."""
            if not tap_matmul:
                return mm(im2col(src, eh, ew, ch), w_ref)
            oh, ow = eh - 2, ew - 2
            m = oh * ow
            acc = None
            for t in range(9):
                dy, dx = t // 3, t % 3
                a = src[dy : dy + oh, dx : dx + ow, :].reshape(m, ch)
                y = jax.lax.dot_general(
                    a, w_ref[t * ch : (t + 1) * ch, :],
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                )
                acc = y if acc is None else acc + y
            return acc

        bias = b_ref[:].astype(jnp.float32)

        # --- stage 0: source x -> contributions to conv1..conv5 -----------
        e0h, e0w = ht + 10, wt + 10
        y0 = conv_packed(xt[:, 0:e0w, 0:f], e0h, e0w, f, w0_ref)  # (M0, g*4+f) fp32
        m0h, m0w = e0h - 2, e0w - 2                     # = ht+8
        y0 = y0.reshape(m0h, m0w, 4 * g + f)
        x1 = _lrelu2(y0[:, :, 0:g] + bias[0:g])
        x1 = (x1 * border_mask(m0h, m0w, 4).astype(jnp.float32)).astype(dt)
        srcbuf[:, :, 0:g] = x1
        # conv2..conv5 partials, cropped to the acc extent (halo 3)
        accbuf[:, :, :] = y0[1 : 1 + ht + 6, 1 : 1 + wt + 6, g:]

        # --- stage 1: source x1 -> conv2..conv5 ---------------------------
        e1h, e1w = ht + 8, wt + 8
        y1 = conv_packed(srcbuf[:, :, 0:g], e1h, e1w, g, w1_ref).reshape(ht + 6, wt + 6, 3 * g + f)
        accbuf[:, :, :] = accbuf[:, :, :] + y1
        x2 = _lrelu2(accbuf[:, :, 0:g] + bias[g : 2 * g])
        x2 = (x2 * border_mask(ht + 6, wt + 6, 3).astype(jnp.float32)).astype(dt)
        srcbuf[1 : 1 + ht + 6, 1 : 1 + wt + 6, g : 2 * g] = x2

        # --- stage 2: source x2 -> conv3..conv5 ---------------------------
        y2 = conv_packed(srcbuf[1 : 1 + ht + 6, 1 : 1 + wt + 6, g : 2 * g], ht + 6, wt + 6, g, w2_ref).reshape(ht + 4, wt + 4, 2 * g + f)
        accbuf[1 : 1 + ht + 4, 1 : 1 + wt + 4, g:] = (
            accbuf[1 : 1 + ht + 4, 1 : 1 + wt + 4, g:] + y2
        )
        x3 = _lrelu2(
            accbuf[1 : 1 + ht + 4, 1 : 1 + wt + 4, g : 2 * g] + bias[2 * g : 3 * g]
        )
        x3 = (x3 * border_mask(ht + 4, wt + 4, 2).astype(jnp.float32)).astype(dt)
        srcbuf[2 : 2 + ht + 4, 2 : 2 + wt + 4, 2 * g : 3 * g] = x3

        # --- stage 3: source x3 -> conv4..conv5 ---------------------------
        y3 = conv_packed(srcbuf[2 : 2 + ht + 4, 2 : 2 + wt + 4, 2 * g : 3 * g], ht + 4, wt + 4, g, w3_ref).reshape(ht + 2, wt + 2, g + f)
        accbuf[2 : 2 + ht + 2, 2 : 2 + wt + 2, 2 * g :] = (
            accbuf[2 : 2 + ht + 2, 2 : 2 + wt + 2, 2 * g :] + y3
        )
        x4 = _lrelu2(
            accbuf[2 : 2 + ht + 2, 2 : 2 + wt + 2, 2 * g : 3 * g] + bias[3 * g : 4 * g]
        )
        x4 = (x4 * border_mask(ht + 2, wt + 2, 1).astype(jnp.float32)).astype(dt)
        srcbuf[3 : 3 + ht + 2, 3 : 3 + wt + 2, 3 * g : 4 * g] = x4

        # --- stage 4: source x4 -> conv5; assemble output -----------------
        y4 = conv_packed(srcbuf[3 : 3 + ht + 2, 3 : 3 + wt + 2, 3 * g : 4 * g], ht + 2, wt + 2, g, w4_ref).reshape(ht, wt, f)
        x5 = (
            accbuf[3 : 3 + ht, 3 : 3 + wt, 3 * g :]
            + y4
            + bias[4 * g : 4 * g + f]
        )
        xc = xt[5 : 5 + ht, 5 : 5 + wt, 0:f].astype(jnp.float32)
        o_ref[0, :, :, :] = (x5 * 0.2 + xc).astype(o_ref.dtype)

    return kernel


def _pick_tile(n: int, target: int) -> int:
    t = min(target, n)
    while n % t:
        t -= 1
    return t


@functools.partial(
    jax.jit, static_argnames=("tile_h", "tile_w", "tap_matmul", "interpret")
)
def fused_rdb(
    x: jnp.ndarray,
    kernels,
    biases,
    *,
    tile_h: int = 64,
    tile_w: int = 32,
    tap_matmul: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """One ResidualDenseBlock forward (reference hybridmodels_hat.py:21-44).

    x: (B, H, W, F). kernels: conv1..conv5 weights in reference HWIO shapes
    (3,3,F,G), (3,3,F+G,G), ..., (3,3,F+4G,F); biases: matching (Cout,).
    """
    b, h, w, f = x.shape
    g = kernels[0].shape[-1]
    th = _pick_tile(h, tile_h)
    tw = _pick_tile(w, tile_w)
    dt = x.dtype

    offs = [0, f, f + g, f + 2 * g, f + 3 * g]
    sizes = [f, g, g, g, g]
    packs = []
    for s in range(5):
        pk = jnp.concatenate(
            [kernels[i][:, :, offs[s] : offs[s] + sizes[s], :] for i in range(s, 5)],
            axis=-1,
        )
        packs.append(pk.reshape(9 * sizes[s], pk.shape[-1]).astype(dt))
    bias_cat = jnp.concatenate([jnp.asarray(bi) for bi in biases]).astype(jnp.float32)

    # DMA slices must be tile-aligned: sublane (W) extents to 8, lane (C)
    # extents to 128 — over-pad W on the right and channels up to 128; the
    # kernel reads the (tw+10, f) logical region
    dma_w = -(-(tw + 10) // 8) * 8
    f_pad = -(-f // 128) * 128
    xp = jnp.pad(x, ((0, 0), (5, 5), (5, dma_w - tw - 5), (0, f_pad - f)))

    m0 = (th + 8) * (tw + 8)
    grid = (b, h // th, w // tw)
    kern = _make_rdb_kernel(th, tw, f, g, h, w, tap_matmul=tap_matmul)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda bb, i, j: (0,) * len(shape), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            wspec(packs[0].shape), wspec(packs[1].shape), wspec(packs[2].shape),
            wspec(packs[3].shape), wspec(packs[4].shape),
            wspec(bias_cat.shape),
        ],
        out_specs=pl.BlockSpec(
            (1, th, tw, f), lambda bb, i, j: (bb, i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, f), dt),
        scratch_shapes=[
            pltpu.VMEM((th + 10, dma_w, f_pad), dt),      # xt (W/C tile-aligned)
            pltpu.VMEM((th + 8, tw + 8, 4 * g), dt),      # srcbuf
            pltpu.VMEM((th + 6, tw + 6, 3 * g + f), jnp.float32),  # accbuf
            pltpu.VMEM((m0, 9 * f), dt),                  # imbuf
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            # default scoped limit is 16MB; v5e VMEM is far larger and the
            # in-kernel fp32 matmul results push the stack past it
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, *packs, bias_cat)


def fused_rrdb_trunk(
    params, x: jnp.ndarray, num_rrdb: int, *, tile_h: int = 64, tile_w: int = 32,
    tap_matmul: bool = False, interpret: bool = False,
) -> jnp.ndarray:
    """The hybrid's whole RRDB trunk through the fused kernel.

    params: the HybridHATRealESRGAN params tree (rrdb_trunk_N/rdbM/convK/conv).
    """
    def one(p, v):
        ks = [p[f"conv{i}"]["conv"]["kernel"] for i in range(1, 6)]
        bs = [p[f"conv{i}"]["conv"]["bias"] for i in range(1, 6)]
        return fused_rdb(v, ks, bs, tile_h=tile_h, tile_w=tile_w,
                         tap_matmul=tap_matmul, interpret=interpret)

    t = x
    for r in range(num_rrdb):
        p = params[f"rrdb_trunk_{r}"]
        u = one(p["rdb1"], t)
        u = one(p["rdb2"], u)
        u = one(p["rdb3"], u)
        t = u * 0.2 + t
    return t

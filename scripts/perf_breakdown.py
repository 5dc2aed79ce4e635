"""Op-class / component time breakdown on the real chip (chained timing).

Writes the measurements that PERF.md cites. Components are timed as
separately-jitted chained loops (each iteration's input depends on the
previous output) because per-op profiling over the axon tunnel is
unreliable (see STATUS.md environment notes).

Usage:
  python scripts/perf_breakdown.py --what hybrid   # HAT vs RRDB vs head
  python scripts/perf_breakdown.py --what swin     # fused vs xla, per stage
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")


def chained_time(fn, x, n=12, reps=3):
    """Median end-to-end time of n chained applications of fn.

    Syncs by fetching a scalar that data-depends on the final iteration —
    bare block_until_ready does NOT reliably wait over the axon tunnel
    (STATUS.md; round-2 timing-artifact correction)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(x0):
        def body(_, c):
            return fn(c)

        out = jax.lax.fori_loop(0, n, body, x0)
        return jnp.sum(out.astype(jnp.float32))

    float(jax.device_get(loop(x)))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jax.device_get(loop(x)))
        times.append(time.perf_counter() - t0)
    return min(times) / n


def hybrid_breakdown(batch=8, dtype_name="bf16"):
    import jax
    import jax.numpy as jnp

    from superresolution_def_tpu.models import HybridHATRealESRGAN

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    model = HybridHATRealESRGAN(
        img_size=128, in_chans=1, embed_dim=90, depths=(6, 6, 6, 6),
        num_heads=(6, 6, 6, 6), window_size=8, upscale=4,
        num_rrdb=12, num_feat=48, num_grow_ch=24, dtype=dtype,
    )
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 128, 128, 1), jnp.float32))["params"]

    from superresolution_def_tpu.kernels.fused_hat import _conv3

    results = {}

    # full model, XLA
    def full_xla(x):
        out = model.apply({"params": params}, x.astype(dtype), True)
        return out[:, ::4, ::4, :].astype(x.dtype)

    results["full_xla"] = chained_time(full_xla, jnp.zeros((batch, 128, 128, 1), dtype))

    # RRDB trunk only, at the HAT-output shape (batch, 256, 256, 48)
    def rdb(p, x):
        def lrelu2(v):
            return jnp.where(v >= 0, v, v * 0.2)
        x1 = lrelu2(_conv3(p["conv1"], x))
        x2 = lrelu2(_conv3(p["conv2"], jnp.concatenate([x, x1], -1)))
        x3 = lrelu2(_conv3(p["conv3"], jnp.concatenate([x, x1, x2], -1)))
        x4 = lrelu2(_conv3(p["conv4"], jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = _conv3(p["conv5"], jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x5 * 0.2 + x

    def trunk(x):
        t = x
        for r in range(12):
            p = params[f"rrdb_trunk_{r}"]
            t = rdb(p["rdb1"], t)
            t = rdb(p["rdb2"], t)
            t = rdb(p["rdb3"], t)
        return t

    xt = jnp.zeros((batch, 256, 256, 48), dtype)
    results["rrdb_trunk_x12"] = chained_time(trunk, xt)

    # variants: packed forward with bf16 partial sums, vs the reference
    # concat formulation (what round-1 shipped)
    from superresolution_def_tpu.models.hybrid import dense_block_packed

    def rdb_packed_bf16(p, x):
        ks = [p[f"conv{i}"]["conv"]["kernel"] for i in range(1, 6)]
        bs = [p[f"conv{i}"]["conv"]["bias"] for i in range(1, 6)]
        f, g = ks[0].shape[2], ks[0].shape[3]
        offs = [0, f, f + g, f + 2 * g, f + 3 * g]
        sizes = [f, g, g, g, g]

        def conv(v, k):
            return jax.lax.conv_general_dilated(
                v.astype(dtype), k.astype(dtype), (1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        acc = [None] * 5
        cur = x
        for s in range(5):
            pack = jnp.concatenate(
                [ks[i][:, :, offs[s] : offs[s] + sizes[s], :] for i in range(s, 5)], -1
            )
            y = conv(cur, pack)
            pos = 0
            for i in range(s, 5):
                w = ks[i].shape[-1]
                part = y[..., pos : pos + w]
                acc[i] = part if acc[i] is None else acc[i] + part
                pos += w
            pre = acc[s] + bs[s].astype(dtype)
            cur = jnp.where(pre >= 0, pre, pre * 0.2) if s < 4 else pre
        return cur * 0.2 + x

    def rdb_naive(p, x):
        def lrelu2(v):
            return jnp.where(v >= 0, v, v * 0.2)
        x1 = lrelu2(_conv3(p["conv1"], x))
        x2 = lrelu2(_conv3(p["conv2"], jnp.concatenate([x, x1], -1)))
        x3 = lrelu2(_conv3(p["conv3"], jnp.concatenate([x, x1, x2], -1)))
        x4 = lrelu2(_conv3(p["conv4"], jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = _conv3(p["conv5"], jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x5 * 0.2 + x

    def make_trunk(rdb_fn):
        def t_fn(x):
            t = x
            for r in range(12):
                p = params[f"rrdb_trunk_{r}"]
                t = rdb_fn(p["rdb1"], t)
                t = rdb_fn(p["rdb2"], t)
                t = rdb_fn(p["rdb3"], t)
            return t
        return t_fn

    results["trunk_packed_bf16"] = chained_time(make_trunk(rdb_packed_bf16), xt)
    results["trunk_naive"] = chained_time(make_trunk(rdb_naive), xt)

    from superresolution_def_tpu.kernels.fused_rdb import fused_rrdb_trunk

    def trunk_fused(x):
        return fused_rrdb_trunk(params, x, 12)

    results["trunk_fused_rdb"] = chained_time(trunk_fused, xt)

    # HAT backbone only (x2 SR: 128 -> 256)
    from superresolution_def_tpu.models.hat import HAT

    hat = HAT(
        img_size=128, in_chans=1, embed_dim=90, depths=(6, 6, 6, 6),
        num_heads=(6, 6, 6, 6), window_size=8, upscale=2,
        upsampler="pixelshuffle", img_range=1.0, dtype=dtype,
    )
    hp = params["hat"]

    def hat_only(x):
        out = hat.apply({"params": hp}, x.astype(dtype), True)
        return out[:, ::2, ::2, :]

    results["hat_backbone"] = chained_time(hat_only, jnp.zeros((batch, 128, 128, 1), dtype))

    # head convs at 256/512: conv_adapt + conv_body + up + hr + last
    from superresolution_def_tpu.ops.resize import resize_nearest

    def head(x):
        def lrelu2(v):
            return jnp.where(v >= 0, v, v * 0.2)
        feat = lrelu2(_conv3(params["conv_adapt"], x))
        feat = feat + _conv3(params["conv_body"], feat)
        feat = lrelu2(_conv3(params["conv_up"], resize_nearest(feat, 2)))
        out = _conv3(params["conv_last"], lrelu2(_conv3(params["conv_hr"], feat)))
        return out[:, ::2, ::2, :1]

    results["head_convs"] = chained_time(head, jnp.zeros((batch, 256, 256, 1), dtype))

    for k, v in results.items():
        print(f"{k:>16}: {v*1000:8.2f} ms/iter  ({batch/v:7.2f} patches/s)")
    print(json.dumps({k: round(v * 1000, 3) for k, v in results.items()}))


def hat_breakdown(batch=8, dtype_name="bf16"):
    """Where the fused HAT backbone's time goes: HABs vs OCABs vs convs."""
    import jax
    import jax.numpy as jnp

    from superresolution_def_tpu.models.hat import HAT
    from superresolution_def_tpu.kernels import fused_hat as fh

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    depths, heads, ws = (6, 6, 6, 6), (6, 6, 6, 6), 8
    hat = HAT(
        img_size=128, in_chans=1, embed_dim=90, depths=depths,
        num_heads=heads, window_size=ws, upscale=2,
        upsampler="pixelshuffle", img_range=1.0, dtype=dtype,
    )
    hp = hat.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 1), jnp.float32))["params"]

    results = {}

    def hat_xla(x):
        return hat.apply({"params": hp}, x.astype(dtype), True)[:, ::2, ::2, :]

    results["hat_xla"] = chained_time(hat_xla, jnp.zeros((batch, 128, 128, 1), dtype))

    fwd = fh.make_fused_hat(depths=depths, num_heads=heads, window_size=ws, dtype=dtype)

    def hat_fused(x):
        return fwd(hp, x.astype(dtype))[:, ::2, ::2, :]

    results["hat_fused_hab"] = chained_time(hat_fused, jnp.zeros((batch, 128, 128, 1), dtype))

    # components at the residual shape (batch, 128, 128, 90)
    xr = jnp.zeros((batch, 128, 128, 90), dtype)
    from superresolution_def_tpu.ops import shift_window_attn_mask
    import numpy as _np

    mask = jnp.asarray(_np.asarray(shift_window_attn_mask(128, 128, ws, ws // 2), _np.float32))
    mask_tiled = jnp.tile(mask, (batch, 1, 1))
    zeros_mask = jnp.zeros((batch * 256, ws * ws, ws * ws), jnp.float32)

    # rebuild the closure's hab via a 1-group fused forward surrogate: time
    # the 24 HABs by chaining through every block of every group
    def habs_only(x):
        res = x
        for i, depth in enumerate(depths):
            g = hp[f"layers_{i}"]
            for j in range(depth):
                # reuse the internal hab through a single-block fused hat
                res = fh_hab(g[f"blocks_{j}"], res, heads[i],
                             0 if j % 2 == 0 else ws // 2, mask_tiled, zeros_mask)
        return res

    # fh_hab: a copy of make_fused_hat's nested hab using module helpers
    from superresolution_def_tpu.ops import (
        window_partition, window_reverse, relative_position_index_sa,
    )
    from superresolution_def_tpu.kernels.swin_block import fused_hab_block

    def fh_hab(p, x, nheads, shift, mt_, zm_):
        b, h, w, c = x.shape
        d = c // nheads
        rpb = p["attn"]["relative_position_bias_table"]
        rpi = relative_position_index_sa(ws)
        bias = (
            rpb[rpi.reshape(-1)].reshape(ws * ws, ws * ws, nheads)
            .transpose(2, 0, 1).astype(jnp.float32)
        )
        xn = fh._ln(p["norm1"], x)
        conv_x = fh._cab(p["conv_block"], xn)
        if shift:
            xs = jnp.roll(x, (-shift, -shift), (1, 2))
            cs = jnp.roll(conv_x, (-shift, -shift), (1, 2))
            mt = mt_
        else:
            xs, cs = x, conv_x
            mt = zm_
        xw = window_partition(xs, ws).reshape(-1, ws * ws, c)
        cw = window_partition(cs, ws).reshape(-1, ws * ws, c)
        out = fused_hab_block(
            xw, cw, mt,
            p["norm1"]["ln"]["scale"], p["norm1"]["ln"]["bias"],
            p["attn"]["qkv"]["linear"]["kernel"].astype(dtype),
            p["attn"]["qkv"]["linear"]["bias"], bias,
            p["attn"]["proj"]["linear"]["kernel"].astype(dtype),
            p["attn"]["proj"]["linear"]["bias"],
            p["norm2"]["ln"]["scale"], p["norm2"]["ln"]["bias"],
            p["mlp"]["fc1"]["linear"]["kernel"].astype(dtype),
            p["mlp"]["fc1"]["linear"]["bias"],
            p["mlp"]["fc2"]["linear"]["kernel"].astype(dtype),
            p["mlp"]["fc2"]["linear"]["bias"],
            num_heads=nheads, scale=d**-0.5, block_windows=16,
        )
        y = window_reverse(out.reshape(-1, ws, ws, c), ws, h, w)
        if shift:
            y = jnp.roll(y, (shift, shift), (1, 2))
        return y

    results["habs_x24_fused"] = chained_time(habs_only, xr)

    def ocabs_only(x):
        res = x
        for i in range(4):
            res = fh._ocab(hp[f"layers_{i}"]["overlap_attn"], res, ws, 0.5, heads[i])
        return res

    results["ocabs_x4"] = chained_time(ocabs_only, xr)

    def cab_only(x):
        res = x
        for i in range(6):
            res = fh._cab(hp["layers_0"][f"blocks_{i}"]["conv_block"], res) * 0.01 + x
        return res

    results["cabs_x6_xla"] = chained_time(cab_only, xr)

    for k, v in results.items():
        print(f"{k:>16}: {v*1000:8.2f} ms/iter  ({batch/v:7.2f} patches/s)")
    print(json.dumps({k: round(v * 1000, 3) for k, v in results.items()}))


def vgg_breakdown(batch=2, dtype_name="bf16"):
    """Standalone cost of the VGG perceptual term at 512^2 (config #3's
    dominant add-on: 32.6 -> 9.0 p/s when enabled). Times forward-only,
    forward+grad, and the full perceptual-loss pattern (vgg(sr) grad +
    vgg(hr) no-grad)."""
    import jax
    import jax.numpy as jnp

    from superresolution_def_tpu.train.vgg import VGG19Features, init_vgg_params

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    params = init_vgg_params(cutoff=35, seed=0)
    model = VGG19Features(cutoff=35, dtype=dtype)

    results = {}
    x = jnp.zeros((batch, 512, 512, 1), dtype)

    def fwd(v):
        f = model.apply({"params": params}, v)
        # reduce back to input shape to keep the chain alive
        m = jnp.mean(f)
        return v * 0.999 + m.astype(v.dtype) * 1e-6

    results["vgg_fwd"] = chained_time(fwd, x)

    def loss(v, t):
        fs = model.apply({"params": params}, v)
        ft = jax.lax.stop_gradient(model.apply({"params": params}, t))
        return jnp.mean(jnp.abs(fs.astype(jnp.float32) - ft.astype(jnp.float32)))

    gl = jax.grad(loss)

    def fwd_bwd(v):
        g = gl(v, v + 0.01)
        return v * 0.999 + g.astype(v.dtype) * 1e-6

    results["vgg_loss_grad"] = chained_time(fwd_bwd, x)

    for k, v in results.items():
        print(f"{k:>16}: {v*1000:8.2f} ms/iter  ({batch/v:7.2f} patches/s)")
    print(json.dumps({k: round(v * 1000, 3) for k, v in results.items()}))


def hat_train_breakdown(micro=1, dtype_name="bf16", impl="fused"):
    """Where config #4's optimizer step spends its time: per micro-batch
    component costs (G train fwd, G fwd+bwd, D phases, VGG term) at the
    bench's exact model/loss configuration. ms are per micro-batch of
    ``micro`` patches; the full step is accum x (G phase + D phase)."""
    import jax
    import jax.numpy as jnp

    from superresolution_def_tpu.train import (
        CombinedGANLoss,
        create_hat_train_state,
    )
    from superresolution_def_tpu.train.losses import DiscriminatorLoss, l1_loss
    from superresolution_def_tpu.train.steps import _d_apply_pair
    from superresolution_def_tpu.train.vgg import VGG19Features, init_vgg_params

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    attn = None if impl == "fused" else impl
    state, bundle = create_hat_train_state(
        jax.random.PRNGKey(0), img_size=128, dtype=dtype, attn_impl=attn,
        fused=(impl == "fused"),
    )
    g_apply, d_apply = bundle.g_apply, bundle.d_apply
    g_params, d_params, spec = state.g_params, state.d_params, state.spectral

    vgg_params = init_vgg_params(cutoff=35, seed=0)
    vgg_model = VGG19Features(cutoff=35, dtype=dtype)
    vgg_apply = lambda v: vgg_model.apply({"params": vgg_params}, v)  # noqa: E731
    crit_g = CombinedGANLoss(
        pixel_weight=1.0, perceptual_weight=1.0, adversarial_weight=0.005,
        vgg_apply=vgg_apply,
    )
    crit_g_novgg = CombinedGANLoss(
        pixel_weight=1.0, perceptual_weight=0.0, adversarial_weight=0.005
    )
    crit_d = DiscriminatorLoss()
    dkey = jax.random.PRNGKey(7)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((micro, 128, 128, 1), np.float32), dtype)
    hr01 = jnp.asarray(rng.random((micro, 512, 512, 1), np.float32))

    def dep(v, scalar):
        # keep the chain data-dependent without perturbing magnitudes
        return v * 0.999 + (scalar * 1e-12).astype(v.dtype)

    results = {}

    def g_fwd(v):
        sr = g_apply({"params": g_params}, v, False, rngs={"droppath": dkey})
        return dep(v, jnp.sum(sr.astype(jnp.float32)))

    results["g_fwd_train"] = chained_time(g_fwd, x)

    def g_l1_grad(v):
        def loss(p):
            sr = g_apply({"params": p}, v, False, rngs={"droppath": dkey})
            return l1_loss(sr, hr01)

        g = jax.grad(loss)(g_params)
        leaf = jax.tree_util.tree_leaves(g)[0]
        return dep(v, jnp.sum(leaf.astype(jnp.float32)))

    results["g_l1_fwd_bwd"] = chained_time(g_l1_grad, x)

    def g_phase(crit):
        def fn(v):
            def loss(p):
                sr = g_apply({"params": p}, v, False, rngs={"droppath": dkey})
                d_fake, d_real, _ = _d_apply_pair(d_apply, d_params, spec, sr, hr01)
                lg, _ = crit(sr, hr01, jax.lax.stop_gradient(d_real), d_fake)
                return lg

            g = jax.grad(loss)(g_params)
            leaf = jax.tree_util.tree_leaves(g)[0]
            return dep(v, jnp.sum(leaf.astype(jnp.float32)))

        return fn

    results["g_phase_full"] = chained_time(g_phase(crit_g), x)
    results["g_phase_novgg"] = chained_time(g_phase(crit_g_novgg), x)

    sr_fixed = jnp.asarray(rng.random((micro, 512, 512, 1), np.float32))

    def d_phase(v512):
        def loss(dp):
            d_fake, d_real, _ = _d_apply_pair(d_apply, dp, spec, v512, hr01)
            ld, _ = crit_d(d_real, d_fake)
            return ld

        g = jax.grad(loss)(d_params)
        leaf = jax.tree_util.tree_leaves(g)[0]
        return dep(v512, jnp.sum(leaf.astype(jnp.float32)))

    results["d_phase"] = chained_time(d_phase, sr_fixed)

    # ---- the FULL production step at this micro size (accum chosen so
    # accum x micro = 16, the reference's effective optimizer batch), and
    # an optimizer/EMA-only step (zero-like grads through the real
    # adam+EMA update) to attribute everything the phases don't cover:
    # scan structure, augment, /65535 conversion, optimizer, EMA, SN
    # threading.  full_step ms is per optimizer STEP, not per micro. ----
    from superresolution_def_tpu.train import make_hat_train_step

    accum = max(1, 16 // micro)
    step = make_hat_train_step(bundle, accum_steps=accum)
    rng2 = np.random.default_rng(1)
    batch = {
        "lr": rng2.integers(0, 65535, (accum, micro, 128, 128, 1), dtype=np.uint16),
        "hr": rng2.integers(0, 65535, (accum, micro, 512, 512, 1), dtype=np.uint16),
    }
    st = state
    st, mm = step(st, batch, 1e-4, 1e-4, warmup=False)
    float(jax.device_get(mm["loss_g"]))
    full_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            st, mm = step(st, batch, 1e-4, 1e-4, warmup=False)
        float(jax.device_get(mm["loss_g"]))
        full_times.append((time.perf_counter() - t0) / 3)
    full = min(full_times)

    # Same step with the batch ALREADY device-resident (what the production
    # prefetch_to_mesh loop gives the step): full_step - full_step_staged is
    # the per-step H2D share the staging thread overlaps; the remaining
    # non-phase delta is true in-step overhead (scan/augment/opt/EMA/SN).
    batch_dev = {k: jax.device_put(v) for k, v in batch.items()}
    st, mm = step(st, batch_dev, 1e-4, 1e-4, warmup=False)
    float(jax.device_get(mm["loss_g"]))
    staged_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            st, mm = step(st, batch_dev, 1e-4, 1e-4, warmup=False)
        float(jax.device_get(mm["loss_g"]))
        staged_times.append((time.perf_counter() - t0) / 3)
    staged = min(staged_times)

    # Surgical in-step-rest attribution: the same staged step with one
    # ingredient removed at a time (augment; live PSNR/SSIM metrics). Each
    # is a separate jit specialization; deltas vs full_step_staged name the
    # in-step non-phase cost component by component.
    # (the steps donate their input state, so thread the live ``st``
    # through every ablation sequentially — ``state`` itself was donated
    # by full_step's compile call above)
    ablations = {}
    for tag, kw in (("noaug", {"augment": False}),
                    ("nometrics", {"train_metrics": False})):
        step_a = make_hat_train_step(bundle, accum_steps=accum, **kw)
        st, mm = step_a(st, batch_dev, 1e-4, 1e-4, warmup=False)
        float(jax.device_get(mm["loss_g"]))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(3):
                st, mm = step_a(st, batch_dev, 1e-4, 1e-4, warmup=False)
            float(jax.device_get(mm["loss_g"]))
            times.append((time.perf_counter() - t0) / 3)
        ablations[tag] = min(times)

    phases = accum * (results["g_phase_full"] + results["d_phase"])
    print(f"{'full_step':>16}: {full*1000:8.2f} ms/STEP   "
          f"({accum * micro / full:7.2f} patches/s) [accum {accum} x micro {micro}]")
    print(f"{'full_step_staged':>16}: {staged*1000:8.2f} ms/STEP   "
          f"({accum * micro / staged:7.2f} patches/s) [device-resident batch]")
    print(f"{'h2d share':>16}: {(full - staged)*1000:8.2f} ms/STEP "
          f"(overlapped by prefetch_to_mesh in the production loop)")
    print(f"{'phases x accum':>16}: {phases*1000:8.2f} ms/STEP")
    print(f"{'non-phase rest':>16}: {(full - phases)*1000:8.2f} ms/STEP "
          f"({100 * (full - phases) / full:.1f}% of the step; "
          f"in-step rest {(staged - phases)*1000:.2f} ms)")
    for tag, v in ablations.items():
        print(f"{'staged_' + tag:>16}: {v*1000:8.2f} ms/STEP "
              f"(removing it saves {(staged - v)*1000:.2f} ms)")

    for k, v in results.items():
        print(f"{k:>16}: {v*1000:8.2f} ms/micro  ({micro/v:7.2f} patches/s)")
    est = results["g_phase_full"] + results["d_phase"]
    print(f"micro-step estimate (G+D phases): {est*1000:.2f} ms "
          f"-> {micro/est:.2f} p/s at accum x micro")
    out = {k: round(v * 1000, 3) for k, v in results.items()}
    out["full_step_ms"] = round(full * 1000, 3)
    out["full_step_staged_ms"] = round(staged * 1000, 3)
    for tag, v in ablations.items():
        out[f"staged_{tag}_ms"] = round(v * 1000, 3)
    out["accum"] = accum
    print(json.dumps(out))


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--what", default="hybrid", choices=["hybrid", "hat", "vgg", "hat-train"]
    )
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--impl", default="fused", choices=["fused", "xla"])
    args = p.parse_args()
    if args.what == "hat":
        hat_breakdown(batch=args.batch)
    elif args.what == "vgg":
        vgg_breakdown(batch=min(args.batch, 2))
    elif args.what == "hat-train":
        hat_train_breakdown(micro=args.batch, impl=args.impl)
    else:
        hybrid_breakdown(batch=args.batch)


if __name__ == "__main__":
    main()

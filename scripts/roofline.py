"""Analytic roofline for the headline BASELINE configs (VERDICT r2 #6).

Counts matmul/conv FLOPs by walking the jaxpr of the ACTUAL model/step
functions (abstract tracing only — no device compute, runs on the 1-core
host in seconds), then reports the speed-of-light patches/s on one
TPU v5e chip (197 TFLOP/s bf16 MXU peak) next to the measured numbers
from PERF.md. The point is an honest ceiling: how much of the remaining
gap is harvestable vs shape-imposed.

FLOP conventions: 2*M*N*K per dot, 2*prod(out)*Cin/groups*prod(kernel)
per conv (multiply+add = 2). Elementwise/VPU work (softmax, LN, GELU,
augmentation) is NOT counted — it is real time on the VPU but does not
move the MXU roofline; the per-stage ablations in PERF.md cover it.

Usage: python scripts/roofline.py [--json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

V5E_BF16_PEAK = 197e12  # TPU v5e (v5 lite) MXU peak, bf16 with f32 accum


# ---------------------------------------------------------------- jaxpr walk
def _mxu_eff_flops(batch: float, m: float, k: float, n: float) -> float:
    """Effective (time-equivalent) FLOPs on a 128x128 MXU.

    A GEMM streams M rows through ceil(K/128)*ceil(N/128) array passes, so
    its time-equivalent full-tile FLOPs are batch*M*ceil128(K)*ceil128(N)*2
    — a (64,15)x(15,64) head dot burns a full 128x128 pass per row despite
    computing 15*64 of the 128*128 MACs. The ratio flops/eff_flops is the
    shape-imposed ceiling (the model packed_heads.best_group optimizes).
    """
    t = lambda v: 128.0 * np.ceil(v / 128.0)  # noqa: E731
    return 2.0 * batch * m * t(k) * t(n)


def _dot_flops(eqn) -> tuple[float, float]:
    (lhs, rhs) = (v.aval for v in eqn.invars[:2])
    dnums = eqn.params["dimension_numbers"]
    (lc, rc), (lb, rb) = dnums
    batch = int(np.prod([lhs.shape[i] for i in lb], dtype=np.float64)) if lb else 1
    k = int(np.prod([lhs.shape[i] for i in lc], dtype=np.float64)) if lc else 1
    m = int(
        np.prod(
            [s for i, s in enumerate(lhs.shape) if i not in lc and i not in lb],
            dtype=np.float64,
        )
    )
    n = int(
        np.prod(
            [s for i, s in enumerate(rhs.shape) if i not in rc and i not in rb],
            dtype=np.float64,
        )
    )
    return 2.0 * batch * m * n * k, _mxu_eff_flops(batch, m, k, n)


def _conv_flops(eqn) -> tuple[float, float]:
    lhs, rhs = (v.aval for v in eqn.invars[:2])
    out = eqn.outvars[0].aval
    dn = eqn.params["dimension_numbers"]
    # rhs_spec: (out_ch, in_ch/groups, *spatial) positions
    kernel_spatial = np.prod(
        [rhs.shape[i] for i in dn.rhs_spec[2:]], dtype=np.float64
    )
    cin_per_group = rhs.shape[dn.rhs_spec[1]]
    cout = out.shape[dn.out_spec[1]]
    m = float(np.prod(out.shape, dtype=np.float64)) / cout  # batch*spatial
    k = cin_per_group * kernel_spatial  # implicit-GEMM contraction
    flops = 2.0 * m * cout * k
    return flops, _mxu_eff_flops(1.0, m, k, cout)


def count_flops(jaxpr) -> tuple[float, float]:
    """(flops, mxu_eff_flops) of a (Closed)Jaxpr, recursing into sub-jaxprs."""
    if hasattr(jaxpr, "jaxpr"):  # ClosedJaxpr
        jaxpr = jaxpr.jaxpr
    total = np.zeros(2)
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "cond":
            branches = eqn.params["branches"]
            total += max((np.asarray(count_flops(b)) for b in branches),
                         key=lambda v: v[0])
        else:
            mult = eqn.params.get("length", 1) if name == "scan" else 1
            for v in eqn.params.values():
                if hasattr(v, "jaxpr") or hasattr(v, "eqns"):
                    total += mult * np.asarray(count_flops(v))
                elif isinstance(v, (tuple, list)):
                    for vv in v:
                        if hasattr(vv, "jaxpr") or hasattr(vv, "eqns"):
                            total += mult * np.asarray(count_flops(vv))
    return float(total[0]), float(total[1])


def flops_of(fn, *args) -> tuple[float, float]:
    return count_flops(jax.make_jaxpr(fn)(*args))


def sds(shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(shape, dtype)


# ---------------------------------------------------------------- the configs
def swin_infer_flops() -> float:
    """Config #1: flagship SwinIR x4 forward, per patch."""
    from superresolution_def_tpu.models import SwinIR

    m = SwinIR(
        img_size=128, in_chans=1, embed_dim=180, depths=(6,) * 6,
        num_heads=(6,) * 6, window_size=8, mlp_ratio=4.0, upscale=4,
    )
    params = jax.eval_shape(m.init, jax.random.PRNGKey(0), sds((1, 128, 128, 1)))
    return flops_of(lambda p, x: m.apply(p, x), params, sds((1, 128, 128, 1)))


def hybrid_infer_flops() -> float:
    """Config #2: hybrid 'Soft' x4 forward, per patch."""
    from superresolution_def_tpu.models import HybridHATRealESRGAN

    m = HybridHATRealESRGAN(
        img_size=128, in_chans=1, embed_dim=90, depths=(6,) * 4,
        num_heads=(6,) * 4, window_size=8, num_rrdb=12, num_feat=48,
        num_grow_ch=24,
    )
    params = jax.eval_shape(m.init, jax.random.PRNGKey(0), sds((1, 128, 128, 1)))
    return flops_of(
        lambda p, x: m.apply(p, x, True), params, sds((1, 128, 128, 1))
    )


def _vgg_apply():
    from superresolution_def_tpu.train.vgg import VGG19Features, init_vgg_params

    params = init_vgg_params(cutoff=35, seed=0)
    model = VGG19Features(cutoff=35)
    return lambda x: model.apply({"params": params}, x)


def _capture_state(create_fn):
    caught = []

    def wrapped(rng):
        s, b = create_fn(rng)
        caught.append(b)
        return s

    state_sds = jax.eval_shape(wrapped, jax.random.PRNGKey(0))
    return state_sds, caught[0]


def swin_train_flops(use_vgg: bool = True):
    """Config #3: full SwinIR GAN step FLOPs per optimizer step (accum 4 x
    batch 2 = 8 patches), counted from the actual step jaxpr (XLA impl —
    FLOP count is implementation-independent)."""
    from superresolution_def_tpu.train.state import create_swin_train_state
    from superresolution_def_tpu.train.steps import make_swin_train_step
    from superresolution_def_tpu.train.losses import CombinedGANLoss

    state_sds, bundle = _capture_state(
        lambda rng: create_swin_train_state(rng, attn_impl="xla")
    )
    crit_g = None
    if use_vgg:
        crit_g = CombinedGANLoss(
            pixel_weight=1.0, perceptual_weight=0.5, adversarial_weight=0.005,
            vgg_apply=_vgg_apply(),
        )
    step = make_swin_train_step(bundle, criterion_g=crit_g)
    batch = {
        "lr": sds((4, 2, 128, 128, 1), jnp.uint16),
        "hr": sds((4, 2, 512, 512, 1), jnp.uint16),
    }
    f = flops_of(
        lambda *a: step(*a),
        state_sds, batch, sds((), jnp.float32), sds((), jnp.float32),
    )
    return f, 8  # (flops, eff_flops) per step, patches per step


def hat_train_flops(use_vgg: bool = True, warmup: bool = False):
    """Config #4: hybrid GAN step per optimizer step (accum 16 x batch 1)."""
    from superresolution_def_tpu.train.state import create_hat_train_state
    from superresolution_def_tpu.train.steps import make_hat_train_step
    from superresolution_def_tpu.train.losses import CombinedGANLoss

    state_sds, bundle = _capture_state(
        lambda rng: create_hat_train_state(rng, attn_impl="xla")
    )
    crit_g = None
    if use_vgg:
        crit_g = CombinedGANLoss(
            pixel_weight=1.0, perceptual_weight=1.0, adversarial_weight=0.005,
            vgg_apply=_vgg_apply(),
        )
    step = make_hat_train_step(bundle, accum_steps=16, criterion_g=crit_g)
    batch = {
        "lr": sds((16, 1, 128, 128, 1), jnp.uint16),
        "hr": sds((16, 1, 512, 512, 1), jnp.uint16),
    }
    f = flops_of(
        lambda s, b, lg, ld: step(s, b, lg, ld, warmup=warmup),
        state_sds, batch, sds((), jnp.float32), sds((), jnp.float32),
    )
    return f, 16


def component_flops():
    """Per-component forwards for the table."""
    from superresolution_def_tpu.models import (
        UNetDiscriminatorSNSwin, UNetDiscriminatorSNHAT,
    )
    from superresolution_def_tpu.train.vgg import VGG19Features, init_vgg_params

    out = {}
    for name, mod in [
        ("D_swin fwd @512^2", UNetDiscriminatorSNSwin(num_in_ch=1, num_feat=64)),
        ("D_hat fwd @512^2", UNetDiscriminatorSNHAT(num_in_ch=1, num_feat=64)),
    ]:
        params = jax.eval_shape(
            mod.init, jax.random.PRNGKey(0), sds((1, 512, 512, 1))
        )
        out[name] = flops_of(
            lambda p, x, m=mod: m.apply(p, x), params, sds((1, 512, 512, 1))
        )
    vgg = VGG19Features()
    vp = init_vgg_params()
    out["VGG19[:36] fwd @512^2"] = flops_of(
        lambda p, x: vgg.apply({"params": p}, x), vp, sds((1, 512, 512, 3))
    )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    rows = []

    f1 = swin_infer_flops()
    rows.append(("#1 SwinIR x4 infer", f1, 1, 84.2))
    f2 = hybrid_infer_flops()
    rows.append(("#2 hybrid x4 infer", f2, 1, 46.7))
    f3, n3 = swin_train_flops()
    rows.append(("#3 swin GAN step (VGG)", f3, n3, 13.3))
    f4, n4 = hat_train_flops()
    rows.append(("#4 hybrid GAN step (VGG)", f4, n4, 4.50))

    comp = component_flops()

    print(f"\nTPU v5e bf16 MXU peak assumed: {V5E_BF16_PEAK/1e12:.0f} TFLOP/s")
    print(f"{'config':<26} {'GFLOP/p':>9} {'SoL p/s':>8} {'shape-SoL':>9} "
          f"{'measured':>9} {'%SoL':>6} {'%shape':>7}")
    result = {}
    for name, (f, eff), per, measured in rows:
        gflop = f / per / 1e9
        sol = V5E_BF16_PEAK / (f / per)
        shape_sol = V5E_BF16_PEAK / (eff / per)
        pct = 100.0 * measured / sol
        pct_s = 100.0 * measured / shape_sol
        print(f"{name:<26} {gflop:>9.1f} {sol:>8.1f} {shape_sol:>9.1f} "
              f"{measured:>9.2f} {pct:>5.1f}% {pct_s:>6.1f}%")
        result[name] = {
            "gflop_per_patch": round(gflop, 2),
            "sol_patches_per_s": round(sol, 2),
            "shape_sol_patches_per_s": round(shape_sol, 2),
            "measured": measured,
            "pct_of_sol": round(pct, 1),
            "pct_of_shape_sol": round(pct_s, 1),
        }

    print("\ncomponent forwards (GFLOP, shape-efficiency):")
    for name, (f, eff) in comp.items():
        print(f"  {name:<26} {f/1e9:>10.1f} GFLOP  mxu-eff {100*f/eff:>5.1f}%")
        result[name] = {"gflop": round(f / 1e9, 2),
                        "mxu_shape_eff_pct": round(100 * f / eff, 1)}

    if args.json:
        print(json.dumps(result, indent=2))
    return result


if __name__ == "__main__":
    main()

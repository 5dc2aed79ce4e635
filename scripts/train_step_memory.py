"""Peak-HBM and timing analysis of the SwinIR GAN train step (config #3).

The VGG perceptual term standalone costs ~18 ms/microbatch (batch 2,
scripts/perf_breakdown.py --what vgg) yet enabling it drops the measured
step from ~32 to ~9 patches/s — far more than its FLOPs. This script
AOT-compiles the step with/without VGG and prints XLA's memory analysis
(peak HBM), to test the hypothesis that the extra live set pushes XLA into
rematerializing/spilling the generator backward.

Usage: python scripts/train_step_memory.py [--no-vgg] [--remat]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--no-vgg", action="store_true")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--remat-loss", action="store_true",
                   help="checkpoint the loss tails (train/steps.py remat_loss)")
    p.add_argument("--arch", default="swin", choices=["swin", "hat"])
    p.add_argument("--batch", type=int, default=None, help="micro-batch size")
    p.add_argument("--accum", type=int, default=None, help="accumulation steps")
    p.add_argument("--impl", default="fused", choices=["fused", "xla"],
                   help="generator impl — 'fused' matches bench.py's default "
                        "(the shipped config); 'xla' is the flax path whose "
                        "backward stashes trunk activations")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from superresolution_def_tpu.train import (
        CombinedGANLoss,
        create_swin_train_state,
        create_hat_train_state,
        make_swin_train_step,
        make_hat_train_step,
    )

    dtype = jnp.bfloat16
    vgg_apply = None
    if not args.no_vgg:
        from superresolution_def_tpu.train.vgg import VGG19Features, init_vgg_params

        vgg_params = init_vgg_params(cutoff=35, seed=0)
        vgg_model = VGG19Features(cutoff=35, dtype=dtype)
        vgg_apply = lambda x: vgg_model.apply({"params": vgg_params}, x)  # noqa: E731

    if args.arch == "swin":
        accum, micro = args.accum or 4, args.batch or 2
        state, bundle = create_swin_train_state(
            jax.random.PRNGKey(0), img_size=128, dtype=dtype, remat=args.remat,
            fused=(args.impl == "fused"),
        )
        crit = CombinedGANLoss(
            pixel_weight=1.0, perceptual_weight=0.5, adversarial_weight=0.005,
            vgg_apply=vgg_apply,
        )
        step = make_swin_train_step(
            bundle, accum_steps=accum, criterion_g=crit,
            remat_loss=args.remat_loss,
        )
        lower = lambda s, b: step.lower(s, b, 1e-4, 1e-4)  # noqa: E731
    else:
        accum, micro = args.accum or 16, args.batch or 1
        state, bundle = create_hat_train_state(
            jax.random.PRNGKey(0), img_size=128, dtype=dtype, remat=args.remat,
            fused=(args.impl == "fused"),
        )
        crit = CombinedGANLoss(
            pixel_weight=1.0, perceptual_weight=1.0, adversarial_weight=0.005,
            vgg_apply=vgg_apply,
        )
        step = make_hat_train_step(
            bundle, accum_steps=accum, criterion_g=crit,
            remat_loss=args.remat_loss,
        )
        lower = lambda s, b: step.lower(s, b, 1e-4, 1e-4, warmup=False)  # noqa: E731

    rng = np.random.default_rng(0)
    batch = {
        "lr": rng.integers(0, 65535, (accum, micro, 128, 128, 1), dtype=np.uint16),
        "hr": rng.integers(0, 65535, (accum, micro, 512, 512, 1), dtype=np.uint16),
    }

    # lower the step itself: re-wrapping the jitted step in another jit
    # would drop its donate_argnums and overstate the peak by a full state
    lowered = lower(state, batch)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    print(f"arch={args.arch} impl={args.impl} vgg={not args.no_vgg} remat={args.remat} remat_loss={args.remat_loss} micro={micro} accum={accum}")
    if ma is not None:
        for k in (
            "temp_size_in_bytes",
            "argument_size_in_bytes",
            "output_size_in_bytes",
            "alias_size_in_bytes",
            "peak_memory_in_bytes",
        ):
            v = getattr(ma, k, None)
            if v is not None:
                print(f"  {k}: {v/2**30:.2f} GiB")
    else:
        print("  memory_analysis() unavailable on this backend")


if __name__ == "__main__":
    main()

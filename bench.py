"""Benchmark: the five BASELINE.json configs on one TPU chip.

Bare invocation (``python bench.py``, the driver's end-of-round command)
runs ALL five configs and prints one JSON line per config:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
ordered so the flagship config #1 (SwinIR x4 128->512 inference — the
north-star metric) prints LAST and stays the round-over-round ``parsed``
record; #2-#5 land in the record's tail (VERDICT r4 item 7).

Any explicit flag selects a single config, e.g.:
  #1  --arch swin --mode infer     #2  --arch hat
  #3  --mode train                 #4  --arch hat --mode train
  #5  --mode prep

Config #1 = BASELINE.json config #1 / north-star metric (SR
patches/sec/chip, x4 128->512, flagship SwinIR at the reference train
config, train_swin.py:147-149, at the reference-EFFECTIVE mlp_ratio=4:
the torch constructor swallows the passed 2 into **kwargs,
architecture_swin.py:100,193-194). vs_baseline compares against the torch
reference's own implementation at the identical effective config measured
on this host's CPU (BENCH_BASELINE.json — the reference publishes no
numbers and no CUDA device exists here).

Flags:
  --arch {swin,hat}   model family (default swin)
  --batch N           patches per device call (default: measured-best)
  --dtype {bf16,f32}  compute dtype (default bf16 — TPU-native)
  --impl {xla,pallas,fused}  implementation; defaults per mode: 'fused'
                      (whole-block VMEM Pallas kernel, 2.1x XLA) for swin
                      inference, 'xla' for training
  --iters N           timed iterations (default 20)
  --all               run all five configs (same as the bare invocation)
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

# persistent XLA compilation cache: repeat bench runs skip the multi-minute
# remote compile (must be set before jax initializes)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")


def bench_all() -> None:
    """All five BASELINE configs, one JSON line each, flagship #1 last.

    Each config runs in its own bounded subprocess (a wedged tunnel or an
    OOM in one config must not eat the whole record); failures print a
    null-value line with the error tail. An overall budget keeps the
    end-of-round driver run from running away — configs past the budget
    are skipped (null line, "skipped: budget"), except #1 which always
    runs. Compiles hit the persistent cache warmed by the round's playbook
    runs.
    """
    import subprocess
    import sys

    configs = [
        ("hat_hybrid_x4_128to512_patches_per_sec_per_chip",
         ["--arch", "hat", "--mode", "infer"], "patches/s"),
        ("swinir_gan_train_patches_per_sec_per_chip",
         ["--arch", "swin", "--mode", "train"], "patches/s"),
        ("hat_gan_train_patches_per_sec_per_chip",
         ["--arch", "hat", "--mode", "train"], "patches/s"),
        ("fused_prep_pairs_per_sec",
         ["--mode", "prep"], "pairs/s"),
        # flagship LAST: its line is the parsed round-over-round record
        ("swinir_x4_128to512_patches_per_sec_per_chip",
         ["--arch", "swin", "--mode", "infer"], "patches/s"),
    ]
    budget_s = 35 * 60
    t_start = time.monotonic()
    for name, flags, unit in configs:
        is_flagship = flags == ["--arch", "swin", "--mode", "infer"]
        left = budget_s - (time.monotonic() - t_start)
        if left < 120 and not is_flagship:
            print(json.dumps({"metric": name, "value": None, "unit": unit,
                              "vs_baseline": None, "error": "skipped: budget"}),
                  flush=True)
            continue
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)] + flags,
                capture_output=True, text=True,
                timeout=max(600, left) if is_flagship else min(900, left),
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = None
            for ln in reversed(proc.stdout.strip().splitlines()):
                if ln.startswith("{"):
                    line = ln
                    break
            if proc.returncode == 0 and line:
                print(line, flush=True)
            else:
                print(json.dumps({
                    "metric": name, "value": None, "unit": unit,
                    "vs_baseline": None,
                    "error": f"rc={proc.returncode}: {proc.stderr[-300:]}",
                }), flush=True)
        except subprocess.TimeoutExpired:
            print(json.dumps({"metric": name, "value": None, "unit": unit,
                              "vs_baseline": None, "error": "timeout"}),
                  flush=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--all", action="store_true",
                   help="run all five BASELINE configs (default when no "
                        "flags are given)")
    p.add_argument("--arch", default="swin", choices=["swin", "hat"])
    p.add_argument("--mode", default="infer", choices=["infer", "train", "prep"])
    p.add_argument(
        "--batch", type=int, default=None,
        help="patches per device call; default: measured-best per mode "
             "(swin infer 3 — batch scan b1..b16 peaks there for BOTH "
             "impls; hat infer 8; train: reference micro-batches 2/1)",
    )
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument(
        "--impl", default=None, choices=["xla", "pallas", "fused", "iofloor"],
        help="default: 'fused' on a TPU backend in bf16 (whole-block "
             "kernels for swin: 2.1x infer, 1.4x train; HAB+OCAB+"
             "channels-major-RDB kernels for the hybrid: 1.9x infer, 1.4x "
             "train via the trunk's custom VJP, which also fits full-size "
             "in HBM without remat), 'xla' elsewhere (Pallas kernels only "
             "lower on TPU)",
    )
    p.add_argument("--iters", type=int, default=20)
    p.add_argument(
        "--accum", type=int, default=None,
        help="train mode: gradient-accumulation steps (default: reference "
             "values — swin 4, hat 16). accum x batch is the optimizer-step "
             "patch count; reformulations with the same product (e.g. hat "
             "8x2 vs 16x1) average the same 16 patches and are numerically "
             "identical up to fp reassociation",
    )
    p.add_argument("--img-size", type=int, default=128, help="LR patch size (smoke runs)")
    p.add_argument(
        "--remat", action="store_true",
        help="train mode: rematerialize the generator forward (required for "
             "the full-size HAT hybrid step with VGG on a 16G chip: without "
             "it XLA needs 15.94G of 15.75G HBM)",
    )
    p.add_argument(
        "--remat-loss", action=argparse.BooleanOptionalAction, default=None,
        help="train mode: jax.checkpoint the G-phase loss tail (D pair + "
             "VGG) — recompute those cheap 512^2 forwards in the backward "
             "instead of stashing them, freeing the HBM that blocks "
             "micro-batch >= 4 at full size (un-rematted micro-4 needs "
             "17.96G of 15.75G; phases run ~2.5x faster per patch at "
             "micro 8 than micro 1). Default: the per-arch measured winner "
             "(swin ON — required for its default micro-8 split, 15.535 vs "
             "14.04 p/s; hat OFF — every remat-loss split lost to plain "
             "2x8, PERF.md round-4 session 3)",
    )
    p.add_argument(
        "--fused-hab", action="store_true",
        help="hat train mode: route every HAB window core AND each RHAG's "
             "OCAB tail through the custom-VJP Pallas kernels "
             "(kernels/hab_train.py + kernels/ocab_train.py) instead of the "
             "flax backbone. Measured 3.88 p/s pre-OCAB-backward vs 4.50 "
             "default; re-measure after kernels/ocab_train.py landed",
    )
    p.add_argument(
        "--no-vgg", action="store_true",
        help="train mode: drop the VGG perceptual term (the trainers run "
             "with it ON by default — cli/trainers.py use_vgg=True; seeded "
             "weights have identical FLOPs to real ones)",
    )
    p.add_argument(
        "--loop", action="store_true",
        help="train mode: measure the PRODUCTION epoch-loop pipeline "
             "(prefetch_to_mesh H2D staging overlap + deferred metric "
             "fetch + bounded run-ahead, exactly cli/trainers.py) instead "
             "of the bare step-with-synchronous-transfer. The delta vs the "
             "bare number is the staged-pipeline win (config #4's measured "
             "~270 ms/step H2D cost over the tunnel, PERF.md round-4)",
    )
    args = p.parse_args()

    import sys

    if args.all or len(sys.argv) == 1:
        bench_all()
        return

    if args.impl is None:
        if args.mode == "prep":
            # the fused prep path is pure jnp (no Pallas) and runs on any
            # backend — it IS the documented config #5 default everywhere
            args.impl = "fused"
        else:
            # same gate as cli/trainers.py: fused Pallas kernels lower only
            # on a real TPU backend in bf16 — anywhere else default to the
            # XLA path, which runs everywhere
            import jax as _jax

            on_tpu_bf16 = _jax.default_backend() == "tpu" and args.dtype == "bf16"
            args.impl = "fused" if on_tpu_bf16 else "xla"
    if args.batch is None:
        if args.mode == "train":
            # measured-best micro splits of the reference optimizer steps
            # (PERF.md round-4): swin micro 8 x accum 1 + remat-loss =
            # 15.535 p/s (same 8-patch step as the reference's 2x4, which
            # measured 14.04); hat micro 2 x accum 8 = 5.361 p/s (same
            # 16-patch step as the reference's 1x16, which measured 4.512).
            # --batch 2/1 --accum 4/16 reproduces the reference envelopes.
            args.batch = 8 if args.arch == "swin" else 2
        else:
            args.batch = 3 if args.arch == "swin" else 8
    if args.mode == "train" and args.remat_loss is None:
        # per-arch measured winner; see --remat-loss help
        args.remat_loss = args.arch == "swin"
    if args.mode == "train":
        bench_train(args)
        return
    if args.mode == "prep":
        bench_prep(args)
        return

    import jax
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    if args.arch == "swin" and args.impl == "fused":
        from superresolution_def_tpu.models import SwinIR
        from superresolution_def_tpu.kernels.swin_block import make_fused_swinir

        model = SwinIR(
            img_size=args.img_size, in_chans=1, embed_dim=180, depths=(6,) * 6,
            num_heads=(6,) * 6, window_size=8, mlp_ratio=4.0, upscale=4,
            dtype=dtype,
        )
        metric = "swinir_x4_128to512_patches_per_sec_per_chip"
        fused_fn = make_fused_swinir(
            depths=(6,) * 6, num_heads=(6,) * 6, window_size=8, upscale=4,
            dtype=dtype,
        )

        def apply_fn(params, x):
            return fused_fn(params, x)
    elif args.arch == "swin":
        from superresolution_def_tpu.models import SwinIR

        model = SwinIR(
            img_size=args.img_size, in_chans=1, embed_dim=180, depths=(6,) * 6,
            num_heads=(6,) * 6, window_size=8, mlp_ratio=4.0, upscale=4,
            dtype=dtype, attn_impl=args.impl,
        )
        metric = "swinir_x4_128to512_patches_per_sec_per_chip"

        def apply_fn(params, x):
            return model.apply({"params": params}, x)
    elif args.impl == "fused":
        from superresolution_def_tpu.models import HybridHATRealESRGAN
        from superresolution_def_tpu.kernels.fused_hat import make_fused_hybrid

        model = HybridHATRealESRGAN(
            img_size=args.img_size, in_chans=1, embed_dim=90, depths=(6, 6, 6, 6),
            num_heads=(6, 6, 6, 6), window_size=8, upscale=4,
            num_rrdb=12, num_feat=48, num_grow_ch=24, dtype=dtype,
        )
        metric = "hat_hybrid_x4_128to512_patches_per_sec_per_chip"
        hy_fn = make_fused_hybrid(
            depths=(6, 6, 6, 6), num_heads=(6, 6, 6, 6), window_size=8,
            num_rrdb=12, dtype=dtype,
        )

        def apply_fn(params, x):
            return hy_fn(params, x)
    else:
        from superresolution_def_tpu.models import HybridHATRealESRGAN

        model = HybridHATRealESRGAN(
            img_size=args.img_size, in_chans=1, embed_dim=90, depths=(6, 6, 6, 6),
            num_heads=(6, 6, 6, 6), window_size=8, upscale=4,
            num_rrdb=12, num_feat=48, num_grow_ch=24,
            dtype=dtype, attn_impl=args.impl,
        )
        metric = "hat_hybrid_x4_128to512_patches_per_sec_per_chip"

        def apply_fn(params, x):
            return model.apply({"params": params}, x, True)

    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, args.img_size, args.img_size, 1), jnp.float32))["params"]

    # Chained timing: each forward's input depends on the previous output,
    # all inside ONE fori_loop dispatch. Per-call RPC timing over the axon
    # tunnel is unreliable in both directions (dispatch latency inflates
    # small calls; queue pipelining hides real work), so N model executions
    # are fused into a single device program and timed end-to-end.
    n_chain = max(4, args.iters)

    @jax.jit
    def chained(x):
        def body(_, c):
            out = apply_fn(params, c)
            return (out[:, ::4, ::4, :] * 0.999 + 1e-4).astype(jnp.float32)

        # scalar reduce of the final chain state: fetching it is the only
        # sync that reliably waits over the device tunnel (block_until_ready
        # alone has been observed returning early; see bench_train)
        return jnp.sum(jax.lax.fori_loop(0, n_chain, body, x))

    x = jnp.asarray(
        np.random.default_rng(0).random((args.batch, args.img_size, args.img_size, 1), np.float32)
    )
    float(chained(x))  # compile + sync
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(x))
        times.append(time.perf_counter() - t0)
    dt = min(times) / n_chain
    patches_per_sec = args.batch / dt

    try:
        baseline = json.load(open("BENCH_BASELINE.json"))[
            "torch_cpu_swinir_x4_patches_per_sec"
        ]
        vs = patches_per_sec / baseline
    except Exception:
        vs = None

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(patches_per_sec, 3),
                "unit": "patches/s",
                "vs_baseline": round(vs, 2) if vs else None,
            }
        )
    )


def bench_train(args) -> None:
    """GAN train-step throughput (BASELINE configs #3/#4), chained timing.

    Reference configs: swin batch 2 x accum 4 (train_swin.py:36-37),
    hat batch 1 x accum 16 (train_hat.py:32,39). The VGG perceptual term is
    IN the measured step by default, like the trainers (use_vgg=True,
    reference losses_train_swin.py:6-40 in the hot loop); seeded weights
    have the same FLOPs as pretrained ones. --no-vgg for the lighter step.
    """
    import jax
    import jax.numpy as jnp

    from superresolution_def_tpu.train import (
        CombinedGANLoss,
        create_swin_train_state,
        create_hat_train_state,
        make_swin_train_step,
        make_hat_train_step,
    )

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    size = args.img_size
    attn = None if args.impl == "fused" else args.impl

    vgg_apply = None
    if not args.no_vgg:
        from superresolution_def_tpu.train.vgg import VGG19Features, init_vgg_params

        vgg_params = init_vgg_params(cutoff=35, seed=0)
        vgg_model = VGG19Features(cutoff=35, dtype=dtype)
        vgg_apply = lambda x: vgg_model.apply({"params": vgg_params}, x)  # noqa: E731

    if args.arch == "swin":
        # keep the reference's 8-patch optimizer step: accum tracks micro
        accum, micro = args.accum or max(1, 8 // args.batch), args.batch
        state, bundle = create_swin_train_state(
            jax.random.PRNGKey(0), img_size=size, dtype=dtype, attn_impl=attn,
            fused=(args.impl == "fused"), remat=args.remat,
        )
        crit = CombinedGANLoss(
            pixel_weight=1.0, perceptual_weight=0.5, adversarial_weight=0.005,
            vgg_apply=vgg_apply,
        )
        step = make_swin_train_step(
            bundle, accum_steps=accum, criterion_g=crit,
            remat_loss=args.remat_loss,
        )
        run = lambda s, b: step(s, b, 1e-4, 1e-4)
        metric = "swinir_gan_train_patches_per_sec_per_chip"
    else:
        # keep the 16-patch optimizer step: accum tracks the micro size
        accum, micro = args.accum or max(1, 16 // args.batch), args.batch
        state, bundle = create_hat_train_state(
            jax.random.PRNGKey(0), img_size=size, dtype=dtype, attn_impl=attn,
            remat=args.remat, fused=(args.impl == "fused"),
            fused_hab=args.fused_hab,
        )
        crit = CombinedGANLoss(
            pixel_weight=1.0, perceptual_weight=1.0, adversarial_weight=0.005,
            vgg_apply=vgg_apply,
        )
        step = make_hat_train_step(
            bundle, accum_steps=accum, criterion_g=crit,
            remat_loss=args.remat_loss,
        )
        run = lambda s, b: step(s, b, 1e-4, 1e-4, warmup=False)
        metric = "hat_gan_train_patches_per_sec_per_chip"
    if args.no_vgg:
        metric += "_novgg"
    if args.remat:
        metric += "_remat"
    # suffix only when remat_loss differs from the per-arch default, so the
    # default invocation's metric name stays stable across rounds
    rl_default = args.arch == "swin"
    if args.remat_loss != rl_default:
        metric += "_rematloss" if args.remat_loss else "_norematloss"
    if args.arch == "hat" and args.fused_hab:
        metric += "_fusedhab"

    rng = np.random.default_rng(0)
    batch = {
        "lr": rng.integers(0, 65535, (accum, micro, size, size, 1), dtype=np.uint16),
        "hr": rng.integers(0, 65535, (accum, micro, size * 4, size * 4, 1), dtype=np.uint16),
    }
    if args.loop:
        bench_train_loop(args, state, run, accum, micro, size, metric)
        return
    state, m = run(state, batch)  # compile
    float(jax.device_get(m["loss_g"]))  # scalar fetch: the only reliable sync
    n = max(3, args.iters // 4)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):  # state feeds back -> chained, can't be pipelined away
            state, m = run(state, batch)
        # block_until_ready alone does NOT reliably wait over the axon tunnel
        # (observed: a 4.9 s/step graph timed as 21 ms/step); fetching a
        # metric scalar that depends on the last chained step does.
        float(jax.device_get(m["loss_g"]))
        best = min(best, (time.perf_counter() - t0) / n)
    dt = best
    pps = accum * micro / dt

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(pps, 3),
                "unit": "patches/s",
                "vs_baseline": None,
            }
        )
    )


def bench_train_loop(args, state, run, accum, micro, size, metric) -> None:
    """Steady-state throughput of the production epoch-loop pipeline.

    Distinct pre-generated host batches cycle through ``prefetch_to_mesh``
    (H2D staging thread, depth 2) into the donated train step with the
    bounded-run-ahead sync — the exact hot-loop structure of
    train_swin_run/train_hat_run (cli/trainers.py), minus loader decode
    (measured separately) and per-epoch eval/checkpoint. The bare
    ``--mode train`` number pays a synchronous uint16 H2D transfer inside
    every step; the loop number overlaps it with device compute.
    """
    import jax

    from superresolution_def_tpu.parallel import (
        make_mesh, replicate, prefetch_to_mesh,
    )

    mesh = make_mesh(jax.devices()[:1])
    state = replicate(state, mesh)

    rng = np.random.default_rng(0)
    host_batches = [
        {
            "lr": rng.integers(0, 65535, (accum, micro, size, size, 1), dtype=np.uint16),
            "hr": rng.integers(
                0, 65535, (accum, micro, size * 4, size * 4, 1), dtype=np.uint16
            ),
        }
        for _ in range(4)
    ]

    def epoch(n):
        for i in range(n):
            yield host_batches[i % len(host_batches)]

    runahead = 8

    def timed_epoch(n_steps):
        nonlocal state
        metrics = []
        t0 = time.perf_counter()
        with prefetch_to_mesh(epoch(n_steps), mesh, batch_axis=1) as stream:
            for _, b in stream:
                state, m = run(state, b)
                metrics.append(m)
                if len(metrics) % runahead == 0:
                    jax.device_get(metrics[-runahead]["loss_g"])
        for m in jax.device_get(metrics):  # the per-epoch drain
            float(m["loss_g"])
        return time.perf_counter() - t0

    timed_epoch(2)  # compile + warm
    n = max(8, args.iters // 2)
    best = min(timed_epoch(n) for _ in range(3))
    pps = n * accum * micro / best
    print(
        json.dumps(
            {
                "metric": metric + "_loop",
                "value": round(pps, 3),
                "unit": "patches/s",
                "vs_baseline": None,
            }
        )
    )


def bench_prep(args) -> None:
    """Fused dataset-prep throughput (BASELINE config #5), end to end from a
    synthetic registered sky.

    Default: the single-dispatch fused path (prep/fused.py — one device
    program per observatory frame, only uint16 results come back).
    ``--impl xla``: the staged extract_patches + normalize_target pipeline
    (batched device math per stage, reference-identical sampling stats).
    CPU comparison: scripts/prep_cpu_baseline.py (reference-structure
    per-patch loop on the host over the same sky)."""
    import tempfile
    from pathlib import Path

    import jax.numpy as jnp

    from superresolution_def_tpu.prep import (
        TanWCS,
        write_fits,
        extract_patches,
        fused_prep_target,
        normalize_target,
        reproject_bilinear,
    )

    size = 2048
    scale = 2e-4
    rng = np.random.default_rng(0)
    sky = (rng.random((size, size)) * 0.6 + 0.2).astype(np.float32)
    w_h = TanWCS((10.0, 20.0), (size / 2, size / 2), cdelt=[-scale, scale])
    tmp = Path(tempfile.mkdtemp(prefix="bench_prep_"))
    (tmp / "hub").mkdir(); (tmp / "obs").mkdir()
    write_fits(tmp / "hub" / "reg_h.fits", sky, w_h.to_header())
    w_o = TanWCS((10.0, 20.0), (size / 8, size / 8), cdelt=[-scale * 4, scale * 4])
    obs = np.nan_to_num(reproject_bilinear(sky, w_h, w_o, (size // 4, size // 4)))
    write_fits(tmp / "obs" / "reg_o.fits", obs, w_o.to_header())

    if args.impl == "xla":
        t0 = time.perf_counter()
        n = extract_patches(
            tmp / "hub", tmp / "obs", tmp / "pairs", stride=128,
            hr_size=512, lr_size=128, log=lambda *a: None,
        )
        m = normalize_target(tmp / "pairs", tmp / "ready", log=lambda *a: None)
        dt = time.perf_counter() - t0
        metric = "staged_prep_pairs_per_sec"
    elif args.impl == "iofloor":
        # IO-only floor: write the SAME per-pair bytes (512² f32 + 128² f32
        # FITS, 512² + 128² u16 TIFFs) for the same pair count with NO
        # compute — bounds what any prep implementation can reach on this
        # host's filesystem. Uses the same writer pool as the fused path.
        from superresolution_def_tpu.prep.fused import (
            _WriterPool, _write_pair_fits, _write_pair_tiff,
        )

        n_pairs = ((size - 512) // 128 + 1) ** 2  # fused path's keep count
        hr_f32 = sky[:512, :512].copy()
        lr_f32 = obs[:128, :128].copy()
        hr_u16 = (hr_f32 * 65535).astype(np.uint16)
        lr_u16 = (lr_f32 * 65535).astype(np.uint16)
        hdr_h, hdr_l = w_h.to_header(), w_o.to_header()
        best = float("inf")
        for rep in range(2):
            out = tmp / f"run{rep}"
            (out / "pairs").mkdir(parents=True)
            (out / "ready").mkdir(parents=True)
            t0 = time.perf_counter()
            pool = _WriterPool()
            for i in range(n_pairs):
                name = f"pair_{i:06d}"
                pool.submit(
                    _write_pair_fits, out / "pairs" / name,
                    hr_f32, lr_f32, hdr_h, hdr_l,
                )
                pool.submit(_write_pair_tiff, out / "ready" / name, hr_u16, lr_u16)
            pool.drain()
            best = min(best, time.perf_counter() - t0)
        m, dt = n_pairs, best
        metric = "iofloor_prep_pairs_per_sec"
    else:
        # warm the device program's compile cache on a tiny shape-alike
        # run is unnecessary: compile happens once inside the timed region
        # like the staged path's first dispatch; report min of 2 to show
        # the steady-state number (compile dominates run 1)
        best, m = float("inf"), 0
        for rep in range(2):
            out = tmp / f"run{rep}"
            t0 = time.perf_counter()
            m = fused_prep_target(
                tmp / "hub", tmp / "obs", out / "pairs", out / "ready",
                stride=128, hr_size=512, lr_size=128, log=lambda *a: None,
            )
            best = min(best, time.perf_counter() - t0)
        dt = best
        metric = "fused_prep_pairs_per_sec"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    try:
        base = json.load(open("BENCH_BASELINE.json"))[
            "prep_cpu_baseline_pairs_per_sec"
        ]
        vs = round(m / dt / base, 2)
    except (OSError, KeyError, ZeroDivisionError):
        vs = None
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(m / dt, 3),
                "unit": "pairs/s",
                "vs_baseline": vs,
            }
        )
    )


if __name__ == "__main__":
    main()

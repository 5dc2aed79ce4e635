"""`sr` command-line entry — flag-driven or interactive, mirroring the
reference launchers (start_swin.py / start_hat.py / infer_*.py pickers).

Subcommands:
  sr split  --data-root data [--target T]        (prepare_data.py)
  sr train  --arch {swin,hat} --target M1,M33    (start_* + train_*)
  sr infer  --arch {swin,hat} [--folder RUN]     (infer_*)
  sr bench  [...]                                (bench.py passthrough)

Interactive mode (no --target / --folder): scans
data/*/8_dataset_split/splits_json/train.json for valid targets
(start_swin.py:15-25) or outputs/* for run folders (infer_swin.py:159-183)
and prompts with numbered menus. Devices need no menu — the mesh uses every
chip in the slice (the GPU picker + CUDA_VISIBLE_DEVICES/NCCL env plumbing
of start_swin.py:27-34,131-135 has no TPU equivalent by design).

Usage: python -m superresolution_def_tpu.cli.main <subcommand> ...
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

# persistent XLA compilation cache (set before jax initializes): repeated
# train/infer invocations skip the multi-minute remote compile
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")


def get_available_targets(data_root: str) -> list[str]:
    """Targets with a train split (start_swin.py:15-25)."""
    out = []
    for d in sorted(Path(data_root).glob("*")):
        if (d / "8_dataset_split" / "splits_json" / "train.json").exists():
            out.append(d.name)
    return out


def _pick_from(items: list[str], what: str, multi: bool = False) -> list[str]:
    if not items:
        sys.exit(f"No {what} found.")
    print(f"Available {what}:")
    for i, t in enumerate(items, 1):
        print(f"  [{i}] {t}")
    raw = input(f"Select {what}" + (" (comma-separated or 'all')" if multi else "") + ": ").strip()
    if multi and raw.lower() == "all":
        return items
    idxs = [int(x) - 1 for x in raw.split(",")]
    return [items[i] for i in idxs] if multi else [items[idxs[0]]]


def cmd_split(args) -> None:
    from ..prep.splits import prepare_full_dataset

    targets = args.target.split(",") if args.target else get_available_pair_targets(args.data_root)
    for t in targets:
        prepare_full_dataset(Path(args.data_root) / t)


def cmd_prep(args) -> None:
    """Run dataset prep steps 1-4 for each target (misc/Dataset_step*)."""
    from ..prep import (
        process_step1_folder,
        main_registration,
        mosaic_check,
        extract_patches,
        fused_prep_target,
        normalize_target,
        make_prep_logger,
    )

    steps = set((args.steps or "1,2,3,4").split(","))
    targets = args.target.split(",") if args.target else [
        p.name for p in sorted(Path(args.data_root).glob("*")) if (p / "1_originarie").exists()
    ]
    # timestamped log file + console, like the reference's step-1 logging
    # (Dataset_step1:44-54) but covering every step we run
    log, log_path = make_prep_logger(Path(args.data_root) / "logs", prefix="prep")
    log(f"prep steps={sorted(steps)} targets={targets} (log: {log_path})")
    for t in targets:
        root = Path(args.data_root) / t
        orig = root / "1_originarie"
        solved_o = root / "2_solved_astap" / "observatory"
        solved_h = root / "2_solved_astap" / "hubble"
        reg_o = root / "3_registered_native" / "observatory"
        reg_h = root / "3_registered_native" / "hubble"
        if "1" in steps:
            process_step1_folder(orig / "local_raw", solved_o, log=log)
            process_step1_folder(orig / "img_lights", solved_h, log=log)
            main_registration(solved_h, solved_o, reg_h, reg_o, log=log)
        if "2" in steps:
            mosaic_check(
                reg_h, reg_o, root / "4_quality_check" / f"{t}_mosaic_check.png",
                target_name=t, log=log,
            )
        if args.fused and {"3", "4"} <= steps:
            # config #5 hot path: steps 3+4 as device-resident programs
            # (prep/fused.py). No per-patch debug cards/zips on this path —
            # use the staged steps when those artifacts are wanted.
            fused_prep_target(
                reg_h, reg_o, root / "6_patches_final",
                root / "7_dataset_ready_LOG",
                target_name=t, desired_count=args.desired_count, log=log,
            )
        else:
            if args.fused:
                log("[prep] --fused needs both steps 3 and 4; running staged")
            if "3" in steps:
                extract_patches(
                    reg_h, reg_o, root / "6_patches_final",
                    target_name=t, desired_count=args.desired_count,
                    debug_dir=root / "6_patches_final_debug",
                    zip_outputs=True, log=log,
                )
            if "4" in steps:
                normalize_target(
                    root / "6_patches_final", root / "7_dataset_ready_LOG",
                    debug_dir=root / "7_dataset_ready_LOG_debug",
                    zip_debug=True, log=log,
                )


def get_available_pair_targets(data_root: str) -> list[str]:
    out = []
    for d in sorted(Path(data_root).glob("*")):
        if (d / "7_dataset_ready_LOG").exists() or (d / "7_dataset_ready").exists():
            out.append(d.name)
    return out


def cmd_train(args) -> None:
    from .trainers import (
        SwinTrainConfig,
        HATTrainConfig,
        train_swin_run,
        train_hat_run,
    )

    if args.target:
        targets = args.target.split(",")
    else:
        targets = _pick_from(get_available_targets(args.data_root), "targets", multi=True)

    common = dict(
        targets=tuple(targets),
        data_root=args.data_root,
        outputs_root=args.outputs_root,
        epochs=args.epochs,
        use_bf16=args.bf16,
        attn_impl=args.attn_impl,
        remat=args.remat,
        use_vgg=not args.no_vgg,
        vgg_weights=args.vgg_weights,
        seed=args.seed,
        max_steps_per_epoch=args.max_steps_per_epoch,
    )
    if args.img_size:
        common["img_size"] = args.img_size
    if args.embed_dim:
        common["embed_dim"] = args.embed_dim
    if args.depths:
        d = [int(x) for x in args.depths.split(",")]
        common["depths"] = tuple(d)
        common["num_heads"] = tuple([args.num_heads] * len(d))
    if args.arch == "swin":
        cfg = SwinTrainConfig(**common)
        if args.batch_size:
            cfg.batch_size = args.batch_size
        if args.accum_steps:
            cfg.accum_steps = args.accum_steps
        if args.remat_loss is not None:  # None keeps the per-arch default
            cfg.remat_loss = args.remat_loss
        if args.fused is not None:
            cfg.fused = args.fused == "on"
        train_swin_run(cfg, resume=not args.no_resume)
    else:
        cfg = HATTrainConfig(**common)
        if args.batch_size:
            cfg.batch_size = args.batch_size
        if args.accum_steps:
            cfg.accum_steps = args.accum_steps
        if args.remat_loss is not None:
            cfg.remat_loss = args.remat_loss
        if args.fused is not None:
            cfg.fused = args.fused == "on"
        cfg.pretrained_hat = args.pretrained_hat
        train_hat_run(cfg, resume=not args.no_resume)


def cmd_infer(args) -> None:
    from .infer import run_test

    if args.folder:
        folder = args.folder
        # bare run names (the interactive picker's vocabulary, and what the
        # reference's infer_swin.py:159-183 prompt accepts) resolve against
        # --outputs-root; explicit paths pass through untouched
        if not Path(folder).is_dir() and (Path(args.outputs_root) / folder).is_dir():
            folder = str(Path(args.outputs_root) / folder)
    else:
        runs = sorted(str(p) for p in Path(args.outputs_root).glob("*") if p.is_dir())
        folder = _pick_from(runs, "run folders")[0]
    result = run_test(
        folder,
        args.arch,
        data_root=args.data_root,
        lr_size=args.lr_size,
        hr_size=args.hr_size,
        limit=args.limit,
        manifest=args.manifest,
        impl=args.impl,
    )
    print(
        f"Test: {result['num_images']} images  "
        f"PSNR={result['psnr']:.2f} dB  SSIM={result['ssim']:.4f}"
    )


def cmd_upscale(args) -> None:
    """SR an arbitrary-size image (16-bit TIFF or FITS) with tiled inference."""
    import numpy as np
    from .infer import load_generator, tiled_sr
    from ..data.tiff import read_tiff_u16, write_tiff_u16
    from ..parallel import make_mesh

    src = Path(args.image)
    if src.suffix.lower() in (".fits", ".fit", ".fts"):
        from ..prep import read_fits
        from ..ops.normalize import robust_minmax, log_stretch_normalize

        raw = np.nan_to_num(read_fits(src).data)
        lo, hi = robust_minmax(raw)
        img01 = np.asarray(log_stretch_normalize(raw, lo, hi))
    else:
        img01 = read_tiff_u16(src).astype(np.float32) / 65535.0

    apply_fn, params, info = load_generator(args.folder, args.arch)
    if args.spatial:
        # halo-exact context parallelism: the whole frame in ONE sharded
        # program, H sharded over every chip (no tile blending at all)
        from .infer import _build_model_from_params
        from ..parallel import make_spatial_swinir, make_spatial_hybrid

        mesh = make_mesh()
        n = mesh.devices.size
        model = _build_model_from_params(args.arch, params)
        quantum = n * model.window_size
        h, w = img01.shape[:2]
        ph = (quantum - h % quantum) % quantum
        pw = (model.window_size - w % model.window_size) % model.window_size
        xin = np.pad(img01, ((0, ph), (0, pw)), mode="reflect")[None, ..., None]
        if args.arch == "swin":
            fn = make_spatial_swinir(
                mesh, depths=model.depths, num_heads=model.num_heads,
                window_size=model.window_size, upscale=model.upscale,
            )
        else:
            fn = make_spatial_hybrid(
                mesh, depths=model.depths, num_heads=model.num_heads,
                window_size=model.window_size, num_rrdb=model.num_rrdb,
            )
        sr = np.asarray(fn(params, xin))[0, : h * 4, : w * 4]
    else:
        mesh = make_mesh() if args.mesh else None
        sr = tiled_sr(
            apply_fn, params, img01,
            tile=args.tile, overlap=args.overlap, scale=4, mesh=mesh,
        )
    out = args.out or str(src.with_suffix("")) + "_sr.tiff"
    write_tiff_u16(out, sr[..., 0])
    print(f"{src} {img01.shape} -> {out} {sr.shape[:2]}  [ckpt: {info['source']}]")


def cmd_bench(args, extra) -> None:
    import subprocess

    sys.exit(subprocess.call([sys.executable, "bench.py", *extra]))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="sr", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("split", help="build 80/10/10 split manifests")
    ps.add_argument("--data-root", default="data")
    ps.add_argument("--target", default=None)

    pp = sub.add_parser("prep", help="dataset prep steps 1-4 (solve/register/QC/patches/normalize)")
    pp.add_argument("--data-root", default="data")
    pp.add_argument("--target", default=None)
    pp.add_argument("--steps", default=None, help="comma subset of 1,2,3,4")
    pp.add_argument("--desired-count", type=int, default=None)
    pp.add_argument(
        "--fused", action="store_true",
        help="run steps 3+4 as the device-resident fused pipeline "
             "(prep/fused.py, BASELINE config #5; skips per-patch debug "
             "cards/zips)",
    )

    pt = sub.add_parser("train", help="train a generator")
    pt.add_argument("--arch", choices=["swin", "hat"], default="swin")
    pt.add_argument("--target", default=None, help="comma-separated targets")
    pt.add_argument("--data-root", default="data")
    pt.add_argument("--outputs-root", default="outputs")
    pt.add_argument("--epochs", type=int, default=300)
    pt.add_argument("--batch-size", type=int, default=None)
    pt.add_argument("--bf16", action="store_true")
    pt.add_argument("--remat", action="store_true", help="checkpoint blocks (less memory, more compute)")
    pt.add_argument(
        "--remat-loss", action=argparse.BooleanOptionalAction, default=None,
        help="checkpoint both loss phases (D pair + VGG) so only generator "
             "residuals peak in HBM; enables micro-batch >= 4 at full size "
             "(algebra-identical, train/steps.py). Default: the per-arch "
             "measured winner (swin on — required for its default micro-8 "
             "split; hat off)",
    )
    pt.add_argument("--accum-steps", type=int, default=None,
                    help="gradient-accumulation micro-steps per optimizer step")
    pt.add_argument("--attn-impl", choices=["xla", "pallas"], default=None)
    pt.add_argument(
        "--fused", choices=["on", "off"], default=None,
        help="swin: fused Pallas fwd+bwd for the generator (1.4x on one TPU "
             "chip). Default auto: on for ALL TPU bf16 runs, off elsewhere; "
             "multi-device meshes run the fused generator per-shard under "
             "shard_map",
    )
    pt.add_argument("--no-vgg", action="store_true")
    pt.add_argument("--vgg-weights", default=None)
    pt.add_argument("--pretrained-hat", default=None,
                    help="HAT-only checkpoint (.pth or orbax) to seed the hybrid backbone")
    pt.add_argument("--no-resume", action="store_true")
    pt.add_argument("--seed", type=int, default=0)
    # model/config knobs (reference hardcodes these; SURVEY.md §5 config)
    pt.add_argument("--img-size", type=int, default=None)
    pt.add_argument("--embed-dim", type=int, default=None)
    pt.add_argument("--depths", default=None, help="comma list, e.g. 6,6,6,6,6,6")
    pt.add_argument("--num-heads", type=int, default=6)
    pt.add_argument("--max-steps-per-epoch", type=int, default=None)

    pi = sub.add_parser("infer", help="evaluate a trained run on its test split")
    pi.add_argument("--arch", choices=["swin", "hat"], default="swin")
    pi.add_argument("--folder", default=None)
    pi.add_argument("--data-root", default="data")
    pi.add_argument("--outputs-root", default="outputs")
    pi.add_argument("--limit", type=int, default=None)
    pi.add_argument("--lr-size", type=int, default=128,
                    help="LR patch size of the dataset (reference: 128)")
    pi.add_argument("--hr-size", type=int, default=512,
                    help="HR patch size of the dataset (reference: 512)")
    pi.add_argument("--manifest", default=None)
    pi.add_argument("--impl", choices=["fused"], default=None,
                    help="'fused' = VMEM Pallas kernels, bf16 (swin whole-block "
                         "2.1x; hybrid HAB+OCAB+channels-major-RDB 1.9x)")

    pu = sub.add_parser("upscale", help="tiled x4 SR of an arbitrary-size TIFF/FITS image")
    pu.add_argument("image")
    pu.add_argument("--folder", required=True, help="trained run folder (checkpoint source)")
    pu.add_argument("--arch", choices=["swin", "hat"], default="swin")
    pu.add_argument("--out", default=None)
    pu.add_argument("--tile", type=int, default=128)
    pu.add_argument("--overlap", type=int, default=16)
    pu.add_argument("--mesh", action="store_true", help="shard tiles over all chips")
    pu.add_argument("--spatial", action="store_true",
                    help="halo-exact spatial sharding instead of tile blending")

    sub.add_parser("bench", help="run bench.py (extra flags passed through)")

    args, extra = p.parse_known_args(argv)
    if args.cmd == "split":
        cmd_split(args)
    elif args.cmd == "prep":
        cmd_prep(args)
    elif args.cmd == "train":
        cmd_train(args)
    elif args.cmd == "infer":
        cmd_infer(args)
    elif args.cmd == "upscale":
        cmd_upscale(args)
    elif args.cmd == "bench":
        cmd_bench(args, extra)


if __name__ == "__main__":
    main()

"""Train state for the two-network GAN engine.

One pytree holds everything the reference spreads across DDP modules,
optimizers, GradScaler and ModelEMA (train_swin.py:147-169): generator and
discriminator params, both AdamW states, the EMA shadow, and the
discriminator's spectral power-iteration vectors. fp32 master params; the
compute dtype is a model property (bf16 on TPU replaces CUDA AMP — no loss
scaler is needed because bf16 has fp32's exponent range).

Optimizers are optax.adamw wrapped in inject_hyperparams so the per-epoch
cosine LR (schedule.py) is set functionally inside the jitted step.
Reference optimizer configs:
  - swin: AdamW(lr=1e-4, betas=(0.9, 0.99), weight_decay=0) for G and D
    (train_swin.py:160-161).
  - hat: AdamW(lr=1e-4, betas=(0.9, 0.99)) — torch's DEFAULT weight_decay
    0.01 applies (train_hat.py:152-153); replicated deliberately.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models import (
    SwinIR,
    HybridHATRealESRGAN,
    UNetDiscriminatorSNSwin,
    UNetDiscriminatorSNHAT,
)
from .ema import ema_init


class GANTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    ema: Any
    spectral: Any
    rng: jax.Array


@dataclasses.dataclass(frozen=True)
class GANBundle:
    """Static (non-pytree) companions of a GANTrainState."""

    g_apply: Callable
    d_apply: Callable
    g_tx: optax.GradientTransformation
    d_tx: optax.GradientTransformation
    g_module: Any = None
    d_module: Any = None


def _adamw(lr: float, weight_decay: float) -> optax.GradientTransformation:
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr, b1=0.9, b2=0.99, eps=1e-8, weight_decay=weight_decay
    )


def _make_state(rng, g_module, d_module, lr_size, hr_size, g_wd, d_wd):
    kg, kd, ks = jax.random.split(rng, 3)
    lr_dummy = jnp.zeros((1, lr_size, lr_size, 1), jnp.float32)
    hr_dummy = jnp.zeros((1, hr_size, hr_size, 1), jnp.float32)
    g_vars = g_module.init(kg, lr_dummy)
    d_vars = d_module.init(kd, hr_dummy)
    g_params = g_vars["params"]
    d_params = d_vars["params"]
    spectral = d_vars.get("spectral", {})

    g_tx = _adamw(1e-4, g_wd)
    d_tx = _adamw(1e-4, d_wd)
    state = GANTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        g_opt=g_tx.init(g_params),
        d_opt=d_tx.init(d_params),
        ema=ema_init(g_params),
        spectral=spectral,
        rng=ks,
    )
    bundle = GANBundle(
        g_apply=g_module.apply,
        d_apply=d_module.apply,
        g_tx=g_tx,
        d_tx=d_tx,
        g_module=g_module,
        d_module=d_module,
    )
    return state, bundle


def create_swin_train_state(
    rng: jax.Array,
    *,
    img_size: int = 128,
    upscale: int = 4,
    embed_dim: int = 180,
    depths=(6,) * 6,
    num_heads=(6,) * 6,
    window_size: int = 8,
    # reference-EFFECTIVE value: train_swin.py:149 passes 2 but the torch
    # constructor swallows it and blocks default to 4 (architecture_swin.py
    # :100,193-194)
    mlp_ratio: float = 4.0,
    dtype=jnp.float32,
    attn_impl: str | None = None,
    remat: bool = False,
    fused: bool = False,
    fused_mesh=None,
):
    """Reference swin train config (train_swin.py:147-156).

    ``fused=True`` routes the generator's forward AND backward through the
    whole-block VMEM Pallas kernels (kernels/swin_block.py) — same params
    tree, 2x the XLA forward on-chip. Pallas custom calls are not
    SPMD-partitionable, so on a data-parallel mesh pass ``fused_mesh`` and
    the fused generator is wrapped in ``shard_map`` over the batch axis
    (params replicated per device, autodiff inserts the psum).
    """
    g = SwinIR(
        img_size=img_size,
        in_chans=1,
        embed_dim=embed_dim,
        depths=tuple(depths),
        num_heads=tuple(num_heads),
        window_size=window_size,
        mlp_ratio=mlp_ratio,
        upscale=upscale,
        dtype=dtype,
        attn_impl=attn_impl,
        remat=remat,
    )
    d = UNetDiscriminatorSNSwin(num_in_ch=1, num_feat=64, dtype=dtype)
    state, bundle = _make_state(
        rng, g, d, img_size, img_size * upscale, g_wd=0.0, d_wd=0.0
    )
    if fused:
        from ..kernels.swin_block import make_fused_swinir

        fused_fn = make_fused_swinir(
            depths=tuple(depths), num_heads=tuple(num_heads),
            window_size=window_size, upscale=upscale, dtype=dtype,
            differentiable=True,
        )
        if fused_mesh is not None:
            from jax.sharding import PartitionSpec as P

            axis = fused_mesh.axis_names[0]
            # check_vma=False: pallas_call out_shapes carry no vma info.
            # jit the shard_map: eager shard_map dispatches PER PRIMITIVE
            # (one pjit lowering each) — under jit it traces once; nested
            # inside the jitted train step it inlines.
            sharded = jax.jit(jax.shard_map(
                fused_fn, mesh=fused_mesh,
                in_specs=(P(), P(axis)), out_specs=P(axis),
                check_vma=False,
            ))

            def g_apply_fused(variables, x, *a, **k):
                return sharded(variables["params"], x)
        else:
            def g_apply_fused(variables, x, *a, **k):
                return fused_fn(variables["params"], x)
        bundle = dataclasses.replace(bundle, g_apply=g_apply_fused)
    return state, bundle


def create_hat_train_state(
    rng: jax.Array,
    *,
    img_size: int = 128,
    embed_dim: int = 90,
    depths=(6, 6, 6, 6),
    num_heads=(6, 6, 6, 6),
    window_size: int = 8,
    num_rrdb: int = 12,
    num_feat: int = 48,
    num_grow_ch: int = 24,
    dtype=jnp.float32,
    attn_impl: str | None = None,
    remat: bool = False,
    fused: bool = False,
    fused_hab: bool = False,
    fused_mesh=None,
    fused_interpret: bool = False,
    drop_path_rate: float = 0.1,
):
    """Reference 'Soft' hybrid config (train_hat.py:132-136).

    ``fused=True`` routes the RRDB trunk's forward AND backward through the
    channels-major Pallas kernels (kernels/fused_rdb_cm{,_bwd}.py) — the
    trunk is ~half the hybrid's cost, the backward recomputes in-VMEM so
    no trunk activations are stashed. The HAT backbone and heads stay the
    flax model (drop-path semantics preserved). Requires the trunk width
    (2*img_size) to be a multiple of 128; falls back to the flax apply
    otherwise. ``fused_interpret`` runs the kernels in interpret mode
    (CPU tests only).
    """
    g = HybridHATRealESRGAN(
        img_size=img_size,
        in_chans=1,
        embed_dim=embed_dim,
        depths=tuple(depths),
        num_heads=tuple(num_heads),
        window_size=window_size,
        upscale=4,
        num_rrdb=num_rrdb,
        num_feat=num_feat,
        num_grow_ch=num_grow_ch,
        dtype=dtype,
        attn_impl=attn_impl,
        remat=remat,
        drop_path_rate=drop_path_rate,
    )
    d = UNetDiscriminatorSNHAT(num_in_ch=1, num_feat=64, dtype=dtype)
    state, bundle = _make_state(rng, g, d, img_size, img_size * 4, g_wd=0.01, d_wd=0.01)
    if fused and (2 * img_size) % 128 == 0:
        from ..models.hat import HAT
        from ..kernels.fused_hat import _conv3, make_fused_hat_train
        from ..kernels.fused_rdb_cm_bwd import fused_rrdb_trunk_cm_ad
        from ..ops.resize import resize_nearest

        if fused_hab:
            # measured SLOWER than the flax backbone on config #4 (3.88 vs
            # 4.50 p/s: head_dim-15 matmuls underfill the MXU and the
            # custom-VJP stash adds HBM traffic) — kept as an option, off
            # by default; gradient-exact per tests/test_fused_hat_train.py
            hat_fn = make_fused_hat_train(
                depths=tuple(depths), num_heads=tuple(num_heads),
                window_size=window_size, dtype=dtype,
                drop_path_rate=drop_path_rate,
            )

            def hat_fwd(p_hat, x, deterministic, rngs):
                rng = rngs.get("droppath") if rngs else None
                return hat_fn(p_hat, x, deterministic, rng)
        else:
            hat_mod = HAT(
                img_size=img_size, in_chans=1, embed_dim=embed_dim,
                depths=tuple(depths), num_heads=tuple(num_heads),
                window_size=window_size, upscale=2, upsampler="pixelshuffle",
                img_range=1.0, dtype=dtype, attn_impl=attn_impl, remat=remat,
                drop_path_rate=drop_path_rate,
            )

            def hat_fwd(p_hat, x, deterministic, rngs):
                return hat_mod.apply({"params": p_hat}, x, deterministic, rngs=rngs)

        def lrelu2(v):
            return jnp.where(v >= 0, v, v * 0.2)

        def core_fwd(p, x, deterministic, rngs):
            hat_out = hat_fwd(p["hat"], x, deterministic, rngs)
            feat = lrelu2(_conv3(p["conv_adapt"], hat_out))
            trunk = fused_rrdb_trunk_cm_ad(
                p, feat, num_rrdb, interpret=fused_interpret
            )
            trunk = _conv3(p["conv_body"], trunk)
            feat = feat + trunk
            feat = lrelu2(_conv3(p["conv_up"], resize_nearest(feat, 2)))
            return _conv3(p["conv_last"], lrelu2(_conv3(p["conv_hr"], feat)))

        if fused_mesh is not None:
            from jax.sharding import PartitionSpec as P

            axis = fused_mesh.axis_names[0]
            _sharded_cache = {}

            def _sharded(det: bool):
                if det not in _sharded_cache:
                    def local(p, x, key):
                        # per-shard drop-path stream, like per-rank torch
                        k = jax.random.fold_in(key, jax.lax.axis_index(axis))
                        rngs = None if det else {"droppath": k}
                        return core_fwd(p, x, det, rngs)

                    # jit the shard_map: eager shard_map dispatches PER
                    # PRIMITIVE (one pjit lowering per op — the flax HAT
                    # body has hundreds, which presents as a hang); under
                    # jit it traces once and inlines in the train step.
                    _sharded_cache[det] = jax.jit(jax.shard_map(
                        local, mesh=fused_mesh,
                        in_specs=(P(), P(axis), P()), out_specs=P(axis),
                        check_vma=False,
                    ))
                return _sharded_cache[det]

            def fused_g_apply(variables, x, deterministic=True, rngs=None, **_):
                key = (rngs or {}).get("droppath")
                if key is None:
                    if not deterministic:
                        # match flax's missing-rng error instead of silently
                        # reusing PRNGKey(0) every step (ADVICE r2)
                        raise ValueError(
                            "fused hybrid apply with deterministic=False "
                            "requires rngs={'droppath': key}"
                        )
                    key = jax.random.PRNGKey(0)
                return _sharded(bool(deterministic))(variables["params"], x, key)
        else:
            def fused_g_apply(variables, x, deterministic=True, rngs=None, **_):
                return core_fwd(variables["params"], x, deterministic, rngs)

        bundle = dataclasses.replace(bundle, g_apply=fused_g_apply)
    return state, bundle

"""Jitted GAN train/eval steps — the reference's hot loops as single XLA programs.

Each step consumes ONE accumulation window: a uint16 batch of shape
(accum, micro_batch, H, W, 1). Normalization (/65535,
astronomical_dataset_swin.py:34-35), paired augmentation (:57-67), both loss
phases, gradient accumulation (lax.scan over micro-batches), the NaN guard,
optimizer updates and EMA all fuse into one compiled program — the TPU
equivalent of train_swin.py:210-259 / train_hat.py:219-266 with zero host
round-trips inside the window.

Faithful update algebra:
  - swin (train_swin.py): D phase FIRST on stop_gradient(sr) (d_real=D(hr)
    then d_fake=D(sr)), then G phase (d_fake=D(sr) then d_real=sg(D(hr))),
    RaGAN both sides, loss/ACCUM, NaN-in-loss resets that optimizer's
    accumulated grads and (for D-NaN) skips the G phase — reference
    `continue` at :226-229,248-251. EMA after the G step.
  - hat (train_hat.py): G phase FIRST (L1-only during warmup epochs <= 30),
    then D on stop_gradient(sr); no NaN guard; EMA per optimizer step;
    train-set PSNR/SSIM accumulated on the fly (:228).
  - every D forward runs in training mode, so each advances the spectral
    power iteration — 4 per swin micro-batch, in reference order.

Documented deviations (intent-preserving, see SURVEY.md §7.3):
  - The D phase reuses the G-phase forward activations via jax.vjp instead
    of a second no-grad G forward — the network is deterministic, so the
    values are bit-identical and one full generator forward is saved.
  - The optimizer steps exactly once per window even if the window's last
    micro-batch hit the NaN guard (torch would defer to the next window).
  - bf16 compute replaces CUDA fp16 AMP; no GradScaler is needed (bf16
    keeps fp32's exponent range) so `scaler.update()` has no equivalent.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..data.augment import augment_pair_batch
from ..ops.metrics import psnr as psnr_fn, ssim as ssim_fn
from .ema import ema_update, EMA_DECAY
from .losses import CombinedGANLoss, DiscriminatorLoss, l1_loss
from .state import GANTrainState, GANBundle

Tree = Any

# remat_loss policy: keep only the tagged stage boundaries (discriminators'
# "d_stage", VGG's "vgg_block") across the loss-tail backward; recompute each
# segment's interior from its boundary. A bare jax.checkpoint (save nothing)
# does NOT lower the peak here — the tail's forward and backward are adjacent,
# so the whole recomputed U-Net would be live at once (measured: 19.17G at
# micro 4 vs 17.96G un-rematted); per-segment boundaries are what let XLA
# free one segment before recomputing the next.
_LOSS_TAIL_POLICY = jax.checkpoint_policies.save_only_these_names(
    "d_stage", "vgg_block"
)


def _tree_zeros_like(t: Tree) -> Tree:
    return jax.tree_util.tree_map(jnp.zeros_like, t)


def _tree_add(a: Tree, b: Tree) -> Tree:
    return jax.tree_util.tree_map(jnp.add, a, b)


def _tree_where(pred, a: Tree, b: Tree) -> Tree:
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


def _set_lr(opt_state, lr):
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = lr
    return opt_state._replace(hyperparams=hp)


def _to01(u16: jnp.ndarray) -> jnp.ndarray:
    return u16.astype(jnp.float32) / 65535.0


def _d_apply_pair(d_apply, d_params, spectral, first, second):
    """Two training-mode D forwards in order, threading spectral state."""
    out1, m1 = d_apply(
        {"params": d_params, "spectral": spectral}, first, True, mutable=["spectral"]
    )
    out2, m2 = d_apply(
        {"params": d_params, "spectral": m1["spectral"]}, second, True, mutable=["spectral"]
    )
    return out1, out2, m2["spectral"]


def make_swin_train_step(
    bundle: GANBundle,
    *,
    accum_steps: int = 4,
    augment: bool = True,
    criterion_g: CombinedGANLoss | None = None,
    criterion_d: DiscriminatorLoss | None = None,
    ema_decay: float = EMA_DECAY,
    remat_loss: bool = False,
    donate: bool = True,
):
    """SwinIR-GAN step. Batch: {'lr','hr'} uint16 (accum, B, H, W, 1).

    ``donate``: hand the input state's buffers to XLA (callers reassign
    ``state = step(state, ...)``), halving the state's HBM footprint.
    Pass False in tests that keep using the pre-step state (donated
    buffers are deleted on every backend, including CPU).

    ``remat_loss`` wraps BOTH loss phases' tails in ``jax.checkpoint``: the
    G-phase tail (D pair + the VGG perceptual term downstream of sr) and
    the D-phase loss (two more D forwards, differentiated wrt d_params).
    Their 512^2 activations — dominated by the UNet-D's leaky-relu
    residuals, ~260M per select at micro 4 — are recomputed during the
    backward instead of stashed, so the HBM peak drops to the generator's
    own residuals. The algebra is unchanged (recompute is bit-identical,
    tests/test_train_steps.py); the cost is re-running the cheap D/VGG
    forwards once each in the backward. Enables larger micro-batches
    (better MXU fill) on a 16G chip.
    """
    criterion_g = criterion_g or CombinedGANLoss(
        pixel_weight=1.0, perceptual_weight=0.5, adversarial_weight=0.005
    )
    criterion_d = criterion_d or DiscriminatorLoss()
    g_apply, d_apply = bundle.g_apply, bundle.d_apply

    # donate the state: production callers reassign `state = step(state, ..)`,
    # so XLA writes the new params/opt-moments/EMA in place instead of
    # double-buffering the whole state (params + 2 adam moments per net +
    # EMA) in HBM.
    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: GANTrainState, batch, lr_g, lr_d):
        rng, step_key = jax.random.split(state.rng)
        mb_keys = jax.random.split(step_key, accum_steps)

        g_params, d_params = state.g_params, state.d_params

        def micro(carry, inp):
            g_acc, d_acc, spectral, valid, g_loss_sum, d_loss_sum = carry
            lr_u16, hr_u16, key = inp
            lr01, hr01 = _to01(lr_u16), _to01(hr_u16)
            if augment:
                lr01, hr01 = augment_pair_batch(lr01, hr01, key)

            # ---- generator forward once, residuals kept for the backward --
            sr, g_vjp = jax.vjp(lambda p: g_apply({"params": p}, lr01), g_params)
            sr_sg = jax.lax.stop_gradient(sr)

            # ---- D phase (reference order: real then fake) ----------------
            def d_loss_fn(dp, spec):
                d_real, d_fake, spec = _d_apply_pair(d_apply, dp, spec, hr01, sr_sg)
                loss, _ = criterion_d(d_real, d_fake)
                return loss / accum_steps, spec

            if remat_loss:
                d_loss_fn = jax.checkpoint(d_loss_fn, policy=_LOSS_TAIL_POLICY)
            (d_loss, spec1), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
                d_params, spectral
            )
            d_ok = jnp.isfinite(d_loss)
            # NaN -> reference zero_grad(): drop the accumulated D grads
            d_acc = _tree_where(d_ok, _tree_add(d_acc, d_grads), _tree_zeros_like(d_acc))

            # ---- G phase (fake then real; d_real detached) ----------------
            def g_rest_fn(sr_in, spec):
                d_fake, d_real, spec = _d_apply_pair(d_apply, d_params, spec, sr_in, hr01)
                loss, _ = criterion_g(
                    sr_in, hr01, jax.lax.stop_gradient(d_real), d_fake
                )
                return loss / accum_steps, spec

            if remat_loss:
                g_rest_fn = jax.checkpoint(g_rest_fn, policy=_LOSS_TAIL_POLICY)
            (g_loss, spec2), sr_grad = jax.value_and_grad(g_rest_fn, has_aux=True)(
                sr, spec1
            )
            (g_grads,) = g_vjp(sr_grad)
            g_ok = jnp.isfinite(g_loss)

            # D-NaN `continue` skips the G phase entirely (incl. its spectral
            # updates); G-NaN resets the accumulated G grads.
            g_acc = _tree_where(
                d_ok & g_ok,
                _tree_add(g_acc, g_grads),
                _tree_where(d_ok, _tree_zeros_like(g_acc), g_acc),
            )
            spectral = _tree_where(d_ok, spec2, spec1)
            both = d_ok & g_ok
            valid = valid + both.astype(jnp.float32)
            g_loss_sum = g_loss_sum + jnp.where(both, g_loss * accum_steps, 0.0)
            d_loss_sum = d_loss_sum + jnp.where(both, d_loss * accum_steps, 0.0)
            return (g_acc, d_acc, spectral, valid, g_loss_sum, d_loss_sum), None

        init = (
            _tree_zeros_like(g_params),
            _tree_zeros_like(d_params),
            state.spectral,
            jnp.zeros(()),
            jnp.zeros(()),
            jnp.zeros(()),
        )
        (g_acc, d_acc, spectral, valid, g_sum, d_sum), _ = jax.lax.scan(
            micro, init, (batch["lr"], batch["hr"], mb_keys)
        )

        d_opt = _set_lr(state.d_opt, lr_d)
        d_updates, d_opt = bundle.d_tx.update(d_acc, d_opt, d_params)
        d_params = jax.tree_util.tree_map(jnp.add, d_params, d_updates)

        g_opt = _set_lr(state.g_opt, lr_g)
        g_updates, g_opt = bundle.g_tx.update(g_acc, g_opt, g_params)
        g_params = jax.tree_util.tree_map(jnp.add, g_params, g_updates)

        ema = ema_update(state.ema, g_params, ema_decay)

        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            g_opt=g_opt,
            d_opt=d_opt,
            ema=ema,
            spectral=spectral,
            rng=rng,
        )
        metrics = {
            "loss_g": g_sum / jnp.maximum(valid, 1.0),
            "loss_d": d_sum / jnp.maximum(valid, 1.0),
            "valid_batches": valid,
        }
        return new_state, metrics

    return step


def make_hat_train_step(
    bundle: GANBundle,
    *,
    accum_steps: int = 16,
    augment: bool = True,
    criterion_g: CombinedGANLoss | None = None,
    criterion_d: DiscriminatorLoss | None = None,
    ema_decay: float = EMA_DECAY,
    remat_loss: bool = False,
    donate: bool = True,
    train_metrics: bool = True,
):
    """Hybrid-HAT step; returns a step(state, batch, lr_g, lr_d, warmup).

    ``train_metrics``: compute live train-set PSNR/SSIM per micro like the
    reference's per-batch ``metrics.update(sr, hr)`` (train_hat.py:228).
    False zeroes those sums (perf attribution only — the trainers keep the
    reference semantics).

    ``donate``: see make_swin_train_step — False for tests that reuse the
    pre-step state.

    ``warmup`` is a static python bool (epochs <= 30 run L1-only,
    train_hat.py:236-244) — two compiled specializations.

    ``remat_loss``: see make_swin_train_step — checkpoints the G-phase loss
    tail (D pair + VGG) AND the D phase so only the generator's own
    residuals occupy HBM at the peak, enabling micro-batch 4/8 at full size
    on a 16G chip (the un-rematted micro-4 step needs 17.96G; with G-tail
    remat alone it needs 19.17G — the UNet-D stash is the binding term; the
    phases run ~2.5x faster per patch at micro 8 than micro 1, PERF.md
    round-4 attribution).
    """
    criterion_g = criterion_g or CombinedGANLoss(
        pixel_weight=1.0, perceptual_weight=1.0, adversarial_weight=0.005
    )
    criterion_d = criterion_d or DiscriminatorLoss()
    g_apply, d_apply = bundle.g_apply, bundle.d_apply

    # state donated for the same reason as the swin step (callers reassign);
    # NOTE donation is per-specialization — the warmup=True and warmup=False
    # programs each donate their own input state, which is fine because a
    # given epoch only runs one of them.
    @functools.partial(
        jax.jit, static_argnames=("warmup",),
        donate_argnums=(0,) if donate else (),
    )
    def step(state: GANTrainState, batch, lr_g, lr_d, warmup: bool = False):
        rng, step_key = jax.random.split(state.rng)
        mb_keys = jax.random.split(step_key, accum_steps)

        g_params, d_params = state.g_params, state.d_params

        def micro(carry, inp):
            g_acc, d_acc, spectral, sums = carry
            lr_u16, hr_u16, key = inp
            akey, dkey = jax.random.split(key)
            lr01, hr01 = _to01(lr_u16), _to01(hr_u16)
            if augment:
                lr01, hr01 = augment_pair_batch(lr01, hr01, akey)

            sr, g_vjp = jax.vjp(
                lambda p: g_apply(
                    {"params": p},
                    lr01,
                    False,
                    rngs={"droppath": dkey},
                ),
                g_params,
            )
            sr_sg = jax.lax.stop_gradient(sr)

            # ---- G phase first (train_hat.py:225-251) ---------------------
            if warmup:
                def g_rest_fn(sr_in, spec):
                    return l1_loss(sr_in, hr01) / accum_steps, (spec, 0.0)
            else:
                def g_rest_fn(sr_in, spec):
                    d_fake, d_real, spec = _d_apply_pair(
                        d_apply, d_params, spec, sr_in, hr01
                    )
                    loss, parts = criterion_g(
                        sr_in, hr01, jax.lax.stop_gradient(d_real), d_fake
                    )
                    return loss / accum_steps, (spec, parts["adversarial"])

                if remat_loss:
                    g_rest_fn = jax.checkpoint(g_rest_fn, policy=_LOSS_TAIL_POLICY)

            (g_loss, (spec1, g_adv)), sr_grad = jax.value_and_grad(
                g_rest_fn, has_aux=True
            )(sr, spectral)
            (g_grads,) = g_vjp(sr_grad)
            g_acc = _tree_add(g_acc, g_grads)

            # ---- D phase (fake then real, train_hat.py:258-266) -----------
            if warmup:
                d_loss = jnp.zeros(())
                spectral = spec1
            else:
                def d_loss_fn(dp, spec):
                    d_fake, d_real, spec = _d_apply_pair(
                        d_apply, dp, spec, sr_sg, hr01
                    )
                    loss, _ = criterion_d(d_real, d_fake)
                    return loss / accum_steps, spec

                if remat_loss:
                    d_loss_fn = jax.checkpoint(d_loss_fn, policy=_LOSS_TAIL_POLICY)
                (d_loss, spectral), d_grads = jax.value_and_grad(
                    d_loss_fn, has_aux=True
                )(d_params, spec1)
                d_acc = _tree_add(d_acc, d_grads)

            # live train metrics (train_hat.py:228)
            l1v = l1_loss(sr_sg, hr01)
            if train_metrics:
                psnr_sum = psnr_fn(sr_sg, hr01).sum()
                ssim_v = ssim_fn(jnp.clip(sr_sg, 0, 1), jnp.clip(hr01, 0, 1))
            else:
                psnr_sum = jnp.zeros(())
                ssim_v = jnp.zeros(())
            b = sr_sg.shape[0]
            sums = {
                "g_total": sums["g_total"] + g_loss * accum_steps,
                "l1": sums["l1"] + l1v,
                "g_adv": sums["g_adv"] + g_adv,
                "d_total": sums["d_total"] + d_loss * accum_steps,
                "psnr_sum": sums["psnr_sum"] + psnr_sum,
                "ssim_sum": sums["ssim_sum"] + ssim_v * b,
                "count": sums["count"] + b,
            }
            return (g_acc, d_acc, spectral, sums), None

        zero_sums = {
            k: jnp.zeros(())
            for k in ("g_total", "l1", "g_adv", "d_total", "psnr_sum", "ssim_sum", "count")
        }
        init = (
            _tree_zeros_like(g_params),
            _tree_zeros_like(d_params),
            state.spectral,
            zero_sums,
        )
        (g_acc, d_acc, spectral, sums), _ = jax.lax.scan(
            micro, init, (batch["lr"], batch["hr"], mb_keys)
        )

        g_opt = _set_lr(state.g_opt, lr_g)
        g_updates, g_opt = bundle.g_tx.update(g_acc, g_opt, g_params)
        g_params = jax.tree_util.tree_map(jnp.add, g_params, g_updates)
        ema = ema_update(state.ema, g_params, ema_decay)

        if warmup:
            d_opt = state.d_opt
        else:
            d_opt = _set_lr(state.d_opt, lr_d)
            d_updates, d_opt = bundle.d_tx.update(d_acc, d_opt, d_params)
            d_params = jax.tree_util.tree_map(jnp.add, d_params, d_updates)

        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            g_opt=g_opt,
            d_opt=d_opt,
            ema=ema,
            spectral=spectral,
            rng=rng,
        )
        n = accum_steps
        metrics = {
            "loss_g": sums["g_total"] / n,
            "l1": sums["l1"] / n,
            "g_adv": sums["g_adv"] / n,
            "loss_d": sums["d_total"] / n,
            "psnr_sum": sums["psnr_sum"],
            "ssim_sum": sums["ssim_sum"],
            "count": sums["count"],
        }
        return new_state, metrics

    return step


def make_eval_step(g_apply: Callable, use_ema: bool = True):
    """Validation step: EMA-shadow forward + nan_to_num + clamp + PSNR/SSIM
    (train_swin.py:277-290). Batch: {'lr','hr'} uint16 (B, H, W, 1)."""

    @jax.jit
    def step(state: GANTrainState, batch):
        params = state.ema if use_ema else state.g_params
        lr01, hr01 = _to01(batch["lr"]), _to01(batch["hr"])
        sr = g_apply({"params": params}, lr01)
        sr = jnp.clip(jnp.nan_to_num(sr), 0.0, 1.0)
        psnr_sum = psnr_fn(sr, hr01).sum()
        ssim_v = ssim_fn(sr, jnp.clip(hr01, 0, 1))
        b = sr.shape[0]
        return {
            "psnr_sum": psnr_sum,
            "ssim_sum": ssim_v * b,
            "count": jnp.asarray(b, jnp.float32),
            "sr": sr,
        }

    return step

"""Loss library with the reference's exact algebra (functional, jit-pure).

Reproduces utils/gan_losses_swin.py + utils/losses_train_swin.py (the HAT
twins are the same math with different default weights):

- GANLoss: 'vanilla' = BCE-with-logits vs constant targets, 'lsgan'/'ragan'
  = MSE vs constant targets (gan_losses_swin.py:6-27).
- RelativeGANLoss (RaGAN): symmetric relativistic-average BCE, halved
  (gan_losses_swin.py:29-42).  The detach pattern is the CALLER's job, as in
  the reference (G detaches d_real, D detaches sr) — these functions are
  pure and differentiate through whatever they're given.
- CombinedGANLoss: pixel_w*L1 + perc_w*VGG + adv_w*RaGAN-G (+ texture)
  (gan_losses_swin.py:74-112; weights: swin 1.0/0.5/0.005 train_swin.py:166,
  hat 1.0/1.0/0.005 train_hat.py:155).
- DiscriminatorLoss: RaGAN-D (gan_losses_swin.py:117-134).
- CharbonnierLoss: SUM reduction sqrt(diff^2+1e-6) (losses_train_swin.py:42).
- TextureLoss: Gram-matrix MSE on VGG conv5_4 features
  (gan_losses_swin.py:44-72).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def charbonnier_loss(pred, target, eps: float = 1e-6) -> jnp.ndarray:
    diff = pred - target
    return jnp.sum(jnp.sqrt(diff * diff + eps))


def _bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean BCEWithLogits, the numerically-stable log-sum-exp form."""
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def gan_loss(
    prediction: jnp.ndarray,
    target_is_real: bool,
    gan_type: str = "ragan",
    real_label: float = 1.0,
    fake_label: float = 0.0,
) -> jnp.ndarray:
    """Plain GAN loss vs a constant target (GANLoss in the reference)."""
    label = real_label if target_is_real else fake_label
    target = jnp.full_like(prediction, label)
    if gan_type == "vanilla":
        return _bce_with_logits(prediction, target)
    if gan_type in ("lsgan", "ragan"):
        return jnp.mean((prediction - target) ** 2)
    raise ValueError(f"GAN type {gan_type} not supported")


def relative_gan_loss(
    real_pred: jnp.ndarray, fake_pred: jnp.ndarray, for_discriminator: bool = True
) -> jnp.ndarray:
    """RaGAN: relativistic average BCE, both directions halved."""
    if for_discriminator:
        return (
            _bce_with_logits(real_pred - jnp.mean(fake_pred), jnp.ones_like(real_pred))
            + _bce_with_logits(fake_pred - jnp.mean(real_pred), jnp.zeros_like(fake_pred))
        ) / 2
    return (
        _bce_with_logits(fake_pred - jnp.mean(real_pred), jnp.ones_like(fake_pred))
        + _bce_with_logits(real_pred - jnp.mean(fake_pred), jnp.zeros_like(real_pred))
    ) / 2


def gram_matrix(feats: jnp.ndarray) -> jnp.ndarray:
    """NHWC features -> (B, C, C) Gram normalized by C*H*W (reference)."""
    b, h, w, c = feats.shape
    f = feats.reshape(b, h * w, c)
    gram = jnp.einsum("bnc,bnd->bcd", f, f)
    return gram / (c * h * w)


def texture_loss(pred_feats: jnp.ndarray, target_feats: jnp.ndarray) -> jnp.ndarray:
    """MSE of Gram matrices; caller applies stop_gradient to the target."""
    return mse_loss(gram_matrix(pred_feats), gram_matrix(jax.lax.stop_gradient(target_feats)))


@dataclasses.dataclass(frozen=True)
class CombinedGANLoss:
    """Generator loss: pixel + perceptual + adversarial (+ texture).

    ``vgg_apply(x) -> features`` is the perceptual feature function (a bound
    VGG19Features.apply); None disables the perceptual term (e.g. HAT warmup
    uses plain L1 before the GAN phase).
    """

    gan_type: str = "ragan"
    pixel_weight: float = 1.0
    perceptual_weight: float = 1.0
    adversarial_weight: float = 0.005
    texture_weight: float = 0.0
    vgg_apply: Optional[Callable] = None
    texture_vgg_apply: Optional[Callable] = None

    def __call__(
        self,
        pred: jnp.ndarray,
        target: jnp.ndarray,
        real_pred: Optional[jnp.ndarray] = None,
        fake_pred: Optional[jnp.ndarray] = None,
    ):
        losses: dict[str, jnp.ndarray] = {}
        losses["pixel"] = l1_loss(pred, target) * self.pixel_weight
        if self.vgg_apply is not None and self.perceptual_weight:
            pf = self.vgg_apply(pred)
            tf = jax.lax.stop_gradient(self.vgg_apply(target))
            losses["perceptual"] = l1_loss(pf, tf) * self.perceptual_weight
        if self.texture_vgg_apply is not None and self.texture_weight:
            losses["texture"] = (
                texture_loss(self.texture_vgg_apply(pred), self.texture_vgg_apply(target))
                * self.texture_weight
            )
        if fake_pred is not None:
            if self.gan_type == "ragan" and real_pred is not None:
                adv = relative_gan_loss(real_pred, fake_pred, for_discriminator=False)
            else:
                adv = gan_loss(fake_pred, True, self.gan_type)
            losses["adversarial"] = adv * self.adversarial_weight
        total = sum(losses.values())
        losses["total"] = total
        return total, losses


@dataclasses.dataclass(frozen=True)
class DiscriminatorLoss:
    gan_type: str = "ragan"

    def __call__(self, real_pred: jnp.ndarray, fake_pred: jnp.ndarray):
        if self.gan_type == "ragan":
            adv = relative_gan_loss(real_pred, fake_pred, for_discriminator=True)
        else:
            adv = (
                gan_loss(real_pred, True, self.gan_type)
                + gan_loss(fake_pred, False, self.gan_type)
            ) / 2
        return adv, {"adversarial": adv, "total": adv}

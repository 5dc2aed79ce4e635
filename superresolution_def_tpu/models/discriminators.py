"""U-Net discriminators with spectral norm — both reference variants.

UNetDiscriminatorSNSwin (models/discriminator_swin.py:6-84): all-SN,
ConvTranspose upsampling, bilinear(align_corners=True) size fix, channel
CONCAT skips.

UNetDiscriminatorSNHAT (models/discriminator_hat.py:8-50, Real-ESRGAN
style): plain conv0/conv9, SN elsewhere, bilinear(align_corners=False) x2
upsampling, ADDITIVE skips.

``update_stats`` mirrors torch train/eval: every training forward advances
the spectral power iteration (stored in the ``spectral`` collection).

Stage outputs are tagged with ``checkpoint_name(. , "d_stage")`` so a
``jax.checkpoint(policy=save_only_these_names("d_stage", ...))`` wrapper
(train/steps.py remat_loss) keeps only these ~boundary tensors and
recomputes each stage's interior (pre-activation leaky-relu masks, conv
temps) during the backward — the interior is what OOMs a 16G chip at
micro-batch 4 (PERF.md round-4). Outside a checkpoint the tags are
identity no-ops.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn
from jax.ad_checkpoint import checkpoint_name

from ..ops.resize import interpolate_bilinear
from .layers import Conv2d, leaky_relu
from .spectral_norm import SNConv2d

Dtype = Any


class UNetDiscriminatorSNSwin(nn.Module):
    num_in_ch: int = 1
    num_feat: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_stats: bool = False) -> jnp.ndarray:
        nf = self.num_feat
        lr = lambda t: leaky_relu(t, 0.2)  # noqa: E731
        sn = lambda f, k, s, p, name, tr=False: SNConv2d(  # noqa: E731
            f, k, s, p, use_bias=False, transpose=tr, dtype=self.dtype, name=name
        )

        ck = lambda t: checkpoint_name(t, "d_stage")  # noqa: E731
        x0 = lr(sn(nf, 3, 1, 1, "conv0_0")(x, update_stats))
        x0 = ck(lr(sn(nf, 4, 2, 1, "conv0_1")(x0, update_stats)))
        x1 = ck(lr(sn(nf * 2, 4, 2, 1, "conv1")(x0, update_stats)))
        x2 = ck(lr(sn(nf * 4, 4, 2, 1, "conv2")(x1, update_stats)))
        x3 = ck(lr(sn(nf * 8, 4, 2, 1, "conv3")(x2, update_stats)))
        x4 = ck(lr(sn(nf * 8, 4, 2, 1, "conv4")(x3, update_stats)))

        def up(feat, skip, features, name):
            y = lr(sn(features, 4, 2, 1, name, tr=True)(feat, update_stats))
            if y.shape[1:3] != skip.shape[1:3]:
                y = interpolate_bilinear(y, skip.shape[1:3], align_corners=True)
            return ck(jnp.concatenate([y, skip], axis=-1))

        d1 = up(x4, x3, nf * 8, "up1")
        d2 = up(d1, x2, nf * 4, "up2")
        d3 = up(d2, x1, nf * 2, "up3")
        d4 = up(d3, x0, nf, "up4")

        out = lr(sn(nf, 3, 1, 1, "final_0")(d4, update_stats))
        out = sn(1, 3, 1, 1, "final_1")(out, update_stats)
        return out


class UNetDiscriminatorSNHAT(nn.Module):
    num_in_ch: int = 1
    num_feat: int = 64
    skip_connection: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_stats: bool = False) -> jnp.ndarray:
        nf = self.num_feat
        lr = lambda t: leaky_relu(t, 0.2)  # noqa: E731
        sn = lambda f, k, s, p, name: SNConv2d(  # noqa: E731
            f, k, s, p, use_bias=False, dtype=self.dtype, name=name
        )

        # Boundary choice under remat_loss (save_only_these_names("d_stage")):
        # the full-res (512²) tensors x0 and conv7-out are NOT tagged — each
        # costs 134M bf16 per D forward (x2 forwards per phase) to stash and
        # one cheap 3x3 conv to recompute from its neighbor boundary. With
        # them tagged, the hat-train micro-4 step missed HBM by 306M
        # (16.05G of 15.75G, scripts/train_step_memory.py).
        ck = lambda t: checkpoint_name(t, "d_stage")  # noqa: E731
        x0 = lr(Conv2d(nf, 3, 1, 1, dtype=self.dtype, name="conv0")(x))
        x1 = ck(lr(sn(nf * 2, 4, 2, 1, "conv1")(x0, update_stats)))
        x2 = ck(lr(sn(nf * 4, 4, 2, 1, "conv2")(x1, update_stats)))
        x3 = ck(lr(sn(nf * 8, 4, 2, 1, "conv3")(x2, update_stats)))

        x3u = interpolate_bilinear(x3, (x3.shape[1] * 2, x3.shape[2] * 2), align_corners=False)
        x4 = lr(sn(nf * 4, 3, 1, 1, "conv4")(x3u, update_stats))
        if self.skip_connection:
            x4 = x4 + x2
        x4 = ck(x4)
        x4u = interpolate_bilinear(x4, (x4.shape[1] * 2, x4.shape[2] * 2), align_corners=False)
        x5 = lr(sn(nf * 2, 3, 1, 1, "conv5")(x4u, update_stats))
        if self.skip_connection:
            x5 = x5 + x1
        x5 = ck(x5)
        x5u = interpolate_bilinear(x5, (x5.shape[1] * 2, x5.shape[2] * 2), align_corners=False)
        x6 = lr(sn(nf, 3, 1, 1, "conv6")(x5u, update_stats))
        if self.skip_connection:
            x6 = x6 + x0
        x6 = ck(x6)

        out = lr(sn(nf, 3, 1, 1, "conv7")(x6, update_stats))
        out = lr(sn(nf, 3, 1, 1, "conv8")(out, update_stats))
        out = Conv2d(1, 3, 1, 1, dtype=self.dtype, name="conv9")(out)
        return out

"""VGG19 feature extractor for the perceptual/texture losses.

The reference's VGGLoss builds torchvision vgg19.features[:feature_layer+1]
with feature_layer=35 (through relu5_4) and TextureLoss uses features[:35]
(through conv5_4) — utils/losses_train_swin.py:6-40,44-72. Inputs are
grayscale repeated to 3 channels then ImageNet-normalized.

This is a from-scratch Flax implementation of that sub-network. Parameters
are named ``conv_{torchvision_index}`` so porting a torch vgg19 state_dict
is a direct key map (``features.{i}.weight/bias``). Since this image has no
torchvision (and no egress), :func:`init_vgg_params` provides deterministic
seeded weights as a fallback — a *random-feature* perceptual loss, which
still regularizes textures but does not reproduce reference loss values;
pass real ported weights (npz) for parity work.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

# torchvision vgg19.features layout: (torch index, kind, out_channels)
VGG19_LAYOUT: list[tuple[int, str, int]] = []
_cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
        512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
_i = 0
for _v in _cfg:
    if _v == "M":
        VGG19_LAYOUT.append((_i, "pool", 0))
        _i += 1
    else:
        VGG19_LAYOUT.append((_i, "conv", int(_v)))
        _i += 1
        VGG19_LAYOUT.append((_i, "relu", 0))
        _i += 1

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


class VGG19Features(nn.Module):
    """features[:cutoff+1] of VGG19, NHWC. cutoff=35 == reference VGGLoss."""

    cutoff: int = 35
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # grayscale -> 3ch repeat + ImageNet normalization (reference forward)
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        x = x.astype(self.dtype)
        for idx, kind, ch in VGG19_LAYOUT:
            if idx > self.cutoff:
                break
            if kind == "conv":
                x = nn.Conv(
                    ch,
                    (3, 3),
                    padding=((1, 1), (1, 1)),
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name=f"conv_{idx}",
                )(x)
            elif kind == "relu":
                x = jax.nn.relu(x)
            else:  # maxpool 2x2 stride 2
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                # block boundary for segment-wise remat: under a
                # jax.checkpoint(policy=save_only_these_names(...,"vgg_block"))
                # wrapper (train/steps.py remat_loss) only these 5 pooled
                # tensors are kept; each block's interior is recomputed in
                # the backward. Identity outside a checkpoint.
                x = jax.ad_checkpoint.checkpoint_name(x, "vgg_block")
        return x


def vgg19_from_torch(sd, cutoff: int = 35) -> dict:
    """torch vgg19 state_dict ('features.{i}.weight') -> flax params."""

    def _np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    params = {}
    for idx, kind, _ in VGG19_LAYOUT:
        if idx > cutoff:
            break
        if kind != "conv":
            continue
        w = _np(sd[f"features.{idx}.weight"])  # (O, I, kh, kw)
        params[f"conv_{idx}"] = {
            "kernel": w.transpose(2, 3, 1, 0),
            "bias": _np(sd[f"features.{idx}.bias"]),
        }
    return params


def init_vgg_params(cutoff: int = 35, seed: int = 0) -> dict:
    """Deterministic fallback weights (random-feature perceptual loss)."""
    model = VGG19Features(cutoff=cutoff)
    dummy = jnp.zeros((1, 32, 32, 1), jnp.float32)
    return model.init(jax.random.PRNGKey(seed), dummy)["params"]

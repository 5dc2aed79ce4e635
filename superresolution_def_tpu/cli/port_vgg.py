"""Convert a torchvision VGG19 checkpoint to this framework's npz format.

Usage:
  python -m superresolution_def_tpu.cli.port_vgg vgg19.pth vgg19_feat35.npz

The resulting npz feeds `--vgg-weights` on `sr train` so the perceptual loss
reproduces the reference's torchvision-pretrained VGGLoss
(utils/losses_train_swin.py:6-40). This image has no torchvision/egress, so
the user supplies the .pth; without it training falls back to the seeded
random-feature VGG (train/vgg.py).
"""

from __future__ import annotations

import sys

import numpy as np


def convert(pth_path: str, out_path: str, cutoff: int = 35) -> None:
    import torch

    from ..train.vgg import vgg19_from_torch

    obj = torch.load(pth_path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if hasattr(obj, "get") else obj
    params = vgg19_from_torch(sd, cutoff=cutoff)
    np.savez(out_path, params=np.array(params, dtype=object))
    n = sum(1 for _ in params)
    print(f"wrote {out_path}: {n} conv layers (cutoff {cutoff})")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    convert(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 35)

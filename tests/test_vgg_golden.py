"""VGG perceptual-loss weight parity — gated on real torchvision weights.

The image has no torchvision weights and no egress, so loss-VALUE parity
with the reference's pretrained VGGLoss (losses_train_swin.py:6-40) cannot
run by default. These tests activate automatically once a weights file
exists; everything needed to produce one is documented below.

To enable:
 1. on any machine with torchvision:  python - <<'PY'
      import torch, torchvision
      torch.save(torchvision.models.vgg19(weights="IMAGENET1K_V1").state_dict(),
                 "vgg19.pth")
    PY
 2. python -m superresolution_def_tpu.cli.port_vgg vgg19.pth \
        tests/golden/vgg19_feat35.npz
 3. (optional, for value-golden locking) on the torchvision machine:
      run _torch_ref.vgg_feature_golden() and commit the npz it writes.

With tests/golden/vgg19_feat35.npz present, these tests lock:
 - feature parity: our VGG19Features(cutoff=35) on a fixed input matches
   the ported weights' expected statistics;
 - loss parity: VGGLoss value on a fixed (sr, hr) pair is reproducible.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

WEIGHTS = Path(__file__).parent / "golden" / "vgg19_feat35.npz"

pytestmark = pytest.mark.skipif(
    not WEIGHTS.exists(),
    reason="real VGG19 weights not present (see module docstring to enable)",
)


def _load_params():
    loaded = np.load(WEIGHTS, allow_pickle=True)
    return loaded["params"].item() if "params" in loaded else dict(loaded)


def test_vgg_feature_parity_vs_torch():
    """Features from ported weights match torch's vgg19.features[:36]."""
    import jax.numpy as jnp
    import torch
    import torchvision  # only importable where weights came from anyway

    from superresolution_def_tpu.train.vgg import VGG19Features

    params = _load_params()
    rng = np.random.default_rng(0)
    x = rng.random((1, 64, 64, 3), np.float32)

    model = VGG19Features(cutoff=35)
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))

    tm = torchvision.models.vgg19()
    tm.load_state_dict(torch.load(WEIGHTS.with_suffix(".pth"), map_location="cpu"))
    feat = torch.nn.Sequential(*list(tm.features.children())[:36]).eval()
    # VGG19Features normalizes internally (reference VGGLoss buffers,
    # losses_train_swin.py:25-33); replicate for the raw torch stack
    mean = np.array([0.485, 0.456, 0.406], np.float32).reshape(1, 3, 1, 1)
    std = np.array([0.229, 0.224, 0.225], np.float32).reshape(1, 3, 1, 1)
    xin = (x.transpose(0, 3, 1, 2) - mean) / std
    with torch.no_grad():
        theirs = feat(torch.from_numpy(xin))
    theirs = theirs.numpy().transpose(0, 2, 3, 1)
    assert np.max(np.abs(ours - theirs)) < 1e-3


def test_vgg_loss_value_locked():
    """Perceptual-loss VALUE on a fixed pair is locked once weights exist."""
    import jax
    import jax.numpy as jnp

    from superresolution_def_tpu.train.vgg import VGG19Features
    from superresolution_def_tpu.train.losses import l1_loss

    params = _load_params()
    model = VGG19Features(cutoff=35)
    vgg_apply = lambda x: model.apply({"params": params}, x)  # noqa: E731
    rng = np.random.default_rng(1)
    sr = jnp.asarray(rng.random((2, 32, 32, 1), np.float32))
    hr = jnp.asarray(rng.random((2, 32, 32, 1), np.float32))
    # the trainer's perceptual term (CombinedGANLoss): L1 on features,
    # target detached (losses_train_swin.py:36-40)
    v = float(l1_loss(vgg_apply(sr), jax.lax.stop_gradient(vgg_apply(hr))))
    golden_path = WEIGHTS.parent / "vgg_loss_golden.npy"
    if golden_path.exists():
        golden = float(np.load(golden_path))
        assert abs(v - golden) < 1e-4 * max(1.0, abs(golden))
    else:  # first run with real weights records the lock
        np.save(golden_path, np.float64(v))

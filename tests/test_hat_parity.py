"""HAT / HybridHATRealESRGAN forward parity vs the torch reference oracle."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from superresolution_def_tpu.models import HAT, HybridHATRealESRGAN
from superresolution_def_tpu.models.torch_port import (
    hat_from_torch,
    hybrid_from_torch,
    detect_hybrid_params,
)
from tests._torch_ref import load_reference_hat, load_reference_hybrid

RNG = np.random.default_rng(7)



pytestmark = pytest.mark.slow  # heavy parity/e2e tier; quick run: pytest -m 'not slow'

def test_hat_forward_matches_torch():
    RefHAT = load_reference_hat()
    torch.manual_seed(0)
    kwargs = dict(
        img_size=16,
        in_chans=1,
        embed_dim=30,
        depths=(2,),
        num_heads=(6,),
        window_size=8,
        upscale=2,
        upsampler="pixelshuffle",
        img_range=1.0,
    )
    ref = RefHAT(**kwargs).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = HAT(
        img_size=16,
        in_chans=1,
        embed_dim=30,
        depths=(2,),
        num_heads=(6,),
        window_size=8,
        upscale=2,
        upsampler="pixelshuffle",
        img_range=1.0,
    )
    params = hat_from_torch(sd, (2,))

    x = RNG.random((2, 16, 16, 1)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))
    ours = model.apply({"params": params}, jnp.asarray(x), True)
    err = np.abs(np.asarray(ours).transpose(0, 3, 1, 2) - expected.numpy())
    assert err.max() < 3e-4, f"max abs err {err.max()}"


def test_hybrid_forward_matches_torch():
    RefHybrid = load_reference_hybrid()
    torch.manual_seed(1)
    ref = RefHybrid(
        img_size=16,
        in_chans=1,
        embed_dim=30,
        depths=(2,),
        num_heads=(6,),
        window_size=8,
        upscale=4,
        num_rrdb=2,
        num_feat=16,
        num_grow_ch=8,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    det = {
        "embed_dim": 30,
        "depths": (2,),
        "num_heads": (6,),
        "window_size": 8,
        "num_rrdb": 2,
        "num_feat": 16,
        "num_grow_ch": 8,
    }
    model = HybridHATRealESRGAN(img_size=16, in_chans=1, **det)
    params = hybrid_from_torch(sd, det)

    x = RNG.random((1, 16, 16, 1)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))
    ours = model.apply({"params": params}, jnp.asarray(x), True)
    err = np.abs(np.asarray(ours).transpose(0, 3, 1, 2) - expected.numpy())
    assert err.max() < 5e-4, f"max abs err {err.max()}"


def test_hybrid_forward_matches_torch_flagship_config():
    """Parity lock at the ACTUAL 'Soft' train config (train_hat.py:132-136:
    embed 90, depths (6,6,6,6), rrdb 12, feat 48, grow 24, 128->512) —
    the full-depth stack could amplify drift the reduced config hides
    (VERDICT r2 #4). Measured max-abs 6.8e-06 on this host; 5e-5 gives
    ~7x headroom, still far below the 0.01 dB gate. ~2 min on 1 core."""
    RefHybrid = load_reference_hybrid()
    torch.manual_seed(1)
    det = {
        "embed_dim": 90,
        "depths": (6, 6, 6, 6),
        "num_heads": (6, 6, 6, 6),
        "window_size": 8,
        "num_rrdb": 12,
        "num_feat": 48,
        "num_grow_ch": 24,
    }
    ref = RefHybrid(img_size=128, in_chans=1, upscale=4, **det).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    model = HybridHATRealESRGAN(img_size=128, in_chans=1, **det)
    params = hybrid_from_torch(sd, det)

    x = RNG.random((1, 128, 128, 1)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))
    ours = model.apply({"params": params}, jnp.asarray(x), True)
    err = np.abs(np.asarray(ours).transpose(0, 3, 1, 2) - expected.numpy())
    assert err.max() < 5e-5, f"max abs err {err.max()}"


def test_detect_hybrid_params_from_torch_sd():
    RefHybrid = load_reference_hybrid()
    torch.manual_seed(2)
    ref = RefHybrid(
        img_size=16, in_chans=1, embed_dim=30, depths=(2, 2), num_heads=(6, 6),
        window_size=8, upscale=4, num_rrdb=3, num_feat=16, num_grow_ch=8,
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    det = detect_hybrid_params(sd)
    assert det["embed_dim"] == 30
    assert det["num_rrdb"] == 3
    assert det["num_feat"] == 16
    assert det["num_grow_ch"] == 8
    assert len(det["depths"]) == 2

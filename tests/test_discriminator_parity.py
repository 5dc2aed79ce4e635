"""Spectral-norm U-Net discriminator parity vs torch (eval-mode sigma)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from superresolution_def_tpu.models import (
    UNetDiscriminatorSNSwin,
    UNetDiscriminatorSNHAT,
)
from superresolution_def_tpu.models.torch_port import (
    discriminator_swin_from_torch,
    discriminator_hat_from_torch,
)
from tests._torch_ref import (
    load_reference_discriminator_swin,
    load_reference_discriminator_hat,
)

RNG = np.random.default_rng(11)



pytestmark = pytest.mark.slow  # heavy parity/e2e tier; quick run: pytest -m 'not slow'

def _run_parity(RefCls, OurCls, port_fn, size, nf=8, atol=2e-4):
    torch.manual_seed(0)
    ref = RefCls(num_in_ch=1, num_feat=nf)
    # advance the power iteration a few steps in training mode so the
    # stored (u, v) are meaningful, then freeze in eval
    x_warm = torch.randn(1, 1, size, size)
    ref.train()
    with torch.no_grad():
        for _ in range(3):
            ref(x_warm)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    params, sn_state = port_fn(sd)
    model = OurCls(num_in_ch=1, num_feat=nf)

    x = RNG.random((2, size, size, 1)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))
    ours = model.apply(
        {"params": params, "spectral": sn_state},
        jnp.asarray(x),
        False,  # update_stats=False == torch eval
    )
    err = np.abs(np.asarray(ours).transpose(0, 3, 1, 2) - expected.numpy())
    assert err.max() < atol, f"max abs err {err.max()}"


def test_swin_discriminator_matches_torch():
    _run_parity(
        load_reference_discriminator_swin(),
        UNetDiscriminatorSNSwin,
        discriminator_swin_from_torch,
        size=64,
    )


def test_hat_discriminator_matches_torch():
    _run_parity(
        load_reference_discriminator_hat(),
        UNetDiscriminatorSNHAT,
        discriminator_hat_from_torch,
        size=64,
    )


def test_power_iteration_matches_torch_one_step():
    """One training forward advances (u, v) identically to torch."""
    RefCls = load_reference_discriminator_hat()
    torch.manual_seed(3)
    ref = RefCls(num_in_ch=1, num_feat=8)
    sd0 = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, sn_state = discriminator_hat_from_torch(sd0)

    x = RNG.random((1, 64, 64, 1)).astype(np.float32)
    ref.train()
    with torch.no_grad():
        ref(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))
    sd1 = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = UNetDiscriminatorSNHAT(num_in_ch=1, num_feat=8)
    _, mutated = model.apply(
        {"params": params, "spectral": sn_state},
        jnp.asarray(x),
        True,
        mutable=["spectral"],
    )
    ours_u = np.asarray(mutated["spectral"]["conv1"]["u"])
    torch_u = sd1["conv1.weight_u"]
    np.testing.assert_allclose(ours_u, torch_u, atol=1e-5)

"""Loss algebra golden tests vs torch (CPU) — exact reference math."""

import numpy as np
import jax.numpy as jnp
import pytest

import torch
import torch.nn.functional as F

from superresolution_def_tpu.train.losses import (
    l1_loss,
    charbonnier_loss,
    gan_loss,
    relative_gan_loss,
    gram_matrix,
    CombinedGANLoss,
    DiscriminatorLoss,
)
from superresolution_def_tpu.train.schedule import cosine_annealing_lr


def _rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def test_l1_and_charbonnier_match_torch():
    a, b = _rand((2, 8, 8, 1), 0), _rand((2, 8, 8, 1), 1)
    ta, tb = torch.tensor(a), torch.tensor(b)
    np.testing.assert_allclose(float(l1_loss(a, b)), float(F.l1_loss(ta, tb)), rtol=1e-6)
    ref = float(torch.sum(torch.sqrt((ta - tb) ** 2 + 1e-6)))
    np.testing.assert_allclose(float(charbonnier_loss(a, b)), ref, rtol=1e-5)


def test_gan_loss_variants_match_torch():
    pred = _rand((2, 5, 5, 1), 2)
    tp = torch.tensor(pred)
    # vanilla = BCEWithLogits
    np.testing.assert_allclose(
        float(gan_loss(jnp.asarray(pred), True, "vanilla")),
        float(F.binary_cross_entropy_with_logits(tp, torch.ones_like(tp))),
        rtol=1e-5,
    )
    # lsgan = MSE vs 0 for fake
    np.testing.assert_allclose(
        float(gan_loss(jnp.asarray(pred), False, "lsgan")),
        float(F.mse_loss(tp, torch.zeros_like(tp))),
        rtol=1e-6,
    )


def test_ragan_matches_torch_both_directions():
    real, fake = _rand((3, 4, 4, 1), 3), _rand((3, 4, 4, 1), 4)
    tr, tf = torch.tensor(real), torch.tensor(fake)
    bce = F.binary_cross_entropy_with_logits
    ref_d = (
        bce(tr - tf.mean(), torch.ones_like(tr)) + bce(tf - tr.mean(), torch.zeros_like(tf))
    ) / 2
    ref_g = (
        bce(tf - tr.mean(), torch.ones_like(tf)) + bce(tr - tf.mean(), torch.zeros_like(tr))
    ) / 2
    np.testing.assert_allclose(
        float(relative_gan_loss(jnp.asarray(real), jnp.asarray(fake), True)),
        float(ref_d), rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(relative_gan_loss(jnp.asarray(real), jnp.asarray(fake), False)),
        float(ref_g), rtol=1e-5,
    )


def test_gram_matrix_matches_torch():
    x = _rand((2, 4, 5, 3), 5)  # NHWC
    tx = torch.tensor(x.transpose(0, 3, 1, 2))  # NCHW
    b, c, h, w = tx.shape
    feats = tx.view(b, c, h * w)
    ref = torch.bmm(feats, feats.transpose(1, 2)) / (c * h * w)
    np.testing.assert_allclose(np.asarray(gram_matrix(jnp.asarray(x))), ref.numpy(), rtol=1e-4, atol=1e-6)


def test_combined_and_discriminator_losses():
    sr, hr = _rand((2, 8, 8, 1), 6), _rand((2, 8, 8, 1), 7)
    d_real, d_fake = _rand((2, 2, 2, 1), 8), _rand((2, 2, 2, 1), 9)
    crit_g = CombinedGANLoss(pixel_weight=1.0, perceptual_weight=0.5, adversarial_weight=0.005)
    total, parts = crit_g(jnp.asarray(sr), jnp.asarray(hr), jnp.asarray(d_real), jnp.asarray(d_fake))
    expect = float(l1_loss(sr, hr)) + 0.005 * float(
        relative_gan_loss(jnp.asarray(d_real), jnp.asarray(d_fake), False)
    )
    np.testing.assert_allclose(float(total), expect, rtol=1e-5)
    assert "perceptual" not in parts  # no vgg bound

    crit_d = DiscriminatorLoss()
    dt, _ = crit_d(jnp.asarray(d_real), jnp.asarray(d_fake))
    np.testing.assert_allclose(
        float(dt), float(relative_gan_loss(jnp.asarray(d_real), jnp.asarray(d_fake), True)), rtol=1e-6
    )


def test_cosine_annealing_matches_torch():
    m = torch.nn.Linear(1, 1)
    opt = torch.optim.AdamW(m.parameters(), lr=1e-4)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=300, eta_min=1e-7)
    for epoch in range(1, 20):
        np.testing.assert_allclose(
            cosine_annealing_lr(epoch, 1e-4, 300, 1e-7),
            opt.param_groups[0]["lr"],
            rtol=1e-6,
        )
        sched.step()


def test_vgg_feature_shapes():
    from superresolution_def_tpu.train.vgg import VGG19Features, init_vgg_params

    model = VGG19Features(cutoff=8)  # through relu2_2, one pool
    params = init_vgg_params(cutoff=8, seed=0)
    out = model.apply({"params": params}, jnp.zeros((1, 32, 32, 1)))
    assert out.shape == (1, 16, 16, 128)

    model35 = VGG19Features(cutoff=35)
    params35 = init_vgg_params(cutoff=35, seed=0)
    out35 = model35.apply({"params": params35}, jnp.zeros((1, 64, 64, 1)))
    assert out35.shape == (1, 4, 4, 512)


@pytest.mark.skipif(
    not _rand((1,), 0).size, reason="always runs"
)
def test_vgg_torch_port_matches():
    """Port a tiny random torch VGG prefix and compare features."""
    import torch.nn as nn
    from superresolution_def_tpu.train.vgg import VGG19Features, vgg19_from_torch

    torch.manual_seed(0)
    layers = [
        nn.Conv2d(3, 64, 3, padding=1), nn.ReLU(inplace=True),
        nn.Conv2d(64, 64, 3, padding=1), nn.ReLU(inplace=True),
        nn.MaxPool2d(2, 2),
        nn.Conv2d(64, 128, 3, padding=1), nn.ReLU(inplace=True),
        nn.Conv2d(128, 128, 3, padding=1), nn.ReLU(inplace=True),
    ]
    tmodel = nn.Sequential(*layers)
    sd = {f"features.{i}.{p}": t for i, l in enumerate(layers)
          for p, t in getattr(l, "state_dict", dict)().items()}
    params = vgg19_from_torch(sd, cutoff=8)

    x = np.random.default_rng(1).random((1, 1, 16, 16)).astype(np.float32)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    tx = (torch.tensor(x).repeat(1, 3, 1, 1) - mean) / std
    ref = tmodel(tx).detach().numpy()

    ours = VGG19Features(cutoff=8).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5
    )

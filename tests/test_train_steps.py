"""End-to-end train-step tests on tiny configs (CPU, fp32)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from superresolution_def_tpu.train import (
    create_swin_train_state,
    create_hat_train_state,
    make_swin_train_step,
    make_hat_train_step,
    make_eval_step,
    cosine_annealing_lr,
)



pytestmark = pytest.mark.slow  # heavy parity/e2e tier; quick run: pytest -m 'not slow'

def _batch(accum, b, lr_size, hr_size, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "lr": rng.integers(0, 65535, (accum, b, lr_size, lr_size, 1), dtype=np.uint16),
        "hr": rng.integers(0, 65535, (accum, b, hr_size, hr_size, 1), dtype=np.uint16),
    }


def _tree_l2_diff(a, b):
    leaves = jax.tree_util.tree_map(lambda x, y: float(jnp.sum((x - y) ** 2)), a, b)
    return sum(jax.tree_util.tree_leaves(leaves))


def test_swin_train_step_updates_everything():
    state, bundle = create_swin_train_state(
        jax.random.PRNGKey(0),
        img_size=16,
        upscale=4,
        embed_dim=16,
        depths=(2,),
        num_heads=(2,),
        window_size=8,
    )
    step = make_swin_train_step(bundle, accum_steps=2, donate=False)
    batch = _batch(2, 1, 16, 64)
    lr = cosine_annealing_lr(1)
    new_state, metrics = step(state, batch, lr, lr)

    assert np.isfinite(float(metrics["loss_g"]))
    assert np.isfinite(float(metrics["loss_d"]))
    assert float(metrics["valid_batches"]) == 2.0
    assert _tree_l2_diff(new_state.g_params, state.g_params) > 0
    assert _tree_l2_diff(new_state.d_params, state.d_params) > 0
    assert _tree_l2_diff(new_state.spectral, state.spectral) > 0  # power iter advanced
    assert _tree_l2_diff(new_state.ema, new_state.g_params) > 0  # shadow lags params
    # EMA = 0.999*old_params + 0.001*new_params to first order
    def check(e, p0, p1):
        np.testing.assert_allclose(
            np.asarray(e), 0.999 * np.asarray(p0) + 0.001 * np.asarray(p1), rtol=1e-4, atol=1e-7
        )
    jax.tree_util.tree_map(check, new_state.ema, state.g_params, new_state.g_params)

    # second step runs from the new state (jit cache hit)
    s2, m2 = step(new_state, _batch(2, 1, 16, 64, seed=1), lr, lr)
    assert int(s2.step) == 2


def test_hat_train_step_warmup_and_gan():
    state, bundle = create_hat_train_state(
        jax.random.PRNGKey(0),
        img_size=16,
        embed_dim=16,
        depths=(1,),
        num_heads=(2,),
        window_size=8,
        num_rrdb=1,
        num_feat=16,
        num_grow_ch=8,
    )
    step = make_hat_train_step(bundle, accum_steps=2, donate=False)
    batch = _batch(2, 1, 16, 64)
    lr = cosine_annealing_lr(1)

    warm_state, wm = step(state, batch, lr, lr, warmup=True)
    assert np.isfinite(float(wm["loss_g"]))
    assert float(wm["loss_d"]) == 0.0
    # warmup must not touch the discriminator
    assert _tree_l2_diff(warm_state.d_params, state.d_params) == 0
    assert _tree_l2_diff(warm_state.g_params, state.g_params) > 0
    assert float(wm["count"]) == 2.0
    assert np.isfinite(float(wm["psnr_sum"]))

    gan_state, gm = step(warm_state, batch, lr, lr, warmup=False)
    assert np.isfinite(float(gm["loss_g"])) and np.isfinite(float(gm["loss_d"]))
    assert _tree_l2_diff(gan_state.d_params, warm_state.d_params) > 0
    assert _tree_l2_diff(gan_state.spectral, warm_state.spectral) > 0


@pytest.mark.parametrize("arch", ["swin", "hat"])
def test_remat_loss_is_algebra_preserving(arch):
    """remat_loss=True must produce the SAME step as remat_loss=False.

    jax.checkpoint only changes WHEN the loss-tail activations exist
    (recomputed in the backward instead of stashed) — on the CPU fp32 path
    the recompute is deterministic, so params/metrics must match exactly."""
    if arch == "swin":
        state, bundle = create_swin_train_state(
            jax.random.PRNGKey(0), img_size=16, upscale=4, embed_dim=16,
            depths=(2,), num_heads=(2,), window_size=8,
        )
        make = lambda **kw: make_swin_train_step(bundle, accum_steps=2, donate=False, **kw)
        run = lambda step, s, b: step(s, b, 1e-4, 1e-4)
    else:
        state, bundle = create_hat_train_state(
            jax.random.PRNGKey(0), img_size=16, embed_dim=16, depths=(1,),
            num_heads=(2,), window_size=8, num_rrdb=1, num_feat=16,
            num_grow_ch=8,
        )
        make = lambda **kw: make_hat_train_step(bundle, accum_steps=2, donate=False, **kw)
        run = lambda step, s, b: step(s, b, 1e-4, 1e-4, warmup=False)

    batch = _batch(2, 1, 16, 64)
    s_ref, m_ref = run(make(remat_loss=False), state, batch)
    s_rm, m_rm = run(make(remat_loss=True), state, batch)

    for k in m_ref:
        np.testing.assert_allclose(
            np.asarray(m_ref[k]), np.asarray(m_rm[k]), rtol=1e-6, atol=1e-7,
            err_msg=f"metric {k}",
        )
    assert _tree_l2_diff(s_ref.g_params, s_rm.g_params) <= 1e-12
    assert _tree_l2_diff(s_ref.d_params, s_rm.d_params) <= 1e-12
    assert _tree_l2_diff(s_ref.spectral, s_rm.spectral) <= 1e-12


def test_eval_step_psnr_perfect_match():
    state, bundle = create_swin_train_state(
        jax.random.PRNGKey(0),
        img_size=16,
        upscale=4,
        embed_dim=16,
        depths=(2,),
        num_heads=(2,),
        window_size=8,
    )
    ev = make_eval_step(bundle.g_apply, use_ema=True)
    batch = {
        "lr": np.zeros((2, 16, 16, 1), np.uint16),
        "hr": np.zeros((2, 64, 64, 1), np.uint16),
    }
    out = ev(state, batch)
    assert out["sr"].shape == (2, 64, 64, 1)
    assert float(out["count"]) == 2.0
    assert np.isfinite(float(out["psnr_sum"]))

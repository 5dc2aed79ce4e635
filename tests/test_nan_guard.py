"""NaN-guard semantics of the swin train step (train_swin.py:226-229,248-251)."""

import numpy as np
import jax
import jax.numpy as jnp

from superresolution_def_tpu.train import (
    create_swin_train_state,
    make_swin_train_step,
)
from superresolution_def_tpu.train.losses import DiscriminatorLoss, CombinedGANLoss


class NaNDLoss(DiscriminatorLoss):
    def __call__(self, real_pred, fake_pred):
        bad = jnp.full((), jnp.nan) + jnp.mean(real_pred) * 0
        return bad, {"adversarial": bad, "total": bad}


def _batch(accum, b=1, lr=16, hr=64, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "lr": rng.integers(0, 65535, (accum, b, lr, lr, 1), dtype=np.uint16),
        "hr": rng.integers(0, 65535, (accum, b, hr, hr, 1), dtype=np.uint16),
    }


def _l2(a, b):
    return sum(
        float(jnp.sum((x - y) ** 2))
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


def test_nan_d_loss_skips_everything():
    """D-NaN acts like the reference `continue`: G phase skipped too,
    valid_batches 0, both parameter sets numerically unchanged."""
    state, bundle = create_swin_train_state(
        jax.random.PRNGKey(0), img_size=16, upscale=4, embed_dim=16,
        depths=(1,), num_heads=(2,), window_size=8,
    )
    # donate=False: the assertions below read the PRE-step state
    step = make_swin_train_step(bundle, accum_steps=2, criterion_d=NaNDLoss(), donate=False)
    new_state, m = step(state, _batch(2), 1e-4, 1e-4)
    assert float(m["valid_batches"]) == 0.0
    assert _l2(new_state.g_params, state.g_params) < 1e-12
    assert _l2(new_state.d_params, state.d_params) < 1e-12
    # params stayed finite, step counter advanced
    assert int(new_state.step) == 1


def test_finite_losses_count_all_batches():
    state, bundle = create_swin_train_state(
        jax.random.PRNGKey(0), img_size=16, upscale=4, embed_dim=16,
        depths=(1,), num_heads=(2,), window_size=8,
    )
    step = make_swin_train_step(bundle, accum_steps=2)
    _, m = step(state, _batch(2), 1e-4, 1e-4)
    assert float(m["valid_batches"]) == 2.0

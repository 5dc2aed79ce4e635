"""Fused-block custom_vjp backward vs jax.grad of a jnp reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from superresolution_def_tpu.kernels.swin_block import fused_swin_block_ad

C, HEADS, N, HID = 16, 2, 64, 32
SCALE = (C // HEADS) ** -0.5



pytestmark = pytest.mark.slow  # heavy parity/e2e tier; quick run: pytest -m 'not slow'

def _ref_block(x, ln1s, ln1b, wqkv, bqkv, bias, wproj, bproj,
               ln2s, ln2b, w1, b1, w2, b2):
    def ln(v, s, b):
        mu = jnp.mean(v, -1, keepdims=True)
        var = jnp.var(v, -1, keepdims=True)
        return (v - mu) / jnp.sqrt(var + 1e-5) * s + b

    bw, n, c = x.shape
    d = c // HEADS
    xn = ln(x, ln1s, ln1b)
    qkv = xn @ wqkv + bqkv
    outs = []
    for i in range(HEADS):
        q = qkv[..., i * d:(i + 1) * d] * SCALE
        k = qkv[..., c + i * d: c + (i + 1) * d]
        v = qkv[..., 2 * c + i * d: 2 * c + (i + 1) * d]
        a = jnp.einsum("bnd,bmd->bnm", q, k) + bias[i]
        a = jax.nn.softmax(a, axis=-1)
        outs.append(jnp.einsum("bnm,bmd->bnd", a, v))
    attn = jnp.concatenate(outs, -1)
    h = x + attn @ wproj + bproj
    hn = ln(h, ln2s, ln2b)
    m = jax.nn.gelu(hn @ w1 + b1, approximate=False) @ w2 + b2
    return h + m


def _inputs(seed=0):
    r = np.random.default_rng(seed)
    f = lambda *s: jnp.asarray(r.standard_normal(s) * 0.1, jnp.float32)
    return dict(
        x=f(8, N, C),
        ln1s=jnp.ones((C,)), ln1b=f(C),
        wqkv=f(C, 3 * C), bqkv=f(3 * C),
        bias=f(HEADS, N, N),
        wproj=f(C, C), bproj=f(C),
        ln2s=jnp.ones((C,)), ln2b=f(C),
        w1=f(C, HID), b1=f(HID), w2=f(HID, C), b2=f(C),
    )


def test_fused_backward_matches_reference_grads():
    p = _inputs()
    names = list(p)

    def loss_ref(*args):
        return jnp.sum(_ref_block(*args) ** 2)

    def loss_fused(*args):
        return jnp.sum(
            fused_swin_block_ad(*args, None, HEADS, SCALE, 4) ** 2
        )

    args = tuple(p[k] for k in names)
    ref_grads = jax.grad(loss_ref, argnums=tuple(range(len(args))))(*args)
    with pltpu.force_tpu_interpret_mode():
        fused_grads = jax.grad(loss_fused, argnums=tuple(range(len(args))))(*args)

    for name, rg, fg in zip(names, ref_grads, fused_grads):
        np.testing.assert_allclose(
            np.asarray(fg), np.asarray(rg), atol=2e-3, rtol=2e-3,
            err_msg=f"grad mismatch for {name}",
        )


def test_fused_ad_forward_matches_reference():
    p = _inputs(1)
    args = tuple(p.values())
    ref = _ref_block(*args)
    with pltpu.force_tpu_interpret_mode():
        got = fused_swin_block_ad(*args, None, HEADS, SCALE, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_fused_train_step_matches_unfused():
    """Full GAN train step with the fused differentiable generator path."""
    from superresolution_def_tpu.train import (
        create_swin_train_state,
        make_swin_train_step,
    )

    kwargs = dict(
        img_size=16, upscale=4, embed_dim=16, depths=(1,), num_heads=(2,),
        window_size=8, dtype=jnp.float32,
    )
    s0, b0 = create_swin_train_state(jax.random.PRNGKey(0), **kwargs)
    s1, b1 = create_swin_train_state(jax.random.PRNGKey(0), **kwargs, fused=True)

    r = np.random.default_rng(0)
    batch = {
        "lr": r.integers(0, 65535, (2, 1, 16, 16, 1), dtype=np.uint16),
        "hr": r.integers(0, 65535, (2, 1, 64, 64, 1), dtype=np.uint16),
    }
    step0 = make_swin_train_step(b0, accum_steps=2)
    step1 = make_swin_train_step(b1, accum_steps=2)
    with pltpu.force_tpu_interpret_mode():
        n1, m1 = step1(s1, batch, 1e-4, 1e-4)
    n0, m0 = step0(s0, batch, 1e-4, 1e-4)

    assert float(m1["valid_batches"]) == 2.0
    np.testing.assert_allclose(float(m1["loss_g"]), float(m0["loss_g"]), rtol=1e-3)
    np.testing.assert_allclose(float(m1["loss_d"]), float(m0["loss_d"]), rtol=1e-3)
    # generator params moved consistently in both paths
    a = jax.tree_util.tree_leaves(n0.g_params)
    b = jax.tree_util.tree_leaves(n1.g_params)
    for x0, x1 in zip(a, b):
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x0), atol=5e-4, rtol=5e-2)

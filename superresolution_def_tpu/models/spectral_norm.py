"""Spectral normalization with torch-compatible power-iteration semantics.

torch.nn.utils.spectral_norm stores weight_orig + (u, v); every *training*
forward runs one power iteration (under no_grad) and computes
sigma = u^T W v with the updated-but-detached vectors; eval forwards reuse
the stored vectors. Gradients flow through W in sigma. The reference's
discriminators update u on every D forward — four per batch in train_swin
(train_swin.py:221-243).

Here (u, v) live in the ``spectral`` variable collection of the train state;
the caller passes ``update_stats`` to mirror train/eval mode. Under pjit the
collection is replicated and updated identically on every shard, so no
cross-device divergence is possible.

The 2-D weight view matches torch exactly (O-first, (I, kh, kw) flattening;
ConvTranspose handled via torch's dim=1 rule) so ported checkpoints resume
with identical sigma.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


def _l2norm(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return x / (jnp.linalg.norm(x) + eps)


class SNConv2d(nn.Module):
    """Spectral-normalized NHWC conv (or transposed conv).

    Kernel stored as (kh, kw, I, O). For ``transpose=True`` the op is
    torch ConvTranspose2d(kernel 4, stride 2, pad 1)-equivalent, expressed
    as an input-dilated conv (fractionally-strided) on the MXU.
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = False
    transpose: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_stats: bool = False) -> jnp.ndarray:
        k = self.kernel_size
        cin = x.shape[-1]
        o = self.features
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (k, k, cin, o),
        )
        fan = cin * k * k
        w2d = kernel.transpose(3, 2, 0, 1).reshape(o, fan)

        u_var = self.variable(
            "spectral", "u", lambda: _l2norm(jax.random.normal(self.make_rng("params"), (o,)))
        )
        v_var = self.variable(
            "spectral", "v", lambda: _l2norm(jax.random.normal(self.make_rng("params"), (fan,)))
        )

        if update_stats:
            w2d_sg = jax.lax.stop_gradient(w2d)
            v_new = _l2norm(w2d_sg.T @ u_var.value)
            u_new = _l2norm(w2d_sg @ v_new)
            u_var.value = u_new
            v_var.value = v_new
        u = jax.lax.stop_gradient(u_var.value)
        v = jax.lax.stop_gradient(v_var.value)
        sigma = u @ (w2d @ v)
        w = (kernel / sigma).astype(self.dtype)

        if self.transpose:
            # torch ConvTranspose2d == lhs-dilated conv with flipped kernel
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                w[::-1, ::-1],
                window_strides=(1, 1),
                padding=[(k - 1 - self.padding,) * 2] * 2,
                lhs_dilation=(self.stride, self.stride),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                w,
                window_strides=(self.stride, self.stride),
                padding=[(self.padding, self.padding)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (o,))
            y = y + bias.astype(self.dtype)
        return y

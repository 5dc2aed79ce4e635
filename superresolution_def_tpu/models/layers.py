"""Shared NHWC building blocks with torch-compatible numerics.

Initializers reproduce torch defaults so from-scratch training matches the
reference's initial distribution:
  - Conv2d / Linear: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)),
    bias U(+-1/sqrt(fan_in))
  - transformer tables/linears that the reference trunc-normal(0.02)-inits
    use :func:`trunc_normal_init`
GELU is the exact (erf) variant — torch nn.GELU default. LayerNorm eps=1e-5.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any

# torch kaiming_uniform(a=sqrt(5)) == variance_scaling(1/3, fan_in, uniform)
torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
# torch kaiming_normal(a=0, fan_in) used by the hybrid's explicit conv init
kaiming_normal_init = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


def torch_bias_init(fan_in: int) -> Callable:
    """torch Conv2d/Linear default bias init: U(+-1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact erf GELU (torch nn.GELU default)."""
    return jax.nn.gelu(x, approximate=False)


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.01) -> jnp.ndarray:
    return jnp.where(x >= 0, x, x * negative_slope)


class Conv2d(nn.Module):
    """NHWC conv with torch padding convention and torch default init."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    in_features: int | None = None  # required for torch-exact bias init
    kernel_init: Callable = torch_kernel_init
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        fan_in = (self.in_features or x.shape[-1]) * k * k
        conv = nn.Conv(
            features=self.features,
            kernel_size=(k, k),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )
        return conv(x)


class Dense(nn.Module):
    """Linear layer with torch default init."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = torch_kernel_init
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = x.shape[-1]
        dense = nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="linear",
        )
        return dense(x)


class LayerNorm(nn.Module):
    """LayerNorm over the channel axis, torch eps, fp32 statistics."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="ln"
        )(x)


class Mlp(nn.Module):
    """fc1 -> GELU -> fc2 (dropout rates are 0 throughout the reference)."""

    hidden_features: int
    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = gelu(x)
        x = Dense(self.out_features, dtype=self.dtype, name="fc2")(x)
        return x

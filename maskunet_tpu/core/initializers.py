"""Parameter initializers matching PyTorch's layer defaults.

The reference model (Belis0811/MaskUnet, e.g. code/ade20k/ade_semantic.py:192-314)
relies on torch's default initialization for Conv2d / Linear / BatchNorm /
LayerNorm. To make training dynamics comparable we reproduce those defaults:

- Conv2d / Linear weights: kaiming_uniform with a=sqrt(5), which reduces to
  U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
- Biases: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
- Norm scales: ones; norm offsets: zeros.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def torch_uniform(key: jax.Array, shape, fan_in: int, dtype=jnp.float32) -> jax.Array:
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch's default for conv/linear."""
    bound = 1.0 / (fan_in ** 0.5)
    return jax.random.uniform(key, shape, dtype=dtype, minval=-bound, maxval=bound)


def conv_kernel(key: jax.Array, kh: int, kw: int, cin: int, cout: int,
                dtype=jnp.float32) -> jax.Array:
    """HWIO conv kernel with torch's default (kaiming_uniform a=sqrt(5)) init."""
    fan_in = cin * kh * kw
    return torch_uniform(key, (kh, kw, cin, cout), fan_in, dtype)


def linear_kernel(key: jax.Array, cin: int, cout: int, dtype=jnp.float32) -> jax.Array:
    """(cin, cout) dense kernel with torch's default init."""
    return torch_uniform(key, (cin, cout), cin, dtype)

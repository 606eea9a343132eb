"""Weight initializers matching the reference's init scheme.

- Linear layers: xavier_uniform weights, zero bias (reference:
  models_mae_cross.py:126-134 _init_weights, "following official JAX
  ViT"); the patch-embed projection is xavier'd as a flattened linear
  (reference: models_mae_cross.py:117-119), which is exactly what our
  matmul patch embed is.
- Conv layers: the reference never re-initializes its convs, so they
  keep torch Conv2d defaults — kaiming_uniform(a=sqrt(5)) weights
  (== uniform with bound 1/sqrt(fan_in)) and uniform bias with the
  same bound.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

xavier_uniform = nn.initializers.xavier_uniform()
zeros = nn.initializers.zeros

# kaiming_uniform(a=sqrt(5)) over fan_in == variance_scaling(1/3,
# fan_in, uniform): bound = sqrt(3 * (1/3) / fan_in) = 1/sqrt(fan_in).
torch_conv_kernel = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_conv_bias(key: jax.Array, shape, dtype=jnp.float32, fan_in: int = 1):
    bound = 1.0 / (fan_in ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def conv_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        return torch_conv_bias(key, shape, dtype, fan_in)

    return init

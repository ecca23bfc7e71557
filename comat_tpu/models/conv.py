"""Drop-in 3x3 SAME conv module with Pallas dispatch.

Parameter-compatible with `nn.Conv(features, (3, 3), padding=1)` —
same `kernel` (3,3,Cin,Cout) / `bias` (Cout,) names and shapes, so HF
weight import (models/hf_import.py) and existing checkpoints are
unaffected. At apply time it routes large-spatial shapes to the Pallas
kernel (ops/conv3x3.py — measured +14..33% over XLA's conv on the VAE
resnet stack on v5e) and everything else to `lax.conv` via nn.Conv's
math. Bias add is left outside the kernel so XLA fuses it with the
following norm/activation.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from comat_tpu.ops.conv3x3 import (
    conv3x3_same, use_pallas_conv, xla_conv3x3,
)


class Conv3x3(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(in_axis=(0, 1, 2), out_axis=3),
            (3, 3, cin, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        k = kernel.astype(self.dtype)
        xd = x.astype(self.dtype)
        if use_pallas_conv(x.shape, kernel.shape):
            y = conv3x3_same(xd, k)
        else:
            y = xla_conv3x3(xd, k)
        return y + bias.astype(self.dtype)

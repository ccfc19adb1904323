"""Core NN building blocks (flax.linen).

Functional re-design of the reference's torch modules: every layer is a pure
function of (params, arrays) — no mutable graph blackboard. Math parity
references are cited per class.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class GatedMLP(nn.Module):
    """Twin dense/gate stacks, output = dense(x) * gate(x).

    Parity: /root/reference/src/torch_m3gnet/nn/core.py:6-62 — dense layers are
    Linear+SiLU (last linear if ``is_output``); gate layers are Linear+SiLU with
    a final Sigmoid.
    """

    dimensions: Sequence[int]
    is_output: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x
        g = x
        n = len(self.dimensions)
        for i, dim in enumerate(self.dimensions):
            d = nn.Dense(dim, use_bias=self.use_bias, name=f"dense_{i}")(d)
            if not (self.is_output and i == n - 1):
                d = nn.silu(d)
            g = nn.Dense(dim, use_bias=self.use_bias, name=f"gate_{i}")(g)
            g = nn.sigmoid(g) if i == n - 1 else nn.silu(g)
        return d * g

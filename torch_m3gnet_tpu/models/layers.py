"""Core NN building blocks (flax.linen).

Functional re-design of the reference's torch modules: every layer is a pure
function of (params, arrays) — no mutable graph blackboard. Math parity
references are cited per class.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class _DenseParams(nn.Module):
    """Owns an ``nn.Dense``-compatible (kernel, bias) pair without applying
    it — lets a parent fuse several Dense applications into one matmul while
    keeping the parameter tree identical to unfused ``nn.Dense`` children."""

    in_features: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.features),
            jnp.float32,
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
            )
            if self.use_bias
            else None
        )
        return kernel, bias


class GatedMLP(nn.Module):
    """Twin dense/gate stacks, output = dense(x) * gate(x).

    Parity: /root/reference/src/torch_m3gnet/nn/core.py:6-62 — dense layers are
    Linear+SiLU (last linear if ``is_output``); gate layers are Linear+SiLU with
    a final Sigmoid.

    ``fuse_first=True`` evaluates the two first-layer matmuls (which share
    the input) as ONE matmul of doubled output width — bit-identical math
    (each output element is the same K-length dot product), same parameter
    tree, but a full-width (>=128-lane) MXU pass and a single read of the
    (E, 3D) input instead of two.

    ``fuse_second=True`` (requires ``fuse_first``) extends the fusion to the
    remaining layers: the twin stacks never split — each later layer is one
    block-diagonal matmul ``h @ [[W_d, 0], [0, W_g]]`` on the doubled-width
    activation, with a single SiLU over the full width between layers (both
    halves use SiLU in non-final layers) and the dense/gate split only at the
    end. At D = 64 the separate (., 64) @ (64, 64) twins each occupy half the
    128-lane MXU tile; the (., 128) @ (128, 2*dim) block pass runs at full
    width in the same tile budget. The zero blocks contribute exact +0.0,
    so the math is identical; outputs differ from the unfused stacks only by
    floating-point reassociation of the wider contraction (~1 ulp). The
    parameter tree is unchanged.
    """

    dimensions: Sequence[int]
    is_output: bool = False
    use_bias: bool = True
    fuse_first: bool = True
    fuse_second: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = len(self.dimensions)
        if self.fuse_second:
            if not self.fuse_first:
                raise ValueError("fuse_second requires fuse_first")
            return self._fused_all(x)
        start = 0
        if self.fuse_first:
            dim = self.dimensions[0]
            kd, bd = _DenseParams(
                x.shape[-1], dim, self.use_bias, name="dense_0"
            )()
            kg, bg = _DenseParams(
                x.shape[-1], dim, self.use_bias, name="gate_0"
            )()
            dtype = jnp.promote_types(x.dtype, kd.dtype)
            h = x.astype(dtype) @ jnp.concatenate(
                [kd.astype(dtype), kg.astype(dtype)], axis=1
            )
            if self.use_bias:
                h = h + jnp.concatenate([bd, bg]).astype(dtype)
            d, g = h[..., :dim], h[..., dim:]
            if not (self.is_output and n == 1):
                d = nn.silu(d)
            g = nn.sigmoid(g) if n == 1 else nn.silu(g)
            start = 1
        else:
            d = x
            g = x
        for i in range(start, n):
            dim = self.dimensions[i]
            d = nn.Dense(dim, use_bias=self.use_bias, name=f"dense_{i}")(d)
            if not (self.is_output and i == n - 1):
                d = nn.silu(d)
            g = nn.Dense(dim, use_bias=self.use_bias, name=f"gate_{i}")(g)
            g = nn.sigmoid(g) if i == n - 1 else nn.silu(g)
        return d * g

    def _fused_all(self, x: jnp.ndarray) -> jnp.ndarray:
        n = len(self.dimensions)
        in_dims = [x.shape[-1]] + list(self.dimensions[:-1])
        h = x
        for i, dim in enumerate(self.dimensions):
            kd, bd = _DenseParams(
                in_dims[i], dim, self.use_bias, name=f"dense_{i}"
            )()
            kg, bg = _DenseParams(
                in_dims[i], dim, self.use_bias, name=f"gate_{i}"
            )()
            dtype = jnp.promote_types(h.dtype, kd.dtype)
            if i == 0:
                k = jnp.concatenate([kd, kg], axis=1)  # (in, 2*dim)
            else:
                z = jnp.zeros((in_dims[i], dim), kd.dtype)
                k = jnp.concatenate(
                    [
                        jnp.concatenate([kd, z], axis=1),
                        jnp.concatenate([z, kg], axis=1),
                    ],
                    axis=0,
                )  # (2*in, 2*dim) block-diagonal
            h = h.astype(dtype) @ k.astype(dtype)
            if self.use_bias:
                h = h + jnp.concatenate([bd, bg]).astype(dtype)
            if i < n - 1:
                h = nn.silu(h)  # both halves are SiLU in non-final layers
        dim = self.dimensions[-1]
        d, g = h[..., :dim], h[..., dim:]
        if not self.is_output:
            d = nn.silu(d)
        return d * nn.sigmoid(g)


class DenseFM(nn.Module):
    """Feature-major Dense: input (F_in, M), output (features, M).

    TPU arrays are tiled (8 sublanes, 128 lanes) with the minor-most axis on
    lanes, so entity-major (M, F) activations with F < 128 are physically
    padded 128/F-fold in HBM (2x for the model's D = 64, 4.7x for the
    factorized stage's 27, 42x for xyz vectors). Carrying activations
    feature-major puts the huge entity axis on lanes instead — the F axis
    lands on sublanes where padding is only to a multiple of 8.

    The parameter tree is IDENTICAL to ``nn.Dense`` (kernel (F_in, features),
    bias (features,)), so checkpoints and initializers are interchangeable
    between the em and fm model paths.
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x_fm: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x_fm.shape[0], self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        # Match nn.Dense's promote_dtype semantics: with dtype=None the
        # computation runs in the promoted input/param dtype (f32 for f32
        # params even when activations are bf16), so em and fm paths agree
        # bit-for-bit in every compute_dtype mode.
        dtype = self.dtype or jnp.promote_types(x_fm.dtype, kernel.dtype)
        y = jnp.einsum(
            "io,im->om", kernel.astype(dtype), x_fm.astype(dtype)
        )
        if bias is not None:
            y = y + bias.astype(dtype)[:, None]
        return y


class GatedMLPFM(nn.Module):
    """Feature-major :class:`GatedMLP`; parameter tree identical to it."""

    dimensions: Sequence[int]
    is_output: bool = False
    use_bias: bool = True
    dtype: jnp.dtype | None = None
    fuse_first: bool = True
    fuse_second: bool = False

    @nn.compact
    def __call__(self, x_fm: jnp.ndarray) -> jnp.ndarray:
        n = len(self.dimensions)
        if self.fuse_second:
            if not self.fuse_first:
                raise ValueError("fuse_second requires fuse_first")
            return self._fused_all(x_fm)
        start = 0
        if self.fuse_first:
            dim = self.dimensions[0]
            kd, bd = _DenseParams(
                x_fm.shape[0], dim, self.use_bias, name="dense_0"
            )()
            kg, bg = _DenseParams(
                x_fm.shape[0], dim, self.use_bias, name="gate_0"
            )()
            dtype = self.dtype or jnp.promote_types(x_fm.dtype, kd.dtype)
            kc = jnp.concatenate([kd, kg], axis=1).astype(dtype)
            h = jnp.einsum("io,im->om", kc, x_fm.astype(dtype))
            if self.use_bias:
                h = h + jnp.concatenate([bd, bg]).astype(dtype)[:, None]
            d, g = h[:dim], h[dim:]
            if not (self.is_output and n == 1):
                d = nn.silu(d)
            g = nn.sigmoid(g) if n == 1 else nn.silu(g)
            start = 1
        else:
            d = x_fm
            g = x_fm
        for i in range(start, n):
            dim = self.dimensions[i]
            d = DenseFM(dim, use_bias=self.use_bias, dtype=self.dtype,
                        name=f"dense_{i}")(d)
            if not (self.is_output and i == n - 1):
                d = nn.silu(d)
            g = DenseFM(dim, use_bias=self.use_bias, dtype=self.dtype,
                        name=f"gate_{i}")(g)
            g = nn.sigmoid(g) if i == n - 1 else nn.silu(g)
        return d * g

    def _fused_all(self, x_fm: jnp.ndarray) -> jnp.ndarray:
        n = len(self.dimensions)
        in_dims = [x_fm.shape[0]] + list(self.dimensions[:-1])
        h = x_fm
        for i, dim in enumerate(self.dimensions):
            kd, bd = _DenseParams(
                in_dims[i], dim, self.use_bias, name=f"dense_{i}"
            )()
            kg, bg = _DenseParams(
                in_dims[i], dim, self.use_bias, name=f"gate_{i}"
            )()
            dtype = self.dtype or jnp.promote_types(h.dtype, kd.dtype)
            if i == 0:
                k = jnp.concatenate([kd, kg], axis=1)
            else:
                z = jnp.zeros((in_dims[i], dim), kd.dtype)
                k = jnp.concatenate(
                    [
                        jnp.concatenate([kd, z], axis=1),
                        jnp.concatenate([z, kg], axis=1),
                    ],
                    axis=0,
                )
            h = jnp.einsum("io,im->om", k.astype(dtype), h.astype(dtype))
            if self.use_bias:
                h = h + jnp.concatenate([bd, bg]).astype(dtype)[:, None]
            if i < n - 1:
                h = nn.silu(h)
        dim = self.dimensions[-1]
        d, g = h[:dim], h[dim:]
        if not self.is_output:
            d = nn.silu(d)
        return d * nn.sigmoid(g)

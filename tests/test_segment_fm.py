"""Feature-major gather/segment-sum pair: correctness and closure under AD."""

import jax
import jax.numpy as jnp
import numpy as np

from torch_m3gnet_tpu.ops.segment import segment_sum_fm, take_fm

rng = np.random.default_rng(0)
N, E, C = 37, 211, 5
idx = np.sort(rng.integers(0, N, E)).astype(np.int32)
x = rng.standard_normal((C, N)).astype(np.float32)
d = rng.standard_normal((C, E)).astype(np.float32)


def test_take_fm_matches_take():
    got = take_fm(jnp.asarray(x), jnp.asarray(idx))
    np.testing.assert_allclose(np.asarray(got), x[:, idx], rtol=0, atol=0)


def test_segment_sum_fm_matches_segment_sum():
    got = segment_sum_fm(jnp.asarray(d), jnp.asarray(idx), N, True)
    want = jax.ops.segment_sum(jnp.asarray(d.T), jnp.asarray(idx), num_segments=N).T
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_fm_pair_vjp():
    w = jnp.asarray(rng.standard_normal((C, E)).astype(np.float32))

    def f(x_):
        return jnp.sum(segment_sum_fm(take_fm(x_, jnp.asarray(idx)) * w, jnp.asarray(idx), N, True) ** 2)

    g = jax.grad(f)(jnp.asarray(x))
    # dense reference via one-hot
    onehot = (idx[None, :] == np.arange(N)[:, None]).astype(np.float32)  # (N, E)

    def f_ref(x_):
        gath = x_ @ jnp.asarray(onehot)  # (C, E)
        s = (gath * w) @ jnp.asarray(onehot.T)  # (C, N)
        return jnp.sum(s**2)

    g_ref = jax.grad(f_ref)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


def test_fm_pair_grad_of_grad():
    w = jnp.asarray(rng.standard_normal((C, E)).astype(np.float32))

    def inner(x_):
        y = segment_sum_fm(take_fm(x_, jnp.asarray(idx)) * w, jnp.asarray(idx), N, True)
        return jnp.sum(y**2)

    def outer(x_):
        return jnp.sum(jax.grad(inner)(x_) ** 3)

    gg = jax.grad(outer)(jnp.asarray(x))
    assert np.isfinite(np.asarray(gg)).all()
    # FD check of the outer grad along a random direction
    v = rng.standard_normal(x.shape).astype(np.float32)
    eps = 1e-3
    fd = (outer(jnp.asarray(x + eps * v)) - outer(jnp.asarray(x - eps * v))) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(gg, v)), float(fd), rtol=5e-2, atol=5e-2)

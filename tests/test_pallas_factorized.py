"""Fused factorized-stage Pallas ops (ops/pallas_factorized_stage.py):
forward parity with the XLA reference implementations, VJP correctness, and
grad-of-grad closure — all in TPU interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torch_m3gnet_tpu.ops.pallas_factorized_stage import (
    q_scatter,
    q_scatter_xla,
    r1_gather,
    r1_gather_xla,
    r2_gather,
    r2_gather_xla,
)

L_MAX, N_MAX = 3, 3
M = L_MAX * L_MAX
LN = L_MAX * N_MAX
MN = M * N_MAX


def _data(e=700, n=40, seed=0):
    rng = np.random.default_rng(seed)
    src = np.sort(rng.integers(0, n, size=e)).astype(np.int32)
    sh = rng.standard_normal((M, e)).astype(np.float32)
    gm = rng.standard_normal((LN, e)).astype(np.float32)
    a = rng.standard_normal((MN, n)).astype(np.float32)
    return jnp.asarray(sh), jnp.asarray(gm), jnp.asarray(a), jnp.asarray(src), n, e


@pytest.fixture(autouse=True)
def _interpret():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def test_q_scatter_matches_xla():
    sh, gm, a, src, n, e = _data()
    got = q_scatter(sh, gm, src, n, L_MAX, N_MAX)
    want = q_scatter_xla(sh, gm, src, n, L_MAX, N_MAX)
    assert got.shape == (MN, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_r1_r2_match_xla():
    sh, gm, a, src, n, e = _data(seed=1)
    got1 = r1_gather(a, sh, src, e, L_MAX, N_MAX)
    want1 = r1_gather_xla(a, sh, src, e, L_MAX, N_MAX)
    assert got1.shape == (LN, e)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1), atol=2e-5)

    got2 = r2_gather(a, gm, src, e, L_MAX, N_MAX)
    want2 = r2_gather_xla(a, gm, src, e, L_MAX, N_MAX)
    assert got2.shape == (M, e)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=2e-5)


def test_stage_and_gradients_match_xla():
    """The composed stage (A = Q, proj = R1) agrees with the XLA composition
    in value AND in gradients with respect to every input."""
    sh, gm, a, src, n, e = _data(e=600, n=32, seed=2)

    def stage(ops, sh, gm):
        q, r1 = ops
        A = q(sh, gm, src, n, L_MAX, N_MAX)
        proj = r1(A, sh, src, e, L_MAX, N_MAX)
        return jnp.sum(jnp.sin(proj - gm))  # nonlinear reduction

    pallas_ops = (q_scatter, r1_gather)
    xla_ops = (q_scatter_xla, r1_gather_xla)

    v_p = float(stage(pallas_ops, sh, gm))
    v_x = float(stage(xla_ops, sh, gm))
    # 5400-term cancellation-heavy f32 reduction: abs tolerance, not rel
    assert v_p == pytest.approx(v_x, abs=5e-4)

    g_p = jax.grad(lambda s, g: stage(pallas_ops, s, g), argnums=(0, 1))(sh, gm)
    g_x = jax.grad(lambda s, g: stage(xla_ops, s, g), argnums=(0, 1))(sh, gm)
    for p, x in zip(g_p, g_x):
        # two chained f32 segment reductions in different accumulation
        # orders: ~n*eps per hop on O(10) values
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(x), atol=5e-4, rtol=1e-3
        )


@pytest.mark.slow
def test_grad_of_grad_closure():
    """Second derivatives flow through the kernel family (force-loss training
    differentiates through the force computation)."""
    sh, gm, a, src, n, e = _data(e=500, n=24, seed=3)

    def energy(ops, sh):
        q, r1 = ops
        A = q(sh, gm, src, n, L_MAX, N_MAX)
        proj = r1(A, sh, src, e, L_MAX, N_MAX)
        return jnp.sum(proj**2)

    def force_norm(ops, sh):
        f = jax.grad(lambda s: energy(ops, s))(sh)
        return jnp.sum(f**2)

    pallas_ops = (q_scatter, r1_gather)
    xla_ops = (q_scatter_xla, r1_gather_xla)
    np.testing.assert_allclose(
        float(force_norm(pallas_ops, sh)), float(force_norm(xla_ops, sh)),
        rtol=1e-4,
    )
    gg_p = jax.grad(lambda s: force_norm(pallas_ops, s))(sh)
    gg_x = jax.grad(lambda s: force_norm(xla_ops, s))(sh)
    np.testing.assert_allclose(
        np.asarray(gg_p), np.asarray(gg_x), atol=1e-3, rtol=1e-3
    )


@pytest.mark.slow
def test_full_model_with_fused_stage_matches_xla(al_fcc, na_bcc):
    """E/F/S of the fm model with fused_factorized='on' equals the XLA fm
    path (same params) to f32 accumulation accuracy — including the force
    path (grad THROUGH the kernels)."""
    from torch_m3gnet_tpu.config import M3GNetConfig
    from torch_m3gnet_tpu.data.graph import pack_structures
    from torch_m3gnet_tpu.models import build_model

    cfg = M3GNetConfig(
        l_max=3, n_max=3, embedding_dim=16, num_blocks=2,
        threebody_mode="factorized", layout="fm",
    )
    b = pack_structures([al_fcc, na_bcc], 5.0, 4.0, pad_multiple=64)
    pot = build_model(cfg)
    params = pot.init(jax.random.PRNGKey(0), b)
    want = pot.apply(params, b)

    pot_f = build_model(cfg.replace(fused_factorized="on"))
    out = pot_f.apply(params, b)
    np.testing.assert_allclose(
        np.asarray(out.energy), np.asarray(want.energy), rtol=2e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.forces), np.asarray(want.forces), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.stress), np.asarray(want.stress), atol=1e-6
    )


@pytest.mark.slow
def test_full_model_fused_stage_training_gradients(al_fcc, na_bcc):
    """Loss + parameter gradients (grad-of-grad through the kernels on the
    force path) match the XLA fm path."""
    from torch_m3gnet_tpu.config import M3GNetConfig
    from torch_m3gnet_tpu.data.graph import pack_structures
    from torch_m3gnet_tpu.models import build_model
    from torch_m3gnet_tpu.train.loop import loss_and_metrics

    rng = np.random.default_rng(7)
    cfg = M3GNetConfig(
        l_max=2, n_max=2, embedding_dim=8, num_blocks=1,
        threebody_mode="factorized", layout="fm", stress_weight=0.1,
    )
    b = pack_structures([al_fcc, na_bcc], 5.0, 4.0, pad_multiple=64)
    b = b.replace(
        energy=np.array([-10.0, -4.0], np.float32),
        forces=(0.1 * rng.standard_normal(b.positions.shape)).astype(np.float32),
        stress=(0.01 * rng.standard_normal((2, 6))).astype(np.float32),
    )
    pot = build_model(cfg)
    pot_f = build_model(cfg.replace(fused_factorized="on"))
    params = pot.init(jax.random.PRNGKey(1), b)

    def loss(p, potential):
        val, _ = loss_and_metrics(potential, p, b, cfg)
        return val

    np.testing.assert_allclose(
        float(loss(params, pot_f)), float(loss(params, pot)), rtol=1e-4
    )
    g = jax.grad(lambda p: loss(p, pot))(params)
    g_f = jax.grad(lambda p: loss(p, pot_f))(params)
    for a, c in zip(jax.tree.leaves(g), jax.tree.leaves(g_f)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), atol=1e-5, rtol=2e-3
        )

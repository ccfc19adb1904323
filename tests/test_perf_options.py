"""Performance-option correctness: bf16 compute and triplet rematerialization."""

import numpy as np

import jax

from torch_m3gnet_tpu.config import M3GNetConfig
from torch_m3gnet_tpu.data.graph import pack_structures
from torch_m3gnet_tpu.models import build_model

CFG = M3GNetConfig(l_max=2, n_max=3, embedding_dim=16, num_blocks=2)


def _batch(al_fcc, na_bcc):
    return pack_structures([al_fcc, na_bcc], 5.0, 4.0, pad_multiple=64)


def test_remat_triplets_is_exact(al_fcc, na_bcc):
    b = _batch(al_fcc, na_bcc)
    pot = build_model(CFG)
    pot_r = build_model(CFG.replace(remat_triplets=True))
    params = pot.init(jax.random.PRNGKey(0), b)
    out = pot.apply(params, b)
    out_r = pot_r.apply(params, b)
    np.testing.assert_allclose(np.asarray(out.energy), np.asarray(out_r.energy), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.forces), np.asarray(out_r.forces), atol=1e-5)


def test_fused_triplets_matches_xla(al_fcc, na_bcc):
    """Full model E/F/S with the fused Pallas triplet stage (interpret mode)
    equals the XLA segment-sum path to f32-accumulation accuracy."""
    from jax.experimental.pallas import tpu as pltpu

    b = _batch(al_fcc, na_bcc)
    pot = build_model(CFG)
    pot_f = build_model(CFG.replace(fused_triplets="on"))
    params = pot.init(jax.random.PRNGKey(0), b)
    out = pot.apply(params, b)
    with pltpu.force_tpu_interpret_mode():
        out_f = pot_f.apply(params, b)
    np.testing.assert_allclose(
        np.asarray(out_f.energy), np.asarray(out.energy), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_f.forces), np.asarray(out.forces), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_f.stress), np.asarray(out.stress), atol=5e-6
    )


def test_fused_triplets_training_gradients(al_fcc, na_bcc):
    """Grad-of-grad: parameter gradients of the E+F loss agree through the
    fused kernel's custom VJP (the force loss differentiates the backward)."""
    from jax.experimental.pallas import tpu as pltpu

    from torch_m3gnet_tpu.train.loop import loss_and_metrics

    rng = np.random.default_rng(0)
    b = _batch(al_fcc, na_bcc)
    b = b.replace(
        energy=np.array([-10.0, -5.0], dtype=np.float32),
        forces=(0.1 * rng.standard_normal((b.num_nodes, 3))).astype(np.float32),
        stress=np.zeros((b.num_graphs, 6), dtype=np.float32),
    )
    cfg = CFG.replace(stress_weight=0.0)
    pot = build_model(cfg)
    pot_f = build_model(cfg.replace(fused_triplets="on"))
    params = pot.init(jax.random.PRNGKey(0), b)

    grads = jax.grad(lambda p: loss_and_metrics(pot, p, b, cfg)[0])(params)
    with pltpu.force_tpu_interpret_mode():
        grads_f = jax.grad(lambda p: loss_and_metrics(pot_f, p, b, cfg)[0])(params)
    for a, c in zip(jax.tree.leaves(grads_f), jax.tree.leaves(grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=5e-5, rtol=2e-3)


def test_bfloat16_compute_close_to_f32(al_fcc, na_bcc):
    b = _batch(al_fcc, na_bcc)
    pot = build_model(CFG)
    pot_h = build_model(CFG.replace(compute_dtype="bfloat16"))
    params = pot.init(jax.random.PRNGKey(0), b)
    out = pot.apply(params, b)
    out_h = pot_h.apply(params, b)
    assert out_h.energy.dtype == out.energy.dtype  # energies stay full precision
    assert np.isfinite(np.asarray(out_h.energy)).all()
    assert np.isfinite(np.asarray(out_h.forces)).all()
    # bf16 has ~3 decimal digits; energies should agree loosely
    e = np.asarray(out.energy[:2])
    eh = np.asarray(out_h.energy[:2])
    np.testing.assert_allclose(eh, e, rtol=0.05, atol=0.05)


def test_factorized_triplets_matches_gather(al_fcc, na_bcc):
    """The addition-theorem factorization computes the IDENTICAL function:
    E/F/S match the per-triplet gather path to f32 roundoff (and to machine
    precision in f64 — exactness, not approximation)."""
    b = _batch(al_fcc, na_bcc)
    pot = build_model(CFG)
    pot_f = build_model(CFG.replace(threebody_mode="factorized"))
    params = pot.init(jax.random.PRNGKey(0), b)
    out = pot.apply(params, b)
    out_f = pot_f.apply(params, b)
    np.testing.assert_allclose(
        np.asarray(out_f.energy), np.asarray(out.energy), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_f.forces), np.asarray(out.forces), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_f.stress), np.asarray(out.stress), atol=5e-6
    )


def test_factorized_triplets_default_lmax(al_fcc, na_bcc):
    """Same equivalence at the reference default l_max=3, n_max=3."""
    cfg = M3GNetConfig(embedding_dim=16, num_blocks=2)
    b = _batch(al_fcc, na_bcc)
    pot = build_model(cfg)
    pot_f = build_model(cfg.replace(threebody_mode="factorized"))
    params = pot.init(jax.random.PRNGKey(0), b)
    out = pot.apply(params, b)
    out_f = pot_f.apply(params, b)
    np.testing.assert_allclose(
        np.asarray(out_f.energy), np.asarray(out.energy), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_f.forces), np.asarray(out.forces), atol=5e-5
    )


def test_factorized_triplets_training_gradients(al_fcc, na_bcc):
    """Grad-of-grad: parameter gradients of the E+F loss agree between the
    factorized and gather paths (the force loss differentiates through the
    harmonics, the E->N segment sum, and the N->E gather)."""
    from torch_m3gnet_tpu.train.loop import loss_and_metrics

    rng = np.random.default_rng(0)
    b = _batch(al_fcc, na_bcc)
    b = b.replace(
        energy=np.array([-10.0, -5.0], dtype=np.float32),
        forces=(0.1 * rng.standard_normal((b.num_nodes, 3))).astype(np.float32),
        stress=np.zeros((b.num_graphs, 6), dtype=np.float32),
    )
    cfg = CFG.replace(stress_weight=0.0)
    pot = build_model(cfg)
    pot_f = build_model(cfg.replace(threebody_mode="factorized"))
    params = pot.init(jax.random.PRNGKey(0), b)

    grads = jax.grad(lambda p: loss_and_metrics(pot, p, b, cfg)[0])(params)
    grads_f = jax.grad(lambda p: loss_and_metrics(pot_f, p, b, cfg)[0])(params)
    for a, c in zip(jax.tree.leaves(grads_f), jax.tree.leaves(grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=5e-5, rtol=2e-3)


def test_bfloat16_factorized_close_to_f32(al_fcc, na_bcc):
    """bf16 + factorized: the stage runs in the compute dtype (consistent with
    the gather/fused paths) and stays close to the f32 factorized result."""
    b = _batch(al_fcc, na_bcc)
    cfg = CFG.replace(threebody_mode="factorized")
    pot = build_model(cfg)
    pot_h = build_model(cfg.replace(compute_dtype="bfloat16"))
    params = pot.init(jax.random.PRNGKey(0), b)
    out = pot.apply(params, b)
    out_h = pot_h.apply(params, b)
    assert out_h.energy.dtype == out.energy.dtype  # energies stay full precision
    assert np.isfinite(np.asarray(out_h.forces)).all()
    np.testing.assert_allclose(
        np.asarray(out_h.energy[:2]), np.asarray(out.energy[:2]), rtol=0.05, atol=0.05
    )


def test_factorized_triplets_high_lmax(al_fcc, na_bcc):
    """l_max = 5 exercises the recursion branch of real_racah_harmonics (the
    factorized default on TPU must not be capped below the gather path)."""
    cfg = M3GNetConfig(l_max=5, n_max=2, embedding_dim=8, num_blocks=1)
    b = _batch(al_fcc, na_bcc)
    pot = build_model(cfg)
    pot_f = build_model(cfg.replace(threebody_mode="factorized"))
    params = pot.init(jax.random.PRNGKey(0), b)
    out = pot.apply(params, b)
    out_f = pot_f.apply(params, b)
    np.testing.assert_allclose(
        np.asarray(out_f.energy), np.asarray(out.energy), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_f.forces), np.asarray(out.forces), atol=5e-5
    )


def test_fuse_gated_second_matches_unfused(al_fcc, na_bcc):
    """Block-diagonal full GatedMLP fusion (models/layers.py fuse_second):
    the zero blocks contribute exact +0.0, so with the same params E/F/S
    match the unfused twin stacks up to fp reassociation of the wider
    contraction (~1 ulp) — in both layouts."""
    b = _batch(al_fcc, na_bcc)
    pot = build_model(CFG)
    params = pot.init(jax.random.PRNGKey(0), b)
    out = pot.apply(params, b)

    pot_f = build_model(CFG.replace(fuse_gated_second=True))
    out_f = pot_f.apply(params, b)
    np.testing.assert_allclose(
        np.asarray(out.energy), np.asarray(out_f.energy), rtol=2e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(out.forces), np.asarray(out_f.forces), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.stress), np.asarray(out_f.stress), atol=1e-7
    )

    # fm layout: fused-second vs the em reference path (same params)
    cfg_fm = CFG.replace(
        threebody_mode="factorized", layout="fm", fuse_gated_second=True
    )
    cfg_em = CFG.replace(threebody_mode="factorized")
    out_em = build_model(cfg_em).apply(params, b)
    out_fm = build_model(cfg_fm).apply(params, b)
    np.testing.assert_allclose(
        np.asarray(out_em.energy), np.asarray(out_fm.energy),
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(out_em.forces), np.asarray(out_fm.forces), atol=1e-5
    )


def test_fuse_gated_second_training_gradients(al_fcc, na_bcc):
    """Loss value AND parameter gradients (grad-of-grad through the fused
    blocks on the force path) match the unfused path."""
    from torch_m3gnet_tpu.train.loop import loss_and_metrics

    rng = np.random.default_rng(3)
    b = _batch(al_fcc, na_bcc)
    b = b.replace(
        energy=np.array([-10.0, -4.0], np.float32),
        forces=(0.1 * rng.standard_normal(b.positions.shape)).astype(np.float32),
        stress=(0.01 * rng.standard_normal((2, 6))).astype(np.float32),
    )
    cfg = CFG.replace(stress_weight=0.1)
    pot = build_model(cfg)
    pot_f = build_model(cfg.replace(fuse_gated_second=True))
    params = pot.init(jax.random.PRNGKey(1), b)

    def loss(p, potential):
        val, _ = loss_and_metrics(potential, p, b, cfg)
        return val

    v = float(loss(params, pot))
    v_f = float(loss(params, pot_f))
    assert v == v_f or abs(v - v_f) < 1e-12
    g = jax.grad(lambda p: loss(p, pot))(params)
    g_f = jax.grad(lambda p: loss(p, pot_f))(params)
    for a, c in zip(jax.tree.leaves(g), jax.tree.leaves(g_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-7, rtol=1e-5)


def test_fused_factorized_auto_resolution():
    """'auto' resolves with platform+layout: off on the CPU test device (the
    kernels are TPU-only), on only for TPU+fm; 'on' outside fm errors."""
    from torch_m3gnet_tpu.config import M3GNetConfig
    from torch_m3gnet_tpu.models import build_model

    cfg = M3GNetConfig(threebody_mode="factorized", layout="fm",
                       fused_factorized="auto")
    pot = build_model(cfg)
    assert pot.model.fused_factorized_stage is False  # CPU pinned in conftest

    pot_on = build_model(cfg.replace(fused_factorized="on"))
    assert pot_on.model.fused_factorized_stage is True

    import pytest as _pytest

    with _pytest.raises(ValueError, match="requires the fm layout"):
        build_model(M3GNetConfig(threebody_mode="factorized", layout="em",
                                 fused_factorized="on"))

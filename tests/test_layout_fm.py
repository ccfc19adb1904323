"""Feature-major (fm) layout: exact parity with the entity-major model.

The fm path re-expresses the factorized model with (features, entities)
arrays; parameters are shared (DenseFM mirrors nn.Dense param trees), and
every Dense contraction keeps the same reduction axis/order, so outputs
must agree to f32 roundoff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_m3gnet_tpu.config import M3GNetConfig
from torch_m3gnet_tpu.data.graph import pack_structures
from torch_m3gnet_tpu.models import build_model


@pytest.fixture(scope="module")
def batch(module_structures):
    return pack_structures(module_structures, 5.0, 4.0, pad_multiple=64)


@pytest.fixture(scope="module")
def module_structures():
    from torch_m3gnet_tpu.data.structure import Structure

    rng = np.random.default_rng(7)
    a = 3.62
    base = Structure.from_frac_coords(
        np.eye(3) * a,
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]],
        [29, 29, 13, 29],
    ).supercell((2, 2, 1))
    return [
        Structure(
            base.lattice,
            base.cart_coords + 0.04 * rng.standard_normal(base.cart_coords.shape),
            base.atomic_numbers,
        )
        for _ in range(3)
    ]


def _build(layout, **kw):
    kw.setdefault("threebody_mode", "factorized")
    cfg = M3GNetConfig(layout=layout, l_max=3, n_max=3, **kw)
    return build_model(cfg, elemental_energies=[0.1] * 95, energy_scale=1.7)


def test_fm_param_tree_matches_em(batch):
    em = _build("em")
    fm = _build("fm")
    p_em = em.init(jax.random.PRNGKey(0), batch)
    p_fm = fm.init(jax.random.PRNGKey(0), batch)
    flat_em = jax.tree_util.tree_flatten_with_path(p_em)[0]
    flat_fm = jax.tree_util.tree_flatten_with_path(p_fm)[0]
    assert [(p, v.shape) for p, v in flat_em] == [(p, v.shape) for p, v in flat_fm]


def test_fm_outputs_match_em(batch):
    em = _build("em")
    fm = _build("fm")
    params = em.init(jax.random.PRNGKey(42), batch)
    out_em = em.apply(params, batch)
    out_fm = fm.apply(params, batch)
    np.testing.assert_allclose(
        np.asarray(out_fm.energy), np.asarray(out_em.energy), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_fm.forces), np.asarray(out_em.forces), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_fm.stress), np.asarray(out_em.stress), rtol=1e-5, atol=1e-5
    )


def test_fm_loss_grads_match_em(batch):
    """Grad-of-grad: force-loss gradients agree between layouts."""
    em = _build("em")
    fm = _build("fm")
    params = em.init(jax.random.PRNGKey(3), batch)

    def loss(pot):
        def f(p):
            out = pot._apply(p, batch)
            return jnp.mean(out.forces**2) + jnp.mean(out.energy**2)

        return f

    g_em = jax.grad(loss(em))(params)
    g_fm = jax.grad(loss(fm))(params)
    flat_em, _ = jax.tree_util.tree_flatten(g_em)
    flat_fm, _ = jax.tree_util.tree_flatten(g_fm)
    for a, b in zip(flat_em, flat_fm):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


def test_fm_bf16_runs_and_is_close(batch):
    fm16 = _build("fm", compute_dtype="bfloat16")
    fm32 = _build("fm")
    params = fm32.init(jax.random.PRNGKey(5), batch)
    o16 = fm16.apply(params, batch)
    o32 = fm32.apply(params, batch)
    assert np.isfinite(np.asarray(o16.forces)).all()
    np.testing.assert_allclose(
        np.asarray(o16.energy), np.asarray(o32.energy), rtol=2e-2, atol=2e-2
    )


def test_fm_requires_factorized():
    with pytest.raises(ValueError):
        _build("fm", threebody_mode="gather")

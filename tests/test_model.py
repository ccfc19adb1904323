"""Model-level tests.

Carries over the reference's test ideas (/root/reference/tests/test_model.py):
NaN-free forward, rotation invariance, batch-vs-single consistency (here:
padding consistency too), forces vs central finite differences — plus exact
parameter-count parity with the documented default model size.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_m3gnet_tpu.config import M3GNetConfig
from torch_m3gnet_tpu.data.graph import (
    batch_graphs,
    cast_batch,
    graph_from_structure,
    pad_batch,
    pack_structures as _pack_structures,
)


def pack_structures(*args, **kwargs):
    """f64 batches: tighter invariance/finite-difference tolerances."""
    kwargs.setdefault("dtype", np.float64)
    return _pack_structures(*args, **kwargs)
from torch_m3gnet_tpu.data.structure import Structure
from torch_m3gnet_tpu.models import build_model

jax.config.update("jax_enable_x64", True)

CONFIG = M3GNetConfig(l_max=2, n_max=3, embedding_dim=16, num_blocks=2, num_types=95)


def _potential():
    return build_model(CONFIG)


def _params(pot, graph):
    return pot.init(jax.random.PRNGKey(0), graph)


@pytest.fixture
def small_batch(al_fcc, na_bcc):
    return pack_structures([al_fcc, na_bcc], 5.0, 4.0, pad_multiple=64)


def test_forward_finite_and_shapes(small_batch):
    pot = _potential()
    params = _params(pot, small_batch)
    out = pot.apply(params, small_batch)
    assert out.energy.shape == (small_batch.num_graphs,)
    assert out.forces.shape == (small_batch.num_nodes, 3)
    assert out.stress.shape == (small_batch.num_graphs, 6)
    for arr in (out.energy, out.forces, out.stress, out.atomic_energy):
        assert np.isfinite(np.asarray(arr)).all()
    # padded graphs/nodes contribute exactly zero
    real_g = int(small_batch.graph_mask.sum())
    np.testing.assert_array_equal(np.asarray(out.energy[real_g:]), 0.0)
    real_n = int(small_batch.node_mask.sum())
    np.testing.assert_array_equal(np.asarray(out.forces[real_n:]), 0.0)


def test_default_param_count(al_fcc):
    """227,549 params for the default config (docs/architecture.md:50)."""
    g = pack_structures([al_fcc], 5.0, 4.0, pad_multiple=32)
    pot = build_model(M3GNetConfig())
    params = pot.init(jax.random.PRNGKey(0), g)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert n == 227_549


def test_padding_consistency(al_fcc, na_bcc):
    """Same physics regardless of padding amount — the TPU analog of the
    reference's batch-order consistency test (test_model.py:59-78)."""
    pot = _potential()
    cat = batch_graphs(
        [graph_from_structure(al_fcc, 5.0, 4.0), graph_from_structure(na_bcc, 5.0, 4.0)]
    )
    small = pad_batch(cat, cat.num_nodes + 3, cat.num_edges + 10, cat.num_triplets + 50, 3)
    big = pad_batch(cat, 2 * cat.num_nodes, 2 * cat.num_edges, 2 * cat.num_triplets, 5)
    params = _params(pot, small)
    out_s = pot.apply(params, small)
    out_b = pot.apply(params, big)
    real_g, real_n = 2, cat.num_nodes
    np.testing.assert_allclose(
        np.asarray(out_s.energy[:real_g]), np.asarray(out_b.energy[:real_g]), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(out_s.forces[:real_n]), np.asarray(out_b.forces[:real_n]), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(out_s.stress[:real_g]), np.asarray(out_b.stress[:real_g]), atol=1e-9
    )


def test_batch_vs_single(al_fcc, na_bcc):
    """Batched forward equals per-graph forwards (test_model.py:59-78)."""
    pot = _potential()
    g1 = graph_from_structure(al_fcc, 5.0, 4.0)
    g2 = graph_from_structure(na_bcc, 5.0, 4.0)
    cat = pad_batch(batch_graphs([g1, g2]), 48, 600, 4000, 2)
    params = _params(pot, cat)
    out = pot.apply(params, cat)
    s1 = pot.apply(params, pad_batch(g1, 40, 500, 3000, 1))
    s2 = pot.apply(params, pad_batch(g2, 16, 200, 1000, 1))
    np.testing.assert_allclose(np.asarray(out.energy[0]), np.asarray(s1.energy[0]), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(out.energy[1]), np.asarray(s2.energy[0]), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(out.forces[: g1.num_nodes]), np.asarray(s1.forces[: g1.num_nodes]), atol=1e-9
    )


def _rotation():
    # A fixed orthogonal matrix (rotation about an arbitrary axis).
    from scipy.spatial.transform import Rotation

    return Rotation.from_rotvec([0.3, -0.5, 0.8]).as_matrix()


def test_rotation_invariance(tio2_rutile):
    """Energy invariant, forces covariant under rigid rotation
    (test_model.py:41-56 checks node features; energy/forces is stronger)."""
    pot = _potential()
    R = _rotation()
    s = tio2_rutile
    s_rot = Structure(
        lattice=s.lattice @ R.T,
        cart_coords=s.cart_coords @ R.T,
        atomic_numbers=s.atomic_numbers,
    )
    g = pack_structures([s], 5.0, 4.0, pad_multiple=32)
    g_rot = pack_structures([s_rot], 5.0, 4.0, pad_multiple=32)
    params = _params(pot, g)
    out = pot.apply(params, g)
    out_rot = pot.apply(params, g_rot)
    np.testing.assert_allclose(
        np.asarray(out.energy[0]), np.asarray(out_rot.energy[0]), rtol=1e-7
    )
    n = len(s)
    np.testing.assert_allclose(
        np.asarray(out.forces[:n]) @ R.T, np.asarray(out_rot.forces[:n]), atol=1e-7
    )


def test_translation_invariance(na_bcc):
    pot = _potential()
    g = pack_structures([na_bcc], 5.0, 4.0, pad_multiple=32)
    shifted = Structure(
        na_bcc.lattice, na_bcc.cart_coords + np.array([0.37, -1.2, 0.81]), na_bcc.atomic_numbers
    )
    g2 = pack_structures([shifted], 5.0, 4.0, pad_multiple=32)
    params = _params(pot, g)
    e1 = pot.apply(params, g).energy[0]
    e2 = pot.apply(params, g2).energy[0]
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), rtol=1e-8)


def test_forces_match_finite_differences(al_fcc):
    """Central finite differences of the energy (test_model.py:90-120)."""
    rng = np.random.default_rng(42)
    perturbed = Structure(
        al_fcc.lattice,
        al_fcc.cart_coords + 0.05 * rng.standard_normal((4, 3)),
        al_fcc.atomic_numbers,
    )
    pot = _potential()
    g = pack_structures([perturbed], 5.0, 4.0, pad_multiple=32)
    params = _params(pot, g)
    out = pot.apply(params, g)

    eps = 1e-4
    for atom in range(2):
        for ax in range(3):
            e = []
            for sign in (+1, -1):
                coords = perturbed.cart_coords.copy()
                coords[atom, ax] += sign * eps
                s2 = Structure(perturbed.lattice, coords, perturbed.atomic_numbers)
                g2 = pack_structures([s2], 5.0, 4.0, pad_multiple=32)
                # re-use same padded sizes so params align
                e.append(float(pot.apply(params, g2).energy[0]))
            fd = -(e[0] - e[1]) / (2 * eps)
            np.testing.assert_allclose(fd, float(out.forces[atom, ax]), atol=1e-6)


def test_stress_matches_strain_finite_differences(al_fcc):
    """Strain-mode stress vs central finite differences of E(A(1+eps), r(1+eps)).

    The reference's stress FD test is skipped as 'too high noise'
    (test_model.py:123-168); the strain-derivative formulation is well-defined
    and matches tightly in f64.
    """
    rng = np.random.default_rng(1)
    s = Structure(
        al_fcc.lattice,
        al_fcc.cart_coords + 0.03 * rng.standard_normal((4, 3)),
        al_fcc.atomic_numbers,
    )
    pot = _potential()
    g0 = pack_structures([s], 5.0, 4.0, pad_multiple=32)
    params = _params(pot, g0)
    out = pot.apply(params, g0)
    vol = s.volume

    delta = 1e-5
    voigt_pairs = [(0, 0), (1, 1), (2, 2), (1, 2), (2, 0), (0, 1)]
    for comp, (a, b) in enumerate(voigt_pairs):
        es = []
        for sign in (+1, -1):
            eps = np.zeros((3, 3))
            eps[a, b] = eps[b, a] = sign * delta  # symmetric strain
            F = np.eye(3) + eps
            s2 = Structure(s.lattice @ F.T, s.cart_coords @ F.T, s.atomic_numbers)
            g2 = pack_structures([s2], 5.0, 4.0, pad_multiple=32)
            es.append(float(pot.apply(params, g2).energy[0]))
        dE_deps = (es[0] - es[1]) / (2 * delta)
        expected = dE_deps / vol
        got = float(out.stress[0, comp])
        # off-diagonal symmetric strain perturbs both (a,b) and (b,a):
        # dE/d(delta) = 2 * sigma_ab * V for a != b
        if a != b:
            expected = expected / 2.0
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-9)


def test_virial_mode_runs(al_fcc):
    """Reference-parity virial stress path stays available and finite."""
    pot = build_model(CONFIG, stress_mode="virial")
    g = pack_structures([al_fcc], 5.0, 4.0, pad_multiple=32)
    params = _params(pot, g)
    out = pot.apply(params, g)
    assert np.isfinite(np.asarray(out.stress)).all()

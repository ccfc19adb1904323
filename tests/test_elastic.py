"""Autodiff second-order observables (simulate/elastic.py): elastic tensor
vs finite differences of the energy, phonon acoustic sum rule, mass scaling.

NOTE the FD cross-check differentiates the ENERGY twice, not the model's
Cauchy stress once: d sigma_i / d eps_j differs from (1/V) d^2E/deps_i deps_j
by residual-stress geometric terms (the random-weight fixture is not at a
stress-free configuration), so only the energy Hessian is the like-for-like
comparison."""

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

from torch_m3gnet_tpu.config import M3GNetConfig
from torch_m3gnet_tpu.data.graph import pack_structures
from torch_m3gnet_tpu.data.structure import Structure
from torch_m3gnet_tpu.models import build_model
from torch_m3gnet_tpu.simulate import (
    bulk_modulus_voigt,
    elastic_tensor,
    force_constants,
    gamma_phonons,
)

CFG = M3GNetConfig(l_max=2, n_max=2, embedding_dim=8, num_blocks=1)


@pytest.fixture(scope="module")
def setup():
    from torch_m3gnet_tpu.data.graph import cast_batch

    rng = np.random.default_rng(0)
    s = Structure.from_frac_coords(
        np.eye(3) * 3.62,
        np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
        + rng.normal(0, 0.01, (4, 3)),
        [29] * 4,
    )
    b = cast_batch(
        pack_structures([s], 5.0, 4.0, pad_multiple=64), np.float64
    )
    pot = build_model(CFG, matmul_precision="highest")
    params = pot.init(jax.random.PRNGKey(0), b)
    return pot, params, b


@pytest.mark.slow
def test_elastic_tensor_matches_energy_fd(setup):
    """C_ij (autodiff hessian) == central second differences of the SAME
    energy function at f64."""
    pot, params, b = setup
    c = elastic_tensor(pot, params, b, gpa=False)  # eV/A^3
    assert c.shape == (6, 6)
    np.testing.assert_allclose(c, c.T, atol=1e-9)

    from torch_m3gnet_tpu.simulate.elastic import voigt_strain_matrix

    pos0 = np.asarray(b.positions, dtype=np.float64)
    lat0 = np.asarray(b.lattice, dtype=np.float64)
    vol = abs(np.linalg.det(lat0[0]))

    def e_at(e6):
        deform = np.eye(3) + np.asarray(voigt_strain_matrix(jax.numpy.asarray(e6)))
        bb = b.replace(positions=pos0 @ deform, lattice=lat0 @ deform)
        return float(np.asarray(pot.apply(params, bb).energy)[0])

    eps = 1e-3
    fd = np.zeros((6, 6))
    for i in range(6):
        for j in range(i, 6):
            ei, ej = np.zeros(6), np.zeros(6)
            ei[i] = eps
            ej[j] = eps
            val = (
                e_at(ei + ej) - e_at(ei - ej) - e_at(ej - ei) + e_at(-ei - ej)
            ) / (4 * eps * eps * vol)
            fd[i, j] = fd[j, i] = val
    np.testing.assert_allclose(c, fd, atol=5e-5)

    k = bulk_modulus_voigt(elastic_tensor(pot, params, b, gpa=True))
    assert np.isfinite(k)


def test_force_constants_acoustic_sum_rule(setup):
    """Uniform translation costs nothing under PBC, so rows of the
    force-constant matrix sum to zero and Gamma has 3 exact zero modes."""
    pot, params, b = setup
    phi = force_constants(pot, params, b)
    n = phi.shape[0]
    rowsum = phi.sum(axis=2)  # (N, 3, 3): sum over the displaced atom j
    assert np.abs(rowsum).max() < 1e-5

    out = gamma_phonons(pot, params, b, masses_amu=[63.55] * n)
    freqs = np.sort(np.abs(out["frequencies_thz"]))
    assert freqs[:3].max() < 5e-2  # three acoustic modes at ~0 THz
    assert out["modes"].shape == (3 * n, n, 3)


def test_gamma_phonons_mass_scaling(setup):
    """omega ~ 1/sqrt(m): doubling every mass scales all frequencies by
    1/sqrt(2) exactly (same force constants)."""
    pot, params, b = setup
    n = int(b.n_node[0])
    f1 = gamma_phonons(pot, params, b, [63.55] * n)["frequencies_thz"]
    f2 = gamma_phonons(pot, params, b, [127.10] * n)["frequencies_thz"]
    np.testing.assert_allclose(f2, f1 / np.sqrt(2.0), atol=1e-8)


@pytest.mark.slow
def test_cubic_crystal_symmetry():
    """On an UNPERTURBED cubic fcc cell the elastic matrix must have cubic
    symmetry: C11=C22=C33, C12=C13=C23, C44=C55=C66, no shear coupling.

    Regression guard for the voigt_strain_matrix asymmetry found in round 4
    (the [2][1] entry applied e4 instead of e4/2 — a spurious rotation that
    broke exactly this invariant while agreeing with its own FD)."""
    s = Structure.from_frac_coords(
        np.eye(3) * 3.62,
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]],
        [29] * 4,
    )
    b = pack_structures([s], 5.0, 4.0, pad_multiple=64)
    from torch_m3gnet_tpu.data.graph import cast_batch

    b = cast_batch(b, np.float64)
    pot = build_model(CFG, matmul_precision="highest")
    params = pot.init(jax.random.PRNGKey(1), b)
    c = elastic_tensor(pot, params, b, gpa=True)
    np.testing.assert_allclose(c[0, 0], c[1, 1], rtol=1e-8)
    np.testing.assert_allclose(c[1, 1], c[2, 2], rtol=1e-8)
    np.testing.assert_allclose(c[0, 1], c[0, 2], rtol=1e-8)
    np.testing.assert_allclose(c[3, 3], c[4, 4], rtol=1e-8)
    np.testing.assert_allclose(c[4, 4], c[5, 5], rtol=1e-8)
    np.testing.assert_allclose(c[:3, 3:], 0.0, atol=1e-6)


def test_elastic_rejects_multi_graph(setup):
    pot, params, _ = setup
    s = Structure.from_frac_coords(np.eye(3) * 4.0, [[0, 0, 0]], [29])
    b2 = pack_structures([s, s], 5.0, 4.0, pad_multiple=64)
    with pytest.raises(ValueError):
        elastic_tensor(pot, params, b2)


def test_eos_birch_murnaghan_roundtrip():
    """The fit recovers known BM parameters from synthetic data exactly."""
    from torch_m3gnet_tpu.simulate import birch_murnaghan, birch_murnaghan_fit

    v = np.linspace(40, 60, 15)
    true = dict(e0=-12.3, v0=48.7, b0=0.9, b0p=4.6)
    e = birch_murnaghan(v, *true.values())
    fit = birch_murnaghan_fit(v, e)
    assert fit["e0_ev"] == pytest.approx(true["e0"], abs=1e-8)
    assert fit["v0_a3"] == pytest.approx(true["v0"], rel=1e-8)
    assert fit["b0_ev_a3"] == pytest.approx(true["b0"], rel=1e-7)
    assert fit["b0_prime"] == pytest.approx(true["b0p"], rel=1e-6)
    assert fit["rms_resid_ev"] < 1e-10


@pytest.mark.slow
def test_eos_curvature_consistent_with_elastic_tensor(setup):
    """Physics cross-check between two independent second-derivative paths:
    the curvature of the model's E(V) curve under isotropic strain equals
    V * sum_{i,j<=3} C_ij from the strain Hessian at the same configuration
    (d^2E/ds^2 for eps = (s,s,s,0,0,0); no equilibrium volume needed — the
    random-weight fixture is unbound, which also pins the fit's
    edge-minimum error path)."""
    from torch_m3gnet_tpu.simulate import (
        birch_murnaghan_fit,
        energy_volume_curve,
    )

    pot, params, b = setup
    s_step = 2e-3
    vols, energies = energy_volume_curve(
        pot, params, b, strains=np.array([-s_step, 0.0, s_step])
    )
    d2e_ds2 = (energies[0] - 2 * energies[1] + energies[2]) / s_step**2

    c = elastic_tensor(pot, params, b, gpa=False)  # eV/A^3
    lat0 = np.asarray(b.lattice, dtype=np.float64)[0]
    vol = abs(np.linalg.det(lat0))
    want = vol * c[:3, :3].sum()
    assert d2e_ds2 == pytest.approx(want, rel=2e-3)

    # unbound E(V): the fit must refuse an edge minimum rather than
    # extrapolate nonsense
    vols_w, e_w = energy_volume_curve(
        pot, params, b, strains=np.linspace(-0.05, 0.05, 9)
    )
    if int(np.argmin(e_w)) in (0, len(e_w) - 1):
        with pytest.raises(ValueError):
            birch_murnaghan_fit(vols_w, e_w)


@pytest.mark.slow
def test_phonon_dispersion_supercell_exactness():
    """Supercell-method invariants on a 1-atom cubic crystal with a 2x2x2
    supercell: (a) k = 0 and every half-integer (supercell-commensurate) k
    reproduce frequencies from the supercell's OWN Gamma spectrum (folding is
    exact at commensurate k); (b) acoustic branches vanish at k -> 0."""
    from torch_m3gnet_tpu.data.graph import cast_batch
    from torch_m3gnet_tpu.simulate import gamma_phonons, phonon_dispersion

    prim = Structure.from_frac_coords(np.eye(3) * 2.5, [[0, 0, 0]], [29])
    cutoff, cutoff3 = 3.6, 2.6  # 1st (2.5) + 2nd (3.54) neighbor shells
    pot = build_model(CFG, matmul_precision="highest")
    sc = prim.supercell((2, 2, 2))
    b_sc = cast_batch(pack_structures([sc], cutoff, cutoff3, pad_multiple=64), np.float64)
    params = pot.init(jax.random.PRNGKey(2), b_sc)

    mass = [63.55]
    sc_gamma = gamma_phonons(pot, params, b_sc, [63.55] * 8)["frequencies_thz"]

    ks = [
        [0.0, 0.0, 0.0],
        [0.5, 0.0, 0.0],
        [0.5, 0.5, 0.0],
        [0.5, 0.5, 0.5],
    ]
    out = phonon_dispersion(
        pot, params, prim, (2, 2, 2), ks, mass, cutoff, cutoff3
    )
    freqs = out["frequencies_thz"]  # (4, 3)
    # every commensurate-k frequency appears in the supercell Gamma spectrum
    for row in freqs:
        for f in row:
            assert np.abs(sc_gamma - f).min() < 5e-3, (f, sc_gamma)
    # acoustic limit: all three k=0 branches are ~0 for a 1-atom cell
    assert np.abs(freqs[0]).max() < 5e-2
    # k -> 0 continuity: tiny k gives tiny frequencies
    small = phonon_dispersion(
        pot, params, prim, (2, 2, 2), [[1e-3, 0, 0]], mass, cutoff, cutoff3
    )["frequencies_thz"]
    assert np.abs(small).max() < np.abs(freqs[1]).max()


def test_elastic_cli_end_to_end(tmp_path, capsys):
    """cli/elastic.py: structure JSON in, elastic matrix + Gamma phonons +
    EOS out; cubic symmetry of the result guards the strain parametrization
    through the CLI path."""
    import json
    import sys

    import yaml

    from torch_m3gnet_tpu.cli import elastic as cli

    struct = {
        "lattice": (np.eye(3) * 3.62).tolist(),
        "frac_coords": [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]],
        "atomic_numbers": [29] * 4,
    }
    sp = tmp_path / "s.json"
    sp.write_text(json.dumps(struct))
    cp = tmp_path / "cfg.yaml"
    cp.write_text(yaml.safe_dump(
        {"l_max": 2, "n_max": 2, "embedding_dim": 8, "num_blocks": 1}
    ))
    argv = sys.argv
    try:
        sys.argv = ["elastic", "--structure", str(sp), "--config", str(cp), "--eos"]
        cli.main()
    finally:
        sys.argv = argv
    out = json.loads(capsys.readouterr().out)
    c = np.array(out["elastic_gpa"])
    assert c.shape == (6, 6)
    np.testing.assert_allclose(c[0, 0], c[1, 1], rtol=1e-5)
    np.testing.assert_allclose(c[3, 3], c[5, 5], rtol=1e-5)
    f = np.sort(np.abs(out["gamma_frequencies_thz"]))
    assert f[:3].max() < 0.05
    assert len(out["eos_volumes_a3"]) == 13 and "birch_murnaghan" in out

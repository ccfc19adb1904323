"""Trajectory observables: RDF normalization, MSD/diffusion, extxyz writer,
and MD trajectory recording plumbing."""

import io

import numpy as np
import pytest

from torch_m3gnet_tpu.data.structure import Structure
from torch_m3gnet_tpu.simulate.observables import (
    diffusion_coefficient,
    mean_squared_displacement,
    radial_distribution,
    write_extxyz,
)


def test_rdf_ideal_gas_is_unity():
    """Uniform random positions give g(r) ~ 1 away from r=0."""
    rng = np.random.default_rng(0)
    lat = np.eye(3) * 12.0
    frames = [rng.uniform(0, 12.0, (400, 3)) for _ in range(4)]
    r, g = radial_distribution(lat, frames, r_max=5.0, n_bins=25)
    sel = r > 1.0  # skip tiny-shell noise
    assert abs(np.mean(g[sel]) - 1.0) < 0.05
    assert np.all(np.abs(g[sel] - 1.0) < 0.35)


def test_rdf_crystal_first_shell():
    """fcc Al: first RDF peak at the 1st-NN distance a/sqrt(2)."""
    a = 4.05
    s = Structure.from_frac_coords(
        np.eye(3) * a,
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]],
        [13] * 4,
    ).supercell((3, 3, 3))
    r, g = radial_distribution(s.lattice, [s.cart_coords], r_max=4.0, n_bins=100)
    assert abs(r[np.argmax(g)] - a / np.sqrt(2)) < 0.1


def test_msd_linear_motion():
    """Constant-velocity frames: MSD(t) = |v|^2 t^2, D fit is positive."""
    v = np.array([0.1, 0.0, 0.0])
    frames = [np.zeros((10, 3)) + v * t for t in range(20)]
    t, msd = mean_squared_displacement(frames)
    np.testing.assert_allclose(msd, 0.01 * t**2, atol=1e-12)
    assert diffusion_coefficient(t, msd) > 0


def test_extxyz_roundtrippable_text():
    s = Structure.from_frac_coords(
        np.eye(3) * 4.0, [[0, 0, 0], [0.5, 0.5, 0.5]], [13, 29]
    )
    buf = io.StringIO()
    frames = [s.cart_coords, s.cart_coords + 0.1]
    vels = [np.zeros((2, 3)), np.ones((2, 3))]
    write_extxyz(buf, s, frames, velocities=vels, energies=[-1.0, -2.0],
                 times=[0.0, 1.0])
    text = buf.getvalue().splitlines()
    assert text[0] == "2"
    assert 'Lattice="4 0 0 0 4 0 0 0 4"' in text[1]
    assert "energy=-1" in text[1] and "time=0" in text[1]
    assert text[2].startswith("Al ")
    assert text[3].startswith("Cu ")
    assert len(text) == 8


def test_md_records_trajectory():
    import jax

    from torch_m3gnet_tpu.config import M3GNetConfig
    from torch_m3gnet_tpu.data.graph import pack_structures
    from torch_m3gnet_tpu.models import build_model
    from torch_m3gnet_tpu.simulate import MDConfig, run_md

    cfg = M3GNetConfig(l_max=2, n_max=2, embedding_dim=8, num_blocks=1)
    pot = build_model(cfg)
    a = 4.05
    s = Structure.from_frac_coords(
        np.eye(3) * a,
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]],
        [13] * 4,
    )
    s2 = Structure.from_frac_coords(np.eye(3) * 3.5, [[0, 0, 0], [0.5, 0.5, 0.5]], [29, 29])
    params = pot.init(
        jax.random.PRNGKey(0), pack_structures([s, s2], 5.0, 4.0, pad_multiple=64)
    )
    res = run_md(
        pot, params, [s, s2], 5.0, 4.0,
        MDConfig(dt=0.5, n_steps=7, rebuild_every=3, record_trajectory=True,
                 ensemble="nve"),
        pad_multiple=64,
    )
    assert res.trajectories is not None and len(res.trajectories) == 2
    assert res.trajectories[0].shape == (7, 4, 3)
    assert res.trajectories[1].shape == (7, 2, 3)
    # last frame == final positions
    np.testing.assert_allclose(
        res.trajectories[0][-1], res.structures[0].cart_coords, rtol=1e-6
    )
    # frames actually move
    assert np.abs(res.trajectories[0][-1] - res.trajectories[0][0]).max() > 0


def test_vacf_and_dos_of_harmonic_motion():
    """An exactly harmonic trajectory has VACF(t) = cos(w t) and a vibrational
    DOS peaked at w/2pi — pins both transforms end to end."""
    from torch_m3gnet_tpu.simulate import (
        phonon_dos_from_vacf,
        velocity_autocorrelation,
    )

    nu_thz = 5.0  # target frequency
    dt_fs = 2.0
    omega = 2 * np.pi * nu_thz * 1e-3  # rad/fs
    t = np.arange(4096) * dt_fs
    rng = np.random.default_rng(0)
    phases = rng.uniform(0, 2 * np.pi, size=(8, 3))
    vel = np.cos(omega * t[:, None, None] + phases[None])  # (T, 8, 3)

    vacf = velocity_autocorrelation(list(vel), max_lag=1024)
    want = np.cos(omega * t[:1024])
    np.testing.assert_allclose(vacf, want, atol=5e-2)
    assert vacf[0] == 1.0

    freqs, dos = phonon_dos_from_vacf(list(vel), dt_fs, max_lag=1024)
    assert abs(freqs[int(np.argmax(dos))] - nu_thz) < 0.3


def test_ensemble_potential_mean_and_disagreement():
    """Committee evaluation: mean/std across K parameter sets from one
    vmapped forward; a K=1 committee has exactly zero disagreement and a
    K=3 committee's mean matches the average of individual applies."""
    import jax

    from torch_m3gnet_tpu.config import M3GNetConfig
    from torch_m3gnet_tpu.data.graph import pack_structures
    from torch_m3gnet_tpu.data.structure import Structure
    from torch_m3gnet_tpu.models import (
        EnsemblePotential,
        build_model,
        stack_params,
    )

    s = Structure.from_frac_coords(
        np.eye(3) * 3.62,
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]],
        [29] * 4,
    )
    b = pack_structures([s], 5.0, 4.0, pad_multiple=64)
    pot = build_model(M3GNetConfig(l_max=2, n_max=2, embedding_dim=8, num_blocks=1))
    members = [pot.init(jax.random.PRNGKey(k), b) for k in range(3)]

    ens = EnsemblePotential(pot)
    mean1, std1 = ens.apply(stack_params(members[:1]), b)
    np.testing.assert_array_equal(np.asarray(std1.energy), 0.0)

    mean3, std3 = ens.apply(stack_params(members), b)
    want_e = np.mean([float(pot.apply(p, b).energy[0]) for p in members])
    assert float(mean3.energy[0]) == pytest.approx(want_e, rel=1e-6)
    want_f = np.mean([np.asarray(pot.apply(p, b).forces) for p in members], axis=0)
    np.testing.assert_allclose(np.asarray(mean3.forces), want_f, atol=1e-6)
    assert float(std3.energy[0]) > 0  # different seeds disagree

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

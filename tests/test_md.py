"""MD integrator tests.

Physics-level checks (no reference counterpart — MD extends beyond the
reference's scope, which only demos relaxation via the external TF package):
- Maxwell-Boltzmann init reproduces the target temperature and zero drift,
- NVE conserves total energy (velocity Verlet, untrained-but-smooth potential),
- NVT Langevin keeps the temperature finite and near target, and is
  deterministic for a fixed seed.
"""

import jax
import numpy as np
import pytest

from torch_m3gnet_tpu.config import M3GNetConfig
from torch_m3gnet_tpu.data.structure import Structure
from torch_m3gnet_tpu.models import build_model
from torch_m3gnet_tpu.simulate.md import (
    ATOMIC_MASSES,
    KB,
    KE_TO_EV,
    MDConfig,
    maxwell_boltzmann_velocities,
    run_md,
)

jax.config.update("jax_enable_x64", True)

CONFIG = M3GNetConfig(l_max=2, n_max=3, embedding_dim=16, num_blocks=2, num_types=95)


@pytest.fixture(scope="module")
def pot_params():
    pot = build_model(CONFIG)
    a = 4.05
    s = Structure.from_frac_coords(
        np.eye(3) * a,
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]],
        [13, 13, 13, 13],
    )
    from torch_m3gnet_tpu.data.graph import pack_structures

    batch = pack_structures([s], 5.0, 4.0, pad_multiple=64, dtype=np.float64)
    params = pot.init(jax.random.PRNGKey(0), batch)
    return pot, params, s


def test_maxwell_boltzmann_temperature():
    rng = np.random.default_rng(0)
    z = np.full(4096, 13)
    masses = ATOMIC_MASSES[z]
    v = maxwell_boltzmann_velocities(masses, 300.0, rng, remove_drift=False)
    ke = 0.5 * np.sum(masses[:, None] * v * v) * KE_TO_EV
    t = 2.0 * ke / (3.0 * len(z) * KB)
    assert abs(t - 300.0) / 300.0 < 0.05

    v = maxwell_boltzmann_velocities(masses, 300.0, rng, remove_drift=True)
    p = (masses[:, None] * v).sum(axis=0)
    np.testing.assert_allclose(p, 0.0, atol=1e-10)


def test_nve_energy_conservation(pot_params):
    pot, params, s = pot_params
    cfg = MDConfig(dt=0.5, n_steps=40, ensemble="nve", temperature=100.0,
                   rebuild_every=10, seed=1)
    res = run_md(pot, params, [s, s], 5.0, 4.0, config=cfg, pad_multiple=64, dtype=np.float64)
    total = res.energies + res.kinetic  # (n_steps, 2)
    drift = np.abs(total - total[0]).max()
    # scale: kinetic energy at 100 K for 4 atoms ~ 0.05 eV
    assert drift < 5e-3, f"NVE energy drift {drift} eV"
    assert np.isfinite(res.temperatures).all()
    assert res.energies.shape == (40, 2)


def test_nvt_langevin_finite_and_deterministic(pot_params):
    pot, params, s = pot_params
    cfg = MDConfig(dt=1.0, n_steps=30, ensemble="nvt", temperature=300.0,
                   friction=0.05, rebuild_every=15, seed=2)
    res1 = run_md(pot, params, [s], 5.0, 4.0, config=cfg, pad_multiple=64, dtype=np.float64)
    res2 = run_md(pot, params, [s], 5.0, 4.0, config=cfg, pad_multiple=64, dtype=np.float64)
    np.testing.assert_allclose(res1.energies, res2.energies)
    np.testing.assert_allclose(
        res1.structures[0].cart_coords, res2.structures[0].cart_coords
    )
    assert np.isfinite(res1.temperatures).all()
    # 4 atoms -> huge fluctuations; just bound the running mean loosely
    assert 0.0 < res1.temperatures[-10:].mean() < 3000.0


def test_md_batched_matches_single(pot_params):
    """Two copies in one batch evolve identically to a single-system run (NVE
    with identical initial velocities)."""
    pot, params, s = pot_params
    rng = np.random.default_rng(7)
    v0 = maxwell_boltzmann_velocities(
        ATOMIC_MASSES[np.asarray(s.atomic_numbers)], 200.0, rng
    )
    cfg = MDConfig(dt=0.5, n_steps=10, ensemble="nve", rebuild_every=5, seed=3)
    res_pair = run_md(pot, params, [s, s], 5.0, 4.0, config=cfg,
                      velocities=[v0, v0], pad_multiple=64, dtype=np.float64)
    res_one = run_md(pot, params, [s], 5.0, 4.0, config=cfg,
                     velocities=[v0], pad_multiple=64, dtype=np.float64)
    np.testing.assert_allclose(
        res_pair.energies[:, 0], res_one.energies[:, 0], rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        res_pair.structures[0].cart_coords,
        res_pair.structures[1].cart_coords,
    )


def test_temperature_dof_com_correction(pot_params):
    """NVE reports T with 3N-3 dof (COM momentum frozen by drift-removed
    init); NVT-Langevin keeps 3N (thermostat breaks momentum conservation)."""
    pot, params, s = pot_params
    for ensemble, dof_of in (("nve", lambda n: 3 * n - 3), ("nvt", lambda n: 3 * n)):
        cfg = MDConfig(dt=0.5, n_steps=4, ensemble=ensemble, temperature=100.0,
                       rebuild_every=4, seed=3)
        res = run_md(pot, params, [s], 5.0, 4.0, config=cfg, pad_multiple=64,
                     dtype=np.float64)
        n = len(res.structures[0])
        want = 2.0 * res.kinetic / (dof_of(n) * KB)
        np.testing.assert_allclose(res.temperatures, want, rtol=1e-6)


def test_npt_barostat_control_law(pot_params):
    """Berendsen barostat feedback: after one step the volume moves in the
    direction of sign(P_int - target) (mu = [1 - k(P0 - P)]^(1/3)), the
    pressure/volume logs have the right shapes, and the mu clamp bounds the
    per-step volume change even under an absurd coupling."""
    pot, params, s = pot_params
    v0 = s.volume

    cfg = MDConfig(
        ensemble="npt", n_steps=1, dt=1.0, temperature=0.0, friction=0.01,
        pressure=0.0, tau_p=200.0, compressibility=1e-2, seed=3,
        rebuild_every=10,
    )
    res = run_md(pot, params, [s], 5.0, 4.0, cfg,
                 velocities=[np.zeros((4, 3))], pad_multiple=64,
                 dtype=np.float64)
    assert res.pressures.shape == (1, 1) and res.volumes.shape == (1, 1)
    p_int = float(res.pressures[0, 0])
    v1 = float(res.volumes[0, 0])
    assert p_int != 0.0
    if p_int > cfg.pressure:
        assert v1 > v0  # too much internal pressure -> expand
    else:
        assert v1 < v0
    # final structure carries the updated cell
    assert abs(res.structures[0].volume - v1) / v1 < 1e-10

    # clamp: mu in [0.98, 1.02] regardless of coupling strength
    cfg2 = MDConfig(
        ensemble="npt", n_steps=1, dt=1.0, temperature=0.0, friction=0.01,
        pressure=0.0, tau_p=1.0, compressibility=1e6, seed=3,
        rebuild_every=10,
    )
    res2 = run_md(pot, params, [s], 5.0, 4.0, cfg2,
                  velocities=[np.zeros((4, 3))], pad_multiple=64,
                  dtype=np.float64)
    ratio = float(res2.volumes[0, 0]) / v0
    assert 0.98 ** 3 - 1e-9 <= ratio <= 1.02 ** 3 + 1e-9


def test_npt_runs_and_tracks_target(pot_params):
    """A short NPT run drives |P_int - target| down (weak-coupling feedback
    on the analytic virial) and keeps volumes finite across neighbor-list
    rebuilds."""
    pot, params, s = pot_params
    cfg = MDConfig(
        ensemble="npt", n_steps=24, dt=1.0, temperature=50.0, friction=0.05,
        pressure=0.0, tau_p=50.0, compressibility=1e-2, seed=4,
        rebuild_every=8,
    )
    res = run_md(pot, params, [s], 5.0, 4.0, cfg, pad_multiple=64,
                 dtype=np.float64)
    assert res.pressures.shape == (24, 1)
    assert np.isfinite(res.volumes).all() and (res.volumes > 0).all()
    p = np.abs(res.pressures[:, 0] - cfg.pressure)
    # feedback reduces the pressure error (compare first vs last quarter)
    assert p[-6:].mean() < p[:6].mean()

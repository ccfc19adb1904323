"""Batched molecular dynamics (NVE / NVT-Langevin) on the learned potential.

Capability extension beyond the reference (which only demonstrates geometry
relaxation via the external TF m3gnet package,
/root/reference/scripts/relax_org.py:13-15): a TPU-native MD driver where the
integrator is one jitted ``lax.fori_loop`` over a padded :class:`GraphBatch`
(all structures advance in lockstep on-device) and the host rebuilds neighbor
lists every ``rebuild_every`` steps under a verlet-skin guarantee, exactly like
:mod:`torch_m3gnet_tpu.simulate.relax`.

Integrators
-----------
- **NVE**: velocity Verlet, one force evaluation per step.
- **NVT**: Langevin dynamics with the BAOAB splitting (Leimkuhler & Matthews,
  J. Chem. Phys. 138, 174102 (2013)) — superconvergent configurational
  sampling, still one force evaluation per step.
- **NPT**: the NVT-Langevin thermostat plus a Berendsen barostat
  (Berendsen et al., J. Chem. Phys. 81, 3684 (1984)): per-graph isotropic
  cell/coordinate rescaling toward the target pressure using the analytic
  virial stress the potential already returns — the cell is dynamic state
  threaded through the jitted loop.

Units: positions in Angstrom, time in fs, energies in eV, masses in amu,
temperature in K. ``FORCE_TO_ACC`` converts eV/A/amu -> A/fs^2.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from torch_m3gnet_tpu.data.graph import (
    GraphBatch,
    batch_graphs,
    graph_from_structure,
    pad_batch,
    round_up,
)
from torch_m3gnet_tpu.data.structure import Structure
from torch_m3gnet_tpu.ops.segment import segment_sum

KB = 8.617333262e-5  # Boltzmann constant, eV/K
FORCE_TO_ACC = 9.648533212e-3  # (eV/A) / amu  ->  A/fs^2
KE_TO_EV = 103.642696562  # amu A^2/fs^2 -> eV
EV_A3_TO_GPA = 160.21766208  # eV/A^3 -> GPa

# Standard atomic weights (amu), index = atomic number Z (0 unused); Z <= 94.
# CODATA/IUPAC conventional values; radioactive elements use the most stable
# isotope's mass number.
ATOMIC_MASSES = np.array(
    [
        0.0, 1.008, 4.0026, 6.94, 9.0122, 10.81, 12.011, 14.007, 15.999,
        18.998, 20.180, 22.990, 24.305, 26.982, 28.085, 30.974, 32.06,
        35.45, 39.948, 39.098, 40.078, 44.956, 47.867, 50.942, 51.996,
        54.938, 55.845, 58.933, 58.693, 63.546, 65.38, 69.723, 72.630,
        74.922, 78.971, 79.904, 83.798, 85.468, 87.62, 88.906, 91.224,
        92.906, 95.95, 97.0, 101.07, 102.91, 106.42, 107.87, 112.41,
        114.82, 118.71, 121.76, 127.60, 126.90, 131.29, 132.91, 137.33,
        138.91, 140.12, 140.91, 144.24, 145.0, 150.36, 151.96, 157.25,
        158.93, 162.50, 164.93, 167.26, 168.93, 173.05, 174.97, 178.49,
        180.95, 183.84, 186.21, 190.23, 192.22, 195.08, 196.97, 200.59,
        204.38, 207.2, 208.98, 209.0, 210.0, 222.0, 223.0, 226.0, 227.0,
        232.04, 231.04, 238.03, 237.0, 244.0,
    ]
)


@dataclass(frozen=True)
class MDConfig:
    """MD run parameters.

    ``ensemble``: "nve" (velocity Verlet), "nvt" (Langevin BAOAB), or
    "npt" (Langevin BAOAB + Berendsen barostat).
    ``friction``: Langevin friction gamma in 1/fs (nvt/npt).
    ``pressure``: barostat target in GPa (npt).
    ``tau_p``: barostat time constant in fs; ``compressibility`` is the
    isothermal compressibility in 1/GPa (the Berendsen mu-factor uses
    compressibility * dt / tau_p; 4.57e-2/GPa is liquid-water-like, solids
    are ~1e-2-1e-3 — the coupling strength, not a material property here).
    """

    dt: float = 1.0  # fs
    n_steps: int = 100
    ensemble: str = "nve"
    temperature: float = 300.0  # K (NVT target / velocity init)
    friction: float = 0.01  # 1/fs
    pressure: float = 0.0  # GPa (npt target)
    tau_p: float = 500.0  # fs
    compressibility: float = 1e-2  # 1/GPa
    rebuild_every: int = 20
    skin: float = 0.3  # A; topology valid while no atom moves > skin/2
    seed: int = 0
    # Record per-step unwrapped positions (MDResult.trajectories) for
    # observables (simulate/observables.py: RDF, MSD, extxyz writer).
    record_trajectory: bool = False

    def __post_init__(self):
        if self.ensemble not in ("nve", "nvt", "npt"):
            raise ValueError(f"unknown ensemble: {self.ensemble}")


@dataclass
class MDResult:
    structures: list  # final Structures (with velocities in properties)
    energies: np.ndarray  # (n_frames, B) potential energy, eV
    kinetic: np.ndarray  # (n_frames, B) kinetic energy, eV
    temperatures: np.ndarray  # (n_frames, B) instantaneous T, K
    times: np.ndarray  # (n_frames,) fs
    # per-structure (n_frames, n_i, 3) unwrapped positions when
    # record_trajectory is set, else None
    trajectories: Optional[list] = None
    # npt only: per-step internal pressure (n_frames, B) GPa and cell
    # volume (n_frames, B) A^3
    pressures: Optional[np.ndarray] = None
    volumes: Optional[np.ndarray] = None


def maxwell_boltzmann_velocities(
    masses: np.ndarray, temperature: float, rng: np.random.Generator,
    remove_drift: bool = True,
) -> np.ndarray:
    """Sample velocities (A/fs) at ``temperature`` for ``masses`` (amu)."""
    sigma = np.sqrt(KB * temperature / KE_TO_EV / masses)[:, None]  # A/fs
    v = rng.standard_normal((len(masses), 3)) * sigma
    if remove_drift and len(masses):
        p = (masses[:, None] * v).sum(axis=0)
        v = v - p / masses.sum()
    return v


def _md_inner(
    potential, params, batch: GraphBatch, vel0, key0, cfg: MDConfig, n_steps: int
):
    """Jitted MD loop over a fixed graph topology.

    Returns (pos, vel, per-step E_pot(B,) and KE(B,) logs, rng_key).
    """
    dtype = jnp.asarray(batch.positions).dtype
    nmask = jnp.asarray(batch.node_mask, dtype=dtype)[:, None]
    gmask = jnp.asarray(batch.graph_mask, dtype=dtype)
    node_graph = jnp.asarray(batch.node_graph)
    nb = batch.num_graphs
    masses = jnp.asarray(ATOMIC_MASSES, dtype=dtype)[
        jnp.asarray(batch.atom_types) + 1
    ]  # atom_types are 0-indexed Z (Z-1)
    masses = jnp.where(jnp.asarray(batch.node_mask), masses, 1.0)[:, None]

    def forces_energy(pos, lat):
        out = potential.apply(
            params, batch.replace(positions=pos, lattice=lat)
        )
        return out.forces, out.energy, out.stress

    dt = cfg.dt
    if cfg.ensemble in ("nvt", "npt"):
        # BAOAB O-step coefficients (exact OU solution)
        c1 = jnp.exp(-cfg.friction * dt)
        # thermal velocity^2 in (A/fs)^2 per unit mass
        kT = KB * cfg.temperature / KE_TO_EV

    def kinetic_of(vel):
        ke_i = 0.5 * jnp.sum(masses * vel * vel, axis=-1) * KE_TO_EV  # (N,) eV
        ke_i = ke_i * nmask[:, 0]
        return segment_sum(ke_i, node_graph, nb)  # (B,)

    def body(i, state):
        pos, vel, lat, f, key, e_log, ke_log, p_log, press_log, vol_log = state
        acc = f / masses * FORCE_TO_ACC  # A/fs^2

        if cfg.ensemble == "nve":
            # velocity Verlet: v(t+dt/2), x(t+dt), F(t+dt), v(t+dt)
            vel = vel + 0.5 * dt * acc
            pos = pos + dt * vel * nmask
            f_new, e_pot, stress = forces_energy(pos, lat)
            acc_new = f_new / masses * FORCE_TO_ACC
            vel = vel + 0.5 * dt * acc_new
        else:
            # BAOAB: B(dt/2) A(dt/2) O(dt) A(dt/2) B(dt/2)
            key, sub = jax.random.split(key)
            vel = vel + 0.5 * dt * acc
            pos = pos + 0.5 * dt * vel * nmask
            noise = jax.random.normal(sub, vel.shape, dtype=vel.dtype)
            sigma = jnp.sqrt(kT / masses * (1.0 - c1 * c1))
            vel = c1 * vel + sigma * noise
            pos = pos + 0.5 * dt * vel * nmask
            f_new, e_pot, stress = forces_energy(pos, lat)
            acc_new = f_new / masses * FORCE_TO_ACC
            vel = vel + 0.5 * dt * acc_new

        if cfg.ensemble == "npt":
            # Berendsen barostat: isotropic per-graph rescale toward the
            # target. P_int = -tr(sigma)/3 (the potential's analytic virial);
            # mu > 1 expands when P_int > target. The mu clamp is the
            # standard stability guard against spikes early in equilibration.
            p_int = (
                -(stress[:, 0] + stress[:, 1] + stress[:, 2]) / 3.0
            ) * EV_A3_TO_GPA  # (B,) GPa
            base = 1.0 - (cfg.compressibility * dt / cfg.tau_p) * (
                cfg.pressure - p_int
            )
            # clamp BEFORE the cube root: a violent pressure spike can push
            # the base negative, and fractional powers of negatives are NaN
            mu = jnp.clip(base, 0.98**3, 1.02**3) ** (1.0 / 3.0)
            mu = jnp.where(jnp.asarray(batch.graph_mask), mu, 1.0)  # pads
            lat = lat * mu[:, None, None]
            pos = pos * mu[node_graph][:, None]
            press_log = press_log.at[i].set(p_int * gmask)
            vol_log = vol_log.at[i].set(
                jnp.abs(jnp.linalg.det(lat)) * gmask
            )

        vel = vel * nmask
        e_log = e_log.at[i].set(e_pot)
        ke_log = ke_log.at[i].set(kinetic_of(vel))
        if cfg.record_trajectory:
            p_log = p_log.at[i].set(pos)
        return pos, vel, lat, f_new, key, e_log, ke_log, p_log, press_log, vol_log

    pos0 = jnp.asarray(batch.positions)
    lat0 = jnp.asarray(batch.lattice, dtype=pos0.dtype)
    vel0 = jnp.asarray(vel0, dtype=pos0.dtype)
    f0, _, _ = forces_energy(pos0, lat0)
    key0 = jnp.asarray(key0, dtype=jnp.uint32)
    # trajectory log only materializes when recording (dummy 0-size otherwise)
    p_shape = (n_steps,) + pos0.shape if cfg.record_trajectory else (0, 0, 3)
    npt_shape = (n_steps, nb) if cfg.ensemble == "npt" else (0, 0)
    state0 = (
        pos0, vel0, lat0, f0, key0,
        jnp.zeros((n_steps, nb), pos0.dtype),
        jnp.zeros((n_steps, nb), pos0.dtype),
        jnp.zeros(p_shape, pos0.dtype),
        jnp.zeros(npt_shape, pos0.dtype),
        jnp.zeros(npt_shape, pos0.dtype),
    )
    (pos, vel, lat, _, key, e_log, ke_log, p_log, press_log, vol_log) = (
        jax.lax.fori_loop(0, n_steps, body, state0)
    )
    return pos, vel, lat, e_log, ke_log, key, p_log, press_log, vol_log


def run_md(
    potential,
    params,
    structures: Sequence[Structure],
    cutoff: float,
    threebody_cutoff: float,
    config: MDConfig = MDConfig(),
    velocities: Optional[Sequence[np.ndarray]] = None,
    pad_multiple: int = 128,
    dtype=np.float32,
) -> MDResult:
    """Run batched MD on ``structures``.

    If ``velocities`` is None they are drawn from Maxwell-Boltzmann at
    ``config.temperature``. The on-device loop advances ``rebuild_every``
    steps per jit call; the host rebuilds the (skin-padded) neighbor list
    between calls, so topology stays valid as atoms diffuse.
    """
    structures = [s.wrap() for s in structures]
    rng = np.random.default_rng(config.seed)
    if velocities is None:
        velocities = [
            maxwell_boltzmann_velocities(
                ATOMIC_MASSES[np.asarray(s.atomic_numbers)], config.temperature, rng
            )
            for s in structures
        ]
    velocities = [np.asarray(v, dtype=np.float64) for v in velocities]

    inner = jax.jit(
        lambda batch, vel, key, n: _md_inner(
            potential, params, batch, vel, key, config, n
        ),
        static_argnums=3,
    )

    positions = [s.cart_coords.copy() for s in structures]
    lattices = [s.lattice.copy() for s in structures]
    n_outer = (config.n_steps + config.rebuild_every - 1) // config.rebuild_every
    e_all, ke_all, traj_all, press_all, vol_all = [], [], [], [], []
    key = np.asarray(jax.random.PRNGKey(config.seed), dtype=np.uint32)
    nsys = len(structures)

    for outer in range(n_outer):
        n_steps = min(config.rebuild_every, config.n_steps - outer * config.rebuild_every)
        graphs = [
            graph_from_structure(
                Structure(lat, p, s.atomic_numbers),
                cutoff + config.skin,
                threebody_cutoff,
                dtype=dtype,
            )
            for s, p, lat in zip(structures, positions, lattices)
        ]
        cat = batch_graphs(graphs)
        batch = pad_batch(
            cat,
            round_up(cat.num_nodes + 1, pad_multiple),
            round_up(cat.num_edges + 1, pad_multiple),
            round_up(cat.num_triplets + 1, pad_multiple),
            cat.num_graphs,
        )
        vel_cat = np.concatenate(velocities, axis=0)
        vel_pad = np.zeros((batch.num_nodes, 3))
        vel_pad[: len(vel_cat)] = vel_cat

        pos, vel, lat, e_log, ke_log, key, p_log, press_log, vol_log = inner(
            batch, vel_pad, key, n_steps
        )
        pos, vel, lat = np.asarray(pos), np.asarray(vel), np.asarray(lat)
        key = np.asarray(key, dtype=np.uint32)
        e_all.append(np.asarray(e_log)[:, :nsys])
        ke_all.append(np.asarray(ke_log)[:, :nsys])
        if config.record_trajectory:
            traj_all.append(np.asarray(p_log))
        if config.ensemble == "npt":
            press_all.append(np.asarray(press_log)[:, :nsys])
            vol_all.append(np.asarray(vol_log)[:, :nsys])

        off = 0
        for i, g in enumerate(graphs):
            n = g.num_nodes
            positions[i] = pos[off : off + n]
            velocities[i] = vel[off : off + n]
            lattices[i] = lat[i]
            off += n

    energies = np.concatenate(e_all, axis=0)
    kinetic = np.concatenate(ke_all, axis=0)
    # NVE conserves total momentum (drift-removed init), so 3 COM dof are
    # frozen: dof = 3N - 3. Langevin kicks break momentum conservation -> 3N.
    com_dof = 3.0 if config.ensemble == "nve" else 0.0
    dof = np.array([max(3.0 * len(s) - com_dof, 3.0) for s in structures])
    temperatures = 2.0 * kinetic / (dof * KB)
    final = [
        Structure(
            lat, p, s.atomic_numbers,
            {**s.properties, "velocities": v},
        )
        for s, p, v, lat in zip(structures, positions, velocities, lattices)
    ]
    trajectories = None
    if config.record_trajectory:
        # chunks may have different node padding; slice each structure's block
        trajectories = []
        offs = np.cumsum([0] + [len(s) for s in structures])
        for i in range(nsys):
            parts = [t[:, offs[i] : offs[i + 1]] for t in traj_all]
            trajectories.append(np.concatenate(parts, axis=0))

    return MDResult(
        structures=final,
        energies=energies,
        kinetic=kinetic,
        temperatures=temperatures,
        times=np.arange(1, config.n_steps + 1) * config.dt,
        trajectories=trajectories,
        pressures=(
            np.concatenate(press_all, axis=0) if press_all else None
        ),
        volumes=np.concatenate(vol_all, axis=0) if vol_all else None,
    )

"""Batched structure relaxation (FIRE / L-BFGS) driven by the learned potential.

The reference only demonstrates relaxation through the *original TF m3gnet*
package (/root/reference/scripts/relax_org.py:13-15, "relax by LBFGS");
here both optimizers are implemented natively and batched:

- **FIRE** (Bitzek et al., PRL 97, 170201 (2006)): one jitted
  ``lax.fori_loop`` over the padded batch; the host only rebuilds neighbor
  lists every ``rebuild_every`` steps (verlet-skin style).
- **L-BFGS** (two-loop recursion, fixed history, trust-radius step — ASE's
  line-search-free variant): same jitted-loop structure, history buffers are
  part of the carried state so the whole optimizer lives on device.

With ``relax_cell=True`` the cell enters the *jitted* state as a per-graph
strain DOF (ASE UnitCellFilter scheme: generalized coordinates = atomic
positions + cell_factor x strain, generalized force on the strain =
-V sigma / cell_factor), so cell and positions relax jointly inside the
device loop — no host-side descent.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from torch_m3gnet_tpu.data.graph import GraphBatch, batch_graphs, graph_from_structure, pad_batch, round_up
from torch_m3gnet_tpu.data.structure import Structure
from torch_m3gnet_tpu.ops.segment import segment_sum, take


@dataclass(frozen=True)
class FireConfig:
    dt_start: float = 0.1
    dt_max: float = 1.0
    n_min: int = 5
    f_inc: float = 1.1
    f_dec: float = 0.5
    alpha_start: float = 0.1
    f_alpha: float = 0.99
    max_steps: int = 200
    rebuild_every: int = 20
    fmax: float = 0.05  # eV/A convergence threshold (max force component norm)
    relax_cell: bool = False
    smax: float = 5e-3  # eV/A^3 stress convergence threshold (relax_cell)
    max_strain_step: float = 0.02  # per-step strain cap (topology skin safety)


@dataclass(frozen=True)
class LbfgsConfig:
    history: int = 8
    alpha: float = 70.0  # initial inverse Hessian H0 = 1/alpha (ASE default)
    maxstep: float = 0.2  # A trust radius per step (max atom displacement)
    max_steps: int = 200
    rebuild_every: int = 20
    fmax: float = 0.05
    relax_cell: bool = False
    smax: float = 5e-3
    max_strain_step: float = 0.02


def _forces_stress(potential, params, batch, pos, lat):
    out = potential.apply(params, batch.replace(positions=pos, lattice=lat))
    return out.forces, out.energy, out.stress


def _stress_force(stress_v, lat, n_node, dtype):
    """Generalized force on the strain DOF: -V sigma / cell_factor (B, 3, 3).

    cell_factor = n_atoms per graph (ASE UnitCellFilter default) puts the
    strain coordinates on the same scale as atomic displacements.
    """
    sv = stress_v
    sig = jnp.stack(
        [
            jnp.stack([sv[:, 0], sv[:, 5], sv[:, 4]], axis=-1),
            jnp.stack([sv[:, 5], sv[:, 1], sv[:, 3]], axis=-1),
            jnp.stack([sv[:, 4], sv[:, 3], sv[:, 2]], axis=-1),
        ],
        axis=-2,
    )  # (B, 3, 3)
    vol = jnp.abs(
        jnp.sum(lat[:, 0] * jnp.cross(lat[:, 1], lat[:, 2]), axis=-1)
    )  # (B,)
    cf = jnp.maximum(n_node.astype(dtype), 1.0)
    return -sig * (vol / cf)[:, None, None]


def _apply_strain(pos, lat, deps, node_graph, max_strain):
    """Apply per-graph strain increments to lattice and positions jointly.

    deps (B, 3, 3) is capped at ``max_strain`` per component so the fixed
    graph topology stays valid between rebuilds. Returns the strain actually
    applied alongside the deformed positions/lattice.
    """
    cap = jnp.max(jnp.abs(deps), axis=(-1, -2), keepdims=True)
    deps = deps * jnp.minimum(1.0, max_strain / jnp.maximum(cap, 1e-20))
    D = jnp.eye(3, dtype=pos.dtype) + deps  # (B, 3, 3)
    lat = jnp.einsum("bij,bkj->bik", lat, D)  # rows a_i <- a_i @ D.T
    Dn = take(D, node_graph)  # (N, 3, 3)
    pos = jnp.einsum("nj,nkj->nk", pos, Dn)
    return pos, lat, deps


def _fire_inner(potential, params, batch: GraphBatch, cfg: FireConfig, n_steps: int):
    """Jitted FIRE loop over a fixed graph topology (distance-safe skin).

    With cfg.relax_cell, the per-graph strain is a first-class FIRE DOF:
    velocities and forces on it follow the same mixing/timestep rules as the
    atomic ones, and each step's strain increment co-deforms positions and
    lattice inside the loop.
    """
    nmask = jnp.asarray(batch.node_mask, dtype=jnp.asarray(batch.positions).dtype)[:, None]
    node_graph = jnp.asarray(batch.node_graph)
    n_node = jnp.asarray(batch.n_node)
    nb = batch.num_graphs

    def body(_, state):
        pos, lat, vel, vel_c, dt, alpha, n_pos = state
        f, _, sv = _forces_stress(potential, params, batch, pos, lat)
        g_c = _stress_force(sv, lat, n_node, pos.dtype) if cfg.relax_cell else jnp.zeros_like(vel_c)

        # per-graph power / norms over the combined (atomic + strain) DOF
        p = segment_sum(jnp.sum(f * vel, axis=-1), node_graph, nb)
        f2 = segment_sum(jnp.sum(f * f, axis=-1), node_graph, nb)
        v2 = segment_sum(jnp.sum(vel * vel, axis=-1), node_graph, nb)
        if cfg.relax_cell:
            p = p + jnp.sum(g_c * vel_c, axis=(-1, -2))
            f2 = f2 + jnp.sum(g_c * g_c, axis=(-1, -2))
            v2 = v2 + jnp.sum(vel_c * vel_c, axis=(-1, -2))
        fnorm = jnp.sqrt(f2 + 1e-20)
        vnorm = jnp.sqrt(v2 + 1e-20)
        uphill = p <= 0.0  # (B,)

        a_g = alpha[node_graph][:, None]
        mix = (1.0 - a_g) * vel + a_g * (vnorm / fnorm)[node_graph][:, None] * f
        vel = jnp.where(uphill[node_graph][:, None], 0.0, mix)
        if cfg.relax_cell:
            a_b = alpha[:, None, None]
            mix_c = (1.0 - a_b) * vel_c + a_b * (vnorm / fnorm)[:, None, None] * g_c
            vel_c = jnp.where(uphill[:, None, None], 0.0, mix_c)

        n_pos = jnp.where(uphill, 0, n_pos + 1)
        grow = (~uphill) & (n_pos > cfg.n_min)
        dt = jnp.where(grow, jnp.minimum(dt * cfg.f_inc, cfg.dt_max), dt)
        alpha = jnp.where(grow, alpha * cfg.f_alpha, alpha)
        dt = jnp.where(uphill, dt * cfg.f_dec, dt)
        alpha = jnp.where(uphill, cfg.alpha_start, alpha)

        vel = vel + dt[node_graph][:, None] * f
        pos = pos + dt[node_graph][:, None] * vel * nmask
        if cfg.relax_cell:
            vel_c = vel_c + dt[:, None, None] * g_c
            cf = jnp.maximum(n_node.astype(pos.dtype), 1.0)
            deps = dt[:, None, None] * vel_c / cf[:, None, None]
            pos, lat, _ = _apply_strain(pos, lat, deps, node_graph, cfg.max_strain_step)
        return pos, lat, vel, vel_c, dt, alpha, n_pos

    pos0 = jnp.asarray(batch.positions)
    lat0 = jnp.asarray(batch.lattice, dtype=pos0.dtype)
    state0 = (
        pos0,
        lat0,
        jnp.zeros_like(pos0),
        jnp.zeros((nb, 3, 3), pos0.dtype),
        jnp.full((nb,), cfg.dt_start, pos0.dtype),
        jnp.full((nb,), cfg.alpha_start, pos0.dtype),
        jnp.zeros((nb,), dtype=jnp.int32),
    )
    pos, lat, *_ = jax.lax.fori_loop(0, n_steps, body, state0)
    f, e, sv = _forces_stress(potential, params, batch, pos, lat)
    return pos, lat, f, e, sv


def _lbfgs_inner(potential, params, batch: GraphBatch, cfg: LbfgsConfig, n_steps: int):
    """Jitted batched L-BFGS (two-loop recursion, trust-radius step).

    Per-graph curvature pairs (s_k, y_k) live in fixed (m, ...) ring buffers
    carried through ``lax.fori_loop``; all inner products are per-graph
    segment sums so each crystal in the batch runs its own independent
    optimizer. No line search — like ASE's LBFGS, the quasi-Newton step is
    clipped to ``maxstep`` per atom (and ``max_strain_step`` per strain
    component with relax_cell).
    """
    nmask = jnp.asarray(batch.node_mask, dtype=jnp.asarray(batch.positions).dtype)[:, None]
    node_graph = jnp.asarray(batch.node_graph)
    n_node = jnp.asarray(batch.n_node)
    nb = batch.num_graphs
    m = cfg.history

    def gdot(a_pos, a_c, b_pos, b_c):
        """Per-graph inner product over combined DOF -> (B,)."""
        d = segment_sum(jnp.sum(a_pos * b_pos, axis=-1), node_graph, nb)
        if cfg.relax_cell:
            d = d + jnp.sum(a_c * b_c, axis=(-1, -2))
        return d

    def grad_of(pos, lat):
        """Generalized gradient (negative forces) of the combined DOF."""
        f, _, sv = _forces_stress(potential, params, batch, pos, lat)
        f = f * nmask
        g_c = (
            _stress_force(sv, lat, n_node, pos.dtype)
            if cfg.relax_cell
            else jnp.zeros((nb, 3, 3), pos.dtype)
        )
        return -f, -g_c

    def body(k, state):
        pos, lat, g, g_c, s_hist, y_hist, sc_hist, yc_hist, rho, count = state

        # two-loop recursion (most recent pair first)
        def loop1(carry, idx):
            q, q_c, alphas = carry
            valid = (idx >= 0) & (idx < count)
            i = jnp.maximum(idx, 0) % m
            a = rho[:, i] * gdot(s_hist[i], sc_hist[i], q, q_c)
            a = jnp.where(valid, a, 0.0)
            q = q - a[node_graph][:, None] * y_hist[i]
            q_c = q_c - a[:, None, None] * yc_hist[i]
            return (q, q_c, alphas.at[i].set(a)), None

        # iterate j = count-1 .. count-m (absolute ids, most recent first)
        js = count - 1 - jnp.arange(m)  # (m,)
        (q, q_c, alphas), _ = jax.lax.scan(
            loop1, (g, g_c, jnp.zeros((m, nb), g.dtype)), js
        )

        # H0 scaling: gamma = s.y / y.y of the most recent pair (per graph)
        last = jnp.maximum(count - 1, 0) % m  # scalar ring slot
        sy = gdot(s_hist[last], sc_hist[last], y_hist[last], yc_hist[last])
        yy = gdot(y_hist[last], yc_hist[last], y_hist[last], yc_hist[last])
        gamma = jnp.where(count > 0, sy / jnp.maximum(yy, 1e-20), 1.0 / cfg.alpha)
        z = gamma[node_graph][:, None] * q
        z_c = gamma[:, None, None] * q_c

        def loop2(carry, idx):
            z, z_c = carry
            valid = (idx >= 0) & (idx < count)
            i = jnp.maximum(idx, 0) % m
            b = rho[:, i] * gdot(y_hist[i], yc_hist[i], z, z_c)
            corr = jnp.where(valid, alphas[i] - b, 0.0)
            z = z + corr[node_graph][:, None] * s_hist[i]
            z_c = z_c + corr[:, None, None] * sc_hist[i]
            return (z, z_c), None

        (z, z_c), _ = jax.lax.scan(loop2, (z, z_c), js[::-1])

        # step = -z, trust-radius clipped per graph
        step = -z * nmask
        longest = jnp.sqrt(
            jax.ops.segment_max(
                jnp.sum(step * step, axis=-1), node_graph, num_segments=nb
            )
            + 1e-20
        )
        scale = jnp.minimum(1.0, cfg.maxstep / jnp.maximum(longest, 1e-20))
        step = scale[node_graph][:, None] * step
        pos_new = pos + step

        lat_new = lat
        deps = jnp.zeros_like(z_c)
        if cfg.relax_cell:
            cf = jnp.maximum(n_node.astype(pos.dtype), 1.0)[:, None, None]
            deps = -scale[:, None, None] * z_c / cf
            pos_new, lat_new, deps = _apply_strain(
                pos_new, lat_new, deps, node_graph, cfg.max_strain_step
            )

        g_new, gc_new = grad_of(pos_new, lat_new)
        s_k = pos_new - pos
        y_k = g_new - g
        # curvature pair uses the strain ACTUALLY applied (post-cap)
        sc_k = deps * jnp.maximum(n_node.astype(pos.dtype), 1.0)[:, None, None]
        yc_k = gc_new - g_c
        sy_k = gdot(s_k, sc_k, y_k, yc_k)
        slot = count % m
        rho_k = jnp.where(sy_k > 1e-12, 1.0 / jnp.maximum(sy_k, 1e-20), 0.0)

        s_hist = s_hist.at[slot].set(s_k)
        y_hist = y_hist.at[slot].set(y_k)
        sc_hist = sc_hist.at[slot].set(sc_k)
        yc_hist = yc_hist.at[slot].set(yc_k)
        rho = rho.at[:, slot].set(rho_k)
        return (
            pos_new, lat_new, g_new, gc_new,
            s_hist, y_hist, sc_hist, yc_hist, rho, count + 1,
        )

    pos0 = jnp.asarray(batch.positions)
    lat0 = jnp.asarray(batch.lattice, dtype=pos0.dtype)
    g0, gc0 = grad_of(pos0, lat0)
    state0 = (
        pos0, lat0, g0, gc0,
        jnp.zeros((m,) + pos0.shape, pos0.dtype),
        jnp.zeros((m,) + pos0.shape, pos0.dtype),
        jnp.zeros((m, nb, 3, 3), pos0.dtype),
        jnp.zeros((m, nb, 3, 3), pos0.dtype),
        jnp.zeros((nb, m), pos0.dtype),
        jnp.zeros((), jnp.int32),
    )
    pos, lat, *_ = jax.lax.fori_loop(0, n_steps, body, state0)
    f, e, sv = _forces_stress(potential, params, batch, pos, lat)
    return pos, lat, f, e, sv


def relax_structures(
    potential,
    params,
    structures: Sequence[Structure],
    cutoff: float,
    threebody_cutoff: float,
    config: FireConfig | LbfgsConfig = FireConfig(),
    skin: float = 0.3,
    pad_multiple: int = 128,
) -> tuple[list[Structure], np.ndarray, np.ndarray]:
    """Relax a batch of structures (FIRE or L-BFGS by config type).

    The neighbor list is built with ``cutoff + skin`` so the jitted inner loop
    stays valid while atoms move up to ``skin/2``; the host rebuilds topology
    every ``rebuild_every`` steps. With ``relax_cell=True`` the per-graph cell
    strain is optimized *inside* the jitted loop (see module docstring) and
    convergence additionally requires ``|sigma|_max <= smax``.

    Returns:
        (relaxed structures, final energies (B,), final max-force (B,)).
    """
    structures = [s.wrap() for s in structures]
    inner_fn = _lbfgs_inner if isinstance(config, LbfgsConfig) else _fire_inner
    inner = jax.jit(
        lambda batch, n: inner_fn(potential, params, batch, config, n),
        static_argnums=1,
    )

    n_outer = (config.max_steps + config.rebuild_every - 1) // config.rebuild_every
    positions = [s.cart_coords.copy() for s in structures]
    lattices = [s.lattice.copy() for s in structures]
    energies = np.zeros(len(structures))
    fmax = np.full(len(structures), np.inf)
    smax_seen = np.full(len(structures), np.inf)

    for _ in range(n_outer):
        graphs = [
            graph_from_structure(
                Structure(lat, p, s.atomic_numbers), cutoff + skin, threebody_cutoff
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
        pos, lat, forces, energy, stress = inner(batch, config.rebuild_every)
        pos = np.asarray(pos)
        lat = np.asarray(lat)
        forces = np.asarray(forces)
        energies = np.asarray(energy)[: len(structures)]
        smax_seen = np.abs(np.asarray(stress))[: len(structures)].max(axis=1)

        off = 0
        for i, g in enumerate(graphs):
            n = g.num_nodes
            positions[i] = pos[off : off + n]
            fmax[i] = float(np.linalg.norm(forces[off : off + n], axis=1).max())
            if config.relax_cell:
                lattices[i] = lat[i]
            off += n

        converged = (fmax <= config.fmax).all()
        if config.relax_cell:
            converged = converged and (smax_seen <= config.smax).all()
        if converged:
            break

    relaxed = [
        Structure(lat, p, s.atomic_numbers, dict(s.properties))
        for s, p, lat in zip(structures, positions, lattices)
    ]
    return relaxed, energies, fmax

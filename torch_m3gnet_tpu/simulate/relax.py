"""Batched structure relaxation (FIRE) driven by the learned potential.

The reference only demonstrates relaxation through the *original TF m3gnet*
package (/root/reference/scripts/relax_org.py:13-15); here it is implemented
natively: batched FIRE geometry optimization (optionally with stress-driven
cell degrees of freedom) where the inner loop is one jitted ``lax.fori_loop``
over the padded batch and the host only rebuilds neighbor lists every
``rebuild_every`` steps (verlet-skin style).

FIRE: Bitzek et al., PRL 97, 170201 (2006).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from torch_m3gnet_tpu.data.graph import GraphBatch, batch_graphs, graph_from_structure, pad_batch, round_up
from torch_m3gnet_tpu.data.structure import Structure
from torch_m3gnet_tpu.ops.segment import segment_sum


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
    cell_gain: float = 1.0  # strain per unit stress (eV/A^3)^-1, capped at 2%/step


def _fire_inner(potential, params, batch: GraphBatch, cfg: FireConfig, n_steps: int):
    """Jitted FIRE loop over a fixed graph topology (distance-safe skin)."""
    nmask = jnp.asarray(batch.node_mask, dtype=jnp.float32)[:, None]
    node_graph = jnp.asarray(batch.node_graph)
    nb = batch.num_graphs

    def forces_of(pos):
        out = potential.apply(params, batch.replace(positions=pos))
        return out.forces, out.energy

    def body(_, state):
        pos, vel, dt, alpha, n_pos = state
        f, _ = forces_of(pos)
        # per-graph power P = sum F . v
        p = segment_sum(jnp.sum(f * vel, axis=-1), node_graph, nb)  # (B,)
        fnorm = jnp.sqrt(
            segment_sum(jnp.sum(f * f, axis=-1), node_graph, nb) + 1e-20
        )
        vnorm = jnp.sqrt(
            segment_sum(jnp.sum(vel * vel, axis=-1), node_graph, nb) + 1e-20
        )
        uphill = p <= 0.0  # (B,)

        a_g = alpha[node_graph][:, None]
        mix = (1.0 - a_g) * vel + a_g * (vnorm / fnorm)[node_graph][:, None] * f
        vel = jnp.where(uphill[node_graph][:, None], 0.0, mix)

        n_pos = jnp.where(uphill, 0, n_pos + 1)
        grow = (~uphill) & (n_pos > cfg.n_min)
        dt = jnp.where(grow, jnp.minimum(dt * cfg.f_inc, cfg.dt_max), dt)
        alpha = jnp.where(grow, alpha * cfg.f_alpha, alpha)
        dt = jnp.where(uphill, dt * cfg.f_dec, dt)
        alpha = jnp.where(uphill, cfg.alpha_start, alpha)

        vel = vel + dt[node_graph][:, None] * f
        pos = pos + dt[node_graph][:, None] * vel * nmask
        return pos, vel, dt, alpha, n_pos

    pos0 = jnp.asarray(batch.positions)
    state0 = (
        pos0,
        jnp.zeros_like(pos0),
        jnp.full((nb,), cfg.dt_start),
        jnp.full((nb,), cfg.alpha_start),
        jnp.zeros((nb,), dtype=jnp.int32),
    )
    pos, *_ = jax.lax.fori_loop(0, n_steps, body, state0)
    f, e = forces_of(pos)
    return pos, f, e


def relax_structures(
    potential,
    params,
    structures: Sequence[Structure],
    cutoff: float,
    threebody_cutoff: float,
    config: FireConfig = FireConfig(),
    skin: float = 0.3,
    pad_multiple: int = 128,
) -> tuple[list[Structure], np.ndarray, np.ndarray]:
    """Relax a batch of structures with FIRE.

    The neighbor list is built with ``cutoff + skin`` so the jitted inner loop
    stays valid while atoms move up to ``skin/2``; the host rebuilds topology
    every ``rebuild_every`` steps.

    Returns:
        (relaxed structures, final energies (B,), final max-force (B,)).
    """
    structures = [s.wrap() for s in structures]
    inner = jax.jit(
        lambda batch, n: _fire_inner(potential, params, batch, config, n),
        static_argnums=1,
    )

    n_outer = (config.max_steps + config.rebuild_every - 1) // config.rebuild_every
    positions = [s.cart_coords.copy() for s in structures]
    lattices = [s.lattice.copy() for s in structures]
    energies = np.zeros(len(structures))
    fmax = np.full(len(structures), np.inf)

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
        pos, forces, energy = inner(batch, config.rebuild_every)
        pos = np.asarray(pos)
        forces = np.asarray(forces)
        energies = np.asarray(energy)[: len(structures)]

        off = 0
        for i, g in enumerate(graphs):
            n = g.num_nodes
            positions[i] = pos[off : off + n]
            fmax[i] = float(np.linalg.norm(forces[off : off + n], axis=1).max())
            off += n

        if config.relax_cell:
            # Stress-driven cell step between topology rebuilds: a damped
            # steepest-descent deformation A <- A (1 - gamma * sigma_hat),
            # applied to lattice and cartesian coordinates jointly
            # (dE = V sigma : d_eps, so -sigma is the descent direction).
            out_full = potential.apply(params, batch)
            stress_v = np.asarray(out_full.stress)[: len(structures)]
            for i in range(len(structures)):
                sv = stress_v[i]
                sig = np.array(
                    [
                        [sv[0], sv[5], sv[4]],
                        [sv[5], sv[1], sv[3]],
                        [sv[4], sv[3], sv[2]],
                    ]
                )
                smax = np.abs(sig).max()
                if smax < 1e-10:
                    continue
                # proportional step (strain = gain * stress), capped at 2%
                # per-component strain so topology stays valid between rebuilds
                eps = -config.cell_gain * sig
                scale = min(1.0, 0.02 / np.abs(eps).max())
                F = np.eye(3) + scale * eps
                lattices[i] = lattices[i] @ F.T
                positions[i] = positions[i] @ F.T

        if (fmax <= config.fmax).all() and not config.relax_cell:
            break

    relaxed = [
        Structure(lat, p, s.atomic_numbers, dict(s.properties))
        for s, p, lat in zip(structures, positions, lattices)
    ]
    return relaxed, energies, fmax

"""Graph parallelism: one huge periodic graph partitioned across devices.

The GNN counterpart of context/sequence parallelism (SURVEY.md §5.7); no
reference counterpart exists (the reference requires the whole graph to fit on
one device, /root/reference/src/torch_m3gnet/model/litmodule.py:269,291).

Design:

- **Nodes**: contiguous index blocks, one per device; features computed and
  updated locally.
- **Edges**: owned by the device of their *source* node (the partitioner gets
  this for free from the neighbor list's source-sorted invariant). Edge source
  ids are stored shard-local, destination ids stay global.
- **Triplets**: both edges of a triplet share a source node, so triplets are
  fully local to their edges' shard; triplet->edge aggregation never
  communicates.
- **Halo exchange**: the only remote reads are destination-node features —
  one `all_gather` over the ``gp`` axis per use (positions once, then the
  node-gate and node-features once per block), riding ICI. Under jax.grad the
  all_gather transposes to a psum_scatter, so force training communicates the
  same volume backward.
- **Reductions**: per-shard energies/virials psum once at the end; forces
  combine a local source-side scatter with one psum'd destination-side
  scatter.

The per-shard compute path is the *same* M3GNet module (with
``halo_axis="gp"`` — see models/m3gnet.py), not a fork of it.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from torch_m3gnet_tpu.data.graph import GraphBatch, round_up
from torch_m3gnet_tpu.models.m3gnet import M3GNet, PotentialOutput, _voigt
from torch_m3gnet_tpu.ops.segment import segment_sum, take


def partition_graph(
    graph: GraphBatch,
    n_shards: int,
    pad_multiple: int = 128,
    nodes_per_shard: Optional[int] = None,
    edges_per_shard: Optional[int] = None,
    triplets_per_shard: Optional[int] = None,
) -> GraphBatch:
    """Split one single (unpadded) graph into stacked per-device shards.

    Returns a GraphBatch whose arrays carry a leading ``n_shards`` axis.
    Shard s owns global nodes [s*nps, (s+1)*nps); ``edge_src`` is shard-local,
    ``edge_dst`` global; triplet edge ids are shard-local slots. Targets
    (energy/forces) are carried into shards when present (forces split by node
    block; the replicated total energy is pmean'd in the gp loss).

    ``nodes/edges/triplets_per_shard`` override the auto-derived shard sizes so
    several graphs can be partitioned to identical shapes (see
    :func:`stack_partitions`).
    """
    if graph.num_graphs_real != 1 or graph.num_graphs != 1:
        raise ValueError("partition_graph expects a single unpadded graph")
    n = graph.num_nodes
    nps = nodes_per_shard or round_up(-(-n // n_shards), 8)
    if nps * n_shards < n:
        raise ValueError("nodes_per_shard too small for this graph")

    src = np.asarray(graph.edge_src)
    if (np.diff(src) < 0).any():
        raise ValueError("edges must be sorted by source node")
    owner = src // nps
    edge_counts = np.bincount(owner, minlength=n_shards)
    eps = edges_per_shard or round_up(int(edge_counts.max()) + 1, pad_multiple)
    if eps <= int(edge_counts.max()):
        raise ValueError("edges_per_shard too small for this partition")

    t1 = np.asarray(graph.triplet_e1)
    towner = owner[t1]
    trip_counts = np.bincount(towner, minlength=n_shards)
    tps = triplets_per_shard or round_up(int(trip_counts.max()) + 1, pad_multiple)
    if tps <= int(trip_counts.max()):
        raise ValueError("triplets_per_shard too small for this partition")

    e_start = np.cumsum(edge_counts) - edge_counts
    t_start = np.cumsum(trip_counts) - trip_counts

    def by_node(arr, fill=0):
        out = np.full((n_shards, nps) + arr.shape[1:], fill, dtype=arr.dtype)
        for s in range(n_shards):
            lo, hi = s * nps, min((s + 1) * nps, n)
            if hi > lo:
                out[s, : hi - lo] = arr[lo:hi]
        return out

    def by_edge(arr, fill=0):
        out = np.full((n_shards, eps) + arr.shape[1:], fill, dtype=arr.dtype)
        for s in range(n_shards):
            out[s, : edge_counts[s]] = arr[e_start[s] : e_start[s] + edge_counts[s]]
        return out

    def by_trip(arr, fill=0):
        out = np.full((n_shards, tps) + arr.shape[1:], fill, dtype=arr.dtype)
        for s in range(n_shards):
            out[s, : trip_counts[s]] = arr[t_start[s] : t_start[s] + trip_counts[s]]
        return out

    # shard-local source ids (padded slots -> last local node, keeping the
    # sorted-ids invariant for the Pallas segment kernels)
    esrc_local = by_edge(src)
    for s in range(n_shards):
        esrc_local[s, : edge_counts[s]] -= s * nps
        esrc_local[s, edge_counts[s] :] = nps - 1

    # triplet edge ids -> shard-local edge slots
    def trip_local(te, pad_value=0):
        te = np.asarray(te)
        out = np.full((n_shards, tps), pad_value, dtype=te.dtype)
        for s in range(n_shards):
            cnt = trip_counts[s]
            out[s, :cnt] = te[t_start[s] : t_start[s] + cnt] - e_start[s]
        return out

    return GraphBatch(
        positions=by_node(np.asarray(graph.positions)),
        atom_types=by_node(np.asarray(graph.atom_types)),
        node_graph=np.zeros((n_shards, nps), dtype=np.int32),
        node_mask=by_node(np.asarray(graph.node_mask)),
        edge_src=esrc_local.astype(np.int32),
        edge_dst=by_edge(np.asarray(graph.edge_dst)).astype(np.int32),
        edge_cell_shift=by_edge(np.asarray(graph.edge_cell_shift)),
        edge_mask=by_edge(np.asarray(graph.edge_mask)),
        triplet_e1=trip_local(graph.triplet_e1, pad_value=eps - 1).astype(np.int32),
        triplet_e2=trip_local(graph.triplet_e2).astype(np.int32),
        triplet_mask=by_trip(np.asarray(graph.triplet_mask)),
        triplet_node_k=by_trip(
            np.asarray(graph.edge_dst)[np.asarray(graph.triplet_e2)]
        ).astype(np.int32),
        lattice=np.broadcast_to(np.asarray(graph.lattice), (n_shards, 1, 3, 3)).copy(),
        graph_mask=np.ones((n_shards, 1), dtype=bool),
        n_node=np.full((n_shards, 1), n, dtype=np.int32),
        energy=None
        if graph.energy is None
        else np.broadcast_to(np.asarray(graph.energy), (n_shards, 1)).copy(),
        forces=None if graph.forces is None else by_node(np.asarray(graph.forces)),
        num_graphs_real=1,
    )


def stack_partitions(
    graphs: Sequence[GraphBatch],
    n_shards: int,
    pad_multiple: int = 128,
) -> GraphBatch:
    """Partition several single graphs to COMMON shard shapes and stack them.

    Returns a GraphBatch whose arrays carry TWO leading axes
    ``(len(graphs), n_shards, ...)`` — the dp x gp layout consumed by
    :meth:`GraphParallelPotential.make_loss` with ``dp_axis`` set. Shard sizes
    are the max over all graphs so every (dp, gp) cell has identical static
    shapes and the whole 2-D batch jits once.
    """
    if not graphs:
        raise ValueError("stack_partitions needs at least one graph")
    nps = max(round_up(-(-g.num_nodes // n_shards), 8) for g in graphs)
    max_e, max_t = 0, 0
    for g in graphs:
        owner = np.asarray(g.edge_src) // nps
        ec = np.bincount(owner, minlength=n_shards)
        tc = np.bincount(owner[np.asarray(g.triplet_e1)], minlength=n_shards)
        max_e = max(max_e, int(ec.max()))
        max_t = max(max_t, int(tc.max()))
    eps = round_up(max_e + 1, pad_multiple)
    tps = round_up(max_t + 1, pad_multiple)
    parts = [
        partition_graph(
            g, n_shards, pad_multiple,
            nodes_per_shard=nps, edges_per_shard=eps, triplets_per_shard=tps,
        )
        for g in graphs
    ]
    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *parts)


class GraphParallelPotential:
    """E/F/S for one partitioned graph over a ``gp`` mesh axis."""

    def __init__(self, model: M3GNet, mesh: Mesh, axis: str = "gp"):
        self.model = model.clone(halo_axis=axis)
        self.mesh = mesh
        self.axis = axis
        self._japply = jax.jit(self._make())

    def _make(self):
        model = self.model
        axis = self.axis

        @functools.partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(P(), P(axis)),
            out_specs=(P(), P(axis), P(axis)),
        )
        def run(params, stacked):
            shard = jax.tree.map(lambda x: x[0], stacked)
            nps = shard.num_nodes
            my = jax.lax.axis_index(axis)
            node_off = my * nps

            pos_local = jnp.asarray(shard.positions)
            lattice = jnp.asarray(shard.lattice)  # (1, 3, 3)
            pos_all = jax.lax.all_gather(pos_local, axis, axis=0, tiled=True)

            shift = jnp.einsum(
                "ep,pq->eq",
                jnp.asarray(shard.edge_cell_shift, pos_local.dtype),
                lattice[0],
            )
            r_vec = (
                take(pos_all, jnp.asarray(shard.edge_dst))
                + shift
                - take(pos_local, jnp.asarray(shard.edge_src))
            )

            def energy_of(rv):
                total, atomic = model.apply(params, shard, rv)
                return jnp.sum(total), (total, atomic)

            g_r, (total, atomic) = jax.grad(energy_of, has_aux=True)(r_vec)

            emask = jnp.asarray(shard.edge_mask, g_r.dtype)[:, None]
            g_r = g_r * emask

            # forces: + at source (local), - at destination (global, psum'd)
            f_src = segment_sum(
                g_r, jnp.asarray(shard.edge_src), num_segments=nps,
                indices_are_sorted=True,
            )
            f_dst_all = segment_sum(
                g_r, jnp.asarray(shard.edge_dst), num_segments=pos_all.shape[0]
            )
            f_dst_all = jax.lax.psum(f_dst_all, axis)
            f_dst_local = jax.lax.dynamic_slice_in_dim(f_dst_all, node_off, nps)
            forces = (f_src - f_dst_local) * jnp.asarray(
                shard.node_mask, g_r.dtype
            )[:, None]

            energy = jax.lax.psum(total, axis)  # (1,)

            outer = jnp.sum(r_vec[:, :, None] * g_r[:, None, :], axis=0)
            sV = jax.lax.psum(outer, axis)
            sV = 0.5 * (sV + sV.T)
            vol = jnp.abs(
                jnp.sum(lattice[0, 0] * jnp.cross(lattice[0, 1], lattice[0, 2]))
            )
            # stress is numerically replicated (psum'd virial / same cell),
            # but the lattice arrives sharded so the replication checker can't
            # prove it — emit per-shard and take row 0 on the host.
            stress = _voigt(sV[None]) / vol  # (1, 6)

            return energy, forces[None], stress[None]

        return run

    # ------------------------------------------------------------------
    # Training: loss whose gradient flows through the halo exchange.
    def make_loss(self, config, dp_axis: Optional[str] = None):
        """Return loss_fn(params, sharded) -> scalar (E/atom + force MSE).

        The per-shard force error and energy are psum'd inside shard_map, so
        jax.grad(loss_fn) backpropagates through the collectives
        (all_gather -> psum_scatter) — a full graph-parallel training step.

        With ``dp_axis`` set (2-D dp x gp mesh), ``sharded`` carries TWO
        leading axes (n_dp, n_gp, ...): each dp row holds a *different*
        partitioned graph, and the returned loss is the dp-mean of the
        per-graph gp losses — data parallelism composed over graph
        parallelism on one mesh (see :func:`stack_partitions`).
        """
        model = self.model
        axis = self.axis
        batch_spec = P(dp_axis, axis) if dp_axis else P(axis)

        @functools.partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(P(), batch_spec),
            out_specs=P(),
        )
        def loss_fn(params, stacked):
            strip = (lambda x: x[0, 0]) if dp_axis else (lambda x: x[0])
            shard = jax.tree.map(strip, stacked)
            nps = shard.num_nodes
            pos_local = jnp.asarray(shard.positions)
            lattice = jnp.asarray(shard.lattice)
            pos_all = jax.lax.all_gather(pos_local, axis, axis=0, tiled=True)
            shift = jnp.einsum(
                "ep,pq->eq",
                jnp.asarray(shard.edge_cell_shift, pos_local.dtype),
                lattice[0],
            )
            r_vec = (
                take(pos_all, jnp.asarray(shard.edge_dst))
                + shift
                - take(pos_local, jnp.asarray(shard.edge_src))
            )

            def energy_of(rv):
                total, _ = model.apply(params, shard, rv)
                return jnp.sum(total)

            e_local, g_r = jax.value_and_grad(energy_of)(r_vec)
            emask = jnp.asarray(shard.edge_mask, g_r.dtype)[:, None]
            g_r = g_r * emask

            f_src = segment_sum(
                g_r, jnp.asarray(shard.edge_src), num_segments=nps,
                indices_are_sorted=True,
            )
            f_dst_all = segment_sum(
                g_r, jnp.asarray(shard.edge_dst), num_segments=pos_all.shape[0]
            )
            f_dst_all = jax.lax.psum(f_dst_all, axis)
            my = jax.lax.axis_index(axis)
            f_dst_local = jax.lax.dynamic_slice_in_dim(f_dst_all, my * nps, nps)
            nmask = jnp.asarray(shard.node_mask, g_r.dtype)[:, None]
            forces = (f_src - f_dst_local) * nmask

            energy = jax.lax.psum(e_local, axis)  # scalar, replicated
            n_atoms = jax.lax.psum(jnp.asarray(shard.node_mask, g_r.dtype).sum(), axis)

            # the target total is broadcast-identical across shards, but that
            # can't be statically inferred from a sharded input — pmean makes
            # the replication explicit for the checker
            e_target = jax.lax.pmean(jnp.sum(jnp.asarray(shard.energy)), axis)
            e_loss = ((energy - e_target) / jnp.maximum(n_atoms, 1.0)) ** 2

            f_err = jnp.sum((forces - jnp.asarray(shard.forces)) ** 2 * nmask)
            f_loss = jax.lax.psum(f_err, axis) / jnp.maximum(3.0 * n_atoms, 1.0)

            loss = config.energy_weight * e_loss + config.force_weight * f_loss
            if dp_axis is not None:
                loss = jax.lax.pmean(loss, dp_axis)
            return loss

        return lambda params, sharded: loss_fn(params, sharded)

    def apply(self, params, sharded: GraphBatch) -> PotentialOutput:
        energy, forces, stress = self._japply(params, sharded)
        return self._unpack(energy, forces, stress, sharded)

    def init(self, rng, sharded: GraphBatch):
        """Init params from one shard's static shapes. Uses a halo-free clone
        (the halo all_gather needs a bound mesh axis; the param structure is
        identical) — params are replicated across the mesh."""
        strip = sharded
        while np.asarray(strip.positions).ndim > 2:
            strip = jax.tree.map(lambda x: x[0], strip)
        r_vec = jnp.zeros((strip.num_edges, 3), np.asarray(strip.positions).dtype)
        return self.model.clone(halo_axis=None).init(rng, strip, r_vec)

    def _unpack(self, energy, forces, stress, sharded):
        stress = jnp.reshape(stress, (-1, 6))[:1]
        forces = jnp.reshape(forces, (-1, 3))
        n = int(np.asarray(sharded.n_node)[0, 0])
        return PotentialOutput(
            energy=jnp.asarray(energy),
            forces=forces,
            stress=jnp.asarray(stress),
            energy_per_atom=jnp.asarray(energy) / n,
            atomic_energy=jnp.zeros(forces.shape[0], forces.dtype),
        )


class GraphParallelTrainer:
    """Optimizer-integrated training over partitioned graphs (gp or dp x gp).

    The graph-parallel counterpart of :class:`torch_m3gnet_tpu.parallel.dp.
    DataParallel`: same Adam(eps=1e-7) + injected-lr chain as the single-chip
    Trainer (reference schedule: litmodule.py:168-183), with the loss/grads
    flowing through the halo collectives (see :meth:`GraphParallelPotential.
    make_loss`). Batches are single huge graphs partitioned by
    :func:`partition_graph` (one graph per step) or stacks from
    :func:`stack_partitions` (``dp_axis`` set: one graph per dp row per step).
    Checkpointing is orbax, same layout as the single-chip Trainer.
    """

    def __init__(self, potential, config, mesh: Mesh, axis: str = "gp",
                 dp_axis: Optional[str] = None):
        import optax

        from torch_m3gnet_tpu.train.loop import TrainState, Trainer

        self.potential = GraphParallelPotential(potential.model, mesh, axis)
        self.config = config
        self.dp_axis = dp_axis
        self.opt = optax.chain(
            optax.scale_by_adam(eps=1e-7),
            optax.inject_hyperparams(optax.scale)(step_size=-config.learning_rate),
        )
        loss_fn = self.potential.make_loss(config, dp_axis=dp_axis)
        opt = self.opt
        set_lr = Trainer._set_lr
        self._TrainState = TrainState

        def step(params, opt_state, sharded, lr):
            loss, grads = jax.value_and_grad(lambda p: loss_fn(p, sharded))(params)
            opt_state = set_lr(opt_state, lr)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._step = jax.jit(step)
        self._loss = jax.jit(loss_fn)

    def init_state(self, rng, sharded: GraphBatch):
        params = self.potential.init(rng, sharded)
        return self._TrainState(params=params, opt_state=self.opt.init(params))

    def train_step(self, state, sharded: GraphBatch, lr):
        params, opt_state, loss = self._step(
            state.params, state.opt_state, sharded, jnp.asarray(lr)
        )
        return (
            self._TrainState(
                params=params, opt_state=opt_state,
                epoch=state.epoch, step=state.step + 1,
            ),
            {"loss": loss},
        )

    def eval_loss(self, params, sharded: GraphBatch):
        return self._loss(params, sharded)

    def save_checkpoint(self, ckpt_dir: str, state, tag: str = "last"):
        from torch_m3gnet_tpu.train.loop import Trainer

        Trainer.save_checkpoint(self, ckpt_dir, state, tag)

    def restore_checkpoint(self, ckpt_dir: str, example_state, tag: str = "last"):
        from torch_m3gnet_tpu.train.loop import Trainer

        return Trainer.restore_checkpoint(self, ckpt_dir, example_state, tag)

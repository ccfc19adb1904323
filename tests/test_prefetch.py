"""Device-prefetch pipeline (train/prefetch.py)."""

import numpy as np
import pytest

import jax

from torch_m3gnet_tpu.train.prefetch import device_prefetch


def test_order_and_values_preserved():
    batches = [{"x": np.full((4,), i, np.float32)} for i in range(7)]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 7
    for i, b in enumerate(out):
        assert isinstance(b["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])


def test_zero_size_passthrough():
    batches = [np.arange(3), np.arange(3) + 1]
    out = list(device_prefetch(iter(batches), size=0))
    assert out[0] is batches[0]  # untouched host arrays


def test_producer_exception_propagates():
    def gen():
        yield {"x": np.zeros(2, np.float32)}
        raise RuntimeError("boom")

    it = device_prefetch(gen(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_graphbatch_pytree_roundtrip(al_fcc):
    from torch_m3gnet_tpu.data.graph import pack_structures

    b = pack_structures([al_fcc], 3.0, 3.0, pad_multiple=32)
    (out,) = list(device_prefetch(iter([b]), size=1))
    # static (non-pytree) metadata preserved; leaves now device arrays
    assert out.num_graphs_real == b.num_graphs_real
    assert out.halo_offsets == b.halo_offsets
    np.testing.assert_array_equal(np.asarray(out.edge_src), b.edge_src)


def test_trainer_uses_prefetch_and_matches_no_prefetch(al_fcc, tmp_path):
    """Training with the prefetch pipeline is numerically identical to the
    plain loop (same batches, same step count, same final loss)."""
    from torch_m3gnet_tpu.config import M3GNetConfig
    from torch_m3gnet_tpu.data.graph import pack_structures
    from torch_m3gnet_tpu.data.structure import Structure
    from torch_m3gnet_tpu.models import build_model
    from torch_m3gnet_tpu.train.loop import Trainer

    rng = np.random.default_rng(0)
    cfg = M3GNetConfig(
        l_max=2, n_max=2, embedding_dim=8, num_blocks=1,
        cutoff=3.0, threebody_cutoff=2.5, root=str(tmp_path),
    )

    def batch(seed):
        s = Structure(
            al_fcc.lattice,
            al_fcc.cart_coords + 0.02 * np.random.default_rng(seed).standard_normal((4, 3)),
            al_fcc.atomic_numbers,
        )
        b = pack_structures([s], cfg.cutoff, cfg.threebody_cutoff, pad_multiple=32)
        return b.replace(
            energy=np.array([-13.0], np.float32),
            forces=np.zeros((b.num_nodes, 3), np.float32),
            stress=np.zeros((1, 6), np.float32),
        )

    batches = [batch(i) for i in range(4)]
    pot = build_model(cfg)

    losses = {}
    for pf in (0, 2):
        trainer = Trainer(pot, cfg, log_dir=str(tmp_path / f"l{pf}"), prefetch=pf)
        state = trainer.init_state(jax.random.PRNGKey(0), batches[0])
        state = trainer.fit(state, lambda e: iter(batches), max_epochs=2)
        m = trainer.evaluate(state.params, iter(batches))
        losses[pf] = m["loss"]
        assert state.epoch == 2
    assert losses[0] == pytest.approx(losses[2], rel=1e-6)

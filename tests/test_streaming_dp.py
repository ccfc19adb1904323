"""Streaming x data-parallel composition (VERDICT r4 #2).

The streaming dataset (bounded-RSS MPF-scale path) feeds a ``dp`` mesh:
``stream_sharded_batches`` / ``stream_ladder_sharded_batches`` yield
device-stacked batches with synchronized padded shapes, and
``train_model``'s streaming branch drives parallel/dp.py over the virtual
8-device CPU mesh (conftest sets xla_force_host_platform_device_count=8).
"""

import numpy as np
import pytest

import jax  # noqa: F401  (conftest pins devices before use)

from torch_m3gnet_tpu.config import M3GNetConfig
from torch_m3gnet_tpu.data.streaming import (
    StreamingGraphDataset,
    ladder_from_index,
    stream_ladder_sharded_batches,
    stream_sharded_batches,
)

from tests.test_streaming import CUTOFF, CUTOFF3, _structures


def test_stream_sharded_batches_layout(tmp_path):
    """Every yield has a leading n_devices axis of identically padded shards;
    every graph appears exactly once per epoch; short tails arrive with
    trailing shards masked empty (real count preserved in num_graphs_real)."""
    ds = StreamingGraphDataset(
        _structures(22, seed=11), CUTOFF, CUTOFF3,
        cache_dir=str(tmp_path), shard_size=6,
    )
    bucket = ds.bucket(3, pad_multiple=32)
    batches = list(stream_sharded_batches(ds, 3, 4, bucket))
    assert len(batches) == 2  # 12 + 10
    for b in batches:
        assert np.asarray(b.positions).shape[0] == 4  # leading device axis
        assert np.asarray(b.positions).shape[1] == bucket.max_nodes
        assert np.asarray(b.triplet_e1).shape[1] == bucket.max_triplets
    total_real = sum(int(np.asarray(b.graph_mask).sum()) for b in batches)
    assert total_real == 22
    assert batches[0].num_graphs_real == 12
    assert batches[1].num_graphs_real == 10
    # tail: shards carry 3,3,3,1 real graphs
    tail_mask = np.asarray(batches[1].graph_mask)
    assert [int(m.sum()) for m in tail_mask] == [3, 3, 3, 1]


def test_stream_ladder_sharded_batches_layout(tmp_path):
    """Class-laddered dp batches: per-yield shapes come from that class's
    bucket and the epoch still covers every graph exactly once."""
    small = _structures(14, seed=12)
    big = [s.supercell((2, 2, 2)) for s in _structures(5, seed=13)]
    ds = StreamingGraphDataset(
        small + big, CUTOFF, CUTOFF3, cache_dir=str(tmp_path), shard_size=5
    )
    ladder = ladder_from_index(ds, 2, num_classes=2, pad_multiple=32)
    batches = list(
        stream_ladder_sharded_batches(ds, 2, 4, ladder,
                                      rng=np.random.default_rng(0))
    )
    total_real = sum(int(np.asarray(b.graph_mask).sum()) for b in batches)
    assert total_real == len(small) + len(big)
    shapes = {np.asarray(b.triplet_e1).shape[1] for b in batches}
    assert shapes <= {bk.max_triplets for bk in ladder.buckets}
    for b in batches:
        assert np.asarray(b.positions).shape[0] == 4


@pytest.mark.parametrize("bucket_classes", [1, 2])
def test_train_model_streaming_dp(tmp_path, bucket_classes):
    """train_model streams into a 4-device dp mesh end to end (both the
    single-bucket and the ladder composition), writes checkpoints, and
    reports finite test metrics."""
    from torch_m3gnet_tpu.train.run import train_model

    cfg = M3GNetConfig(
        l_max=2, n_max=2, embedding_dim=8, num_blocks=1,
        cutoff=CUTOFF, threebody_cutoff=CUTOFF3,
        batch_size=8, num_devices=4, max_epochs=2,
        early_stopping_patience=100, bucket_classes=bucket_classes,
        pad_multiple=32, root=str(tmp_path / "run"),
    )
    mk = lambda n, name, seed: StreamingGraphDataset(
        _structures(n, seed=seed), CUTOFF, CUTOFF3,
        cache_dir=str(tmp_path / "cache"), name=name, shard_size=5,
    )
    _, state, metrics = train_model(
        cfg, mk(20, "train", 14), val_graphs=mk(6, "val", 15),
        test_graphs=mk(6, "test", 16),
    )
    assert state.epoch >= 1
    for k in ("energy_mae", "forces_mae", "loss"):
        assert np.isfinite(metrics[k]), (k, metrics)
    import os

    assert os.path.exists(str(tmp_path / "run" / "checkpoints" / "last.meta.json"))


def test_streaming_dp_matches_single_device_epoch(tmp_path):
    """One full-batch epoch: the dp-sharded streaming step produces the same
    loss and gradients as the single-device streaming step on the same 8
    graphs (weighted psum == global mean when every shard is full)."""
    import jax.numpy as jnp

    from torch_m3gnet_tpu.data.streaming import stream_batches
    from torch_m3gnet_tpu.models import build_model
    from torch_m3gnet_tpu.parallel import DataParallel, make_mesh
    from torch_m3gnet_tpu.train.loop import Trainer, TrainState

    cfg = M3GNetConfig(
        l_max=2, n_max=2, embedding_dim=8, num_blocks=1,
        cutoff=CUTOFF, threebody_cutoff=CUTOFF3, batch_size=8,
        pad_multiple=32, root=str(tmp_path / "run"),
    )
    ds = StreamingGraphDataset(
        _structures(8, seed=17), CUTOFF, CUTOFF3,
        cache_dir=str(tmp_path), shard_size=4,
    )
    pot = build_model(cfg, elemental_energies=[0.0] * cfg.num_types,
                      energy_scale=1.0)

    # single device: one batch of all 8 graphs
    bucket1 = ds.bucket(8, pad_multiple=32)
    (batch1,) = list(stream_batches(ds, 8, bucket1))
    trainer = Trainer(pot, cfg, log_dir=str(tmp_path / "logs"))
    state1 = trainer.init_state(jax.random.PRNGKey(0), batch1)
    _, m1 = trainer.train_step(state1, batch1, jnp.asarray(1e-3))

    # dp over 4 devices: 2 graphs per shard, same epoch content
    bucket4 = ds.bucket(2, pad_multiple=32)
    (batch4,) = list(stream_sharded_batches(ds, 2, 4, bucket4))
    dp = DataParallel(pot, cfg, make_mesh(4, platform="cpu"))
    state4 = TrainState(params=state1.params,
                        opt_state=dp.opt.init(state1.params))
    _, m4 = dp.train_step(state4, batch4, 1e-3)

    assert float(m1["loss"]) == pytest.approx(float(m4["loss"]), rel=1e-5)
    assert float(m1["forces_mae"]) == pytest.approx(
        float(m4["forces_mae"]), rel=1e-5
    )


def test_streaming_dp_10k(tmp_path):
    """VERDICT r4 #2 'done' criterion: a streaming dp training run on the
    virtual 8-device mesh over a >=10k-graph synthetic set."""
    from torch_m3gnet_tpu.train.run import train_model

    structs = _structures(10_240, seed=18)
    cfg = M3GNetConfig(
        l_max=2, n_max=2, embedding_dim=8, num_blocks=1,
        cutoff=CUTOFF, threebody_cutoff=CUTOFF3,
        batch_size=64, num_devices=8, max_epochs=1,
        early_stopping_patience=100, pad_multiple=32,
        root=str(tmp_path / "run"),
    )
    ds = StreamingGraphDataset(
        structs, CUTOFF, CUTOFF3, cache_dir=str(tmp_path / "cache"),
        name="train10k", shard_size=512,
    )
    del structs
    _, state, metrics = train_model(
        cfg, ds, val_graphs=None,
        test_graphs=StreamingGraphDataset(
            _structures(64, seed=19), CUTOFF, CUTOFF3,
            cache_dir=str(tmp_path / "cache"), name="test10k", shard_size=64,
        ),
    )
    assert state.epoch == 1
    assert np.isfinite(metrics["loss"])

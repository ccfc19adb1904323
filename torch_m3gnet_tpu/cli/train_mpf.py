"""Train on MPF.2021.2.8 (universal-potential pretraining).

Parity with /root/reference/scripts/load_mpf_dataset.py:109-152: block pickles
``block_0_cif.p`` / ``block_1_cif.p``, split by material id before flattening
trajectories, stress kbar -> eV/A^3 Voigt.

Usage:
    python -m torch_m3gnet_tpu.cli.train_mpf \
        --path MPF.2021.2.8 --config configs/mpf.yaml --root runs/mpf
"""

from __future__ import annotations

import argparse
import json
import os

from torch_m3gnet_tpu.config import M3GNetConfig
from torch_m3gnet_tpu.data.dataset import GraphDataset
from torch_m3gnet_tpu.data.io import load_mpf_pickles
from torch_m3gnet_tpu.data.streaming import StreamingGraphDataset
from torch_m3gnet_tpu.train.run import train_model


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--path", required=True, help="dir containing block_{0,1}_cif.p")
    ap.add_argument("--config", default=None)
    ap.add_argument("--root", default="runs/mpf")
    ap.add_argument("--max-epochs", type=int, default=None)
    ap.add_argument("--num-workers", type=int, default=1)
    ap.add_argument("--resume", default=None)
    ap.add_argument(
        "--in-memory", action="store_true",
        help="use the in-memory GraphDataset instead of the sharded "
        "streaming cache (default streams: MPF is ~187k structures and the "
        "single-pickle cache would not survive that — data/streaming.py)",
    )
    ap.add_argument("--shard-size", type=int, default=256)
    ap.add_argument(
        "--mesh", type=int, default=None, metavar="N",
        help="data-parallel devices: shard the stream over an N-device dp "
        "mesh (stream_sharded_batches; overrides config.num_devices)",
    )
    args = ap.parse_args()

    config = (
        M3GNetConfig.from_yaml(args.config, root=args.root)
        if args.config
        else M3GNetConfig(root=args.root)
    )
    if args.mesh is not None:
        config = config.replace(num_devices=args.mesh)
    os.makedirs(config.root, exist_ok=True)

    blocks = [
        os.path.join(args.path, "block_0_cif.p"),
        os.path.join(args.path, "block_1_cif.p"),
    ]
    blocks = [b for b in blocks if os.path.exists(b)]
    train_s, val_s, test_s = load_mpf_pickles(
        blocks, config.val_ratio, config.test_ratio, config.seed
    )

    cache = os.path.join(config.root, "cache")
    if args.in_memory:
        mk = lambda structs, name: GraphDataset(
            structs, config.cutoff, config.threebody_cutoff,
            cache_dir=cache, num_workers=args.num_workers, name=name,
        ).graphs
    else:
        mk = lambda structs, name: StreamingGraphDataset(
            structs, config.cutoff, config.threebody_cutoff,
            cache_dir=cache, name=name, shard_size=args.shard_size,
            num_workers=args.num_workers, num_types=config.num_types,
        )
    trainer, state, metrics = train_model(
        config,
        mk(train_s, "train"),
        val_graphs=mk(val_s, "val"),
        test_graphs=mk(test_s, "test"),
        resume_checkpoint=args.resume,
        max_epochs=args.max_epochs,
    )
    print(json.dumps({"test": metrics}, indent=2))


if __name__ == "__main__":
    main()

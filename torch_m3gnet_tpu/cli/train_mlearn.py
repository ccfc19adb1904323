"""Train on an mlearn element dataset (Cu/Ge/Li/Mo/Ni/Si).

Parity with /root/reference/scripts/load_mlearn_dataset.py:75-134 (click CLI +
ruamel.yaml there; argparse + pyyaml here). The mlearn repo layout is
``<path>/<element>/training.json`` and ``test.json``; as in the reference, the
(train, test) pair is used as (train, val) for fitting.

Usage:
    python -m torch_m3gnet_tpu.cli.train_mlearn \
        --path mlearn/data/Cu --config configs/mlearn_Cu.yaml --root runs/cu
"""

from __future__ import annotations

import argparse
import json
import os

from torch_m3gnet_tpu.config import M3GNetConfig
from torch_m3gnet_tpu.data.dataset import GraphDataset
from torch_m3gnet_tpu.data.io import load_mlearn_json
from torch_m3gnet_tpu.train.run import train_model


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--path", required=True, help="mlearn element dir with training.json/test.json")
    ap.add_argument("--config", default=None, help="YAML config overriding defaults")
    ap.add_argument("--root", default="runs/mlearn", help="output root (logs/checkpoints/cache)")
    ap.add_argument("--max-epochs", type=int, default=None)
    ap.add_argument("--num-workers", type=int, default=1)
    ap.add_argument("--resume", default=None, help="checkpoint dir to resume from")
    ap.add_argument(
        "--mesh", type=int, default=None, metavar="N",
        help="data-parallel devices (overrides config.num_devices)",
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

    train_structs = load_mlearn_json(os.path.join(args.path, "training.json"))
    test_structs = load_mlearn_json(os.path.join(args.path, "test.json"))

    cache = os.path.join(config.root, "cache")
    train_ds = GraphDataset(
        train_structs, config.cutoff, config.threebody_cutoff,
        cache_dir=cache, num_workers=args.num_workers, name="train",
    )
    test_ds = GraphDataset(
        test_structs, config.cutoff, config.threebody_cutoff,
        cache_dir=cache, num_workers=args.num_workers, name="test",
    )

    trainer, state, metrics = train_model(
        config,
        train_ds.graphs,
        val_graphs=test_ds.graphs,  # reference uses (train, test) as train/val
        test_graphs=test_ds.graphs,
        resume_checkpoint=args.resume,
        max_epochs=args.max_epochs,
    )
    print(json.dumps({"test": metrics}, indent=2))


if __name__ == "__main__":
    main()

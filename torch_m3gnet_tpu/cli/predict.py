"""Potential evaluation CLI: structures in, energy/forces/stress out.

The reference exposes prediction only through ``LitM3GNet.predict_step``
(/root/reference/src/torch_m3gnet/model/litmodule.py:190-192, re-enabling
grad for forces); this CLI is the batch-evaluation entry point: it packs the
structures into padded buckets, evaluates the full E/F/S head jit-compiled
on the accelerator, and prints JSON.

Input: a JSON list of structures, each {"lattice": 3x3, "frac_coords": Nx3,
"atomic_numbers": [...]} (or "cart_coords"), or an mlearn-format JSON file
(--format mlearn). Output: per-structure {energy, energy_per_atom, forces,
stress} JSON on stdout.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def load_structures(path: str, fmt: str):
    from torch_m3gnet_tpu.data.io import load_mlearn_json
    from torch_m3gnet_tpu.data.structure import Structure

    if fmt == "mlearn":
        return load_mlearn_json(path)
    with open(path) as f:
        raw = json.load(f)
    structures = []
    for d in raw:
        if "cart_coords" in d:
            structures.append(
                Structure(d["lattice"], d["cart_coords"], d["atomic_numbers"])
            )
        else:
            structures.append(
                Structure.from_frac_coords(
                    d["lattice"], d["frac_coords"], d["atomic_numbers"]
                )
            )
    return structures


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--structures", required=True, help="input file (see docstring)")
    ap.add_argument("--format", choices=("json", "mlearn"), default="json")
    ap.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    ap.add_argument("--config", default=None, help="YAML config for the model")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0, help="init seed when no checkpoint")
    args = ap.parse_args()

    import jax

    from torch_m3gnet_tpu.config import M3GNetConfig
    from torch_m3gnet_tpu.data.graph import pack_structures
    from torch_m3gnet_tpu.models import build_model

    config = M3GNetConfig.from_yaml(args.config) if args.config else M3GNetConfig()
    structures = load_structures(args.structures, args.format)

    if args.checkpoint:
        # Rebuild with the constants baked in at training time (sidecar
        # written by Trainer.save_checkpoint): the fitted elemental energies
        # and energy scale are model attributes, not checkpoint variables.
        from torch_m3gnet_tpu.train.loop import Trainer

        meta = Trainer.load_meta(args.checkpoint)
        if meta is None:
            raise SystemExit(
                f"no sidecar {args.checkpoint}.meta.json — re-save the "
                "checkpoint with this version's Trainer, or pass a model "
                "built with explicit elemental energies"
            )
        pot = build_model(
            config,
            elemental_energies=meta["elemental_energies"],
            energy_scale=meta["energy_scale"],
        )
        params = Trainer.load_params(args.checkpoint)
    else:
        pot = build_model(config)
        example = pack_structures(
            structures[: args.batch_size], config.cutoff, config.threebody_cutoff
        )
        params = pot.init(jax.random.PRNGKey(args.seed), example)

    results = []
    for lo in range(0, len(structures), args.batch_size):
        chunk = structures[lo : lo + args.batch_size]
        batch = pack_structures(chunk, config.cutoff, config.threebody_cutoff)
        out = pot.apply(params, batch)
        node_graph = np.asarray(batch.node_graph)
        node_mask = np.asarray(batch.node_mask)
        forces = np.asarray(out.forces)
        for gi, s in enumerate(chunk):
            sel = (node_graph == gi) & node_mask
            results.append(
                {
                    "energy": float(np.asarray(out.energy)[gi]),
                    "energy_per_atom": float(np.asarray(out.energy_per_atom)[gi]),
                    "forces": forces[sel].tolist(),
                    "stress_voigt": np.asarray(out.stress)[gi].tolist(),
                    "num_atoms": len(s),
                }
            )
    print(json.dumps(results))


if __name__ == "__main__":
    main()

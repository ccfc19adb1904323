"""Batched structure relaxation from a trained checkpoint.

Native replacement for the reference's relaxation demo, which shells out to the
*original TensorFlow m3gnet* package (/root/reference/scripts/relax_org.py:13-15)
instead of using its own model. Here relaxation runs on our potential with the
batched FIRE optimizer (simulate/relax.py).

Input: a JSON file of structures, each {"lattice": 3x3, "frac_coords": Nx3,
"atomic_numbers": [...]} (or "cart_coords"). Output: relaxed structures with
final energies and max-force, printed as JSON.
"""

from __future__ import annotations

import argparse
import json

import numpy as np

import jax


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--structures", required=True, help="JSON list of structures")
    ap.add_argument("--checkpoint", default=None, help="orbax checkpoint dir (tag 'best')")
    ap.add_argument("--config", default=None, help="YAML config for the model")
    ap.add_argument("--fmax", type=float, default=0.05)
    ap.add_argument("--max-steps", type=int, default=200)
    ap.add_argument("--optimizer", choices=("fire", "lbfgs"), default="fire")
    ap.add_argument("--relax-cell", action="store_true",
                    help="optimize the cell strain jointly (jitted DOF)")
    ap.add_argument("--seed", type=int, default=0, help="init seed when no checkpoint")
    args = ap.parse_args()

    from torch_m3gnet_tpu.config import M3GNetConfig
    from torch_m3gnet_tpu.data.graph import pack_structures
    from torch_m3gnet_tpu.data.structure import Structure
    from torch_m3gnet_tpu.models import build_model
    from torch_m3gnet_tpu.simulate import FireConfig, LbfgsConfig, relax_structures

    config = M3GNetConfig.from_yaml(args.config) if args.config else M3GNetConfig()

    with open(args.structures) as f:
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

    pot = build_model(config)
    example = pack_structures(structures[:1], config.cutoff, config.threebody_cutoff)
    params = pot.init(jax.random.PRNGKey(args.seed), example)
    if args.checkpoint:
        import orbax.checkpoint as ocp
        import os

        ckptr = ocp.StandardCheckpointer()
        # checkpoints store a TrainState; restore params subtree
        from torch_m3gnet_tpu.train.loop import TrainState

        state = ckptr.restore(
            os.path.abspath(args.checkpoint), TrainState(params=params, opt_state=None)
        )
        params = state.params

    relaxed, energies, fmax = relax_structures(
        pot,
        params,
        structures,
        config.cutoff,
        config.threebody_cutoff,
        (LbfgsConfig if args.optimizer == "lbfgs" else FireConfig)(
            max_steps=args.max_steps, fmax=args.fmax, relax_cell=args.relax_cell
        ),
    )
    out = [
        {
            "lattice": s.lattice.tolist(),
            "cart_coords": s.cart_coords.tolist(),
            "atomic_numbers": s.atomic_numbers.tolist(),
            "energy": float(e),
            "fmax": float(fm),
        }
        for s, e, fm in zip(relaxed, energies, fmax)
    ]
    print(json.dumps(out))


if __name__ == "__main__":
    main()

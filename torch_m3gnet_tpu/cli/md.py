"""Batched molecular dynamics from a trained checkpoint.

Capability beyond the reference (which has no MD at all; its only dynamics
demo delegates to the external TF m3gnet package,
/root/reference/scripts/relax_org.py): NVE / NVT-Langevin on our potential
with the jitted batched integrator (simulate/md.py).

Input: a JSON file of structures, each {"lattice": 3x3, "frac_coords": Nx3,
"atomic_numbers": [...]} (or "cart_coords"). Output: final structures with
velocities plus per-step energy/temperature series, printed as JSON.
"""

from __future__ import annotations

import argparse
import json

import jax


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--structures", required=True, help="JSON list of structures")
    ap.add_argument("--checkpoint", default=None, help="orbax checkpoint dir (tag 'best')")
    ap.add_argument("--config", default=None, help="YAML config for the model")
    ap.add_argument("--ensemble", choices=("nve", "nvt", "npt"), default="nvt")
    ap.add_argument("--temperature", type=float, default=300.0, help="K")
    ap.add_argument("--friction", type=float, default=0.01, help="Langevin gamma, 1/fs")
    ap.add_argument("--pressure", type=float, default=0.0, help="NPT target, GPa")
    ap.add_argument("--tau-p", type=float, default=500.0, help="barostat tau, fs")
    ap.add_argument("--compressibility", type=float, default=1e-2,
                    help="barostat coupling, 1/GPa")
    ap.add_argument("--dt", type=float, default=1.0, help="fs")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--rebuild-every", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--traj-out",
        default=None,
        help="write per-structure extended-XYZ trajectories to "
        "<traj-out>.<i>.extxyz (records every step)",
    )
    args = ap.parse_args()

    from torch_m3gnet_tpu.config import M3GNetConfig
    from torch_m3gnet_tpu.data.graph import pack_structures
    from torch_m3gnet_tpu.data.structure import Structure
    from torch_m3gnet_tpu.models import build_model
    from torch_m3gnet_tpu.simulate import MDConfig, run_md

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
        import os

        import orbax.checkpoint as ocp

        from torch_m3gnet_tpu.train.loop import TrainState

        ckptr = ocp.StandardCheckpointer()
        state = ckptr.restore(
            os.path.abspath(args.checkpoint), TrainState(params=params, opt_state=None)
        )
        params = state.params

    res = run_md(
        pot,
        params,
        structures,
        config.cutoff,
        config.threebody_cutoff,
        MDConfig(
            dt=args.dt,
            n_steps=args.steps,
            ensemble=args.ensemble,
            temperature=args.temperature,
            friction=args.friction,
            pressure=args.pressure,
            tau_p=args.tau_p,
            compressibility=args.compressibility,
            rebuild_every=args.rebuild_every,
            seed=args.seed,
            record_trajectory=args.traj_out is not None,
        ),
    )

    if args.traj_out is not None:
        from torch_m3gnet_tpu.simulate import write_extxyz

        for i, (s, traj) in enumerate(zip(structures, res.trajectories)):
            lattices = None
            if res.volumes is not None:
                # NPT: the barostat scaling is isotropic per graph, so the
                # per-frame cell is the initial cell scaled by (V_t/V_0)^(1/3)
                v0 = abs(np.linalg.det(s.lattice))
                mu = (res.volumes[:, i] / v0) ** (1.0 / 3.0)
                lattices = s.lattice[None] * mu[:, None, None]
            write_extxyz(
                f"{args.traj_out}.{i}.extxyz", s, traj,
                energies=res.energies[:, i], times=res.times,
                lattices=lattices,
            )
    out = {
        "structures": [
            {
                "lattice": s.lattice.tolist(),
                "cart_coords": s.cart_coords.tolist(),
                "atomic_numbers": s.atomic_numbers.tolist(),
                "velocities": s.properties["velocities"].tolist(),
            }
            for s in res.structures
        ],
        "times_fs": res.times.tolist(),
        "potential_energy_ev": res.energies.tolist(),
        "kinetic_energy_ev": res.kinetic.tolist(),
        "temperature_k": res.temperatures.tolist(),
    }
    if res.pressures is not None:
        out["pressure_gpa"] = res.pressures.tolist()
        out["volume_a3"] = res.volumes.tolist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

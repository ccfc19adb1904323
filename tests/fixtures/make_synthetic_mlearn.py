"""Generate the committed synthetic mlearn-like fixture (run once; output is
checked in so the accuracy-regression test pins against fixed data).

Targets come from a frozen random-init "teacher" M3GNet (default-normalized
chi, f32, CPU) on perturbed fcc-Cu cells, so the dataset is exactly learnable
by the student architecture; MAEs after a fixed short training run are then a
stable accuracy-regression proxy while the real mlearn data is unavailable
in-image (BASELINE.md). Regenerate ONLY when the fixture format must change —
regeneration shifts the pinned MAEs in tests/test_accuracy_regression.py.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_default_device", jax.devices("cpu")[0])

from torch_m3gnet_tpu.config import M3GNetConfig
from torch_m3gnet_tpu.data.graph import graph_from_structure, pad_batch
from torch_m3gnet_tpu.data.structure import Structure
from torch_m3gnet_tpu.models import build_model

CUTOFF, CUTOFF3 = 4.0, 3.0
TEACHER_CFG = M3GNetConfig(
    l_max=2, n_max=3, embedding_dim=16, num_blocks=2,
    cutoff=CUTOFF, threebody_cutoff=CUTOFF3,
)


def structures(n, seed):
    rng = np.random.default_rng(seed)
    base = Structure.from_frac_coords(
        np.eye(3) * 3.62,
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]],
        [29] * 4,
    )
    out = []
    for _ in range(n):
        out.append(
            Structure(
                base.lattice * (1 + 0.01 * rng.standard_normal()),
                base.cart_coords + 0.06 * rng.standard_normal((4, 3)),
                base.atomic_numbers,
            )
        )
    return out


def main():
    elemental = [0.0] * 95
    elemental[28] = -3.5
    teacher = build_model(TEACHER_CFG, elemental_energies=elemental, energy_scale=0.5)
    params = None

    def records(structs):
        nonlocal params
        recs = []
        for s in structs:
            g = graph_from_structure(s, CUTOFF, CUTOFF3)
            b = pad_batch(g, g.num_nodes + 4, g.num_edges + 16, g.num_triplets + 32, 1)
            if params is None:
                params = teacher.init(jax.random.PRNGKey(2024), b)
            o = teacher.apply(params, b)
            n = len(s)
            recs.append(
                {
                    "structure": {
                        "lattice": {"matrix": s.lattice.tolist()},
                        "sites": [
                            {"abc": list(map(float, f)), "species": [{"element": "Cu"}]}
                            for f in s.frac_coords
                        ],
                    },
                    "outputs": {
                        "energy": float(np.asarray(o.energy)[0]),
                        "forces": np.asarray(o.forces)[:n].tolist(),
                        # store as kbar VASP order (the loader's input
                        # convention): invert the voigt gather + unit conv
                        "virial_stress": (
                            np.asarray(o.stress)[0][[0, 1, 2, 5, 3, 4]]
                            * 1602.1766208
                        ).tolist(),
                    },
                }
            )
        return recs

    here = os.path.join(os.path.dirname(__file__), "synthetic_mlearn_Cu")
    os.makedirs(here, exist_ok=True)
    with open(os.path.join(here, "training.json"), "w") as f:
        json.dump(records(structures(48, seed=10)), f)
    with open(os.path.join(here, "test.json"), "w") as f:
        json.dump(records(structures(12, seed=20)), f)
    print("wrote", here)


if __name__ == "__main__":
    main()

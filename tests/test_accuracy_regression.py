"""Training-accuracy regression proxy on the committed synthetic fixture.

Real mlearn/MPF data is not available in this image (zero egress; see
BASELINE.md), so training accuracy is pinned against
tests/fixtures/synthetic_mlearn_Cu — teacher-model targets generated once by
tests/fixtures/make_synthetic_mlearn.py and checked in. The student recovers
the teacher to ~3e-5 eV/atom energy MAE / ~1.4e-4 eV/A force MAE in 80
epochs (CPU f32, recorded 2026-08-21); the bounds below carry an order of
magnitude of headroom for platform drift, so only a real regression (e.g. a
broken three-body stage, a mis-permuted stress target, an optimizer/loss
wiring bug) can trip them.

The fixture stores stresses in kbar VASP component order, so this test also
end-to-end-guards the loader's VASP->Voigt shear remap (data/io.py): a wrong
gather mis-pairs the shear targets and the stress MAE blows past its bound.
"""

import os

import numpy as np
import pytest

import jax  # noqa: F401  (conftest pins devices)

from torch_m3gnet_tpu.config import M3GNetConfig
from torch_m3gnet_tpu.data.graph import graph_from_structure
from torch_m3gnet_tpu.data.io import load_mlearn_json
from torch_m3gnet_tpu.train.run import train_model

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "synthetic_mlearn_Cu"
)

# recorded MAEs (2026-08-21, CPU f32): 3e-5 / 1.4e-4 / 7e-5
BOUNDS = {"energy_mae": 5e-4, "forces_mae": 2e-3, "stresses_mae": 1e-3}


@pytest.mark.slow
def test_synthetic_mlearn_accuracy(tmp_path):
    cfg = M3GNetConfig(
        l_max=2, n_max=3, embedding_dim=16, num_blocks=2,
        cutoff=4.0, threebody_cutoff=3.0, batch_size=8,
        learning_rate=5e-3, decay_steps=150, max_epochs=80,
        early_stopping_patience=1000, stress_weight=0.1,
        root=str(tmp_path),
    )
    graphs = lambda path: [
        graph_from_structure(s, cfg.cutoff, cfg.threebody_cutoff)
        for s in load_mlearn_json(path)
    ]
    test = graphs(os.path.join(FIXTURE, "test.json"))
    _, _, metrics = train_model(
        cfg, graphs(os.path.join(FIXTURE, "training.json")),
        val_graphs=test, test_graphs=test,
    )
    for key, bound in BOUNDS.items():
        assert float(metrics[key]) < bound, (key, float(metrics[key]), bound)

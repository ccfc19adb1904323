"""Typed run configuration.

Capability parity with the reference ``RunConfig``
(/root/reference/src/torch_m3gnet/config.py:6-32) plus TPU-specific knobs
(bucketing, mesh, precision) that have no reference counterpart.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Mapping


@dataclass(frozen=True)
class M3GNetConfig:
    """Single flat config for model, data, and training.

    Defaults follow the reference defaults (cutoff=5.0, threebody_cutoff=4.0,
    l_max=3, n_max=3, num_types=95, embedding_dim=64, num_blocks=3, ...).
    """

    # Where run artifacts (cache, checkpoints, logs) live.
    root: str = "."

    # --- featurization ---
    cutoff: float = 5.0
    threebody_cutoff: float = 4.0

    # --- model ---
    l_max: int = 3
    n_max: int = 3
    num_types: int = 95
    embedding_dim: int = 64
    num_blocks: int = 3

    # --- training ---
    max_epochs: int = 1000
    learning_rate: float = 1e-3
    decay_steps: int = 200
    decay_alpha: float = 1e-2
    batch_size: int = 32
    accumulate_grad_batches: int = 1
    val_ratio: float = 0.1
    test_ratio: float = 0.1
    early_stopping_patience: int = 200
    energy_weight: float = 1.0
    force_weight: float = 1.0
    stress_weight: float = 0.1
    seed: int = 0

    # --- TPU-specific (no reference counterpart) ---
    # Padded bucket sizes per batch; ``None`` means auto-derived from data.
    max_nodes: int | None = None
    max_edges: int | None = None
    max_triplets: int | None = None
    # Round padded sizes up to a multiple of this (MXU/VPU lane friendliness).
    pad_multiple: int = 128
    # Matmul/accumulation dtypes: "float32" (parity) or "bfloat16" (speed).
    compute_dtype: str = "float32"
    # jax matmul precision for f32 on TPU: "default" lets the MXU ingest bf16
    # (~4e-3 relative error, fastest), "highest" forces full f32 (f32x3 passes).
    matmul_precision: str = "default"
    # Rematerialize the triplet message stage in backward (HBM for recompute).
    remat_triplets: bool = False
    # Evaluate every GatedMLP as a never-splitting chain of doubled-width
    # matmuls (block-diagonal later layers; models/layers.py). Same math and
    # param tree (fp reassociation only); fills the 128-lane MXU tile at
    # D = 64. Default ON: paired A/B measured 0.79x step-time ratio vs the
    # split stacks at the 32-graph bench point (docs/benchmark.md round 4).
    fuse_gated_second: bool = True
    # Fused Pallas kernels for the factorized three-body stage
    # ("on"|"off"|"auto"; fm layout only): keeps the stage's (MN, E)
    # expanded-product / gather intermediates in VMEM
    # (ops/pallas_factorized_stage.py). "auto" (default since round 5) = on
    # for TPU+fm, still VMEM-self-gated per batch shape: three independent
    # quiet windows measured the eval step at 0.73-0.87x with the kernels
    # (train neutral), and the 559-window contention-compressed median
    # agreed directionally (docs/benchmark.md round 5).
    fused_factorized: str = "auto"
    # Size-class bucket ladder: >1 pads batches per size class (one XLA
    # compilation per class) — big padding-efficiency win on mixed datasets.
    bucket_classes: int = 1
    # Data-parallel axis size; 1 = single chip.
    num_devices: int = 1
    # Use Pallas segment kernels on TPU ("auto"|"on"|"off").
    pallas_segment: str = "auto"
    # Fused Pallas triplet stage (gate gather + basis product + segment sum in
    # one kernel; T-scale data touched once). "auto" = on when the default
    # backend is TPU (measured 1.16x end-to-end on v5e), off elsewhere.
    # Superseded by threebody_mode when that is not "auto".
    fused_triplets: str = "auto"
    # Three-body stage algorithm:
    #   "gather"     per-triplet gather + segment sum (XLA; exact parity path)
    #   "fused"      per-triplet Pallas kernel (ops/pallas_fused_triplet.py)
    #   "factorized" Legendre-addition-theorem factorization: P_l(cos theta)
    #                splits into per-edge real harmonics, so the whole T-scale
    #                stage collapses to O(E) dense ops (exact same function,
    #                fastest on TPU by a wide margin)
    #   "auto"       factorized on TPU, gather elsewhere (unless the legacy
    #                fused_triplets knob explicitly forces the fused kernel)
    threebody_mode: str = "auto"
    # Activation layout: "em" entity-major (entities, features) — the parity
    # layout; "fm" feature-major (features, entities) — avoids TPU lane
    # padding (2x HBM at D=64, 4.7x at l^2*n, 42x for xyz rows) by keeping
    # the huge entity axis on the 128 lanes. "auto" resolves to fm on TPU
    # when the three-body stage is factorized (measured 0.84-0.93x of em with
    # fuse_gated_second, docs/benchmark.md round 4) and em elsewhere
    # ("fm" requires threebody_mode="factorized"; graph parallelism keeps
    # the native layout — fm exchanges node COLUMNS via halo_exchange_fm).
    # Parameter trees are layout-independent.
    layout: str = "auto"

    def replace(self, **kwargs: Any) -> "M3GNetConfig":
        return dataclasses.replace(self, **kwargs)

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "M3GNetConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        unknown = set(d) - names
        if unknown:
            raise ValueError(f"Unknown config keys: {sorted(unknown)}")
        return cls(**dict(d))

    @classmethod
    def from_yaml(cls, path: str, **overrides: Any) -> "M3GNetConfig":
        import yaml

        with open(path) as f:
            d = yaml.safe_load(f) or {}
        d.update(overrides)
        return cls.from_dict(d)

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

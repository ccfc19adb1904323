"""Run the ACTUAL torch reference (lan496/torch-m3gnet) inside this image.

The reference's model stack (/root/reference/src/torch_m3gnet/model/build.py:16-83)
imports four packages that are not installed here, but none of them is needed
for the model math itself:

* ``torch_scatter`` — only ``scatter_sum`` is used (nn/conv.py:4,
  nn/interaction.py:6, nn/readout.py:4, nn/gradient.py:4); reproduced exactly
  with ``Tensor.index_add_`` (differentiable, incl. grad-of-grad).
* ``torchtyping`` — ``TensorType`` appears only in annotations; a subscriptable
  placeholder suffices (nn/invariant.py evaluates annotations at def time).
* ``pymatgen`` — ``Structure`` is only a type/constructor for
  ``MaterialGraph.from_structure`` (data/material_graph.py:132-165), which we
  bypass: the blackboard is built directly from our ``GraphBatch`` arrays.
* ``torch_geometric`` — ``Data`` is the dict-like base of ``MaterialGraph``;
  the nn layers themselves only ever do ``graph[key]`` get/set
  (e.g. nn/invariant.py:21-40), so a plain dict serves as the batch.

With the shims installed, ``import torch_m3gnet`` loads the reference's own
Python source unmodified from /root/reference/src, and
:func:`run_reference_efs` executes its real ``Gradient``-wrapped Sequential —
giving live per-layer activations and E/F/S to pin our JAX stack against
(BASELINE.md "per-layer activations vs reference: allclose").
"""

from __future__ import annotations

import sys
import types

import numpy as np

REFERENCE_SRC = "/root/reference/src"


def install_reference_shims(reference_src: str = REFERENCE_SRC) -> None:
    """Install import shims and put the reference source on sys.path."""
    import torch

    if "torch_scatter" not in sys.modules:
        mod = types.ModuleType("torch_scatter")

        def scatter_sum(src, index, dim=-1, dim_size=None):
            # torch_scatter.scatter_sum semantics at the reference's call
            # sites: 1-D index of length src.shape[dim]; default dim=-1
            # (relied on at nn/interaction.py:212 and nn/readout.py:49).
            if dim < 0:
                dim = src.dim() + dim
            if dim_size is None:
                dim_size = int(index.max()) + 1 if index.numel() else 0
            shape = list(src.shape)
            shape[dim] = dim_size
            out = torch.zeros(shape, dtype=src.dtype, device=src.device)
            return out.index_add(dim, index, src)

        mod.scatter_sum = scatter_sum
        sys.modules["torch_scatter"] = mod

    if "torchtyping" not in sys.modules:
        mod = types.ModuleType("torchtyping")

        class TensorType:
            def __class_getitem__(cls, item):
                return cls

        mod.TensorType = TensorType
        sys.modules["torchtyping"] = mod

    if "pymatgen" not in sys.modules:
        pkg = types.ModuleType("pymatgen")
        core = types.ModuleType("pymatgen.core")

        class Structure:  # constructor type only; never instantiated here
            pass

        core.Structure = Structure
        pkg.core = core
        sys.modules["pymatgen"] = pkg
        sys.modules["pymatgen.core"] = core

    if "torch_geometric" not in sys.modules:
        pkg = types.ModuleType("torch_geometric")
        data = types.ModuleType("torch_geometric.data")

        class Data:
            """Minimal dict-like stand-in for PyG Data (attribute store)."""

            def __init__(self, **kwargs):
                for k, v in kwargs.items():
                    setattr(self, k, v)

            def __getitem__(self, key):
                return getattr(self, key)

            def __setitem__(self, key, value):
                setattr(self, key, value)

        class InMemoryDataset:  # imported by data/dataset.py; unused here
            pass

        data.Data = Data
        data.InMemoryDataset = InMemoryDataset
        pkg.data = data
        sys.modules["torch_geometric"] = pkg
        sys.modules["torch_geometric.data"] = data

    if reference_src not in sys.path:
        sys.path.insert(0, reference_src)


def install_training_shims() -> None:
    """Shims sufficient to import and EXECUTE the reference's training module
    (/root/reference/src/torch_m3gnet/model/litmodule.py) — not just the model.

    ``LitM3GNet`` itself only needs ``pl.LightningModule`` as an nn.Module base
    with ``save_hyperparameters``/``log_dict`` (litmodule.py:27,45,80) and
    torchmetrics' ``MeanAbsoluteError``/``MeanSquaredError`` called
    functionally inside ``_loss_fn`` (litmodule.py:68-69,162-165). The
    remaining imports (loggers, callbacks, PyG DataLoader) are only touched by
    ``train_model``'s Lightning-Trainer orchestration, which we do not run —
    placeholders satisfy import time. sklearn is real in this image.

    With these installed, ``LitM3GNet._loss_fn`` (the reference's actual loss
    code, litmodule.py:123-166) and ``configure_optimizers`` (its real torch
    Adam(eps=1e-7) + CosineAnnealingLR, litmodule.py:168-183) run unmodified —
    the basis of the training-dynamics parity study
    (benchmarks/train_dynamics.py).
    """
    import torch

    install_reference_shims()

    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")

        class LightningModule(torch.nn.Module):
            def save_hyperparameters(self, *args, **kwargs):
                self._hparams = args[0] if args else kwargs

            def log_dict(self, *args, **kwargs):
                pass

            def lr_schedulers(self):
                return None

        pl.LightningModule = LightningModule
        pl.seed_everything = lambda seed, **kw: torch.manual_seed(seed)
        pl.Trainer = None  # train_model orchestration is not executed

        loggers = types.ModuleType("pytorch_lightning.loggers")
        loggers.TensorBoardLogger = loggers.CSVLogger = object
        callbacks = types.ModuleType("pytorch_lightning.callbacks")
        callbacks.LearningRateMonitor = object
        early = types.ModuleType("pytorch_lightning.callbacks.early_stopping")
        early.EarlyStopping = object
        callbacks.early_stopping = early
        pl.loggers = loggers
        pl.callbacks = callbacks
        sys.modules["pytorch_lightning"] = pl
        sys.modules["pytorch_lightning.loggers"] = loggers
        sys.modules["pytorch_lightning.callbacks"] = callbacks
        sys.modules["pytorch_lightning.callbacks.early_stopping"] = early

    if "torchmetrics" not in sys.modules:
        tm = types.ModuleType("torchmetrics")

        class MeanAbsoluteError(torch.nn.Module):
            # functional use only (litmodule.py:162-165): batch-mean |d|
            def forward(self, pred, target):
                return (pred - target).abs().mean()

        class MeanSquaredError(torch.nn.Module):
            def forward(self, pred, target):
                return ((pred - target) ** 2).mean()

        tm.MeanAbsoluteError = MeanAbsoluteError
        tm.MeanSquaredError = MeanSquaredError
        sys.modules["torchmetrics"] = tm

    if "torch_geometric.loader" not in sys.modules:
        loader = types.ModuleType("torch_geometric.loader")
        loader.DataLoader = object  # import-time only (litmodule.py:16)
        sys.modules["torch_geometric.loader"] = loader
        if "torch_geometric" in sys.modules:
            sys.modules["torch_geometric"].loader = loader


def patch_reference_corrected_chi(model, cfg) -> None:
    """Fix the reference's two live bugs in-place (docs/reference_parity.md):

    1. replace each ThreeBodyInteration's chi normalization with the intended
       1/|j_{l+1}(z_ln)| constants and a regenerated zeros table (the shipped
       ``nsb.factors`` divide by j_{l+1} at its OWN roots → chi ~ 1e-12);
    2. replace the module-global ``legendre_cos`` (hand-written backward is
       wrong for l>=2) with an autograd-native Bonnet recursion.

    Idempotent; mirrors what benchmarks/parity_vs_reference.py "corrected"
    mode does, shared here so the training-dynamics study uses the same patch.
    """
    import torch

    import torch_m3gnet.nn.interaction as ref_interaction
    from torch_m3gnet.nn.interaction import ThreeBodyInteration

    from torch_m3gnet_tpu.ops.basis import chi_norm_constants, spherical_bessel_zeros

    cn = chi_norm_constants(cfg.cutoff, cfg.l_max, cfg.n_max)
    zeros = spherical_bessel_zeros(cfg.l_max + 1, cfg.n_max)
    dtype = next(model.parameters()).dtype
    for m in model.modules():
        if isinstance(m, ThreeBodyInteration):
            m.nsb.factors = torch.tensor(1.0 / cn, dtype=dtype)
            m.nsb.spherical_bessel_zeros = torch.tensor(zeros, dtype=dtype)

    def autograd_legendre(x, order):
        out = [torch.ones_like(x)]
        if order >= 1:
            out.append(x)
            for n in range(1, order):
                out.append(((2 * n + 1) * x * out[n] - n * out[n - 1]) / (n + 1))
        return out[-1]

    ref_interaction.legendre_cos = autograd_legendre


def build_reference_model(cfg, elemental_energies=None, energy_scale: float = 1.0,
                          dtype=None, seed: int | None = None):
    """Build the reference's real model (build.py:16-83) at the given dtype.

    f64 note: the reference stores basis constants as plain (default-dtype)
    tensors, so the whole model is built under ``torch.set_default_dtype``.
    The single f32 leak — ``one_hot.to(torch.float)`` at nn/featurizer.py:36 —
    is healed with a forward-pre-hook that casts the (exact 0/1) one-hot input
    to the layer's weight dtype.
    """
    import torch

    install_reference_shims()
    from torch_m3gnet.model.build import build_model as ref_build
    from torch_m3gnet.nn.featurizer import AtomFeaturizer

    dtype = dtype or torch.float64
    prev = torch.get_default_dtype()
    torch.set_default_dtype(dtype)
    try:
        if seed is not None:
            torch.manual_seed(seed)
        ee = (None if elemental_energies is None
              else torch.as_tensor(np.asarray(elemental_energies), dtype=dtype))
        model = ref_build(
            cutoff=cfg.cutoff, threebody_cutoff=cfg.threebody_cutoff,
            l_max=cfg.l_max, n_max=cfg.n_max, num_types=cfg.num_types,
            embedding_dim=cfg.embedding_dim, num_blocks=cfg.num_blocks,
            elemental_energies=ee, energy_scale=energy_scale,
        )
    finally:
        torch.set_default_dtype(prev)

    for m in model.modules():
        if isinstance(m, AtomFeaturizer):
            m.linear.register_forward_pre_hook(
                lambda mod, inp: (inp[0].to(mod.weight.dtype),)
            )
    return model


def build_reference_litmodule(cfg, elemental_energies, energy_scale: float,
                              dtype=None, seed: int | None = None,
                              corrected_chi: bool = True):
    """Construct the reference's real ``LitM3GNet`` (litmodule.py:27-192).

    Returns the LightningModule with its ``Gradient``-wrapped model built at
    ``dtype`` (default f64) from ``torch.manual_seed(seed)`` init, ready for
    ``_loss_fn`` / ``configure_optimizers``. ``corrected_chi`` applies
    :func:`patch_reference_corrected_chi` so the three-body stage is live.
    """
    import torch

    install_training_shims()
    from torch_m3gnet.config import RunConfig
    from torch_m3gnet.model.litmodule import LitM3GNet
    from torch_m3gnet.nn.featurizer import AtomFeaturizer

    ref_cfg = RunConfig(
        root="/tmp/torch_m3gnet_ref",  # required positional; nothing is written
        cutoff=cfg.cutoff, threebody_cutoff=cfg.threebody_cutoff,
        l_max=cfg.l_max, n_max=cfg.n_max, num_types=cfg.num_types,
        embedding_dim=cfg.embedding_dim, num_blocks=cfg.num_blocks,
        learning_rate=cfg.learning_rate, decay_steps=cfg.decay_steps,
        decay_alpha=cfg.decay_alpha, energy_weight=cfg.energy_weight,
        force_weight=cfg.force_weight, stress_weight=cfg.stress_weight,
    )
    dtype = dtype or torch.float64
    prev = torch.get_default_dtype()
    torch.set_default_dtype(dtype)
    try:
        if seed is not None:
            torch.manual_seed(seed)
        lit = LitM3GNet(
            config=ref_cfg,
            elemental_energies=list(map(float, elemental_energies)),
            energy_scale=float(energy_scale),
        )
    finally:
        torch.set_default_dtype(prev)

    for m in lit.model.modules():
        if isinstance(m, AtomFeaturizer):
            m.linear.register_forward_pre_hook(
                lambda mod, inp: (inp[0].to(mod.weight.dtype),)
            )
    if corrected_chi:
        patch_reference_corrected_chi(lit.model, cfg)
    return lit


def reference_blackboard(g, dtype=None):
    """Build the reference's batch blackboard from an unpadded GraphBatch.

    Feeds OUR edge list (identical edge ids on both sides so per-edge
    activations compare element-wise; our list is source-grouped, satisfying
    the ordering invariant of data/material_graph.py:229-248) and lets the
    reference's own ``compute_threebody`` enumerate its triplets.
    """
    import torch

    install_reference_shims()
    from torch_m3gnet.data.material_graph import compute_threebody

    dtype = dtype or torch.float64
    n = int(g.n_node[0])
    assert g.num_graphs_real == 1 and g.positions.shape[0] == n, (
        "reference_blackboard expects a single unpadded graph"
    )
    pos = torch.tensor(np.asarray(g.positions, dtype=np.float64), dtype=dtype)
    edge_index = torch.stack([
        torch.as_tensor(np.asarray(g.edge_src, dtype=np.int64)),
        torch.as_tensor(np.asarray(g.edge_dst, dtype=np.int64)),
    ])
    shift = torch.as_tensor(
        np.asarray(np.rint(g.edge_cell_shift), dtype=np.int64)).to(torch.int)
    lattice = torch.tensor(np.asarray(g.lattice, dtype=np.float64), dtype=dtype)
    rvec = (pos[edge_index[1]]
            + shift.to(dtype) @ lattice[0]
            - pos[edge_index[0]])
    distances = torch.linalg.norm(rvec, dim=1)

    # threebody_cutoff is re-derived by the caller's config; pass via attribute
    return {
        "pos": pos,
        "atom_types": torch.as_tensor(np.asarray(g.atom_types, dtype=np.int64)),
        "edge_index": edge_index,
        "edge_cell_shift": shift,
        "lattice": lattice,
        "batch": torch.zeros(n, dtype=torch.long),
        "_edge_distances_precomputed": distances,
        "_compute_threebody": compute_threebody,
    }


def reference_blackboard_batched(graphs, threebody_cutoff: float, dtype=None):
    """Batched blackboard (with targets) from a list of unpadded GraphBatch.

    The multi-graph analog of :func:`reference_blackboard`: per-graph
    source-grouped edge lists are concatenated with node-id offsets (global
    source-contiguity is preserved, satisfying compute_threebody's ordering
    invariant at data/material_graph.py:229-248), lattice becomes (B,3,3),
    and a PyG-style ``batch`` vector is added — the same shape the reference's
    DataLoader collation produces (material_graph.py:109-130). Targets
    (total_energy/forces/stresses) come along for ``LitM3GNet._loss_fn``.
    """
    import torch

    install_reference_shims()
    from torch_m3gnet.data.material_graph import compute_threebody

    from torch_m3gnet_tpu.data.graph import batch_graphs

    dtype = dtype or torch.float64
    cat = batch_graphs(list(graphs))
    n = cat.num_nodes
    assert cat.num_graphs_real == cat.num_graphs, "expects unpadded graphs"

    pos = torch.tensor(np.asarray(cat.positions, dtype=np.float64), dtype=dtype)
    edge_index = torch.stack([
        torch.as_tensor(np.asarray(cat.edge_src, dtype=np.int64)),
        torch.as_tensor(np.asarray(cat.edge_dst, dtype=np.int64)),
    ])
    shift = torch.as_tensor(
        np.asarray(np.rint(cat.edge_cell_shift), dtype=np.int64)).to(torch.int)
    lattice = torch.tensor(np.asarray(cat.lattice, dtype=np.float64), dtype=dtype)
    batch_vec = torch.as_tensor(np.asarray(cat.node_graph, dtype=np.int64))
    rvec = (pos[edge_index[1]]
            + torch.einsum("ep,epa->ea", shift.to(dtype),
                           lattice[batch_vec[edge_index[0]]])
            - pos[edge_index[0]])
    distances = torch.linalg.norm(rvec, dim=1)
    tei, num_triplet_i, num_triplet_ij = compute_threebody(
        n, edge_index, distances, threebody_cutoff
    )

    bb = {
        "pos": pos,
        "atom_types": torch.as_tensor(np.asarray(cat.atom_types, dtype=np.int64)),
        "edge_index": edge_index,
        "edge_cell_shift": shift,
        "lattice": lattice,
        "batch": batch_vec,
        "triplet_edge_index": tei,
        "num_triplet_i": num_triplet_i,
        "num_triplet_ij": num_triplet_ij,
    }
    if cat.energy is not None:
        bb["total_energy"] = torch.tensor(
            np.asarray(cat.energy, dtype=np.float64), dtype=dtype)
    if cat.forces is not None:
        bb["forces"] = torch.tensor(
            np.asarray(cat.forces, dtype=np.float64), dtype=dtype)
    if cat.stress is not None:
        bb["stresses"] = torch.tensor(
            np.asarray(cat.stress, dtype=np.float64), dtype=dtype)
    return bb


def attach_reference_triplets(bb: dict, threebody_cutoff: float) -> dict:
    """Run the reference's compute_threebody on the blackboard's edges."""
    compute_threebody = bb.pop("_compute_threebody")
    distances = bb.pop("_edge_distances_precomputed")
    n = bb["pos"].shape[0]
    tei, num_triplet_i, num_triplet_ij = compute_threebody(
        n, bb["edge_index"], distances, threebody_cutoff
    )
    bb["triplet_edge_index"] = tei
    bb["num_triplet_i"] = num_triplet_i
    bb["num_triplet_ij"] = num_triplet_ij
    return bb


# Sequential stage layout (model/build.py:37-82): fixed prefix of 6 stages,
# then (ThreeBodyInteration, M3GNetConv) pairs, then AtomWiseReadout.
_PREFIX_SNAPSHOTS = {
    3: [("x", "node_features/init")],
    4: [("edge_weights", "edge_weights")],
    5: [("edge_attr", "edge_features/init")],
}


def run_reference_efs(model, bb: dict, num_blocks: int, capture: bool = True):
    """Execute the reference's Gradient-wrapped model on the blackboard.

    Returns (efs, snapshots): efs has numpy energy (scalar), forces (N,3) and
    stresses (6,) in the reference's conventions (gradient.py:40-62);
    snapshots maps oracle-intermediate names (utils/oracle.py) to numpy arrays
    captured from the live blackboard after each Sequential stage.
    """
    import torch

    snapshots: dict[str, np.ndarray] = {}
    hooks = []
    if capture:
        seq = model.model  # the Sequential inside Gradient (gradient.py:23)

        def make_hook(pairs):
            def hook(mod, args, out):
                for key, name in pairs:
                    snapshots[name] = out[key].detach().cpu().numpy().copy()
            return hook

        for idx, pairs in _PREFIX_SNAPSHOTS.items():
            hooks.append(seq[idx].register_forward_hook(make_hook(pairs)))
        for b in range(num_blocks):
            hooks.append(seq[6 + 2 * b].register_forward_hook(
                make_hook([("edge_attr", f"edge_features/three_{b}")])))
            hooks.append(seq[7 + 2 * b].register_forward_hook(
                make_hook([("edge_attr", f"edge_features/conv_{b}"),
                           ("x", f"node_features/conv_{b}")])))
        hooks.append(seq[6 + 2 * num_blocks].register_forward_hook(
            make_hook([("scaled_atomic_energies", "scaled_atomic_energies")])))

    # nn/featurizer.py:91 allocates forward-time temporaries at the *current*
    # default dtype (torch.empty), so the forward must run under the model's
    # dtype as default, exactly like construction.
    prev = torch.get_default_dtype()
    torch.set_default_dtype(next(model.parameters()).dtype)
    try:
        out = model(dict(bb))
    finally:
        torch.set_default_dtype(prev)
        for h in hooks:
            h.remove()

    efs = {
        "energy": float(out["total_energy"].detach().cpu().numpy()[0]),
        "forces": out["forces"].detach().cpu().numpy(),
        "stresses": out["stresses"].detach().cpu().numpy()[0],
    }
    return efs, snapshots

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

"""Per-layer + E/F/S parity against the LIVE torch reference.

Runs the reference's real code (/root/reference/src/torch_m3gnet, imported
unmodified via utils/reference_shims.py) with the same weights as our JAX
stack and asserts allclose at f64 — the BASELINE.md "per-layer activations vs
reference" requirement, checked against the reference's *actual execution*,
not a transcription.

Two modes cover the chi-normalization finding (docs/reference_parity.md):

* literal  — our model runs with ``chi_norm_override`` equal to the
  reference's shipped constants (which are ~1e-12 because
  interaction.py:256-266 divides j_l by sqrt(2/rc^3)/|j_{l+1}(z_{l+1,n})|,
  evaluating j_{l+1} at its OWN tabulated roots). Pins everything including
  the fact that the reference's three-body stage is numerically inert.
* corrected — the reference runs with its ``nsb.factors`` attribute set to
  the reciprocal of the intended normalization (a one-attribute harness
  patch), so its three-body stage is ACTIVE; our model runs at its default
  (textbook) normalization. Pins the full three-body math — triplet
  enumeration, Legendre recursion, radial basis, gate gather, scatter — of
  both stacks against each other.
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

torch = pytest.importorskip("torch")

from torch_m3gnet_tpu.config import M3GNetConfig
from torch_m3gnet_tpu.data.graph import graph_from_structure, pad_batch
from torch_m3gnet_tpu.models import build_model
from torch_m3gnet_tpu.ops.basis import (
    chi_norm_constants,
    reference_literal_chi_norm,
)
from torch_m3gnet_tpu.utils.oracle import reference_energy_numpy
from torch_m3gnet_tpu.utils.reference_shims import (
    attach_reference_triplets,
    build_reference_model,
    reference_blackboard,
    run_reference_efs,
)

CFG = M3GNetConfig(l_max=3, n_max=3, embedding_dim=16, num_blocks=2)


def _map_state_dict(sd, num_blocks):
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "benchmarks")
    )
    from parity_vs_reference import map_reference_state_dict

    return map_reference_state_dict(sd, num_blocks)


def _perturbed_structures():
    from torch_m3gnet_tpu.data.structure import Structure

    rng = np.random.default_rng(42)
    fcc = Structure.from_frac_coords(
        np.eye(3) * 3.62,
        np.array([[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]])
        + rng.normal(0, 0.02, (4, 3)),
        [29] * 4,
    )
    rutile = Structure.from_frac_coords(
        np.diag([4.603, 4.603, 2.966]),
        np.array(
            [
                [0, 0, 0], [0.5, 0.5, 0.5],
                [0.3046, 0.3046, 0], [0.6954, 0.6954, 0],
                [0.8046, 0.1954, 0.5], [0.1954, 0.8046, 0.5],
            ]
        )
        + rng.normal(0, 0.01, (6, 3)),
        [22, 22, 8, 8, 8, 8],
    )
    return [fcc, rutile]


def _setup(chi_mode: str):
    elemental = np.zeros(CFG.num_types)
    elemental[28], elemental[21], elemental[7] = -3.1, -2.0, -1.5
    scale = 1.3
    ref = build_reference_model(
        CFG, elemental_energies=elemental, energy_scale=scale, seed=0
    )
    sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
    params = _map_state_dict(sd, CFG.num_blocks)

    restore = None
    if chi_mode == "literal":
        from torch_m3gnet.nn.interaction import SPHERICAL_BESSEL_ZEROS

        cn = reference_literal_chi_norm(
            CFG.cutoff, CFG.l_max, CFG.n_max,
            zeros_table=np.array(SPHERICAL_BESSEL_ZEROS),
        )
        override = cn
    else:
        # Patch the reference's normalization attribute to the intended
        # constants so its three-body stage is numerically active; our side
        # then runs at its default normalization. Also align the zeros table
        # to ours (the reference's is truncated ~1e-11 differently, which
        # otherwise shows up at ~1e-8 in d(chi)/dr on the force path).
        import torch_m3gnet.nn.interaction as ref_interaction
        from torch_m3gnet.nn.interaction import ThreeBodyInteration

        from torch_m3gnet_tpu.ops.basis import spherical_bessel_zeros

        cn = chi_norm_constants(CFG.cutoff, CFG.l_max, CFG.n_max)
        zeros = spherical_bessel_zeros(CFG.l_max + 1, CFG.n_max)
        for m in ref.modules():
            if isinstance(m, ThreeBodyInteration):
                m.nsb.factors = torch.tensor(1.0 / cn, dtype=torch.float64)
                m.nsb.spherical_bessel_zeros = torch.tensor(
                    zeros, dtype=torch.float64
                )
        # Reference bug #2 (see test_reference_legendre_backward_is_wrong):
        # its hand-written LegendreCosPolynomial.backward multiplies
        # grad_output into every recursion step (interaction.py:378-382), so
        # P_l gradients for l >= 2 carry spurious grad_output^2 terms and the
        # reference's forces are NOT the gradient of its energy once the
        # three-body stage is active. Harness patch: an autograd-native
        # Bonnet recursion (same forward values, correct gradients).
        def autograd_legendre(x, order):
            out = [torch.ones_like(x)]
            if order >= 1:
                out.append(x)
                for n in range(1, order):
                    out.append(((2 * n + 1) * x * out[n] - n * out[n - 1]) / (n + 1))
            return out[-1]

        restore = (ref_interaction, ref_interaction.legendre_cos)
        ref_interaction.legendre_cos = autograd_legendre
        override = None

    pot = build_model(
        CFG.replace(fused_triplets="off"),
        elemental_energies=list(map(float, elemental)),
        energy_scale=scale,
        stress_mode="virial",
        matmul_precision="highest",
        chi_norm_override=override,
    )
    return ref, params, pot, elemental, scale, cn, restore


@pytest.mark.parametrize("chi_mode", ["literal", "corrected"])
def test_per_layer_and_efs_parity_vs_live_reference(chi_mode):
    tol = 1e-12
    ref, params, pot, elemental, scale, cn, restore = _setup(chi_mode)
    oracle_cn = cn if chi_mode == "literal" else None
    try:
        _run_parity(ref, params, pot, elemental, scale, oracle_cn, tol, chi_mode)
    finally:
        if restore is not None:
            mod, orig = restore
            mod.legendre_cos = orig


def _run_parity(ref, params, pot, elemental, scale, oracle_cn, tol, chi_mode):
    for s in _perturbed_structures():
        g = graph_from_structure(
            s, CFG.cutoff, CFG.threebody_cutoff, dtype=np.float64
        )
        bb = attach_reference_triplets(
            reference_blackboard(g), CFG.threebody_cutoff
        )
        efs, snaps = run_reference_efs(ref, bb, CFG.num_blocks)

        # per-layer: live reference blackboard vs oracle with same weights
        p64 = jax.tree.map(lambda x: np.asarray(x, np.float64), params)
        _, inter = reference_energy_numpy(
            p64, g, CFG, elemental, scale,
            return_intermediates=True, chi_norm=oracle_cn,
        )
        checked = 0
        for k, ref_val in snaps.items():
            if k not in inter:
                continue
            ours = inter[k]
            if ours.shape != ref_val.shape:
                ours = ours.T
            assert np.abs(ours - ref_val).max() < tol, f"{chi_mode}:{k}"
            checked += 1
        assert checked >= 8  # init, weights, three_x2, conv_x2 both arrays, readout

        # E/F/S: our jitted model vs the live reference
        padded = pad_batch(
            g, g.num_nodes + 3, g.num_edges + 5, g.num_triplets + 7, 1
        )
        out = pot.apply({"params": jax.tree.map(np.asarray, params)}, padded)
        n = len(s)
        assert abs(float(out.energy[0]) - efs["energy"]) < tol
        assert np.abs(np.asarray(out.forces)[:n] - efs["forces"]).max() < tol
        assert np.abs(np.asarray(out.stress)[0] - efs["stresses"]).max() < tol


def test_reference_shipped_chi_is_numerically_inert():
    """Document-by-test: the reference's shipped NormalizedSphericalBessel
    returns |chi| <= ~1e-11 for physical radii, so its three-body residual
    vanishes (the bug behind the literal/corrected split above)."""
    from torch_m3gnet_tpu.utils.reference_shims import install_reference_shims

    install_reference_shims()
    from torch_m3gnet.nn.interaction import NormalizedSphericalBessel

    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        nsb = NormalizedSphericalBessel(cutoff=5.0, l_max=3, n_max=3)
        chi = nsb(torch.linspace(0.5, 4.9, 23))
    finally:
        torch.set_default_dtype(prev)
    assert float(chi.abs().max()) < 1e-10
    # while the intended normalization is O(1)
    assert chi_norm_constants(5.0, 3, 3).max() > 0.1


def test_reference_legendre_backward_is_wrong_for_l_ge_2():
    """Document-by-test, reference bug #2: LegendreCosPolynomial.backward
    multiplies grad_output into every recursion step (interaction.py:378-382),
    so for l >= 2 it returns (2x + x*go)*go instead of 3x*go — gradients carry
    spurious grad_output^2 terms. Invisible to the reference's own gradcheck
    (one-hot grad_outputs have go^2 == go) and masked in the shipped model by
    bug #1 (chi ~ 1e-12). Our jax.grad path has no such defect (FD-validated
    in test_model.py); the corrected-mode parity above patches in an
    autograd-native Legendre before comparing forces."""
    from torch_m3gnet_tpu.utils.reference_shims import install_reference_shims

    install_reference_shims()
    # Use the class's own .apply, NOT the module-global ``legendre_cos``:
    # the corrected-chi harness patch (reference_shims.
    # patch_reference_corrected_chi) rebinds the global in-process, and this
    # test must always see the reference's original hand-written backward.
    from torch_m3gnet.nn.interaction import LegendreCosPolynomial

    legendre_cos = LegendreCosPolynomial.apply

    x = torch.tensor([0.3, -0.7], dtype=torch.float64, requires_grad=True)
    go = torch.tensor([2.0, 5.0], dtype=torch.float64)
    (g,) = torch.autograd.grad(legendre_cos(x, 2), x, grad_outputs=go)
    true = 3 * x.detach() * go  # P_2'(x) = 3x
    buggy = (2 * x.detach() + x.detach() * go) * go
    assert np.allclose(g.numpy(), buggy.numpy())
    assert not np.allclose(g.numpy(), true.numpy())


def test_triplet_enumeration_matches_reference():
    """Our vectorized/C++ triplet enumeration produces exactly the reference's
    (e1, e2) pair multiset (compute_threebody, material_graph.py:196-254) on
    the same edge list."""
    for s in _perturbed_structures():
        g = graph_from_structure(
            s, CFG.cutoff, CFG.threebody_cutoff, dtype=np.float64
        )
        bb = attach_reference_triplets(
            reference_blackboard(g), CFG.threebody_cutoff
        )
        tei = bb["triplet_edge_index"].numpy()
        ours = set(zip(g.triplet_e1.tolist(), g.triplet_e2.tolist()))
        ref_pairs = set(zip(tei[0].tolist(), tei[1].tolist()))
        assert ours == ref_pairs
        assert len(ours) == g.triplet_e1.shape[0] == tei.shape[1]

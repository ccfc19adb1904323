"""End-to-end numerical parity against an independent transcription.

BASELINE.md requires per-layer/whole-model numerical parity with the reference
implementation. The reference's torch stack cannot run here (no
torch-geometric/torch-scatter), so this test re-derives the published equations
(/root/reference/docs/architecture.md:69-193 and the reference sources cited in
each layer's docstring) in straight numpy/scipy f64 — scipy's spherical_jn,
np.sinc, explicit loops, np.add.at scatters — and checks our jitted JAX model
reproduces the same total energy for the same random weights.

Everything downstream (forces, stress, training) is jax.grad of this energy,
so energy parity + the FD force/stress tests in test_model.py pin the whole
pipeline.
"""

import numpy as np
import pytest

import jax

from torch_m3gnet_tpu.config import M3GNetConfig
from torch_m3gnet_tpu.data.graph import graph_from_structure, pad_batch
from torch_m3gnet_tpu.models import build_model
from torch_m3gnet_tpu.ops.basis import spherical_bessel_zeros

jax.config.update("jax_enable_x64", True)


def _silu(x):
    return x / (1 + np.exp(-x))


def _sigmoid(x):
    return 1 / (1 + np.exp(-x))


def _gated_mlp(x, layers):
    """layers: list of (dense_W, dense_b, gate_W, gate_b, last_dense_linear)."""
    d = x
    g = x
    n = len(layers)
    for i, (dw, db, gw, gb, is_output) in enumerate(layers):
        d = d @ dw + (db if db is not None else 0.0)
        if not (is_output and i == n - 1):
            d = _silu(d)
        g = g @ gw + (gb if gb is not None else 0.0)
        g = _sigmoid(g) if i == n - 1 else _silu(g)
    return d * g


def reference_energy_numpy(p, g, cfg, elemental, energy_scale):
    """Reference-equation forward (f64 numpy/scipy), returns total energy."""
    from scipy.special import spherical_jn

    lmax, nmax, D = cfg.l_max, cfg.n_max, cfg.embedding_dim
    rc, rc3 = cfg.cutoff, cfg.threebody_cutoff

    pos = g.positions.astype(np.float64)
    lat = g.lattice.astype(np.float64)[0]
    src, dst = g.edge_src, g.edge_dst
    t1, t2 = g.triplet_e1, g.triplet_e2

    # geometry
    rvec = pos[dst] + g.edge_cell_shift.astype(np.float64) @ lat - pos[src]
    dist = np.linalg.norm(rvec, axis=1)
    cosj = np.clip(
        np.sum(rvec[t1] * rvec[t2], axis=1) / (dist[t1] * dist[t2]), -1, 1
    )

    # smooth radial basis h_m (docs/architecture.md:69-89, torch.sinc semantics)
    m = np.arange(nmax, dtype=np.float64)
    em = (m**2) * ((m + 2) ** 2) / (4 * ((m + 1) ** 4) + 1)
    dm = np.ones(nmax)
    for i in range(1, nmax):
        dm[i] = 1 - em[i] / dm[i - 1]
    coeff = (
        ((-1.0) ** m) * np.sqrt(2) * np.pi / rc**1.5
        * (m + 1) * (m + 2) / np.sqrt((m + 1) ** 2 + (m + 2) ** 2)
    )
    fm = coeff[:, None] * (
        np.sinc((m[:, None] + 1) * np.pi / rc * dist[None, :])
        + np.sinc((m[:, None] + 2) * np.pi / rc * dist[None, :])
    )
    hm = np.empty_like(fm)
    hm[0] = fm[0]
    for i in range(1, nmax):
        hm[i] = (fm[i] + np.sqrt(em[i] / dm[i - 1]) * hm[i - 1]) / np.sqrt(dm[i])
    edge_w = hm.T  # (E, nmax)

    # node embedding == one-hot @ W
    v = p["atom_embed"]["embedding"][g.atom_types]
    e = _silu(edge_w @ p["edge_init"]["kernel"])

    # triplet constants
    def fc(r, c):
        u = r / c
        return np.where(u <= 1, 1 - 6 * u**5 + 15 * u**4 - 10 * u**3, 0.0)

    fcprod = fc(dist[t1], rc3) * fc(dist[t2], rc3)
    sph = np.stack(
        [
            np.sqrt((2 * ell + 1) / (4 * np.pi))
            * np.polynomial.legendre.legval(cosj, np.eye(ell + 1)[ell])
            for ell in range(lmax)
        ]
    )  # (l, T)
    zeros = spherical_bessel_zeros(lmax + 1, nmax)
    chi = np.stack(
        [
            spherical_jn(ell, zeros[ell][:, None] * dist[t2][None, :] / rc)
            * (np.sqrt(2 / rc**3) / np.abs(spherical_jn(ell + 1, zeros[ell])))[:, None]
            for ell in range(lmax)
        ]
    )  # (l, n, T)
    basis = (chi * sph[:, None, :] * fcprod[None, None, :]).reshape(lmax * nmax, -1).T

    node_k = g.edge_dst[t2]
    E = len(src)
    N = len(pos)

    for b in range(cfg.num_blocks):
        gate = _sigmoid(
            v @ p[f"three_gate_{b}"]["kernel"] + p[f"three_gate_{b}"]["bias"]
        )
        msg = basis * gate[node_k]  # (T, l*n)
        agg = np.zeros((E, lmax * nmax))
        np.add.at(agg, t1, msg)
        q = p[f"three_mlp_{b}"]
        e = e + _gated_mlp(
            agg, [(q["dense_0"]["kernel"], None, q["gate_0"]["kernel"], None, False)]
        )

        concat = np.concatenate([v[src], v[dst], e], axis=1)
        q = p[f"conv_edge_{b}"]
        upd = _gated_mlp(
            concat,
            [
                (q["dense_0"]["kernel"], q["dense_0"]["bias"],
                 q["gate_0"]["kernel"], q["gate_0"]["bias"], False),
                (q["dense_1"]["kernel"], q["dense_1"]["bias"],
                 q["gate_1"]["kernel"], q["gate_1"]["bias"], False),
            ],
        )
        e = e + upd * (edge_w @ p[f"conv_edge_w_{b}"]["kernel"])

        concat = np.concatenate([v[src], v[dst], e], axis=1)
        q = p[f"conv_node_{b}"]
        nupd = _gated_mlp(
            concat,
            [
                (q["dense_0"]["kernel"], q["dense_0"]["bias"],
                 q["gate_0"]["kernel"], q["gate_0"]["bias"], False),
                (q["dense_1"]["kernel"], q["dense_1"]["bias"],
                 q["gate_1"]["kernel"], q["gate_1"]["bias"], False),
            ],
        ) * (edge_w @ p[f"conv_node_w_{b}"]["kernel"])
        acc = np.zeros((N, cfg.embedding_dim))
        np.add.at(acc, src, nupd)
        v = v + acc

    q = p["readout"]
    atomic = _gated_mlp(
        v,
        [
            (q["dense_0"]["kernel"], q["dense_0"]["bias"],
             q["gate_0"]["kernel"], q["gate_0"]["bias"], True),
            (q["dense_1"]["kernel"], q["dense_1"]["bias"],
             q["gate_1"]["kernel"], q["gate_1"]["bias"], True),
            (q["dense_2"]["kernel"], q["dense_2"]["bias"],
             q["gate_2"]["kernel"], q["gate_2"]["bias"], True),
        ],
    )[:, 0]
    scaled = elemental[g.atom_types] / energy_scale + atomic
    return energy_scale * scaled.sum()


@pytest.mark.parametrize("seed", [0, 1])
def test_energy_parity_vs_numpy_reference(tio2_rutile, seed):
    cfg = M3GNetConfig(l_max=3, n_max=3, embedding_dim=16, num_blocks=2)
    elemental = np.zeros(cfg.num_types)
    elemental[21] = -1.5  # Ti
    elemental[7] = -0.7  # O
    scale = 1.37

    g = graph_from_structure(tio2_rutile, cfg.cutoff, cfg.threebody_cutoff, dtype=np.float64)
    pot = build_model(
        cfg, elemental_energies=list(map(float, elemental)), energy_scale=scale
    )
    padded = pad_batch(g, g.num_nodes + 5, g.num_edges + 7, g.num_triplets + 9, 2)
    params = pot.init(jax.random.PRNGKey(seed), padded)
    out = pot.apply(params, padded)

    p = jax.tree.map(lambda x: np.asarray(x, dtype=np.float64), params["params"])
    want = reference_energy_numpy(p, g, cfg, elemental, scale)
    got = float(out.energy[0])
    np.testing.assert_allclose(got, want, rtol=1e-10)

"""The M3GNet potential as a pure functional JAX model.

Capability parity with the reference pipeline assembled in
/root/reference/src/torch_m3gnet/model/build.py:16-83
(ScaleLength -> AtomRef -> DistanceAndAngle -> AtomFeaturizer -> EdgeFeaturizer
-> EdgeAdjustor -> (ThreeBodyInteraction -> M3GNetConv) x num_blocks ->
AtomWiseReadout -> Gradient), re-designed TPU-first:

- one jit-compiled pure function over a padded :class:`GraphBatch` pytree —
  no per-layer graph mutation, all shapes static;
- every aggregation is a masked ``segment_sum`` (Pallas-capable);
- forces/stress come from ``jax.grad`` of the energy inside the same jitted
  computation (replacing the ``Gradient`` wrapper's
  ``torch.autograd.grad(create_graph=True)``,
  /root/reference/src/torch_m3gnet/nn/gradient.py:25-64);
- feature layout is row-major (entities, features) so the feature axis maps to
  TPU lanes and the big matmuls hit the MXU.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from torch_m3gnet_tpu.data.graph import GraphBatch
from torch_m3gnet_tpu.models.layers import DenseFM, GatedMLP, GatedMLPFM
from torch_m3gnet_tpu.ops.basis import (
    cutoff_poly,
    legendre_cos_tmajor,
    normalized_spherical_bessel,
    normalized_spherical_bessel_tmajor,
    racah_l_index,
    real_racah_harmonics,
    real_racah_harmonics_fm,
    smooth_radial_basis,
    smooth_radial_basis_fm,
)
from torch_m3gnet_tpu.ops.halo import halo_exchange, halo_exchange_fm
from torch_m3gnet_tpu.ops.segment import segment_sum, segment_sum_fm, take, take_fm


@flax.struct.dataclass
class PotentialOutput:
    """Energies/forces/stresses for a batch (padded entries zeroed)."""

    energy: jnp.ndarray  # (B,) total energy, eV
    forces: jnp.ndarray  # (N, 3) eV/Angstrom
    stress: jnp.ndarray  # (B, 6) Voigt [xx, yy, zz, yz, zx, xy], eV/A^3
    energy_per_atom: jnp.ndarray  # (B,) eV/atom
    atomic_energy: jnp.ndarray  # (N,) eV


def _gather(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    # custom-VJP gather: the cotangent is a segment_sum, not XLA's slow
    # scatter-add gather transpose (~350x at 1.88M-row scale; ops/segment.py).
    return take(x, jnp.asarray(idx))


def edge_vectors(
    graph: GraphBatch,
    positions: jnp.ndarray,
    lattice: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Pair vectors r_e = pos[dst] + shift @ lattice[graph] - pos[src].

    Geometry lives *outside* the differentiated energy core: the energy depends
    on atomic positions and the cell only through these edge vectors, so one
    VJP with respect to them yields both forces and the PBC virial stress
    (pair-force form, /root/reference/docs/gradient.md:40-84) without
    backpropagating through gather-heavy coordinate transforms.
    """
    dtype = positions.dtype
    if lattice is None:
        lattice = jnp.asarray(graph.lattice, dtype=dtype)
    edge_graph = _gather(jnp.asarray(graph.node_graph), graph.edge_src)
    lat_e = _gather(lattice.astype(dtype), edge_graph)  # (E, 3, 3)
    shift_vec = jnp.einsum("ep,epq->eq", jnp.asarray(graph.edge_cell_shift, dtype=dtype), lat_e)
    return _gather(positions, graph.edge_dst) + shift_vec - _gather(positions, graph.edge_src)


def edge_vectors_fm(
    graph: GraphBatch,
    positions: jnp.ndarray,
    lattice: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Feature-major :func:`edge_vectors`: (3, E) pair vectors.

    Every E-scale intermediate is rank-1 or (k, E) with E on TPU lanes —
    the entity-major (E, 3) form is physically padded to (E, 128) by the
    (8, 128) tile, a 42x HBM blowup this layout avoids. Only the tiny
    (N, 3) / (B, 3, 3) host inputs are transposed.
    """
    dtype = positions.dtype
    if lattice is None:
        lattice = jnp.asarray(graph.lattice, dtype=dtype)
    pos_fm = positions.T  # (3, N) — N-scale, cheap
    edge_graph = _gather(jnp.asarray(graph.node_graph), graph.edge_src)  # (E,)
    lat_fm = lattice.astype(dtype).reshape(-1, 9).T  # (9, B) tiny
    lat_e = take_fm(lat_fm, edge_graph)  # (9, E): rows are lattice[p, q]
    shift_fm = jnp.asarray(graph.edge_cell_shift, dtype=dtype).T  # (3, E)
    shift_vec = jnp.stack(
        [
            sum(shift_fm[p] * lat_e[3 * p + q] for p in range(3))
            for q in range(3)
        ],
        axis=0,
    )  # (3, E)
    return (
        take_fm(pos_fm, graph.edge_dst) + shift_vec - take_fm(pos_fm, graph.edge_src)
    )


class M3GNet(nn.Module):
    """Energy model: GraphBatch (+ edge vectors) -> per-graph total energy.

    Consumes precomputed edge vectors (see :func:`edge_vectors`) so force and
    stress computation can differentiate with respect to them directly.
    """

    cutoff: float = 5.0
    threebody_cutoff: float = 4.0
    l_max: int = 3
    n_max: int = 3
    num_types: int = 95
    embedding_dim: int = 64
    num_blocks: int = 3
    # Fixed (non-trainable) per-species reference energies and scales,
    # mirroring AtomRef + energy/length scaling (build.py:30-36, readout.py:46-56).
    elemental_energies: tuple = ()
    energy_scale: float = 1.0
    length_scale: float = 1.0
    # When set, node features live sharded over this mesh axis (graph
    # parallelism): node-feature reads through *global* ids (edge_dst, the
    # triplet k-node) go through an all_gather halo exchange, whose gradient
    # transposes to an efficient psum_scatter over ICI. Edge sources must be
    # shard-local ids; see parallel/graph_shard.py.
    halo_axis: Optional[str] = None
    # Optional low-precision compute: "bfloat16" runs featurization and MLPs
    # in bf16 (MXU native); geometry/basis and the energy sum stay in the
    # input dtype. None = compute in the input dtype (full parity).
    compute_dtype: Optional[str] = None
    # Rematerialize the three-body message stage in the backward pass instead
    # of storing (T, l*n) intermediates — trades cheap recompute for HBM.
    remat_triplets: bool = False
    # Fused Pallas triplet stage (ops/pallas_fused_triplet.py): gate gather +
    # basis product + segment sum in one kernel, T-scale data touched once.
    # Composes with the gp halo path (gate all_gather'd first, kernel local).
    fused_triplets: bool = False
    # Factorized three-body stage: the Legendre addition theorem
    # P_l(cos theta_jik) = sum_m C_lm(u_ij) C_lm(u_ik) turns the per-triplet
    # angular basis into a product of per-EDGE real harmonics, so the whole
    # T-scale stage becomes one E->N segment sum + one N->E gather of
    # (l_max^2 * n_max)-wide dense features per block — O(E) instead of O(T),
    # MXU/VPU-friendly, and mathematically IDENTICAL to the gather path
    # (ordered j!=k triplets are recovered by subtracting the analytic j=k
    # diagonal; fc(r)=0 beyond the 3-body cutoff makes the full-neighbor sum
    # match the cutoff-restricted triplet enumeration exactly).
    # Takes precedence over fused_triplets.
    factorized_triplets: bool = False
    # Activation layout: "em" (entity-major (E, F), the parity layout) or
    # "fm" (feature-major (F, E)). TPU tiles are (8 sublanes, 128 lanes) with
    # the minor-most axis on lanes, so em arrays with F < 128 are physically
    # lane-padded 128/F-fold in HBM (2x at D = 64, 4.7x at l^2*n = 27, 42x
    # for xyz rows); fm puts the huge E/N axis on lanes and the small feature
    # axis on sublanes (padding only to a multiple of 8). Parameter trees are
    # identical between layouts (DenseFM mirrors nn.Dense), so checkpoints
    # are interchangeable. fm requires factorized_triplets, consumes (3, E)
    # edge vectors (see :func:`edge_vectors_fm`), and composes with
    # halo_axis: node-feature reads through extended-local ids go through the
    # feature-major halo exchange (node COLUMNS; ops/halo.halo_exchange_fm).
    layout: str = "em"
    # Profiling-only: drop the three-body stage entirely (used by
    # benchmarks/ablate_step.py to attribute step time between the triplet
    # and conv stages; param tree differs, never for real models).
    skip_threebody: bool = False
    # Evaluate each GatedMLP's twin first-layer matmuls as one doubled-width
    # matmul (bit-identical, same params; full-width MXU pass + single read
    # of the concat input). Off only for A/B measurement.
    fuse_gated_mlp: bool = True
    # Fused Pallas kernels for the factorized three-body stage in the fm
    # layout (ops/pallas_factorized_stage.py): the (MN, E) expanded product /
    # gather intermediates never touch HBM. Requires layout="fm"; falls back
    # to the XLA path when the resident accumulator would not fit VMEM.
    fused_factorized_stage: bool = False
    # Extend the fusion to every GatedMLP layer: later twin matmuls run as
    # one block-diagonal doubled-width pass and the twin stacks never split
    # until the output (models/layers.py GatedMLP.fuse_second). Same math and
    # param tree (fp reassociation only); full-width MXU tiles at D = 64. Opt-in pending a
    # quiet-window A/B on the shared chip (docs/benchmark.md).
    fuse_gated_second: bool = False
    # Optional chi-normalization override: flattened (l_max * n_max) floats
    # replacing ops/basis.chi_norm_constants. Used by the parity harness to
    # reproduce the torch reference's LITERAL (buggy, ~1e-12) normalization —
    # see ops/basis.reference_literal_chi_norm and docs/reference_parity.md.
    chi_norm: tuple = ()

    @nn.compact
    def __call__(
        self,
        graph: GraphBatch,
        r_vec: jnp.ndarray,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        if self.layout == "fm":
            if not self.factorized_triplets:
                raise ValueError("layout='fm' requires factorized_triplets")
            if r_vec.shape[0] != 3:
                raise ValueError(
                    "layout='fm' consumes FEATURE-MAJOR (3, E) edge vectors "
                    f"(got {r_vec.shape}); build them with edge_vectors_fm"
                )
            return self._forward_fm(graph, r_vec)
        if r_vec.shape[-1] != 3:
            raise ValueError(
                "layout='em' consumes (E, 3) edge vectors "
                f"(got {r_vec.shape}); build them with edge_vectors"
            )
        return self._forward_em(graph, r_vec)

    def _forward_em(
        self,
        graph: GraphBatch,
        r_vec: jnp.ndarray,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        dtype = r_vec.dtype
        d = self.embedding_dim
        ln = self.l_max * self.n_max
        rc = self.cutoff / self.length_scale
        rc3 = self.threebody_cutoff / self.length_scale

        def extend_nodes(x):
            """Make remote node rows addressable under graph parallelism.

            With a halo plan in the batch: boundary-only all_to_all exchange
            (comm ∝ cut size, ops/halo.py) producing the extended-local array
            that edge_dst / triplet_node_k index. Without one: legacy full
            all_gather (global-id addressing)."""
            if graph.halo_send_idx is not None:
                return halo_exchange(
                    x, graph.halo_send_idx, graph.halo_recv_idx,
                    graph.halo_offsets, self.halo_axis,
                )
            return jax.lax.all_gather(x, self.halo_axis, axis=0, tiled=True)

        def gather_nodes(x, idx):
            if self.halo_axis is None:
                return _gather(x, idx)
            return _gather(extend_nodes(x), idx)

        node_mask = graph.node_mask.astype(dtype)  # (N,)
        edge_mask = graph.edge_mask.astype(dtype)  # (E,)
        trip_mask = graph.triplet_mask.astype(dtype)  # (T,)
        graph_mask = graph.graph_mask.astype(dtype)  # (B,)

        # --- geometry (invariant.py:20-59) -------------------------------
        r_vec = r_vec / self.length_scale
        # Grad-safe masked norm: padded edges get distance rc (not 0).
        sq = jnp.sum(r_vec * r_vec, axis=-1)
        sq_safe = jnp.where(graph.edge_mask, sq, 1.0)
        dist = jnp.where(graph.edge_mask, jnp.sqrt(sq_safe), rc)  # (E,)

        if self.factorized_triplets:
            cos_jik = None  # no T-scale geometry: angles factorize per edge
        elif self.fused_triplets and dtype == jnp.float32:
            # T-scale geometry reads through the windowed Pallas gather: XLA
            # lowers narrow-row gathers AND their gradient transposes
            # (scatter-adds on the force path) to serial row-at-a-time loops
            # that dominate the whole step (~16 ms at MPF scale, round-2
            # profile). Feature-major packing [x, y, z, dist] keeps the T
            # axis on lanes; cos is formed from feature rows so the (T, 3)
            # entity-major vectors never materialize.
            from torch_m3gnet_tpu.ops.pallas_windowed_take import (
                windowed_take_fm,
            )

            geom_fm = jnp.concatenate([r_vec.T, dist[None, :]], axis=0)  # (4, E)
            g1 = windowed_take_fm(geom_fm, jnp.asarray(graph.triplet_e1))
            g2 = windowed_take_fm(geom_fm, jnp.asarray(graph.triplet_e2))
            rij, rik = g1[3], g2[3]  # (T,)
            cos_jik = jnp.sum(g1[:3] * g2[:3], axis=0) / (rij * rik)
        else:
            vij = _gather(r_vec, graph.triplet_e1)  # (T, 3)
            vik = _gather(r_vec, graph.triplet_e2)
            rij = _gather(dist, graph.triplet_e1)  # (T,)
            rik = _gather(dist, graph.triplet_e2)
            cos_jik = jnp.sum(vij * vik, axis=-1) / (rij * rik)
        if cos_jik is not None:
            cos_jik = jnp.clip(cos_jik, -1.0, 1.0)  # (invariant.py:40)

        # --- featurization ------------------------------------------------
        # AtomFeaturizer (featurizer.py:11-38): one-hot @ W == embedding table.
        cdtype0 = jnp.dtype(self.compute_dtype) if self.compute_dtype else dtype
        embed = nn.Embed(self.num_types, d, name="atom_embed", dtype=cdtype0)
        v = embed(graph.atom_types)  # (N, D)

        # EdgeFeaturizer (featurizer.py:41-100): smooth radial basis (computed
        # in the geometry dtype, then cast to the compute dtype for the MLPs).
        edge_weights = smooth_radial_basis(dist, self.n_max, rc).astype(cdtype0)  # (E, n_max)

        # EdgeAdjustor (featurizer.py:103-132).
        e = nn.silu(
            nn.Dense(d, use_bias=False, name="edge_init")(edge_weights)
        )  # (E, D)

        sph_norm = np.array(
            [math.sqrt((2 * ell + 1) / (4.0 * math.pi)) for ell in range(self.l_max)]
        )
        chi_norm = (
            np.asarray(self.chi_norm, dtype=np.float64).reshape(
                self.l_max, self.n_max
            )
            if self.chi_norm
            else None
        )

        # --- interaction blocks ------------------------------------------
        if self.factorized_triplets:
            # Factorized three-body stage (see class docstring): per-edge
            # factors only — NOTHING at T scale. For edge e = i->j,
            #   out[e,(l,n)] = fc(r_e) c_l ( sum_m C_lm(u_e) A[i,(l,m,n)]
            #                                - chi_ln(r_e) fc(r_e) gate[j,(l,n)] )
            #   A[i,(l,m,n)] = sum_{e'=i->k} C_lm(u_e') chi_ln(r_e') fc(r_e')
            #                   gate[k,(l,n)]
            # with c_l = sqrt((2l+1)/4pi); the subtracted term is the j = k
            # diagonal (P_l(1) = 1) excluded by the triplet enumeration
            # (data/triplets.py: ordered pairs of DISTINCT edges).
            u_hat = r_vec / dist[:, None]  # padded rows: dist = rc > 0
            sh = real_racah_harmonics(u_hat, self.l_max)  # (E, M), M = l_max^2
            chi_e = normalized_spherical_bessel_tmajor(
                dist, rc, self.l_max, self.n_max, norm_override=chi_norm
            )  # (E, l, n)
            fc_e = cutoff_poly(dist, rc3) * edge_mask  # (E,)
            chifc = chi_e * fc_e[:, None, None]  # (E, l, n)
            l_idx = racah_l_index(self.l_max)  # (M,) degree of each component
            ends = np.cumsum([2 * ell + 1 for ell in range(self.l_max)])
            # Basis factors computed in the geometry dtype (the r_vec VJP flows
            # through them), then cast once: the stage itself runs in the
            # compute dtype, consistent with the gather/fused paths' basis_t
            # cast (bf16 keeps the full HBM/VPU win; parity covered by
            # tests/test_perf_options.py::test_bfloat16_factorized_close_to_f32).
            sh = sh.astype(cdtype0)
            chifc = chifc.astype(cdtype0)
            fcn_e = (fc_e[:, None, None] * sph_norm[None, :, None]).astype(cdtype0)

            def triplet_aggregate(_, gate):
                gate_e = gather_nodes(gate, graph.edge_dst)
                gate_e = gate_e.reshape(-1, self.l_max, self.n_max).astype(cdtype0)
                g = chifc * gate_e  # (E, l, n)
                w = sh[:, :, None] * g[:, l_idx, :]  # (E, M, n)
                per_node = segment_sum(
                    w.reshape(w.shape[0], -1),
                    graph.edge_src,
                    num_segments=graph.num_nodes,
                    indices_are_sorted=True,
                )  # (N, M*n)
                a_e = _gather(per_node, graph.edge_src).reshape(
                    -1, l_idx.size, self.n_max
                )
                prod = sh[:, :, None] * a_e  # (E, M, n)
                proj = jnp.stack(
                    [
                        prod[:, (ends[ell - 1] if ell else 0) : ends[ell]].sum(axis=1)
                        for ell in range(self.l_max)
                    ],
                    axis=1,
                )  # (E, l, n)
                agg = fcn_e * (proj - g)
                return agg.reshape(-1, ln)

            basis_for_blocks = None
        else:
            # Triplet-constant angular/radial factors (computed once; reference
            # recomputes identical values in every block, interaction.py:187-202).
            # Entity-major layout throughout: the T axis stays on sublanes, the
            # small (l, n) axes on lanes — no (l*n, T) -> (T, l*n) transpose.
            fc = cutoff_poly(rij, rc3) * cutoff_poly(rik, rc3)  # (T,)
            sph_t = legendre_cos_tmajor(cos_jik, self.l_max) * sph_norm  # (T, l)
            chi_t = normalized_spherical_bessel_tmajor(
                rik, rc, self.l_max, self.n_max, norm_override=chi_norm
            )  # (T, l, n)
            basis_t = (chi_t * sph_t[:, :, None] * fc[:, None, None]).reshape(-1, ln)
            basis_t = basis_t * trip_mask[:, None]

            basis_t = basis_t.astype(cdtype0)

            # node k of i->k — precomputed at pack time when available (the
            # T-scale int gather costs ~8 ms/step on v5e if re-derived per step)
            if graph.triplet_node_k is not None:
                node_k = jnp.asarray(graph.triplet_node_k)
            else:
                node_k = _gather(graph.edge_dst, graph.triplet_e2)

        if self.factorized_triplets:
            pass
        elif self.fused_triplets:
            from torch_m3gnet_tpu.ops.pallas_fused_triplet import (
                fused_triplet_gate_sum,
            )

            # Feature-major basis (XLA folds the transpose into the
            # elementwise producer above); the kernel runs in f32.
            basis_fm = basis_t.T.astype(jnp.float32)  # (l*n, T)
            e1 = jnp.asarray(graph.triplet_e1)
            e2 = jnp.asarray(graph.triplet_e2)

            def triplet_aggregate(basis, gate):
                # gate pre-gathered node->edge (E-scale, cheap); the kernel's
                # T-scale e2 access is then window-local by the triplet
                # enumeration invariant. Under graph parallelism the gate is
                # halo-exchanged first, exactly like gather_nodes — the kernel
                # itself stays shard-local.
                if self.halo_axis is not None:
                    gate = extend_nodes(gate)
                gate_e_fm = _gather(gate, graph.edge_dst).T.astype(jnp.float32)
                out_fm = fused_triplet_gate_sum(
                    basis, gate_e_fm, e1, e2, graph.num_edges
                )
                return out_fm.T.astype(cdtype0)  # (E, l*n)

            basis_for_blocks = basis_fm
        else:
            def triplet_aggregate(basis, gate):
                msg = basis * gather_nodes(gate, node_k)  # (T, l*n)
                return segment_sum(
                    msg, graph.triplet_e1, num_segments=graph.num_edges,
                    indices_are_sorted=True,  # triplets are enumerated per edge
                )  # (E, l*n)

            basis_for_blocks = basis_t

        if self.remat_triplets:
            triplet_aggregate = jax.checkpoint(triplet_aggregate)

        for b in range(self.num_blocks):
            # ThreeBodyInteraction (interaction.py:138-223)
            if not self.skip_threebody:
                gate = nn.sigmoid(
                    nn.Dense(ln, name=f"three_gate_{b}")(v)
                )  # (N, l*n)
                agg = triplet_aggregate(basis_for_blocks, gate)
                e = e + GatedMLP([d], use_bias=False, fuse_first=self.fuse_gated_mlp, fuse_second=self.fuse_gated_second, name=f"three_mlp_{b}")(agg)

            # M3GNetConv (conv.py:12-97)
            vi = _gather(v, graph.edge_src)
            vj = gather_nodes(v, graph.edge_dst)
            concat = jnp.concatenate([vi, vj, e], axis=-1)  # (E, 3D)
            e = e + GatedMLP([d, d], fuse_first=self.fuse_gated_mlp, fuse_second=self.fuse_gated_second, name=f"conv_edge_{b}")(concat) * nn.Dense(
                d, use_bias=False, name=f"conv_edge_w_{b}"
            )(edge_weights)

            concat = jnp.concatenate([vi, vj, e], axis=-1)
            node_msg = GatedMLP([d, d], fuse_first=self.fuse_gated_mlp, fuse_second=self.fuse_gated_second, name=f"conv_node_{b}")(concat) * nn.Dense(
                d, use_bias=False, name=f"conv_node_w_{b}"
            )(edge_weights)
            node_msg = node_msg * edge_mask[:, None]
            v = v + segment_sum(
                node_msg,
                graph.edge_src,
                num_segments=graph.num_nodes,
                indices_are_sorted=True,
            )

        # --- readout (readout.py:12-58): accumulate energies in the geometry
        # dtype even under bf16 compute.
        atomic = GatedMLP([d, d, 1], is_output=True, fuse_first=self.fuse_gated_mlp, fuse_second=self.fuse_gated_second, name="readout")(v)[:, 0]
        atomic = atomic.astype(dtype)  # (N,)
        elem = jnp.asarray(
            np.asarray(self.elemental_energies, dtype=np.float64)
            if len(self.elemental_energies)
            else np.zeros(self.num_types),
            dtype=dtype,
        )
        scaled_atomic = _gather(elem, graph.atom_types) / self.energy_scale + atomic
        scaled_atomic = scaled_atomic * node_mask
        scaled_total = segment_sum(
            scaled_atomic, graph.node_graph, num_segments=graph.num_graphs,
            indices_are_sorted=True,
        )
        total = self.energy_scale * scaled_total * graph_mask  # (B,) eV
        atomic_ev = self.energy_scale * scaled_atomic  # (N,) eV
        return total, atomic_ev

    def _forward_fm(
        self,
        graph: GraphBatch,
        r_vec_fm: jnp.ndarray,  # (3, E)
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Feature-major forward: mathematically identical to the em
        factorized path (same parameters, same contraction order per Dense),
        with every E/N-scale activation carried as (F, entities)."""
        dtype = r_vec_fm.dtype
        d = self.embedding_dim
        ln = self.l_max * self.n_max
        m_sz = self.l_max * self.l_max
        rc = self.cutoff / self.length_scale
        rc3 = self.threebody_cutoff / self.length_scale

        node_mask = graph.node_mask.astype(dtype)  # (N,)
        edge_mask = graph.edge_mask.astype(dtype)  # (E,)
        graph_mask = graph.graph_mask.astype(dtype)  # (B,)

        def extend_nodes_fm(x_fm):
            """fm counterpart of the em ``extend_nodes``: make remote node
            COLUMNS addressable under graph parallelism (boundary-only
            ppermutes with a halo plan, legacy all_gather of columns
            otherwise)."""
            if graph.halo_send_idx is not None:
                return halo_exchange_fm(
                    x_fm, graph.halo_send_idx, graph.halo_recv_idx,
                    graph.halo_offsets, self.halo_axis,
                )
            return jax.lax.all_gather(x_fm, self.halo_axis, axis=1, tiled=True)

        def gather_nodes_fm(x_fm, idx):
            if self.halo_axis is None:
                return take_fm(x_fm, idx)
            return take_fm(extend_nodes_fm(x_fm), idx)

        # --- geometry -----------------------------------------------------
        r_fm = r_vec_fm / self.length_scale
        sq = jnp.sum(r_fm * r_fm, axis=0)
        sq_safe = jnp.where(graph.edge_mask, sq, 1.0)
        dist = jnp.where(graph.edge_mask, jnp.sqrt(sq_safe), rc)  # (E,)

        # --- featurization ------------------------------------------------
        cdtype0 = jnp.dtype(self.compute_dtype) if self.compute_dtype else dtype
        embed = nn.Embed(self.num_types, d, name="atom_embed", dtype=cdtype0)
        v_fm = embed(graph.atom_types).T  # (D, N) — N-scale transpose, cheap

        ew_fm = smooth_radial_basis_fm(dist, self.n_max, rc).astype(cdtype0)  # (n, E)
        e_fm = nn.silu(
            DenseFM(d, use_bias=False, name="edge_init")(ew_fm)
        )  # (D, E)

        sph_norm = np.array(
            [math.sqrt((2 * ell + 1) / (4.0 * math.pi)) for ell in range(self.l_max)]
        )

        chi_norm = (
            np.asarray(self.chi_norm, dtype=np.float64).reshape(
                self.l_max, self.n_max
            )
            if self.chi_norm
            else None
        )

        # --- factorized three-body stage (fm) -----------------------------
        u_fm = r_fm / dist[None, :]  # (3, E); padded rows: dist = rc > 0
        sh_fm = real_racah_harmonics_fm(u_fm, self.l_max)  # (M, E)
        chi_fm = normalized_spherical_bessel(
            dist, rc, self.l_max, self.n_max, norm_override=chi_norm
        )  # (l, n, E)
        fc_e = cutoff_poly(dist, rc3) * edge_mask  # (E,)
        chifc_fm = chi_fm * fc_e[None, None, :]  # (l, n, E)
        l_idx = racah_l_index(self.l_max)  # (M,)
        ends = np.cumsum([2 * ell + 1 for ell in range(self.l_max)])
        sh_fm = sh_fm.astype(cdtype0)
        chifc_fm = chifc_fm.astype(cdtype0)
        fcn_fm = (fc_e[None, None, :] * sph_norm[:, None, None]).astype(cdtype0)

        # Fused-kernel path: the (MN, E) expanded product / gather
        # intermediates stay in VMEM (ops/pallas_factorized_stage.py); used
        # when enabled AND the resident accumulator fits the VMEM budget.
        use_fused_stage = False
        if self.fused_factorized_stage:
            from torch_m3gnet_tpu.ops.pallas_factorized_stage import (
                VMEM_RESIDENT_BYTES,
                _n_pad,
                q_scatter,
                r1_gather,
            )

            mnp = -(-(m_sz * self.n_max) // 8) * 8
            use_fused_stage = (
                mnp * _n_pad(graph.num_nodes) * 4 <= VMEM_RESIDENT_BYTES
            )

        if use_fused_stage:
            chifc_flat = chifc_fm.reshape(ln, -1)
            # fcn_fm is broadcastable (l, 1, E); expand to (l, n, E) rows
            fcn_flat = jnp.broadcast_to(
                fcn_fm, (self.l_max, self.n_max, fcn_fm.shape[-1])
            ).reshape(ln, -1)
            src = jnp.asarray(graph.edge_src)

            def triplet_aggregate(gate_fm):
                gate_e = gather_nodes_fm(gate_fm, graph.edge_dst)  # (ln, E)
                g = chifc_flat * gate_e.astype(cdtype0)  # (ln, E)
                a = q_scatter(
                    sh_fm, g, src, graph.num_nodes, self.l_max, self.n_max
                )
                proj = r1_gather(
                    a, sh_fm, src, graph.num_edges, self.l_max, self.n_max
                )
                return (fcn_flat * (proj.astype(cdtype0) - g)).reshape(ln, -1)

        else:
            def triplet_aggregate(gate_fm):
                gate_e = gather_nodes_fm(gate_fm, graph.edge_dst)  # (ln, E)
                gate_e = gate_e.reshape(self.l_max, self.n_max, -1).astype(cdtype0)
                g = chifc_fm * gate_e  # (l, n, E)
                w = sh_fm[:, None, :] * g[l_idx]  # (M, n, E)
                per_node = segment_sum_fm(
                    w.reshape(m_sz * self.n_max, -1),
                    graph.edge_src,
                    graph.num_nodes,
                    True,  # edges are sorted by source node
                )  # (M*n, N)
                a_e = take_fm(per_node, graph.edge_src).reshape(
                    m_sz, self.n_max, -1
                )
                prod = sh_fm[:, None, :] * a_e  # (M, n, E)
                proj = jnp.stack(
                    [
                        prod[(ends[ell - 1] if ell else 0) : ends[ell]].sum(axis=0)
                        for ell in range(self.l_max)
                    ],
                    axis=0,
                )  # (l, n, E)
                agg = fcn_fm * (proj - g)
                return agg.reshape(ln, -1)

        if self.remat_triplets:
            triplet_aggregate = jax.checkpoint(triplet_aggregate)

        # --- interaction blocks -------------------------------------------
        for b in range(self.num_blocks):
            # skip_threebody honored exactly like the em path so fm ablations
            # attribute the triplet stage correctly (benchmarks/ablate_step.py)
            if not self.skip_threebody:
                gate_fm = nn.sigmoid(
                    DenseFM(ln, name=f"three_gate_{b}")(v_fm)
                )  # (ln, N)
                agg_fm = triplet_aggregate(gate_fm)
                e_fm = e_fm + GatedMLPFM([d], use_bias=False, fuse_first=self.fuse_gated_mlp, fuse_second=self.fuse_gated_second, name=f"three_mlp_{b}")(
                    agg_fm
                )

            vi = take_fm(v_fm, graph.edge_src)
            vj = gather_nodes_fm(v_fm, graph.edge_dst)
            concat = jnp.concatenate([vi, vj, e_fm], axis=0)  # (3D, E)
            e_fm = e_fm + GatedMLPFM([d, d], fuse_first=self.fuse_gated_mlp, fuse_second=self.fuse_gated_second, name=f"conv_edge_{b}")(
                concat
            ) * DenseFM(d, use_bias=False, name=f"conv_edge_w_{b}")(ew_fm)

            concat = jnp.concatenate([vi, vj, e_fm], axis=0)
            node_msg = GatedMLPFM([d, d], fuse_first=self.fuse_gated_mlp, fuse_second=self.fuse_gated_second, name=f"conv_node_{b}")(
                concat
            ) * DenseFM(d, use_bias=False, name=f"conv_node_w_{b}")(ew_fm)
            node_msg = node_msg * edge_mask[None, :]
            v_fm = v_fm + segment_sum_fm(
                node_msg, graph.edge_src, graph.num_nodes, True
            )

        # --- readout ------------------------------------------------------
        atomic = GatedMLPFM([d, d, 1], is_output=True, fuse_first=self.fuse_gated_mlp, fuse_second=self.fuse_gated_second, name="readout")(v_fm)[0]
        atomic = atomic.astype(dtype)  # (N,)
        elem = jnp.asarray(
            np.asarray(self.elemental_energies, dtype=np.float64)
            if len(self.elemental_energies)
            else np.zeros(self.num_types),
            dtype=dtype,
        )
        scaled_atomic = _gather(elem, graph.atom_types) / self.energy_scale + atomic
        scaled_atomic = scaled_atomic * node_mask
        scaled_total = segment_sum(
            scaled_atomic, graph.node_graph, num_segments=graph.num_graphs,
            indices_are_sorted=True,
        )
        total = self.energy_scale * scaled_total * graph_mask  # (B,) eV
        atomic_ev = self.energy_scale * scaled_atomic  # (N,) eV
        return total, atomic_ev


def _voigt(t: jnp.ndarray) -> jnp.ndarray:
    """(B, 3, 3) -> (B, 6) in the reference's order [xx, yy, zz, yz, zx, xy]
    (gradient.py:50-58)."""
    return jnp.stack(
        [t[:, 0, 0], t[:, 1, 1], t[:, 2, 2], t[:, 1, 2], t[:, 2, 0], t[:, 0, 1]],
        axis=-1,
    )


class M3GNetPotential:
    """Energy/forces/stress head from ONE VJP with respect to edge vectors.

    The energy depends on geometry only through the pair vectors r_e, so with
    g_e = dE/dr_e from a single backward pass:

    - forces (parity with the ``Gradient`` wrapper,
      /root/reference/src/torch_m3gnet/nn/gradient.py:25-64):
      F_i = -dE/dpos_i = sum_{e: src=e=i} g_e - sum_{e: dst=e=i} g_e
      (two segment sums);
    - stress ``"strain"`` mode (default): the PBC virial in pair-force form
      (math: /root/reference/docs/gradient.md:40-84),
      sigma V = sym( sum_e r_e (x) g_e ) per graph — identical to the strain
      derivative dE/d eps for E depending only on pair vectors;
    - stress ``"virial"`` mode: the reference's gauge-dependent
      sum_i r_i (x) F_i / V (gradient.py:40-62), kept for parity only.

    Grad-of-grad for force/stress losses comes free from composing jax.grad.
    """

    def __init__(
        self,
        model: M3GNet,
        stress_mode: str = "strain",
        matmul_precision: str = "default",
    ):
        if stress_mode not in ("strain", "virial"):
            raise ValueError(f"unknown stress_mode: {stress_mode}")
        self.model = model
        self.stress_mode = stress_mode
        self.matmul_precision = matmul_precision

        def japply(params, graph):
            # "default" lets TPU f32 matmuls ingest bf16 on the MXU (fast,
            # ~4e-3 relative); "highest" forces full-f32 (f32x3) passes.
            with jax.default_matmul_precision(self.matmul_precision):
                return self._apply(params, graph)

        self._japply = jax.jit(japply)

    def init(self, rng, graph: GraphBatch):
        positions = jnp.asarray(graph.positions)
        if self.model.layout == "fm":
            return self.model.init(rng, graph, edge_vectors_fm(graph, positions))
        return self.model.init(rng, graph, edge_vectors(graph, positions))

    def apply(self, params, graph: GraphBatch) -> PotentialOutput:
        """Compiled potential evaluation (cached per padded shape bucket)."""
        return self._japply(params, graph)

    def _apply(self, params, graph: GraphBatch) -> PotentialOutput:
        if self.model.layout == "fm":
            return self._apply_fm(params, graph)
        positions = jnp.asarray(graph.positions)
        lattice = jnp.asarray(graph.lattice, dtype=positions.dtype)
        nb = graph.num_graphs
        r_vec = edge_vectors(graph, positions, lattice)

        def energy_fn(rv):
            total, atomic = self.model.apply(params, graph, rv)
            return jnp.sum(total), (total, atomic)

        g_r, (energy, atomic) = jax.grad(energy_fn, has_aux=True)(r_vec)  # (E, 3)

        nmask = graph.node_mask.astype(g_r.dtype)[:, None]
        forces = (
            segment_sum(g_r, graph.edge_src, num_segments=graph.num_nodes,
                        indices_are_sorted=True)
            - segment_sum(g_r, graph.edge_dst, num_segments=graph.num_nodes)
        ) * nmask

        volumes = jnp.abs(
            jnp.sum(lattice[:, 0] * jnp.cross(lattice[:, 1], lattice[:, 2]), axis=-1)
        )
        gmask = graph.graph_mask.astype(g_r.dtype)
        edge_graph = _gather(jnp.asarray(graph.node_graph), graph.edge_src)
        if self.stress_mode == "strain":
            outer = r_vec[:, :, None] * g_r[:, None, :]  # (E, 3, 3)
            per_graph = segment_sum(
                outer.reshape(-1, 9), edge_graph, num_segments=nb,
                indices_are_sorted=True,
            ).reshape(-1, 3, 3)
            per_graph = 0.5 * (per_graph + jnp.swapaxes(per_graph, -1, -2))
        else:
            outer = positions[:, :, None] * forces[:, None, :]  # (N, 3, 3)
            per_graph = segment_sum(
                outer.reshape(-1, 9), graph.node_graph, num_segments=nb
            ).reshape(-1, 3, 3)
        stress = _voigt(per_graph) / volumes[:, None] * gmask[:, None]

        n_node = jnp.maximum(jnp.asarray(graph.n_node), 1)
        return PotentialOutput(
            energy=energy,
            forces=forces,
            stress=stress,
            energy_per_atom=energy / n_node.astype(energy.dtype),
            atomic_energy=atomic,
        )

    def _apply_fm(self, params, graph: GraphBatch) -> PotentialOutput:
        """Feature-major head: one VJP with respect to the (3, E) edge
        vectors; forces/stress assembled from (3, E)/(9, E) rows so no
        E-scale array ever materializes in the lane-padded (E, 3) layout."""
        positions = jnp.asarray(graph.positions)
        lattice = jnp.asarray(graph.lattice, dtype=positions.dtype)
        nb = graph.num_graphs
        r_fm = edge_vectors_fm(graph, positions, lattice)  # (3, E)

        def energy_fn(rv_fm):
            total, atomic = self.model.apply(params, graph, rv_fm)
            return jnp.sum(total), (total, atomic)

        g_fm, (energy, atomic) = jax.grad(energy_fn, has_aux=True)(r_fm)  # (3, E)

        nmask = graph.node_mask.astype(g_fm.dtype)[None, :]
        forces_fm = (
            segment_sum_fm(g_fm, graph.edge_src, graph.num_nodes, True)
            - segment_sum_fm(g_fm, graph.edge_dst, graph.num_nodes, False)
        ) * nmask  # (3, N)
        forces = forces_fm.T  # N-scale transpose, cheap

        volumes = jnp.abs(
            jnp.sum(lattice[:, 0] * jnp.cross(lattice[:, 1], lattice[:, 2]), axis=-1)
        )
        gmask = graph.graph_mask.astype(g_fm.dtype)
        edge_graph = _gather(jnp.asarray(graph.node_graph), graph.edge_src)
        if self.stress_mode == "strain":
            outer_fm = (r_fm[:, None, :] * g_fm[None, :, :]).reshape(9, -1)
            per_graph = segment_sum_fm(
                outer_fm, edge_graph, nb, True
            ).T.reshape(-1, 3, 3)  # (B, 3, 3): B-scale, cheap
            per_graph = 0.5 * (per_graph + jnp.swapaxes(per_graph, -1, -2))
        else:
            outer = positions[:, :, None] * forces[:, None, :]  # (N, 3, 3)
            per_graph = segment_sum(
                outer.reshape(-1, 9), graph.node_graph, num_segments=nb
            ).reshape(-1, 3, 3)
        stress = _voigt(per_graph) / volumes[:, None] * gmask[:, None]

        n_node = jnp.maximum(jnp.asarray(graph.n_node), 1)
        return PotentialOutput(
            energy=energy,
            forces=forces,
            stress=stress,
            energy_per_atom=energy / n_node.astype(energy.dtype),
            atomic_energy=atomic,
        )


def build_model(config, elemental_energies=None, energy_scale: float = 1.0,
                length_scale: float = 1.0, stress_mode: str = "strain",
                matmul_precision: str | None = None,
                chi_norm_override=None) -> M3GNetPotential:
    """Assemble a potential from a config (parity: build.py:16-83).

    ``chi_norm_override``: optional (l_max, n_max) chi normalization constants
    (see ops/basis.reference_literal_chi_norm; parity harness only).
    """
    if matmul_precision is None:
        matmul_precision = getattr(config, "matmul_precision", "default")
    pallas = getattr(config, "pallas_segment", "auto")
    if pallas == "on":
        from torch_m3gnet_tpu.ops import segment as _seg

        _seg.enable_pallas(True)
    elif pallas == "off":
        from torch_m3gnet_tpu.ops import segment as _seg

        _seg.enable_pallas(False)

    compute_dtype = getattr(config, "compute_dtype", "float32")
    # The platform the model will actually run on: an explicitly pinned
    # default device wins over the backend priority list (the CPU test
    # environment pins CPU while the TPU plugin is still registered).
    pinned = jax.config.jax_default_device
    platform = pinned.platform if pinned is not None else jax.default_backend()
    mode = getattr(config, "threebody_mode", "auto")
    fused = getattr(config, "fused_triplets", "auto")
    if mode == "auto":
        if fused != "auto":
            # Legacy knob set explicitly: honor it.
            mode = "fused" if fused == "on" else "gather"
        else:
            mode = "factorized" if platform == "tpu" else "gather"
    if mode not in ("gather", "fused", "factorized"):
        raise ValueError(f"unknown threebody_mode: {mode}")
    fused = "on" if mode == "fused" else "off"
    layout = getattr(config, "layout", "auto")
    if layout == "auto":
        # fm + fuse_gated_second measured 0.72-0.84x paired step ratio vs the
        # round-3 default across two independent epochs (docs/benchmark.md
        # round 4) — the first reproducible fm win, so auto now resolves to
        # fm exactly where it is supported and fastest: TPU + factorized
        # three-body. Elsewhere (CPU tests, gather/fused modes) em remains.
        layout = "fm" if (platform == "tpu" and mode == "factorized") else "em"
    if layout == "fm" and mode != "factorized":
        raise ValueError("layout='fm' requires threebody_mode='factorized'")
    fused_stage_cfg = getattr(config, "fused_factorized", "off")
    if fused_stage_cfg not in ("on", "off", "auto"):
        # a YAML typo silently resolving to "off" would shed the default
        # perf win with no error (matches the threebody_mode precedent)
        raise ValueError(f"unknown fused_factorized: {fused_stage_cfg!r}")
    if fused_stage_cfg == "auto":
        # resolves with the layout: the kernels exist only in fm, and the
        # kernel call itself still self-gates on the VMEM budget at each
        # batch shape (m3gnet.py use_fused_stage)
        fused_stage = layout == "fm" and platform == "tpu"
    else:
        fused_stage = fused_stage_cfg == "on"
    if fused_stage and layout != "fm":
        raise ValueError("fused_factorized='on' requires the fm layout")
    model = M3GNet(
        cutoff=config.cutoff,
        threebody_cutoff=config.threebody_cutoff,
        l_max=config.l_max,
        n_max=config.n_max,
        num_types=config.num_types,
        embedding_dim=config.embedding_dim,
        num_blocks=config.num_blocks,
        elemental_energies=tuple(elemental_energies or ()),
        energy_scale=energy_scale,
        length_scale=length_scale,
        compute_dtype=None if compute_dtype in ("float32", None) else compute_dtype,
        remat_triplets=getattr(config, "remat_triplets", False),
        fused_triplets=fused == "on",
        factorized_triplets=mode == "factorized",
        layout=layout,
        fused_factorized_stage=fused_stage,
        fuse_gated_second=getattr(config, "fuse_gated_second", False),
        chi_norm=(
            tuple(np.asarray(chi_norm_override, dtype=np.float64).ravel().tolist())
            if chi_norm_override is not None
            else ()
        ),
    )
    return M3GNetPotential(
        model, stress_mode=stress_mode, matmul_precision=matmul_precision
    )

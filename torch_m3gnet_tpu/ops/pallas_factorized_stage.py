"""Fused feature-major Pallas kernels for the FACTORIZED three-body stage.

The factorized stage (models/m3gnet.py `_forward_fm.triplet_aggregate`;
reference semantics: /root/reference/src/torch_m3gnet/nn/interaction.py:
187-223 after the Legendre-addition-theorem rewrite) is, per block,

    g[(l,n), e]  = chifc[(l,n), e] * gate_e[(l,n), e]       (elementwise)
    A[(m,n), i]  = sum_{e: src[e]=i} sh[m, e] * g[(l_m,n), e]   (E -> N)
    proj[(l,n),e]= sum_{m: l_m=l} sh[m, e] * A[(m,n), src[e]]   (N -> E)
    agg          = fcn * (proj - g)                          (elementwise)

with sh the real Racah harmonics (M = l_max^2 rows), g/agg LN = l_max*n_max
rows, A MN = M*n_max rows. Run as XLA ops the middle two lines materialize
the (MN, E) expanded product `w`, the (MN, E) gather `a_e`, and the (M..,E)
`prod` in HBM — ~3x 16 MB per block at the bench operating point. These
kernels keep all MN-wide per-edge intermediates in VMEM:

- ``q_scatter``  computes A in one pass: per 512-edge tile it forms the
  expanded product on the VPU and scatter-adds it into a VMEM-resident
  (MNp, Npad) accumulator via windowed one-hot matmuls (edges are sorted by
  source, so each tile touches one short node window — the same locality
  trick as ops/pallas_fused_triplet.py).
- ``r1_gather``  computes proj: windows of A are contracted back to edge
  tiles with the transposed one-hot, then the per-l row sums happen in VMEM.
- ``r2_gather``  is the companion contraction  out[m,e] =
  sum_n gm[(l_m,n),e] * A[(m,n), src[e]]  (needed only by the VJPs).

**Closure under differentiation** (the property that makes grad-of-grad for
force-loss training work to all orders, same scheme as
pallas_fused_triplet.py): every op is bilinear in its two tensor operands,
and each one's VJP is expressed in terms of the other two:

    dQ/d(sh) = R2(dA, gm),  dQ/d(gm) = R1(dA, sh)
    dR1/d(A) = Q(sh, cot),  dR1/d(sh) = R2(A, cot)
    dR2/d(A) = Q(cot, gm),  dR2/d(gm) = R1(A, cot)

f32 exactness: one-hot matrices are exact in bf16; the data operand of every
MXU contraction is split hi/lo into two bf16 matmuls (x == hi + lo exactly).

The resident accumulator caps the node count: MNp * Npad * 4 bytes must fit
the VMEM budget (~48k padded nodes at l_max=3, n_max=3) — far above any
single-chip batch this model trains on; callers fall back to the XLA path
otherwise (models/m3gnet.py gates the knob).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TE = 512  # edges per tile
WN = 128  # node-window chunk (multiple of 128)

VMEM_RESIDENT_BYTES = 6 * 1024 * 1024  # cap for the (MNp, Npad) A buffer


def _split(x):
    """bf16 hi/lo split: x == hi + lo exactly, both exactly representable."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


def _row_maps(l_max: int, n_max: int):
    """Static row-index maps for the (m, n) <-> rows flattenings.

    Returns (sh_rows, gm_rows, mn, m_sz, ln): for flattened row r = m*n_max+n
    of the expanded product, sh_rows[r] = m and gm_rows[r] = l_m*n_max + n.
    """
    from torch_m3gnet_tpu.ops.basis import racah_l_index

    l_idx = racah_l_index(l_max)  # (M,)
    m_sz = l_max * l_max
    ln = l_max * n_max
    mn = m_sz * n_max
    sh_rows = np.repeat(np.arange(m_sz), n_max)
    gm_rows = np.concatenate(
        [l_idx[m] * n_max + np.arange(n_max) for m in range(m_sz)]
    )
    return sh_rows, gm_rows, mn, m_sz, ln, np.asarray(l_idx)


def _pad_rows_cols(x, rows, cols):
    r, c = x.shape
    if r == rows and c == cols:
        return x
    return jnp.pad(x, ((0, rows - r), (0, cols - c)))


def _prep_src(src, num_edges):
    """Pad/tile the sorted source-index array; per-tile node-window bounds."""
    e = src.shape[0]
    e_pad = -(-e // TE) * TE
    if e_pad != e:
        src = jnp.concatenate([src, jnp.full((e_pad - e,), src[-1], src.dtype)])
    src = src.astype(jnp.int32)
    n_tiles = e_pad // TE
    lo = (src[::TE] // WN) * WN  # sorted: tile min = first element
    hi = src[TE - 1 :: TE]
    return src, lo, hi, n_tiles, e_pad


def _n_pad(num_nodes):
    return -(-num_nodes // WN) * WN + WN


def _vma(*xs):
    out = frozenset()
    for x in xs:
        out |= frozenset(getattr(jax.typeof(x), "vma", None) or ())
    return out


def _match_vma(x, vma):
    have = frozenset(getattr(jax.typeof(x), "vma", None) or ())
    missing = tuple(vma - have)
    return jax.lax.pvary(x, missing) if missing else x


def _scatter_res(idx, lo, hi, vals, out_ref):
    """out[:, i] += sum_{t: idx[t]=i} vals[:, t] via windowed one-hot MXU."""
    from jax.experimental import pallas as pl

    nch = (hi - lo) // WN + 1
    v_hi, v_lo = _split(vals)

    def body(c, _):
        base = pl.multiple_of(lo + c * WN, 128)
        cols = jax.lax.broadcasted_iota(jnp.int32, (TE, WN), 1) + base
        onehot = (idx[:, None] == cols).astype(jnp.float32)  # (TE, WN)
        partial = _dot(v_hi, onehot, ((1,), (0,))) + _dot(v_lo, onehot, ((1,), (0,)))
        out_ref[:, pl.ds(base, WN)] = out_ref[:, pl.ds(base, WN)] + partial
        return 0

    jax.lax.fori_loop(0, nch, body, 0)


def _gather_res(idx, lo, hi, ref, rows):
    """(rows, TE) window gather: sum_c ref[:, chunk_c] @ onehot(idx)^T."""
    from jax.experimental import pallas as pl

    nch = (hi - lo) // WN + 1

    def body(c, acc):
        base = pl.multiple_of(lo + c * WN, 128)
        win = ref[:, pl.ds(base, WN)]
        cols = jax.lax.broadcasted_iota(jnp.int32, (TE, WN), 1) + base
        onehot = (idx[:, None] == cols).astype(jnp.float32)  # (TE, WN)
        w_hi, w_lo = _split(win)
        return acc + _dot(w_hi, onehot, ((1,), (1,))) + _dot(w_lo, onehot, ((1,), (1,)))

    return jax.lax.fori_loop(0, nch, body, jnp.zeros((rows, TE), jnp.float32))


def _expanded_product(shv, gmv, sh_rows, gm_rows, mnp):
    """w[(m,n)] = sh[m] * gm[(l_m, n)] as a (mnp, TE) array.

    Static Python-int row indexing only — constant index ARRAYS would be
    captured as kernel constants, which pallas_call rejects.
    """
    rows = [
        shv[int(sh_rows[r])] * gmv[int(gm_rows[r])] for r in range(len(sh_rows))
    ]
    zero = jnp.zeros_like(rows[0])
    while len(rows) < mnp:
        rows.append(zero)
    return jnp.stack(rows)


# ---------------------------------------------------------------------------
# Q: A[(m,n), i] = sum_{e: src[e]=i} sh[m, e] * gm[(l_m, n), e]
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def q_scatter(sh, gm, src, num_nodes, l_max, n_max):
    """(M, E), (LN, E), sorted (E,) int32 -> (MN, num_nodes) f32."""
    return _q_impl(sh, gm, src, num_nodes, l_max, n_max)


def _q_impl(sh, gm, src, num_nodes, l_max, n_max):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sh_rows, gm_rows, mn, m_sz, ln, _ = _row_maps(l_max, n_max)
    mp = -(-m_sz // 8) * 8
    lnp = -(-ln // 8) * 8
    mnp = -(-mn // 8) * 8
    n_pad = _n_pad(num_nodes)
    assert mnp * n_pad * 4 <= VMEM_RESIDENT_BYTES, (
        "node count exceeds the resident-A VMEM budget; use the XLA path"
    )
    vma = _vma(sh, gm, src)
    e = sh.shape[1]
    src_p, lo, hi, n_tiles, e_pad = _prep_src(_match_vma(src, vma), e)
    sh_p = _pad_rows_cols(_match_vma(sh, vma).astype(jnp.float32), mp, e_pad)
    gm_p = _pad_rows_cols(_match_vma(gm, vma).astype(jnp.float32), lnp, e_pad)

    def kernel(lo_ref, hi_ref, src_ref, sh_ref, gm_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            out_ref[:] = jnp.zeros_like(out_ref)

        idx = src_ref[:, 0]
        w = _expanded_product(sh_ref[:], gm_ref[:], sh_rows, gm_rows, mnp)
        _scatter_res(idx, lo_ref[i], hi_ref[i], w, out_ref)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TE, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, TE), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((lnp, TE), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (mnp, n_pad), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mnp, n_pad), jnp.float32, vma=vma),
    )(lo, hi, src_p.reshape(-1, 1), sh_p, gm_p)
    return out[:mn, :num_nodes]


def _q_fwd(sh, gm, src, num_nodes, l_max, n_max):
    # route through the custom_vjp wrapper so outer linearization keeps the
    # pallas_call behind the custom-AD boundary (see pallas_fused_triplet.py)
    return q_scatter(sh, gm, src, num_nodes, l_max, n_max), (sh, gm, src)


def _q_bwd(num_nodes, l_max, n_max, res, d_a):
    sh, gm, src = res
    num_edges = sh.shape[1]
    d_sh = r2_gather(d_a, gm, src, num_edges, l_max, n_max)
    d_gm = r1_gather(d_a, sh, src, num_edges, l_max, n_max)
    return d_sh, d_gm, None


# ---------------------------------------------------------------------------
# R1: out[(l,n), e] = sum_{m: l_m=l} sh[m, e] * A[(m,n), src[e]]
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def r1_gather(a, sh, src, num_edges, l_max, n_max):
    """(MN, N), (M, E), sorted (E,) -> (LN, E) f32."""
    return _r_impl(a, sh, src, num_edges, l_max, n_max, mode="r1")


# ---------------------------------------------------------------------------
# R2: out[m, e] = sum_n gm[(l_m, n), e] * A[(m,n), src[e]]
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def r2_gather(a, gm, src, num_edges, l_max, n_max):
    """(MN, N), (LN, E), sorted (E,) -> (M, E) f32."""
    return _r_impl(a, gm, src, num_edges, l_max, n_max, mode="r2")


def _r_impl(a, other, src, num_edges, l_max, n_max, mode):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sh_rows, gm_rows, mn, m_sz, ln, l_idx = _row_maps(l_max, n_max)
    mp = -(-m_sz // 8) * 8
    lnp = -(-ln // 8) * 8
    mnp = -(-mn // 8) * 8
    num_nodes = a.shape[1]
    n_pad = _n_pad(num_nodes)
    assert mnp * n_pad * 4 <= VMEM_RESIDENT_BYTES, (
        "node count exceeds the resident-A VMEM budget; use the XLA path"
    )
    vma = _vma(a, other, src)
    src_p, lo, hi, n_tiles, e_pad = _prep_src(_match_vma(src, vma), num_edges)
    a_p = _pad_rows_cols(_match_vma(a, vma).astype(jnp.float32), mnp, n_pad)
    rows_in = mp if mode == "r1" else lnp
    rows_out = lnp if mode == "r1" else mp
    n_out = ln if mode == "r1" else m_sz
    other_p = _pad_rows_cols(
        _match_vma(other, vma).astype(jnp.float32), rows_in, e_pad
    )

    def kernel(lo_ref, hi_ref, src_ref, a_ref, other_ref, out_ref):
        i = pl.program_id(0)
        idx = src_ref[:, 0]
        a_e = _gather_res(idx, lo_ref[i], hi_ref[i], a_ref, mnp)  # (mnp, TE)
        ov = other_ref[:]
        if mode == "r1":
            # out[(l,n)] = sum_{m in l} sh[m] * a_e[(m,n)]
            rows = []
            for ell in range(l_max):
                ms = np.nonzero(l_idx == ell)[0]
                for n in range(n_max):
                    acc = 0.0
                    for m in ms:
                        acc = acc + ov[int(m)] * a_e[int(m) * n_max + n]
                    rows.append(acc)
        else:
            # out[m] = sum_n gm[(l_m, n)] * a_e[(m, n)]
            rows = []
            for m in range(m_sz):
                acc = 0.0
                for n in range(n_max):
                    acc = acc + ov[int(l_idx[m]) * n_max + n] * a_e[m * n_max + n]
                rows.append(acc)
        out = jnp.stack(rows)
        pad = rows_out - out.shape[0]
        if pad:
            out = jnp.concatenate([out, jnp.zeros((pad, TE), out.dtype)])
        out_ref[:] = out

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TE, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (mnp, n_pad), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (rows_in, TE), lambda i, *_: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (rows_out, TE), lambda i, *_: (0, i), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows_out, e_pad), jnp.float32, vma=vma),
    )(lo, hi, src_p.reshape(-1, 1), a_p, other_p)
    return out[:n_out, :num_edges]


def _r1_fwd(a, sh, src, num_edges, l_max, n_max):
    return r1_gather(a, sh, src, num_edges, l_max, n_max), (a, sh, src)


def _r1_bwd(num_edges, l_max, n_max, res, cot):
    a, sh, src = res
    num_nodes = a.shape[1]
    d_a = q_scatter(sh, cot, src, num_nodes, l_max, n_max)
    d_sh = r2_gather(a, cot, src, num_edges, l_max, n_max)
    return d_a, d_sh, None


def _r2_fwd(a, gm, src, num_edges, l_max, n_max):
    return r2_gather(a, gm, src, num_edges, l_max, n_max), (a, gm, src)


def _r2_bwd(num_edges, l_max, n_max, res, cot):
    a, gm, src = res
    num_nodes = a.shape[1]
    d_a = q_scatter(cot, gm, src, num_nodes, l_max, n_max)
    d_gm = r1_gather(a, cot, src, num_edges, l_max, n_max)
    return d_a, d_gm, None


q_scatter.defvjp(_q_fwd, _q_bwd)
r1_gather.defvjp(_r1_fwd, _r1_bwd)
r2_gather.defvjp(_r2_fwd, _r2_bwd)


# ---------------------------------------------------------------------------
# XLA reference implementations (testing + fallback)
# ---------------------------------------------------------------------------

def q_scatter_xla(sh, gm, src, num_nodes, l_max, n_max):
    from torch_m3gnet_tpu.ops.segment import segment_sum_fm

    sh_rows, gm_rows, *_ = _row_maps(l_max, n_max)
    w = sh[np.asarray(sh_rows)] * gm[np.asarray(gm_rows)]
    return segment_sum_fm(w, src, num_nodes, True)


def r1_gather_xla(a, sh, src, num_edges, l_max, n_max):
    from torch_m3gnet_tpu.ops.segment import take_fm

    _, _, mn, m_sz, ln, l_idx = _row_maps(l_max, n_max)
    a_e = take_fm(a, src)  # (MN, E)
    rows = []
    for ell in range(l_max):
        ms = np.nonzero(l_idx == ell)[0]
        for n in range(n_max):
            rows.append(sum(sh[int(m)] * a_e[int(m) * n_max + n] for m in ms))
    return jnp.stack(rows)


def r2_gather_xla(a, gm, src, num_edges, l_max, n_max):
    from torch_m3gnet_tpu.ops.segment import take_fm

    _, _, mn, m_sz, ln, l_idx = _row_maps(l_max, n_max)
    a_e = take_fm(a, src)
    rows = []
    for m in range(m_sz):
        rows.append(
            sum(gm[int(l_idx[m]) * n_max + n] * a_e[m * n_max + n]
                for n in range(n_max))
        )
    return jnp.stack(rows)

"""Fused Pallas TPU kernel for the three-body message stage.

The hottest op in the model (SURVEY.md §3.3) is, per interaction block,

    out[e1[t]] += basis[t] * gate_e[e2[t]]        t = 0..T-1   (T >> E)

i.e. a T-scale gather of the node-gate (pre-gathered to edges, so the
random access is by *edge* id), an elementwise product against the
triplet-constant basis, and a sorted segment-sum back to edges
(reference semantics: /root/reference/src/torch_m3gnet/nn/interaction.py:204-217).

Run as separate XLA ops this stage is HBM-bound: the (T, l*n) message
materializes once for the gather-product and is re-read by the scatter.
This kernel fuses all three steps so the T-scale data is touched exactly
once, and exploits the *window locality* of the triplet enumeration: both
edges of a triplet share a source node, and edges are sorted by source
node, so for a tile of TT consecutive triplets ALL e1 and e2 ids fall in
one short contiguous edge window. Random access therefore never leaves
VMEM:

- gather  gate_e[e2]  = onehot(e2)  @ gate_window   (MXU)
- scatter sum over e1 = msg @ onehot(e1)            (MXU)

with the gate/output windows streamed chunk-by-chunk via async DMA
(chunk counts are data-dependent; the grid is sequential so
read-modify-write accumulation into HBM is safe, same scheme as
:mod:`torch_m3gnet_tpu.ops.pallas_segment`).

Everything is stored **feature-major** — basis (LN, T), gate (LN, E),
out (LN, E), with LN = l_max*n_max padded to 8 sublanes — so every HBM
DMA window is 128-lane aligned on its minor (T or E) axis regardless of
the tiny feature width. f32 exactness comes from the bf16 hi/lo
two-matmul split (one-hot matrices are exact in bf16 already).

The backward pass is a second kernel of the same shape: per T-tile it
gathers the output cotangent at e1 (window-local), recomputes the gate
gather, and emits

    d_basis[t]  = g[e1[t]] * gate_e[e2[t]]          (streaming write)
    d_gate_e[e] = sum_{t: e2[t]=e} g[e1[t]] * basis[t]   (windowed MXU scatter)

so the T-scale intermediates are never materialized in HBM in either
direction — the property XLA's fusion could not deliver across a
pallas_call boundary (see pallas_segment.py module notes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Tile sizes from an on-chip sweep (benchmarks, v5e, MPF-scale fwd+vjp):
# (512, 256, 256) beat (1024, 512, 512) by ~6% — smaller windows cut the
# one-hot matmul FLOPs (which scale with chunk size) faster than the extra
# per-tile overhead costs.
TT = 512  # triplets per tile
WG = 256  # gate-window chunk (multiple of 128)
EB = 256  # output-window chunk (multiple of 128)

# The windowed path DMAs gate/output chunks per tile (hundreds of small
# latency-bound copies). When the full (LNp, E_pad) gate and output fit in
# VMEM, the resident path instead pins BOTH as whole-array blocks with a
# constant index map (loaded once, written back once — zero manual DMA in the
# hot loop) and replaces every copy with a VMEM dynamic slice.
VMEM_RESIDENT_BYTES = 4 * 1024 * 1024  # per (LNp, E_pad) f32 buffer


def _split(x):
    """bf16 hi/lo split: x == hi + lo exactly, both exactly representable."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def _dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


def _gather_window(idx, lo, hi, hbm_ref, scratch, sem, chunk):
    """sum_c onehot(idx in chunk_c) @ hbm[:, chunk_c] -> (LNp, TT), exact f32.

    ``idx`` (TT,) int32 with values in [lo, hi]; windows of ``chunk`` columns
    are DMA'd into ``scratch`` and contracted on the MXU.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nch = (hi - lo) // chunk + 1
    lnp = scratch.shape[0]

    def body(c, acc):
        base = pl.multiple_of(lo + c * chunk, 128)
        cp = pltpu.make_async_copy(
            hbm_ref.at[:, pl.ds(base, chunk)], scratch, sem
        )
        cp.start()
        cols = jax.lax.broadcasted_iota(jnp.int32, (TT, chunk), 1) + base
        onehot = (idx[:, None] == cols).astype(jnp.float32)  # (TT, chunk)
        cp.wait()
        w_hi, w_lo = _split(scratch[:])
        # (LNp, chunk) x (TT, chunk) -> (LNp, TT), contracting the chunk axis
        acc = acc + _dot(w_hi, onehot, ((1,), (1,))) + _dot(w_lo, onehot, ((1,), (1,)))
        return acc

    return jax.lax.fori_loop(
        0, nch, body, jnp.zeros((lnp, TT), jnp.float32)
    )


def _scatter_window(idx, lo, hi, vals, hbm_ref, scratch, sem, chunk):
    """hbm[:, e] += sum_{t: idx[t]=e} vals[:, t] over windows of ``chunk``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nch = (hi - lo) // chunk + 1
    v_hi, v_lo = _split(vals)

    def body(c, _):
        base = pl.multiple_of(lo + c * chunk, 128)
        load = pltpu.make_async_copy(
            hbm_ref.at[:, pl.ds(base, chunk)], scratch, sem
        )
        load.start()
        cols = jax.lax.broadcasted_iota(jnp.int32, (TT, chunk), 1) + base
        onehot = (idx[:, None] == cols).astype(jnp.float32)  # (TT, chunk)
        # (LNp, TT) x (TT, chunk) -> (LNp, chunk), contracting the TT axis
        partial = _dot(v_hi, onehot, ((1,), (0,))) + _dot(v_lo, onehot, ((1,), (0,)))
        load.wait()
        scratch[:] = scratch[:] + partial
        store = pltpu.make_async_copy(
            scratch, hbm_ref.at[:, pl.ds(base, chunk)], sem
        )
        store.start()
        store.wait()
        return 0

    jax.lax.fori_loop(0, nch, body, 0)


def _gather_res(idx, lo, hi, ref, chunk):
    """VMEM-resident variant of _gather_window: direct dynamic slices."""
    from jax.experimental import pallas as pl

    nch = (hi - lo) // chunk + 1
    lnp = ref.shape[0]
    tt = idx.shape[0]

    def body(c, acc):
        base = pl.multiple_of(lo + c * chunk, 128)
        win = ref[:, pl.ds(base, chunk)]
        cols = jax.lax.broadcasted_iota(jnp.int32, (tt, chunk), 1) + base
        onehot = (idx[:, None] == cols).astype(jnp.float32)
        w_hi, w_lo = _split(win)
        return acc + _dot(w_hi, onehot, ((1,), (1,))) + _dot(w_lo, onehot, ((1,), (1,)))

    return jax.lax.fori_loop(0, nch, body, jnp.zeros((lnp, tt), jnp.float32))


def _scatter_res(idx, lo, hi, vals, out_ref, chunk):
    """VMEM-resident variant of _scatter_window: in-place VMEM accumulate."""
    from jax.experimental import pallas as pl

    nch = (hi - lo) // chunk + 1
    tt = idx.shape[0]
    v_hi, v_lo = _split(vals)

    def body(c, _):
        base = pl.multiple_of(lo + c * chunk, 128)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tt, chunk), 1) + base
        onehot = (idx[:, None] == cols).astype(jnp.float32)
        partial = _dot(v_hi, onehot, ((1,), (0,))) + _dot(v_lo, onehot, ((1,), (0,)))
        out_ref[:, pl.ds(base, chunk)] = out_ref[:, pl.ds(base, chunk)] + partial
        return 0

    jax.lax.fori_loop(0, nch, body, 0)


def _fwd_kernel_res(
    e1lo_ref, e1hi_ref, e2lo_ref, e2hi_ref,
    e1_ref, e2_ref, basis_ref, gate_ref,
    out_ref,
):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    e1 = e1_ref[:, 0]
    e2 = e2_ref[:, 0]
    gathered = _gather_res(e2, e2lo_ref[i], e2hi_ref[i], gate_ref, WG)
    msg = basis_ref[:] * gathered
    _scatter_res(e1, e1lo_ref[i], e1hi_ref[i], msg, out_ref, EB)


def _bwd_kernel_res(
    e1lo_ref, e1hi_ref, e2lo_ref, e2hi_ref,
    e1_ref, e2_ref, basis_ref, gate_ref, g_ref,
    dbasis_ref, dgate_ref,
):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dgate_ref[:] = jnp.zeros_like(dgate_ref)

    e1 = e1_ref[:, 0]
    e2 = e2_ref[:, 0]
    ggath = _gather_res(e1, e1lo_ref[i], e1hi_ref[i], g_ref, EB)
    gathered = _gather_res(e2, e2lo_ref[i], e2hi_ref[i], gate_ref, WG)
    dbasis_ref[:] = ggath * gathered
    m2 = ggath * basis_ref[:]
    _scatter_res(e2, e2lo_ref[i], e2hi_ref[i], m2, dgate_ref, WG)


def _fwd_kernel(
    e1lo_ref, e1hi_ref, e2lo_ref, e2hi_ref,
    e1_ref, e2_ref, basis_ref, gate_ref, init_ref,
    out_ref, gate_scratch, out_scratch, sem,
):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    e1 = e1_ref[:, 0]
    e2 = e2_ref[:, 0]

    gathered = _gather_window(
        e2, e2lo_ref[i], e2hi_ref[i], gate_ref, gate_scratch, sem, WG
    )  # (LNp, TT)
    msg = basis_ref[:] * gathered
    _scatter_window(e1, e1lo_ref[i], e1hi_ref[i], msg, out_ref, out_scratch, sem, EB)


def _bwd_kernel(
    e1lo_ref, e1hi_ref, e2lo_ref, e2hi_ref,
    e1_ref, e2_ref, basis_ref, gate_ref, g_ref, init_ref,
    dbasis_ref, dgate_ref, gate_scratch, out_scratch, sem,
):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    e1 = e1_ref[:, 0]
    e2 = e2_ref[:, 0]

    ggath = _gather_window(
        e1, e1lo_ref[i], e1hi_ref[i], g_ref, out_scratch, sem, EB
    )  # (LNp, TT) = g[:, e1]
    gathered = _gather_window(
        e2, e2lo_ref[i], e2hi_ref[i], gate_ref, gate_scratch, sem, WG
    )  # (LNp, TT) = gate[:, e2]

    dbasis_ref[:] = ggath * gathered
    m2 = ggath * basis_ref[:]
    _scatter_window(
        e2, e2lo_ref[i], e2hi_ref[i], m2, dgate_ref, gate_scratch, sem, WG
    )


def _prep(e1, e2, num_edges):
    """Pad T to a tile multiple (preserving invariants) and build the
    per-tile window bounds (scalar-prefetch arrays)."""
    t = e1.shape[0]
    t_pad = -(-t // TT) * TT
    if t_pad != t:
        e1 = jnp.concatenate([e1, jnp.full((t_pad - t,), e1[-1], e1.dtype)])
        e2 = jnp.concatenate([e2, jnp.full((t_pad - t,), e2[-1], e2.dtype)])
    e1 = e1.astype(jnp.int32)
    e2 = e2.astype(jnp.int32)
    n_tiles = t_pad // TT
    e1lo = (e1[::TT] // 128) * 128  # e1 sorted: tile min = first element
    e1hi = e1[TT - 1 :: TT]
    e2t = e2.reshape(n_tiles, TT)
    e2lo = (jnp.min(e2t, axis=1) // 128) * 128
    e2hi = jnp.max(e2t, axis=1)
    e_pad = -(-num_edges // EB) * EB + EB
    return e1, e2, e1lo, e1hi, e2lo, e2hi, n_tiles, t_pad, e_pad


def _pad_fm(x, lnp, cols):
    """Pad a feature-major (LN, C) array to (lnp, cols)."""
    ln, c = x.shape
    if ln == lnp and c == cols:
        return x
    return jnp.pad(x, ((0, lnp - ln), (0, cols - c)))


def _vma(*xs):
    """Union of the operands' varying-mesh-axes sets: under jax.shard_map with
    check_vma, pallas out_shapes must declare how outputs vary across the mesh
    (here: exactly as the inputs do — the kernel is shard-local)."""
    out = frozenset()
    for x in xs:
        out |= frozenset(getattr(jax.typeof(x), "vma", None) or ())
    return out


def _match_vma(x, vma):
    """pvary ``x`` up to ``vma`` so kernel operands (incl. created zeros/fills)
    agree on varying axes under check_vma."""
    have = frozenset(getattr(jax.typeof(x), "vma", None) or ())
    missing = tuple(vma - have)
    return jax.lax.pvary(x, missing) if missing else x


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_triplet_gate_sum(
    basis_fm: jnp.ndarray,  # (LN, T) f32, feature-major, padded triplets zeroed
    gate_e_fm: jnp.ndarray,  # (LN, E) f32, node gate pre-gathered to edge dst
    e1: jnp.ndarray,  # (T,) i32, sorted (triplet -> its i->j edge)
    e2: jnp.ndarray,  # (T,) i32 (triplet -> its i->k edge; window-local)
    num_edges: int,
) -> jnp.ndarray:
    """out[:, e] = sum_{t: e1[t]=e} basis[:, t] * gate_e[:, e2[t]]  -> (LN, E)."""
    return _forward(basis_fm, gate_e_fm, e1, e2, num_edges)


def _forward(basis_fm, gate_e_fm, e1, e2, num_edges):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ln, t = basis_fm.shape
    lnp = -(-ln // 8) * 8
    vma = _vma(basis_fm, gate_e_fm, e1, e2)
    e1, e2 = _match_vma(e1, vma), _match_vma(e2, vma)
    e1, e2, e1lo, e1hi, e2lo, e2hi, n_tiles, t_pad, e_pad = _prep(e1, e2, num_edges)
    basis_fm = _pad_fm(_match_vma(basis_fm, vma).astype(jnp.float32), lnp, t_pad)
    gate_fm = _pad_fm(_match_vma(gate_e_fm, vma).astype(jnp.float32), lnp, e_pad)

    if lnp * e_pad * 4 <= VMEM_RESIDENT_BYTES:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((TT, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TT, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((lnp, TT), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((lnp, e_pad), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (lnp, e_pad), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
            ),
        )
        out = pl.pallas_call(
            _fwd_kernel_res,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((lnp, e_pad), jnp.float32, vma=vma),
        )(
            e1lo, e1hi, e2lo, e2hi,
            e1.reshape(-1, 1), e2.reshape(-1, 1), basis_fm, gate_fm,
        )
        return out[:ln, :num_edges]

    zeros = _match_vma(jnp.zeros((lnp, e_pad), jnp.float32), vma)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TT, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TT, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lnp, TT), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # gate (LNp, E_pad)
            pl.BlockSpec(memory_space=pl.ANY),  # zero-initialized out alias
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((lnp, WG), jnp.float32),
            pltpu.VMEM((lnp, EB), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    out = pl.pallas_call(
        _fwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((lnp, e_pad), jnp.float32, vma=vma),
        input_output_aliases={8: 0},  # zeros (4 prefetch + 5th operand) -> out
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        e1lo, e1hi, e2lo, e2hi,
        e1.reshape(-1, 1), e2.reshape(-1, 1), basis_fm, gate_fm, zeros,
    )
    return out[:ln, :num_edges]


def _vjp_fwd(basis_fm, gate_e_fm, e1, e2, num_edges):
    # Call the custom_vjp-wrapped function (not the raw impl): when an outer
    # grad linearizes a jaxpr containing this fwd, the pallas_call must still
    # sit behind the custom-AD boundary or JAX tries (and fails) to JVP it.
    return fused_triplet_gate_sum(basis_fm, gate_e_fm, e1, e2, num_edges), (
        basis_fm, gate_e_fm, e1, e2,
    )


def _vjp_bwd(num_edges, res, g):
    basis_fm, gate_e_fm, e1, e2 = res
    d_basis, d_gate = backward_pair(basis_fm, gate_e_fm, g, e1, e2, num_edges)
    return d_basis, d_gate, None, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def backward_pair(basis_fm, gate_e_fm, g, e1, e2, num_edges):
    """The forward's VJP as a first-class differentiable op:

        dB[:, t] = g[:, e1[t]] * G[:, e2[t]]
        dG[:, e] = sum_{t: e2[t]=e} g[:, e1[t]] * B[:, t]

    Both outputs are bilinear, so the op family {fused_triplet_gate_sum,
    backward_pair} is CLOSED under differentiation — grad-of-grad (force-loss
    training differentiates through the force computation,
    /root/reference/src/torch_m3gnet/model/litmodule.py:87 via
    nn/gradient.py:33) stays inside these two kernels to all orders.
    """
    return _backward(basis_fm, gate_e_fm, e1, e2, num_edges, g)


def _pair_fwd(basis_fm, gate_e_fm, g, e1, e2, num_edges):
    # Same boundary trick as _vjp_fwd (see comment there).
    out = backward_pair(basis_fm, gate_e_fm, g, e1, e2, num_edges)
    return out, (basis_fm, gate_e_fm, g, e1, e2)


def _pair_bwd(num_edges, res, cot):
    basis_fm, gate_e_fm, g, e1, e2 = res
    u_b, u_g = cot  # cotangents of (dB, dG): (LN, T), (LN, E)
    # d/dB  <u_g, dG> = g[:, e1] * u_g[:, e2]   (dB-shaped)
    # d/dG  <u_b, dB> = scatter_e2(g[:, e1] * u_b)   (dG-shaped)
    # -> ONE backward_pair call with (B, G) := (u_b, u_g) yields both.
    g_basis, g_gate = backward_pair(u_b, u_g, g, e1, e2, num_edges)
    # d/dg: scatter_e1(u_b * G[:, e2]) + scatter_e1(B * u_g[:, e2])
    g_g = fused_triplet_gate_sum(u_b, gate_e_fm, e1, e2, num_edges) + (
        fused_triplet_gate_sum(basis_fm, u_g, e1, e2, num_edges)
    )
    return g_basis, g_gate, g_g, None, None


def _backward(basis_fm, gate_e_fm, e1, e2, num_edges, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ln, t = basis_fm.shape
    lnp = -(-ln // 8) * 8
    vma = _vma(basis_fm, gate_e_fm, g, e1, e2)
    e1, e2 = _match_vma(e1, vma), _match_vma(e2, vma)
    e1, e2, e1lo, e1hi, e2lo, e2hi, n_tiles, t_pad, e_pad = _prep(e1, e2, num_edges)
    basis_p = _pad_fm(_match_vma(basis_fm, vma).astype(jnp.float32), lnp, t_pad)
    gate_p = _pad_fm(_match_vma(gate_e_fm, vma).astype(jnp.float32), lnp, e_pad)
    g_p = _pad_fm(_match_vma(g, vma).astype(jnp.float32), lnp, e_pad)

    if lnp * e_pad * 4 <= VMEM_RESIDENT_BYTES:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((TT, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TT, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((lnp, TT), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((lnp, e_pad), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((lnp, e_pad), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((lnp, TT), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (lnp, e_pad), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
        )
        d_basis, d_gate = pl.pallas_call(
            _bwd_kernel_res,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((lnp, t_pad), jnp.float32, vma=vma),
                jax.ShapeDtypeStruct((lnp, e_pad), jnp.float32, vma=vma),
            ],
        )(
            e1lo, e1hi, e2lo, e2hi,
            e1.reshape(-1, 1), e2.reshape(-1, 1), basis_p, gate_p, g_p,
        )
        return d_basis[:ln, :t], d_gate[:ln, :num_edges]

    dgate_zeros = _match_vma(jnp.zeros((lnp, e_pad), jnp.float32), vma)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TT, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TT, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lnp, TT), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # gate
            pl.BlockSpec(memory_space=pl.ANY),  # g (output cotangent)
            pl.BlockSpec(memory_space=pl.ANY),  # d_gate zero init alias
        ],
        out_specs=[
            pl.BlockSpec((lnp, TT), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # d_gate accumulator
        ],
        scratch_shapes=[
            pltpu.VMEM((lnp, WG), jnp.float32),
            pltpu.VMEM((lnp, EB), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    d_basis, d_gate = pl.pallas_call(
        _bwd_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((lnp, t_pad), jnp.float32, vma=vma),
            jax.ShapeDtypeStruct((lnp, e_pad), jnp.float32, vma=vma),
        ],
        input_output_aliases={9: 1},  # dgate_zeros (4 prefetch + 6th) -> d_gate
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        e1lo, e1hi, e2lo, e2hi,
        e1.reshape(-1, 1), e2.reshape(-1, 1), basis_p, gate_p, g_p, dgate_zeros,
    )
    return d_basis[:ln, :t], d_gate[:ln, :num_edges]


fused_triplet_gate_sum.defvjp(_vjp_fwd, _vjp_bwd)
backward_pair.defvjp(_pair_fwd, _pair_bwd)


def reference_triplet_gate_sum(basis_fm, gate_e_fm, e1, e2, num_edges):
    """Pure-XLA reference of the same contraction (for tests/benchmarks)."""
    msg = basis_fm * jnp.take(gate_e_fm, e2, axis=1)
    return jax.vmap(
        lambda row: jax.ops.segment_sum(
            row, e1, num_segments=num_edges, indices_are_sorted=True
        )
    )(msg)

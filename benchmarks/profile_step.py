"""Profile the headline bench step: stage breakdown + speed-of-light anchor.

The shared-tunnel chip makes single timing windows vary up to ~50x, so the
only fair protocol is ALTERNATING measurement: every round times each variant
once back-to-back, and each variant keeps its best round. Stage costs are
measured as standalone jitted functions replicating exactly what the full
step runs (same shapes, same dtypes, same kernels).

Absolute anchor: XLA's own cost analysis of the compiled full step (FLOPs +
HBM bytes accessed) against v5e peaks (197 TFLOP/s bf16-in-f32-out matmul,
819 GB/s HBM) gives the speed-of-light step time; the report states what
fraction of it we achieve and whether the step is compute- or memory-bound.

Run: python benchmarks/profile_step.py [--quick]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

# TPU v5e (v5 lite) peaks.
PEAK_MATMUL_FLOPS = 197e12  # bf16 inputs / f32 accumulate (default precision)
PEAK_HBM_BW = 819e9  # bytes/s


def alternating_best(entries, iters=10, rounds=8, spacing=1.0):
    """entries: list of (label, fn, args). Returns {label: best_seconds}."""
    for _, fn, args in entries:  # compile + warm
        jax.block_until_ready(fn(*args))
    best = {label: float("inf") for label, _, _ in entries}
    for r in range(rounds):
        for label, fn, args in entries:
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            jax.block_until_ready(out)
            best[label] = min(best[label], (time.perf_counter() - t0) / iters)
        if r < rounds - 1:
            time.sleep(spacing)  # hit different contention states
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--trace-dir", default=None,
                    help="also capture a jax.profiler trace of the full step")
    args = ap.parse_args()
    rounds = 3 if args.quick else 8

    from bench import build_batch
    from torch_m3gnet_tpu.config import M3GNetConfig
    from torch_m3gnet_tpu.models import build_model
    from torch_m3gnet_tpu.models.m3gnet import edge_vectors
    from torch_m3gnet_tpu.models.layers import GatedMLP
    from torch_m3gnet_tpu.ops.basis import (
        cutoff_poly,
        legendre_cos_tmajor,
        normalized_spherical_bessel_tmajor,
        smooth_radial_basis,
    )
    from torch_m3gnet_tpu.ops.pallas_fused_triplet import fused_triplet_gate_sum
    from torch_m3gnet_tpu.ops.segment import segment_sum, take

    cfg = M3GNetConfig()
    batch = build_batch()
    E, T, N = batch.num_edges, batch.num_triplets, batch.num_nodes
    D, ln = cfg.embedding_dim, cfg.l_max * cfg.n_max
    real_items = int(np.asarray(batch.edge_mask).sum()) + int(
        np.asarray(batch.triplet_mask).sum()
    )
    print(f"device={jax.devices()[0]}  N={N} E={E} T={T} D={D} ln={ln}")

    pot = build_model(cfg)
    params = pot.init(jax.random.PRNGKey(0), batch)

    @jax.jit
    def full_step(params, batch):
        out = pot.apply(params, batch)
        return out.energy, out.forces, out.stress

    # ---- XLA cost analysis of the compiled full step ----------------------
    try:
        compiled = jax.jit(pot._apply).lower(params, batch).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
        bytes_acc = float(ca.get("bytes accessed", float("nan")))
        t_mxu = flops / PEAK_MATMUL_FLOPS
        t_hbm = bytes_acc / PEAK_HBM_BW
        print(
            f"XLA cost analysis: {flops/1e9:.2f} GFLOP, "
            f"{bytes_acc/1e6:.1f} MB accessed"
        )
        print(
            f"speed-of-light: compute {t_mxu*1e3:.3f} ms, "
            f"memory {t_hbm*1e3:.3f} ms -> bound by "
            f"{'HBM' if t_hbm > t_mxu else 'MXU'}, "
            f"t_sol = {max(t_mxu, t_hbm)*1e3:.3f} ms"
        )
        mem = compiled.memory_analysis()
        if mem is not None:
            print(
                f"memory: args {mem.argument_size_in_bytes/1e6:.1f} MB, "
                f"temps {mem.temp_size_in_bytes/1e6:.1f} MB, "
                f"output {mem.output_size_in_bytes/1e6:.1f} MB"
            )
    except Exception as exc:  # cost analysis is backend-dependent
        print(f"cost analysis unavailable: {exc!r}")
        t_mxu = t_hbm = float("nan")

    # ---- stage replicas ----------------------------------------------------
    positions = jnp.asarray(batch.positions)
    r_vec = edge_vectors(batch, positions)
    rng = jax.random.PRNGKey(1)
    v0 = jax.random.normal(rng, (N, D), jnp.float32)
    e0 = jax.random.normal(rng, (E, D), jnp.float32)
    ew0 = jax.random.normal(rng, (E, cfg.n_max), jnp.float32)
    basis0 = jax.random.normal(rng, (ln, T), jnp.float32)
    gate0 = jax.random.uniform(rng, (ln, E), jnp.float32)
    e1 = jnp.asarray(batch.triplet_e1, jnp.int32)
    e2 = jnp.asarray(batch.triplet_e2, jnp.int32)
    rc, rc3 = cfg.cutoff, cfg.threebody_cutoff

    def basis_chain(rv):
        """T-scale geometry + basis product, exactly as the model computes it."""
        sq = jnp.sum(rv * rv, axis=-1)
        sq_safe = jnp.where(batch.edge_mask, sq, 1.0)
        dist = jnp.where(batch.edge_mask, jnp.sqrt(sq_safe), rc)
        vij = take(rv, e1)
        vik = take(rv, e2)
        rij = take(dist, e1)
        rik = take(dist, e2)
        cos = jnp.clip(jnp.sum(vij * vik, axis=-1) / (rij * rik), -1.0, 1.0)
        fc = cutoff_poly(rij, rc3) * cutoff_poly(rik, rc3)
        import math
        sph_norm = np.array(
            [math.sqrt((2 * l + 1) / (4 * math.pi)) for l in range(cfg.l_max)]
        )
        sph = legendre_cos_tmajor(cos, cfg.l_max) * sph_norm
        chi = normalized_spherical_bessel_tmajor(rik, rc, cfg.l_max, cfg.n_max)
        basis = (chi * sph[:, :, None] * fc[:, None, None]).reshape(-1, ln)
        basis = basis * batch.triplet_mask.astype(rv.dtype)[:, None]
        ewts = smooth_radial_basis(dist, cfg.n_max, rc)
        return basis.T, ewts

    basis_fwd = jax.jit(basis_chain)
    w_basis = jax.random.normal(rng, (ln, T), jnp.float32)
    w_ew = jax.random.normal(rng, (E, cfg.n_max), jnp.float32)
    basis_vjp = jax.jit(
        jax.grad(
            lambda rv: jnp.sum(basis_chain(rv)[0] * w_basis)
            + jnp.sum(basis_chain(rv)[1] * w_ew)
        )
    )

    w_out = jax.random.normal(rng, (ln, E), jnp.float32)
    trip_vjp = jax.jit(
        jax.grad(
            lambda b, g: jnp.sum(
                fused_triplet_gate_sum(b, g, e1, e2, E) * w_out
            ),
            argnums=(0, 1),
        )
    )

    esrc = jnp.asarray(batch.edge_src)
    edst = jnp.asarray(batch.edge_dst)
    emask = jnp.asarray(batch.edge_mask, jnp.float32)

    def conv_block(mdl_params, v, e, ew):
        """One block's MLP stack (three_mlp + conv edge + conv node + sums)."""
        agg = jax.random.uniform(rng, (E, ln), jnp.float32)  # stand-in, constant
        e = e + GatedMLP([D], use_bias=False, name="tm").apply(
            mdl_params["tm"], agg
        )
        vi = take(v, esrc)
        vj = take(v, edst)
        cat = jnp.concatenate([vi, vj, e], axis=-1)
        e = e + GatedMLP([D, D], name="ce").apply(mdl_params["ce"], cat) * (
            ew @ mdl_params["wew1"]
        )
        cat = jnp.concatenate([vi, vj, e], axis=-1)
        msg = GatedMLP([D, D], name="cn").apply(mdl_params["cn"], cat) * (
            ew @ mdl_params["wew2"]
        )
        msg = msg * emask[:, None]
        v = v + segment_sum(msg, esrc, num_segments=N, indices_are_sorted=True)
        return v, e

    mp = {
        "tm": GatedMLP([D], use_bias=False, name="tm").init(
            rng, jnp.zeros((E, ln))
        ),
        "ce": GatedMLP([D, D], name="ce").init(rng, jnp.zeros((E, 3 * D))),
        "cn": GatedMLP([D, D], name="cn").init(rng, jnp.zeros((E, 3 * D))),
        "wew1": jax.random.normal(rng, (cfg.n_max, D)) * 0.1,
        "wew2": jax.random.normal(rng, (cfg.n_max, D)) * 0.1,
    }

    def conv3(mp, v, e, ew):
        for _ in range(cfg.num_blocks):
            v, e = conv_block(mp, v, e, ew)
        return jnp.sum(v) + jnp.sum(e)

    conv_fwd = jax.jit(lambda mp, v, e, ew: conv3(mp, v, e, ew))
    conv_vjp = jax.jit(jax.grad(conv3, argnums=(1, 2)))

    fwd_energy = jax.jit(
        lambda params, batch: pot.model.apply(
            params, batch, edge_vectors(batch, jnp.asarray(batch.positions))
        )[0]
    )

    entries = [
        ("full E/F/S step", full_step, (params, batch)),
        ("energy fwd only", fwd_energy, (params, batch)),
        ("basis chain fwd", basis_fwd, (r_vec,)),
        ("basis chain fwd+vjp", basis_vjp, (r_vec,)),
        ("triplet kernel fwd+vjp (x1 block)", trip_vjp, (basis0, gate0)),
        ("conv MLPs x3 fwd", conv_fwd, (mp, v0, e0, ew0)),
        ("conv MLPs x3 fwd+vjp", conv_vjp, (mp, v0, e0, ew0)),
    ]
    best = alternating_best(entries, rounds=rounds)

    print("\nstage breakdown (best-of alternating windows):")
    for label, _, _ in entries:
        print(f"  {label:36s} {best[label]*1e3:8.3f} ms")
    full = best["full E/F/S step"]
    print(f"\nitems/s at best full step: {real_items/full/1e6:.1f} M")
    trip3 = 3 * best["triplet kernel fwd+vjp (x1 block)"]
    acc = (
        best["basis chain fwd+vjp"]
        + trip3
        + best["conv MLPs x3 fwd+vjp"]
    )
    print(
        f"sum of parts (basis vjp + 3x triplet vjp + conv vjp): {acc*1e3:.3f} ms "
        f"vs full {full*1e3:.3f} ms"
    )
    if np.isfinite(t_hbm):
        sol = max(t_mxu, t_hbm)
        print(f"fraction of speed-of-light: {sol/full*100:.1f}%")

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            for _ in range(10):
                out = full_step(params, batch)
            jax.block_until_ready(out)
        print(f"trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()

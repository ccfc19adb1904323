"""Direct unit tests of the halo exchanges (ops/halo.py).

The gp model tests validate the exchanges end-to-end; these pin the
primitive itself: the feature-major exchange is exactly the transpose of
the entity-major exchange under the same index plan, and gradients
transpose to the owning rows/columns.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from torch_m3gnet_tpu.data.graph import graph_from_structure
from torch_m3gnet_tpu.data.structure import Structure
from torch_m3gnet_tpu.ops.halo import halo_exchange, halo_exchange_fm
from torch_m3gnet_tpu.parallel.graph_shard import partition_graph


def _plan(n_shards=4):
    """A real halo plan from the partitioner (rod crystal, 2 ring offsets)."""
    rod = Structure.from_frac_coords(
        np.eye(3) * 3.62,
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]],
        [29] * 4,
    ).supercell((1, 1, 2 * n_shards))
    g = graph_from_structure(rod, 4.5, 4.0)
    return partition_graph(g, n_shards, pad_multiple=32)


def test_fm_exchange_is_transpose_of_em():
    sharded = _plan(4)
    mesh = Mesh(np.array(jax.devices("cpu")[:4]), ("gp",))
    nps = sharded.positions.shape[1]
    F = 5
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, nps, F)).astype(np.float32)  # per-shard rows

    @jax.jit
    @jax.shard_map(mesh=mesh, in_specs=(P("gp"), P("gp"), P("gp")),
                   out_specs=(P("gp"), P("gp")))
    def run(x_s, send_s, recv_s):
        xs = x_s[0]
        em = halo_exchange(
            xs, send_s[0], recv_s[0], sharded.halo_offsets, "gp"
        )
        fm = halo_exchange_fm(
            xs.T, send_s[0], recv_s[0], sharded.halo_offsets, "gp"
        )
        return em[None], fm[None]

    em, fm = run(x, np.asarray(sharded.halo_send_idx),
                 np.asarray(sharded.halo_recv_idx))
    np.testing.assert_array_equal(
        np.asarray(fm), np.swapaxes(np.asarray(em), 1, 2)
    )


def test_fm_exchange_gradient_matches_em():
    """d(sum f(extended))/dx agrees between the two exchanges — the column
    exchange's transpose routes cotangents to the same owning entries."""
    sharded = _plan(4)
    mesh = Mesh(np.array(jax.devices("cpu")[:4]), ("gp",))
    nps = sharded.positions.shape[1]
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, nps, 3)).astype(np.float32)
    w_full = rng.standard_normal(
        (4, nps + sharded.halo_recv_idx.shape[1], 3)
    ).astype(np.float32)

    def make(fn, transpose):
        @jax.jit
        @jax.shard_map(mesh=mesh, in_specs=(P("gp"), P("gp"), P("gp"), P("gp")),
                       out_specs=P())
        def loss(x_s, w_s, send_s, recv_s):
            xs = x_s[0].T if transpose else x_s[0]
            ext = fn(xs, send_s[0], recv_s[0], sharded.halo_offsets, "gp")
            w = w_s[0].T if transpose else w_s[0]
            return jax.lax.psum(jnp.sum(ext * w), "gp")

        return loss

    args = (x, w_full, np.asarray(sharded.halo_send_idx),
            np.asarray(sharded.halo_recv_idx))
    loss_em = make(halo_exchange, False)
    loss_fm = make(halo_exchange_fm, True)
    np.testing.assert_allclose(float(loss_em(*args)), float(loss_fm(*args)),
                               rtol=1e-5)
    g_em = jax.jit(jax.grad(lambda x_: loss_em(x_, *args[1:])))(x)
    g_fm = jax.jit(jax.grad(lambda x_: loss_fm(x_, *args[1:])))(x)
    np.testing.assert_allclose(np.asarray(g_em), np.asarray(g_fm), atol=1e-5)

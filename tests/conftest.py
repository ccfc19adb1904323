"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding tests use
``xla_force_host_platform_device_count=8`` as prescribed for mesh validation.
Must set env before the first jax import anywhere in the test process.
"""

import os

# NOTE: do NOT set JAX_PLATFORMS=cpu here — the axon TPU plugin in this image
# fights the override and the first computation deadlocks. Instead we keep the
# default platform list and pin the *default device* to CPU after import;
# sharding tests build their Mesh from jax.devices("cpu") explicitly.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_default_device", jax.devices("cpu")[0])

# Persistent compilation cache: the suite compiles many small model variants
# (the dominant wall-clock cost on CPU); caching them across test runs and CI
# matrix entries cuts repeat runs dramatically.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest

from torch_m3gnet_tpu.data.structure import Structure


@pytest.fixture
def al_fcc() -> Structure:
    """Conventional fcc Al (4 atoms); 1st NN shell has 12 neighbors."""
    a = 4.05
    return Structure.from_frac_coords(
        lattice=np.eye(3) * a,
        frac_coords=[[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]],
        atomic_numbers=[13, 13, 13, 13],
    )


@pytest.fixture
def na_bcc() -> Structure:
    """Conventional bcc Na (2 atoms); 1st NN shell has 8 neighbors."""
    a = 4.29
    return Structure.from_frac_coords(
        lattice=np.eye(3) * a,
        frac_coords=[[0, 0, 0], [0.5, 0.5, 0.5]],
        atomic_numbers=[11, 11],
    )


@pytest.fixture
def tio2_rutile() -> Structure:
    """Rutile TiO2 (6 atoms) — a lower-symmetry multi-species fixture."""
    a, c, u = 4.603, 2.966, 0.3046
    return Structure.from_frac_coords(
        lattice=np.diag([a, a, c]),
        frac_coords=[
            [0, 0, 0],
            [0.5, 0.5, 0.5],
            [u, u, 0],
            [-u % 1.0, -u % 1.0, 0],
            [0.5 + u, 0.5 - u, 0.5],
            [0.5 - u, 0.5 + u, 0.5],
        ],
        atomic_numbers=[22, 22, 8, 8, 8, 8],
    )


def first_nn_cutoff(structure: Structure) -> float:
    """Distance to the 1st-neighbor shell plus a small margin."""
    from torch_m3gnet_tpu.data.neighborlist import neighbor_list_pbc

    _, _, d = neighbor_list_pbc(structure.lattice, structure.cart_coords, 10.0)
    return float(d.min()) + 1e-3

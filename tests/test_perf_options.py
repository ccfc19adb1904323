"""Performance-option correctness: bf16 compute and triplet rematerialization."""

import numpy as np

import jax

from torch_m3gnet_tpu.config import M3GNetConfig
from torch_m3gnet_tpu.data.graph import pack_structures
from torch_m3gnet_tpu.models import build_model

CFG = M3GNetConfig(l_max=2, n_max=3, embedding_dim=16, num_blocks=2)


def _batch(al_fcc, na_bcc):
    return pack_structures([al_fcc, na_bcc], 5.0, 4.0, pad_multiple=64)


def test_remat_triplets_is_exact(al_fcc, na_bcc):
    b = _batch(al_fcc, na_bcc)
    pot = build_model(CFG)
    pot_r = build_model(CFG.replace(remat_triplets=True))
    params = pot.init(jax.random.PRNGKey(0), b)
    out = pot.apply(params, b)
    out_r = pot_r.apply(params, b)
    np.testing.assert_allclose(np.asarray(out.energy), np.asarray(out_r.energy), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.forces), np.asarray(out_r.forces), atol=1e-5)


def test_bfloat16_compute_close_to_f32(al_fcc, na_bcc):
    b = _batch(al_fcc, na_bcc)
    pot = build_model(CFG)
    pot_h = build_model(CFG.replace(compute_dtype="bfloat16"))
    params = pot.init(jax.random.PRNGKey(0), b)
    out = pot.apply(params, b)
    out_h = pot_h.apply(params, b)
    assert out_h.energy.dtype == out.energy.dtype  # energies stay full precision
    assert np.isfinite(np.asarray(out_h.energy)).all()
    assert np.isfinite(np.asarray(out_h.forces)).all()
    # bf16 has ~3 decimal digits; energies should agree loosely
    e = np.asarray(out.energy[:2])
    eh = np.asarray(out_h.energy[:2])
    np.testing.assert_allclose(eh, e, rtol=0.05, atol=0.05)

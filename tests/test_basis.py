"""Basis-function numerics tests.

Carries over the reference's checks (/root/reference/tests/test_basis.py):
Bessel zeros are really zeros, derivative correctness (reference uses
torch.autograd.gradcheck in f64; here jax.grad vs finite differences and
grad-of-grad finiteness), cutoff boundary values — plus parity of the zeros
table against the reference's hard-coded values.
"""

import jax
import jax.numpy as jnp
import numpy as np

from torch_m3gnet_tpu.ops.basis import (
    cutoff_poly,
    legendre_cos_all,
    normalized_spherical_bessel,
    smooth_radial_basis,
    spherical_bessel_all,
    spherical_bessel_zeros,
)

jax.config.update("jax_enable_x64", True)


def test_bessel_zeros_match_reference_table():
    # First rows of the reference's hard-coded table
    # (/root/reference/src/torch_m3gnet/nn/interaction.py:14-135).
    z = spherical_bessel_zeros(4, 4)
    np.testing.assert_allclose(z[0], [np.pi, 2 * np.pi, 3 * np.pi, 4 * np.pi], rtol=1e-12)
    np.testing.assert_allclose(
        z[1],
        [4.4934094579080615, 7.725251836938652, 10.904121659429897, 14.066193912832478],
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        z[3],
        [6.987932000501506, 10.417118547380369, 13.698023153250254, 16.923621285214363],
        rtol=1e-10,
    )


def test_zeros_are_zeros():
    from scipy.special import spherical_jn

    z = spherical_bessel_zeros(6, 6)
    for ell in range(6):
        np.testing.assert_allclose(spherical_jn(ell, z[ell]), 0.0, atol=1e-10)


def test_spherical_bessel_matches_scipy():
    from scipy.special import spherical_jn

    x = np.linspace(1e-3, 30.0, 500)
    vals = spherical_bessel_all(jnp.asarray(x), 5)
    for ell in range(5):
        np.testing.assert_allclose(vals[ell], spherical_jn(ell, x), atol=1e-10)


def test_spherical_bessel_gradients():
    from scipy.special import spherical_jn

    x = np.linspace(0.05, 20.0, 100)
    for ell in range(4):
        f = lambda z: spherical_bessel_all(z, ell + 1)[ell].sum()
        g = jax.grad(f)(jnp.asarray(x))
        np.testing.assert_allclose(g, spherical_jn(ell, x, derivative=True), atol=1e-8)
    # grad-of-grad (needed for force training) stays finite incl. near zero
    x2 = jnp.asarray(np.linspace(0.0, 5.0, 50))
    gg = jax.grad(lambda z: jax.grad(lambda y: spherical_bessel_all(y, 3)[2].sum())(z).sum())(x2)
    assert np.isfinite(np.asarray(gg)).all()


def test_legendre_matches_numpy():
    x = np.linspace(-1, 1, 201)
    vals = legendre_cos_all(jnp.asarray(x), 5)
    for ell in range(5):
        c = np.zeros(ell + 1)
        c[ell] = 1
        np.testing.assert_allclose(vals[ell], np.polynomial.legendre.legval(x, c), atol=1e-12)
    # derivative via jax matches numpy's
    g = jax.grad(lambda z: legendre_cos_all(z, 4)[3].sum())(jnp.asarray(x))
    dc = np.polynomial.legendre.legder(np.array([0.0, 0, 0, 1]))
    np.testing.assert_allclose(g, np.polynomial.legendre.legval(x, dc), atol=1e-12)


def test_cutoff_function():
    # boundary values (reference tests/test_basis.py:45-49)
    rc = 4.0
    r = jnp.asarray([0.0, rc / 2, rc, rc + 1.0])
    v = cutoff_poly(r, rc)
    np.testing.assert_allclose(v, [1.0, 0.5, 0.0, 0.0], atol=1e-12)
    # smooth: first derivative vanishes at both ends
    g = jax.grad(lambda x: cutoff_poly(x, rc).sum())(jnp.asarray([1e-9, rc - 1e-9]))
    np.testing.assert_allclose(g, [0.0, 0.0], atol=1e-6)


def test_normalized_bessel_shape_and_finiteness():
    r = jnp.asarray(np.linspace(0.1, 5.0, 64))
    chi = normalized_spherical_bessel(r, 5.0, 3, 3)
    assert chi.shape == (3, 3, 64)
    assert np.isfinite(np.asarray(chi)).all()
    # chi_ln(rc) = 0 for all (l, n): z_ln * rc/rc is a root of j_l
    chi_rc = normalized_spherical_bessel(jnp.asarray([5.0]), 5.0, 3, 3)
    np.testing.assert_allclose(np.asarray(chi_rc), 0.0, atol=1e-6)


def test_smooth_radial_basis_parity_formula():
    """Check h_m against a direct transcription of the reference recursion."""
    n_max, rc = 3, 5.0
    r = np.linspace(0.3, 4.9, 40)
    got = np.asarray(smooth_radial_basis(jnp.asarray(r), n_max, rc))

    m = np.arange(n_max, dtype=np.float64)
    em = (m**2) * ((m + 2) ** 2) / (4 * ((m + 1) ** 4) + 1)
    dm = np.ones(n_max)
    for i in range(1, n_max):
        dm[i] = 1 - em[i] / dm[i - 1]
    coeff = (
        ((-1.0) ** m) * np.sqrt(2) * np.pi / rc**1.5
        * (m + 1) * (m + 2) / np.sqrt((m + 1) ** 2 + (m + 2) ** 2)
    )

    def tsinc(x):  # torch.sinc semantics
        return np.sinc(x)

    fm = coeff[:, None] * (
        tsinc((m[:, None] + 1) * np.pi / rc * r[None, :])
        + tsinc((m[:, None] + 2) * np.pi / rc * r[None, :])
    )
    hm = np.empty_like(fm)
    hm[0] = fm[0]
    for i in range(1, n_max):
        hm[i] = (fm[i] + np.sqrt(em[i] / dm[i - 1]) * hm[i - 1]) / np.sqrt(dm[i])
    np.testing.assert_allclose(got, hm.T, atol=1e-10)
    assert np.isfinite(got).all()


def test_racah_harmonics_addition_theorem():
    """sum_m C_lm(a) C_lm(b) == P_l(a.b) for l = 0..3 — the identity that
    makes the factorized three-body stage exact (models/m3gnet.py)."""
    from torch_m3gnet_tpu.ops.basis import racah_l_index, real_racah_harmonics

    rng = np.random.default_rng(7)
    a = rng.standard_normal((32, 3))
    b = rng.standard_normal((32, 3))
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    cos = np.sum(a * b, axis=1)
    for l_max in (1, 2, 3, 4, 5, 6, 8):
        ca = np.asarray(real_racah_harmonics(jnp.asarray(a), l_max))
        cb = np.asarray(real_racah_harmonics(jnp.asarray(b), l_max))
        l_idx = racah_l_index(l_max)
        assert ca.shape == (32, l_max * l_max) and l_idx.size == l_max * l_max
        for ell in range(l_max):
            sel = l_idx == ell
            lhs = np.sum(ca[:, sel] * cb[:, sel], axis=1)
            coef = np.zeros(ell + 1)
            coef[ell] = 1.0
            np.testing.assert_allclose(
                lhs, np.polynomial.legendre.legval(cos, coef), atol=1e-10
            )


def test_racah_harmonics_differentiable():
    from torch_m3gnet_tpu.ops.basis import real_racah_harmonics

    u = jnp.asarray([[0.6, 0.48, 0.64]])  # unit vector
    jac = jax.jacobian(lambda v: real_racah_harmonics(v, 4))(u)
    assert np.isfinite(np.asarray(jac)).all()

"""Radial/angular basis functions as pure, differentiable jnp code.

Capability parity with the reference's basis stack, re-expressed for XLA:

- smooth radial basis: the Kocer two-sinc + Gram-Schmidt recursion of
  ``EdgeFeaturizer`` (/root/reference/src/torch_m3gnet/nn/featurizer.py:61-100);
- spherical Bessel j_l via upward recurrence with small-z guards, replacing the
  hand-written ``torch.autograd.Function``
  (/root/reference/src/torch_m3gnet/nn/interaction.py:284-350) — here plain jnp
  with grad-safe ``where`` guards, so ``jax.grad`` (including grad-of-grad for
  force training) needs no custom rules;
- Legendre P_l(cos) Bonnet recursion (interaction.py:353-382), likewise plain jnp;
- normalized spherical Bessel chi_ln (interaction.py:226-281);
- smooth polynomial cutoff (interaction.py:389-400);
- spherical Bessel zeros regenerated numerically at first use via interlaced
  root bracketing (parity with scripts/search_spherical_bessel_zeros.py:9-26)
  instead of a hard-coded table.

All ``l_max`` / ``n_max`` are static Python ints (3 by default), so the tiny
recurrences unroll at trace time into fused elementwise XLA ops.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

_EPS = 1e-8


@lru_cache(maxsize=None)
def spherical_bessel_zeros(l_max: int, n_max: int) -> np.ndarray:
    """First ``n_max`` positive roots of j_l for l = 0..l_max-1.

    Uses the interlacing property: roots of j_l strictly separate roots of
    j_{l+1}, so each root of j_{l+1} is bracketed by consecutive roots of j_l.
    """
    from scipy.optimize import brentq
    from scipy.special import spherical_jn

    # Roots of j_0 are exactly n*pi; each recurrence row loses one usable
    # bracket, so start with l_max extras.
    width = n_max + l_max + 1
    zeros = np.zeros((l_max, width))
    zeros[0] = np.arange(1, width + 1) * np.pi
    valid = width
    for ell in range(1, l_max):
        f = lambda z, ell=ell: spherical_jn(ell, z)
        valid -= 1
        for k in range(valid):
            zeros[ell, k] = brentq(f, zeros[ell - 1, k], zeros[ell - 1, k + 1])
    return np.ascontiguousarray(zeros[:, :n_max])


def cutoff_poly(r: jnp.ndarray, cutoff: float) -> jnp.ndarray:
    """Smooth C^2 cutoff: 1 - 6u^5 + 15u^4 - 10u^3 for u = r/rc, 0 beyond."""
    u = r / cutoff
    val = 1.0 - 6.0 * u**5 + 15.0 * u**4 - 10.0 * u**3
    return jnp.where(u <= 1.0, val, 0.0)


def spherical_bessel_all(z: jnp.ndarray, l_max: int) -> jnp.ndarray:
    """Spherical Bessel j_l(z) for l = 0..l_max-1, stacked on a new axis 0.

    Upward recurrence j_{l+1} = (2l+1)/z * j_l - j_{l-1} for z >= 0.5; below
    that the recurrence loses ~eps/z^2 per order to cancellation, so a 6-term
    Taylor series j_l(z) = z^l/(2l+1)!! * sum_k (-z^2/2)^k / (k! (2l+3)...(2l+2k+1))
    is used instead (accurate to ~1e-14 at the switch point). This is strictly
    more accurate than the reference's EPS=1e-8 guard (interaction.py:289-323)
    and keeps all (nested) gradients finite: divisions use guarded denominators.
    """
    switch = 0.5
    small = z <= switch
    zs = jnp.where(small, 1.0, z)  # grad-safe denominator for the recurrence
    zt = jnp.where(small, z, 0.0)  # grad-safe argument for the series

    # --- series branch (exact gradients via the polynomial itself) ---
    def series(ell: int) -> jnp.ndarray:
        dfact = 1.0
        for i in range(ell):
            dfact *= 2 * i + 3  # (2l+1)!!
        term = jnp.ones_like(zt)
        acc = term
        for k in range(1, 6):
            term = term * (-(zt * zt) / 2.0) / (k * (2 * ell + 2 * k + 1))
            acc = acc + term
        return zt**ell / dfact * acc

    # --- recurrence branch ---
    rec = [jnp.sin(zs) / zs]
    if l_max > 1:
        rec.append((jnp.sin(zs) / zs - jnp.cos(zs)) / zs)
        for n in range(1, l_max - 1):
            rec.append((2 * n + 1) / zs * rec[n] - rec[n - 1])

    return jnp.stack(
        [jnp.where(small, series(ell), rec[ell]) for ell in range(l_max)]
    )


def legendre_cos_all(x: jnp.ndarray, l_max: int) -> jnp.ndarray:
    """Legendre polynomials P_l(x) for l = 0..l_max-1 via Bonnet recursion."""
    out = [jnp.ones_like(x)]
    if l_max > 1:
        out.append(x)
        for n in range(1, l_max - 1):
            out.append(((2 * n + 1) * x * out[n] - n * out[n - 1]) / (n + 1))
    return jnp.stack(out)


def chi_norm_constants(cutoff: float, l_max: int, n_max: int) -> np.ndarray:
    """Default (textbook M3GNet) chi normalization constants, (l_max, n_max):
    sqrt(2/rc^3) / |j_{l+1}(z_ln)| with z_ln the n-th root of j_l.

    NOTE — deliberate deviation from the torch reference: the reference's
    ``NormalizedSphericalBessel`` (interaction.py:248-281) computes
    ``factors[l, n] = sqrt(2/rc^3) / |j_{l+1}(z_{l+1,n})|`` — evaluating
    j_{l+1} at its OWN roots, which is ~0 up to the zeros-table truncation
    (~1e-13) — and then DIVIDES by it: ``chi = j / factors``. The shipped
    reference chi is therefore ~1e-12 and its entire three-body stage is
    numerically a no-op (verified live via utils/reference_shims.py; see
    docs/reference_parity.md). We default to the intended normalization and
    expose ``reference_literal_chi_norm`` + the ``norm_override`` hooks so the
    parity harness can still pin our stack bit-for-bit to the literal
    reference behavior.
    """
    from scipy.special import spherical_jn

    zeros = spherical_bessel_zeros(l_max + 1, n_max)
    return np.stack(
        [
            math.sqrt(2.0 / cutoff**3) / np.abs(spherical_jn(ell + 1, zeros[ell]))
            for ell in range(l_max)
        ]
    )  # (l_max, n_max)


def reference_literal_chi_norm(
    cutoff: float, l_max: int, n_max: int, zeros_table: np.ndarray | None = None
) -> np.ndarray:
    """(l_max, n_max) constants reproducing the torch reference's LITERAL chi.

    Mirrors interaction.py:256-281: chi = j_l(z_ln r/rc) / factors with
    factors = sqrt(2/rc^3) / |j_{l+1}(z_{l+1,n})|, i.e. the returned constant
    is |j_{l+1}(z_{l+1,n})| / sqrt(2/rc^3). Because j_{l+1} is evaluated at
    its own tabulated roots, the value depends on the PRECISION of the zeros
    table; for exact parity pass the reference's table (read at runtime from
    the live import, e.g. ``torch_m3gnet.nn.interaction.SPHERICAL_BESSEL_ZEROS``).
    """
    from scipy.special import spherical_jn

    zeros = (
        np.asarray(zeros_table, dtype=np.float64)
        if zeros_table is not None
        else spherical_bessel_zeros(l_max + 2, n_max)
    )
    return np.stack(
        [
            np.abs(spherical_jn(ell + 1, zeros[ell + 1][:n_max]))
            / math.sqrt(2.0 / cutoff**3)
            for ell in range(l_max)
        ]
    )


def normalized_spherical_bessel(
    r: jnp.ndarray, cutoff: float, l_max: int, n_max: int,
    norm_override: np.ndarray | None = None,
) -> jnp.ndarray:
    """chi_ln(r) = norm_ln * j_l(z_ln r/rc); default norm is
    :func:`chi_norm_constants`, ``norm_override`` (l_max, n_max) replaces it
    (parity with the reference's literal constants).

    Returns shape (l_max, n_max, *r.shape). Normalization constants are
    host-side numpy, constant-folded into the jitted graph.
    """
    zeros = spherical_bessel_zeros(l_max + 1, n_max)  # (l_max+1, n_max)
    norm = (
        np.asarray(norm_override, dtype=np.float64)
        if norm_override is not None
        else chi_norm_constants(cutoff, l_max, n_max)
    )

    # j_l evaluated at z_ln * r / rc for every (l, n): evaluate per order.
    chis = []
    for ell in range(l_max):
        z = zeros[ell][(...,) + (None,) * r.ndim] * r[None] / cutoff  # (n_max, *r)
        j = spherical_bessel_all(z.reshape(n_max, -1), ell + 1)[ell]
        chis.append(j.reshape((n_max,) + r.shape) * norm[ell][(...,) + (None,) * r.ndim])
    return jnp.stack(chis)  # (l_max, n_max, *r)


def racah_l_index(l_max: int) -> np.ndarray:
    """Degree l of each component of :func:`real_racah_harmonics`: (M,) int,
    M = sum_{l<l_max} (2l+1) = l_max^2."""
    return np.concatenate(
        [np.full(2 * ell + 1, ell, dtype=np.int64) for ell in range(l_max)]
    )


def real_racah_harmonics(u: jnp.ndarray, l_max: int) -> jnp.ndarray:
    """Real Racah-normalized solid harmonics C_lm(u) for l = 0..l_max-1.

    ``u`` is (*batch, 3) of UNIT vectors; output is (*batch, l_max^2) with
    components grouped by l (see :func:`racah_l_index`), normalized so the
    Legendre addition theorem holds exactly:

        sum_m C_lm(a) C_lm(b) = P_l(a . b)          for unit a, b.

    This is the identity that factorizes the reference's per-triplet angular
    term P_l(cos theta_jik) (/root/reference/src/torch_m3gnet/nn/invariant.py
    via interaction.py:187-202) into per-EDGE features, collapsing the
    O(T)-scale three-body stage to O(E) dense ops (models/m3gnet.py).
    Validated against numpy Legendre in tests/test_basis.py.

    Works for any ``l_max``: the associated Legendre factor is built with the
    standard (m, m) -> (m+1, m) -> (l, m) recurrences on the *scaled*
    polynomials Pi_l^m(z) = P_l^m(z) / r_xy^m (so no (1-z^2)^(m/2) branch
    cuts — everything is polynomial in x, y, z and grad-safe at the poles),
    and the azimuthal factor r_xy^m (cos m phi, sin m phi) = (Re, Im)(x+iy)^m
    via the complex-power recurrence. The Condon-Shortley phase is dropped;
    it cancels in the C_lm(a) C_lm(b) products the model consumes.
    """
    x, y, z = u[..., 0], u[..., 1], u[..., 2]
    return jnp.stack(_racah_components(x, y, z, l_max), axis=-1)


def real_racah_harmonics_fm(u_fm: jnp.ndarray, l_max: int) -> jnp.ndarray:
    """Feature-major :func:`real_racah_harmonics`: (3, E) unit vectors ->
    (l_max^2, E) with components on axis 0 — every intermediate is a rank-1
    (E,) array with E on TPU lanes, so nothing materializes in the 42x-padded
    (E, 3) layout."""
    return jnp.stack(_racah_components(u_fm[0], u_fm[1], u_fm[2], l_max), axis=0)


def _racah_components(x, y, z, l_max: int) -> list:
    """Elementwise component list shared by the em/fm stackings."""
    # Pi_l^m(z): pi_mm[m] = (2m-1)!!, then upward in l at fixed m.
    pi: dict = {(0, 0): jnp.ones_like(z)}
    for m in range(1, l_max):
        pi[(m, m)] = (2 * m - 1) * pi[(m - 1, m - 1)]
    for m in range(l_max):
        if m + 1 < l_max:
            pi[(m + 1, m)] = (2 * m + 1) * z * pi[(m, m)]
        for ell in range(m + 2, l_max):
            pi[(ell, m)] = (
                (2 * ell - 1) * z * pi[(ell - 1, m)] - (ell - 1 + m) * pi[(ell - 2, m)]
            ) / (ell - m)
    # r_xy^m (cos m phi, sin m phi) = (A_m, B_m), (A,B)_m = (x+iy) (A,B)_{m-1}.
    a_m, b_m = [jnp.ones_like(x)], [jnp.zeros_like(x)]
    for m in range(1, l_max):
        a_m.append(x * a_m[m - 1] - y * b_m[m - 1])
        b_m.append(x * b_m[m - 1] + y * a_m[m - 1])
    comps = []
    for ell in range(l_max):
        comps.append(pi[(ell, 0)])  # m = 0: P_l(z)
        for m in range(1, ell + 1):
            norm = math.sqrt(2.0 * math.factorial(ell - m) / math.factorial(ell + m))
            comps.append(norm * pi[(ell, m)] * a_m[m])
            comps.append(norm * pi[(ell, m)] * b_m[m])
    return comps


def legendre_cos_tmajor(x: jnp.ndarray, l_max: int) -> jnp.ndarray:
    """P_l(x) stacked on the LAST axis: shape (*x.shape, l_max).

    Entity-major layout keeps the big axis on TPU sublanes and the small l
    axis on lanes — no (l, T) -> (T, l) transpose in the model's hot path.
    """
    out = [jnp.ones_like(x)]
    if l_max > 1:
        out.append(x)
        for n in range(1, l_max - 1):
            out.append(((2 * n + 1) * x * out[n] - n * out[n - 1]) / (n + 1))
    return jnp.stack(out, axis=-1)


def normalized_spherical_bessel_tmajor(
    r: jnp.ndarray, cutoff: float, l_max: int, n_max: int,
    norm_override: np.ndarray | None = None,
) -> jnp.ndarray:
    """chi_ln(r) with entity-major layout: shape (*r.shape, l_max, n_max)."""
    zeros = spherical_bessel_zeros(l_max + 1, n_max)
    norm = (
        np.asarray(norm_override, dtype=np.float64)
        if norm_override is not None
        else chi_norm_constants(cutoff, l_max, n_max)
    )
    outs = []
    for ell in range(l_max):
        z = r[..., None] * (zeros[ell] / cutoff)  # (..., n)
        j = spherical_bessel_all(z, ell + 1)[ell]
        outs.append(j * norm[ell])
    return jnp.stack(outs, axis=-2)  # (..., l, n)


def smooth_radial_basis(
    r: jnp.ndarray, n_max: int, cutoff: float, axis: int = -1
) -> jnp.ndarray:
    """Kocer-style smooth radial basis h_m(r), m = 0..n_max-1.

    f_m(r) = c_m * (sinc((m+1) pi r / rc) + sinc((m+2) pi r / rc))
    where sinc is the *normalized* sinc sin(pi x)/(pi x) applied to the already
    pi-scaled argument — reproducing the reference's ``torch.sinc`` usage
    exactly (featurizer.py:86-89) for activation parity,
    h_m    = (f_m + sqrt(e_m / d_{m-1}) h_{m-1}) / sqrt(d_m)
    with e_m = m^2 (m+2)^2 / (4 (m+1)^4 + 1), d_0 = 1, d_m = 1 - e_m / d_{m-1},
    c_m = (-1)^m sqrt(2) pi / rc^1.5 * (m+1)(m+2) / sqrt((m+1)^2 + (m+2)^2).

    Returns shape (*r.shape, n_max). Math spec:
    /root/reference/docs/architecture.md:69-89.
    """
    m = np.arange(n_max, dtype=np.float64)
    em = (m**2) * ((m + 2) ** 2) / (4 * ((m + 1) ** 4) + 1)
    dm = np.ones(n_max)
    for i in range(1, n_max):
        dm[i] = 1 - em[i] / dm[i - 1]
    coeff = (
        ((-1.0) ** m)
        * math.sqrt(2.0)
        * math.pi
        / cutoff**1.5
        * (m + 1)
        * (m + 2)
        / np.sqrt((m + 1) ** 2 + (m + 2) ** 2)
    )

    def sinc(x):
        # normalized sinc: sin(pi x)/(pi x), safe at 0
        small = jnp.abs(x) <= _EPS
        xs = jnp.where(small, 1.0, x)
        return jnp.where(small, 1.0, jnp.sin(jnp.pi * xs) / (jnp.pi * xs))

    hs = []
    for i in range(n_max):
        f = coeff[i] * (
            sinc((i + 1) * math.pi / cutoff * r) + sinc((i + 2) * math.pi / cutoff * r)
        )
        if i == 0:
            h = f
        else:
            h = (f + math.sqrt(em[i] / dm[i - 1]) * hs[i - 1]) / math.sqrt(dm[i])
        hs.append(h)
    return jnp.stack(hs, axis=axis)


def smooth_radial_basis_fm(
    r: jnp.ndarray, n_max: int, cutoff: float
) -> jnp.ndarray:
    """Feature-major :func:`smooth_radial_basis`: shape (n_max, *r.shape) —
    intermediates stay rank-1 (E on lanes); the stack lands on axis 0."""
    return smooth_radial_basis(r, n_max, cutoff, axis=0)

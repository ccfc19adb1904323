"""Equation-of-state utilities: energy-volume curves + Birch-Murnaghan fit.

Complements simulate/elastic.py on the downstream-capability surface: the
E(V) curve reuses ONE compiled potential evaluation (isotropic strains keep
every array shape static), and the third-order Birch-Murnaghan fit yields
(E0, V0, B0, B0') — the standard bulk-property workflow the reference never
implements against its own model.
"""

from __future__ import annotations

import numpy as np

from torch_m3gnet_tpu.simulate.elastic import EV_PER_A3_TO_GPA


def energy_volume_curve(
    potential, params, batch, strains=None
) -> tuple[np.ndarray, np.ndarray]:
    """Volumes (A^3) and energies (eV) under isotropic strain of a
    single-graph batch. One jit compilation serves every point (static
    shapes; only array values change)."""
    if batch.num_graphs_real != 1:
        raise ValueError("energy_volume_curve expects a single-graph batch")
    if strains is None:
        strains = np.linspace(-0.04, 0.04, 13)
    pos0 = np.asarray(batch.positions, dtype=np.float64)
    lat0 = np.asarray(batch.lattice, dtype=np.float64)
    v0 = abs(np.linalg.det(lat0[0]))
    vols, energies = [], []
    for s in np.asarray(strains, dtype=np.float64):
        f = 1.0 + s
        b = batch.replace(
            positions=(pos0 * f).astype(batch.positions.dtype),
            lattice=(lat0 * f).astype(batch.lattice.dtype),
        )
        energies.append(float(np.asarray(potential.apply(params, b).energy)[0]))
        vols.append(v0 * f**3)
    return np.asarray(vols), np.asarray(energies)


def birch_murnaghan(v, e0, v0, b0, b0p):
    """Third-order Birch-Murnaghan E(V); b0 in eV/A^3."""
    eta = (v0 / v) ** (2.0 / 3.0)
    return e0 + 9.0 * v0 * b0 / 16.0 * (
        (eta - 1.0) ** 3 * b0p + (eta - 1.0) ** 2 * (6.0 - 4.0 * eta)
    )


def birch_murnaghan_fit(volumes, energies) -> dict:
    """Fit (E0, V0, B0, B0') to an E(V) curve; B0 returned in GPa too.

    Initial guesses come from a parabola in V; the fit needs the sampled
    range to bracket the minimum (raises otherwise).
    """
    from scipy.optimize import curve_fit

    v = np.asarray(volumes, dtype=np.float64)
    e = np.asarray(energies, dtype=np.float64)
    i = int(np.argmin(e))
    if i in (0, len(e) - 1):
        raise ValueError(
            "energy minimum is at the edge of the sampled volume range; "
            "widen the strain window"
        )
    coef = np.polyfit(v, e, 2)
    v0 = -coef[1] / (2 * coef[0])
    b0 = max(2 * coef[0] * v0, 1e-6)
    p, _ = curve_fit(
        birch_murnaghan, v, e, p0=[e.min(), v0, b0, 4.0], maxfev=20000
    )
    e0, v0, b0, b0p = map(float, p)
    resid = float(np.sqrt(np.mean((birch_murnaghan(v, *p) - e) ** 2)))
    return {
        "e0_ev": e0,
        "v0_a3": v0,
        "b0_ev_a3": b0,
        "b0_gpa": b0 * EV_PER_A3_TO_GPA,
        "b0_prime": b0p,
        "rms_resid_ev": resid,
    }

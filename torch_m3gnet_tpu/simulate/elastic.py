"""Second-order observables by exact automatic differentiation.

Downstream capabilities beyond the reference's scope (it only ever shells
out to the TF m3gnet for relaxation, /root/reference/scripts/relax_org.py):
elastic constants and Gamma-point phonons computed as EXACT second
derivatives of the jitted potential — `jax.hessian` composes forward-over-
reverse through the whole model (including the gather/segment custom VJPs
and the factorized three-body stage), so there is no finite-difference
step-size tuning and no supercell displacement bookkeeping.

Conventions:
- strain: lattice and positions deform affinely, x -> x @ (1 + eps), with
  Voigt engineering shears (eps_4..6 are 2*eps_yz etc.), so the returned
  C_ij = (1/V) d^2E / d eps_i d eps_j is the standard elastic matrix;
- clamped-ion: internal coordinates are NOT re-relaxed under strain (the
  pure second derivative). For relaxed-ion constants relax at each strain
  with simulate/relax.py and finite-difference the relaxed energies;
- phonons: the dynamical matrix is the position Hessian of the PBC energy
  mass-weighted in place; its PBC construction satisfies the acoustic sum
  rule by construction (uniform translations cost nothing), so Gamma has
  three exact zero modes.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

EV_PER_A3_TO_GPA = 160.21766208

# sqrt(eV / (amu * A^2)) -> THz (nu = omega / 2pi)
_SQRT_EV_AMU_A2_TO_THZ = 15.633302


def _energy_fn(potential, params, batch):
    """Differentiable total energy as a function of (positions, lattice)."""
    from torch_m3gnet_tpu.models.m3gnet import edge_vectors, edge_vectors_fm

    model = potential.model
    ev = edge_vectors_fm if model.layout == "fm" else edge_vectors

    def energy(positions, lattice):
        g = batch.replace(positions=positions, lattice=lattice)
        rv = ev(g, positions, lattice)
        total, _ = model.apply(params, g, rv)
        return jnp.sum(total)

    return energy


def voigt_strain_matrix(eps6: jnp.ndarray) -> jnp.ndarray:
    """(6,) engineering Voigt strain -> symmetric (3, 3) strain matrix."""
    e = eps6
    return jnp.array(
        [
            [e[0], e[5] / 2, e[4] / 2],
            [e[5] / 2, e[1], e[3] / 2],
            [e[4] / 2, e[3] / 2, e[2]],
        ]
    )


def elastic_tensor(potential, params, batch, gpa: bool = True) -> np.ndarray:
    """Clamped-ion elastic matrix C (6, 6) of a SINGLE-graph batch.

    C_ij = (1/V) d^2 E / (d eps_i d eps_j) at zero strain, exact autodiff
    (forward-over-reverse). Returns GPa by default, eV/A^3 otherwise.
    """
    if batch.num_graphs_real != 1:
        raise ValueError("elastic_tensor expects a single-graph batch")
    energy = _energy_fn(potential, params, batch)
    pos0 = jnp.asarray(batch.positions)
    lat0 = jnp.asarray(batch.lattice)

    def e_of_eps(eps6):
        deform = jnp.eye(3, dtype=pos0.dtype) + voigt_strain_matrix(eps6).astype(
            pos0.dtype
        )
        return energy(pos0 @ deform, lat0 @ deform)

    hess = jax.hessian(e_of_eps)(jnp.zeros(6, dtype=pos0.dtype))
    vol = float(
        np.abs(np.linalg.det(np.asarray(batch.lattice, dtype=np.float64)[0]))
    )
    c = np.asarray(hess, dtype=np.float64) / vol
    c = 0.5 * (c + c.T)
    return c * EV_PER_A3_TO_GPA if gpa else c


def bulk_modulus_voigt(c_gpa: np.ndarray) -> float:
    """Voigt-average bulk modulus from the elastic matrix (GPa in, GPa out)."""
    c = np.asarray(c_gpa)
    return float(
        (c[0, 0] + c[1, 1] + c[2, 2] + 2 * (c[0, 1] + c[0, 2] + c[1, 2])) / 9.0
    )


def force_constants(potential, params, batch) -> np.ndarray:
    """(N, 3, N, 3) PBC force-constant matrix d^2E/du_i du_j, exact autodiff.

    Folded over periodic images by construction (the PBC energy already sums
    them), i.e. the supercell-Gamma force constants of the given cell.
    """
    if batch.num_graphs_real != 1:
        raise ValueError("force_constants expects a single-graph batch")
    energy = _energy_fn(potential, params, batch)
    pos0 = jnp.asarray(batch.positions)
    lat0 = jnp.asarray(batch.lattice)
    n = int(batch.n_node[0])

    hess = jax.hessian(lambda p: energy(p, lat0))(pos0)
    return np.asarray(hess, dtype=np.float64)[:n, :, :n, :]


def phonon_dispersion(
    potential,
    params,
    primitive,
    reps,
    k_frac,
    masses_amu,
    cutoff: float,
    threebody_cutoff: float,
    pad_multiple: int = 64,
) -> dict:
    """Phonon frequencies along a k-path by the supercell force-constant
    method, with the force constants from ONE exact autodiff Hessian.

    ``primitive`` is the unit cell; ``reps = (na, nb, nc)`` builds the
    supercell whose PBC Hessian supplies the interatomic force constants.
    ``k_frac`` is (nk, 3) in fractional coordinates of the PRIMITIVE
    reciprocal lattice; ``masses_amu`` has one mass per primitive atom.

    D(k)_{p a, p' b} = (m_p m_p')^{-1/2} sum_R Phi[(0,p)a, (R,p')b] e^{i k.R}

    using the image-major supercell ordering (data/structure.py:84-95:
    supercell atom s = m * n_prim + p with R_m in lexicographic order).
    Frequencies are EXACT at k commensurate with the supercell (the PBC
    Hessian folds longer-ranged contributions onto equivalent images —
    standard supercell-method aliasing) and Fourier-interpolated elsewhere.

    Returns {"frequencies_thz": (nk, 3*n_prim) ascending per k (negative =
    imaginary), "force_constants": the supercell (N, 3, N, 3) array}.
    """
    from torch_m3gnet_tpu.data.graph import cast_batch, pack_structures

    na, nb, nc = reps
    n_prim = len(primitive)
    masses = np.asarray(masses_amu, dtype=np.float64).reshape(n_prim)
    sc = primitive.supercell(reps)
    batch = cast_batch(
        pack_structures([sc], cutoff, threebody_cutoff, pad_multiple=pad_multiple),
        np.float64,
    )
    phi = force_constants(potential, params, batch)  # (N, 3, N, 3)

    images = np.array(
        [[i, j, k] for i in range(na) for j in range(nb) for k in range(nc)],
        dtype=np.float64,
    )  # matches Structure.supercell ordering
    n_img = len(images)
    # Phi blocks between home-cell atom p and image-m atom p'
    blocks = phi[:n_prim].reshape(n_prim, 3, n_img, n_prim, 3)

    inv_sqrt_m = 1.0 / np.sqrt(masses)
    k_frac = np.atleast_2d(np.asarray(k_frac, dtype=np.float64))
    freqs = np.empty((len(k_frac), 3 * n_prim))
    for ki, kf in enumerate(k_frac):
        phase = np.exp(2j * np.pi * (images @ kf))  # (n_img,)
        dk = np.einsum("pamqb,m->paqb", blocks, phase)  # (np,3,np,3) complex
        dk = (
            dk
            * inv_sqrt_m[:, None, None, None]
            * inv_sqrt_m[None, None, :, None]
        ).reshape(3 * n_prim, 3 * n_prim)
        dk = 0.5 * (dk + dk.conj().T)
        evals = np.linalg.eigvalsh(dk)
        freqs[ki] = (
            np.sign(evals) * np.sqrt(np.abs(evals)) * _SQRT_EV_AMU_A2_TO_THZ
        )
    return {"frequencies_thz": freqs, "force_constants": phi}


def gamma_phonons(potential, params, batch, masses_amu) -> dict:
    """Gamma-point phonon frequencies (THz) and eigenvectors of one cell.

    Returns {"frequencies_thz": (3N,) sorted (negative = imaginary, i.e.
    sqrt of a negative dynamical-matrix eigenvalue), "modes": (3N, N, 3),
    "force_constants": (N, 3, N, 3)}.
    """
    n = int(batch.n_node[0])
    masses = np.asarray(masses_amu, dtype=np.float64).reshape(n)
    phi = force_constants(potential, params, batch)  # eV / A^2

    inv_sqrt_m = 1.0 / np.sqrt(masses)
    dyn = (
        phi
        * inv_sqrt_m[:, None, None, None]
        * inv_sqrt_m[None, None, :, None]
    ).reshape(3 * n, 3 * n)
    dyn = 0.5 * (dyn + dyn.T)
    evals, evecs = np.linalg.eigh(dyn)  # eV / (amu A^2)
    freqs = np.sign(evals) * np.sqrt(np.abs(evals)) * _SQRT_EV_AMU_A2_TO_THZ
    modes = evecs.T.reshape(3 * n, n, 3) * inv_sqrt_m[None, :, None]
    return {
        "frequencies_thz": freqs,
        "modes": modes,
        "force_constants": phi,
    }

"""Induced point-dipole polarization (AMOEBA-class mutual polarization).

The reference's solvent MM is Tinker9 AMOEBA with mutual dipole
polarization (src/Calculators/tinker_async.py:127-145: `polarization
mutual`, converged to 0.01).  This module brings the induced-dipole physics
in-graph as an optional term on top of the fixed-charge MM engine:

  * per-atom isotropic polarizabilities (Thole/AMOEBA element values)
  * permanent field from point charges with Thole damping and 1-2/1-3
    masking, evaluated over the existing [N, K] neighbor lists
  * mutual induction solved by a fixed number of successive-over-relaxation
    Jacobi iterations (the TPU analog of Tinker's CG-to-tolerance: static
    iteration count keeps one compiled program; 4 SOR iterations reach
    ~1e-2 D residuals, matching the reference's 0.01 convergence target)
  * energy from the variational functional
        U[mu] = 1/2 mu a^-1 mu - mu.E0 - 1/2 mu.T.mu
    evaluated at the (stop-gradient) converged dipoles: at the SCF fixed
    point dU/dmu = 0, so position gradients of U at fixed mu are exact
    forces up to the residual (envelope theorem / extrapolated-polarization
    practice).

This is the induced-dipole half of AMOEBA; permanent multipoles beyond
charges are future work (ROADMAP.md).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ai2bmd_tpu import units
from ai2bmd_tpu.ops.neighbors import NeighborList, _pbc_diff

# Thole/AMOEBA isotropic polarizabilities (A^3) by atomic number
# (standard published values: Thole 1981 / AMOEBA water & protein papers)
POLARIZABILITY = {
    1: 0.496,
    6: 1.334,
    7: 1.073,
    8: 0.837,
    11: 0.120,
    15: 1.828,
    16: 2.800,
    17: 4.000,
}
THOLE_A = 0.39  # AMOEBA damping coefficient


@dataclasses.dataclass
class PolarizationParams:
    alpha: Any          # [N] A^3
    charge: Any         # [N] e
    excl_mask_pairs: Any  # [M,2] 1-2/1-3 pairs masked from the permanent field
    n_iter: int = 4
    sor: float = 0.7
    cutoff: float = 9.0

    @classmethod
    def build(cls, numbers: np.ndarray, charges: np.ndarray,
              excl_pairs: np.ndarray, cutoff: float = 9.0,
              n_iter: int = 4) -> "PolarizationParams":
        alpha = np.array([POLARIZABILITY.get(int(z), 1.0) for z in numbers])
        return cls(
            alpha=jnp.asarray(alpha, jnp.float32),
            charge=jnp.asarray(charges, jnp.float32),
            excl_mask_pairs=jnp.asarray(excl_pairs, jnp.int32),
            n_iter=n_iter,
            cutoff=cutoff,
        )


def _thole_factors(r, alpha_i, alpha_j):
    """Thole damping scale factors (lambda3, lambda5) for damped T tensors."""
    aa = (alpha_i * alpha_j) ** (1.0 / 6.0)
    u = r / jnp.maximum(aa, 1e-6)
    expu = jnp.exp(-THOLE_A * u**3)
    lam3 = 1.0 - expu
    lam5 = 1.0 - (1.0 + THOLE_A * u**3) * expu
    return lam3, lam5


def _pair_geometry(pol: PolarizationParams, P, nl: NeighborList, cell):
    Pj = jnp.concatenate([P, jnp.zeros((1, 3), P.dtype)])[nl.idx]
    vec = _pbc_diff(Pj - P[:, None, :], cell)          # r_ij = r_j - r_i
    d2 = jnp.sum(vec * vec, axis=-1)
    valid = nl.valid & (d2 < pol.cutoff**2)
    d2 = jnp.where(valid, d2, 1.0)
    inv_r = jax.lax.rsqrt(d2)
    inv_r3 = inv_r / d2
    aj = jnp.concatenate([pol.alpha, jnp.ones(1)])[nl.idx]
    lam3, lam5 = _thole_factors(jnp.sqrt(d2), pol.alpha[:, None], aj)
    return vec, d2, inv_r3, valid, lam3, lam5, aj


def permanent_field(pol: PolarizationParams, P, nl: NeighborList, cell):
    """Damped field at each atom from all point charges (eV/e/A units)."""
    vec, d2, inv_r3, valid, lam3, _, _ = _pair_geometry(pol, P, nl, cell)
    qj = jnp.concatenate([pol.charge, jnp.zeros(1)])[nl.idx]
    # E_i = sum_j q_j * (r_i - r_j)/r^3 = -sum_j q_j vec/r^3
    contrib = -(qj * lam3 * inv_r3)[..., None] * vec
    contrib = jnp.where(valid[..., None], contrib, 0.0)
    E0 = units.COULOMB * jnp.sum(contrib, axis=1)

    # remove masked (1-2/1-3) pair contributions
    if pol.excl_mask_pairs.shape[0]:
        i, j = pol.excl_mask_pairs[:, 0], pol.excl_mask_pairs[:, 1]
        v = _pbc_diff(P[j] - P[i], cell)
        d2e = jnp.maximum(jnp.sum(v * v, -1), 1e-6)
        inv3 = d2e**-1.5
        lam3e, _ = _thole_factors(jnp.sqrt(d2e), pol.alpha[i], pol.alpha[j])
        corr_i = -(pol.charge[j] * lam3e * inv3)[:, None] * v
        corr_j = (pol.charge[i] * lam3e * inv3)[:, None] * v
        E0 = E0.at[i].add(-units.COULOMB * corr_i)
        E0 = E0.at[j].add(-units.COULOMB * corr_j)
    return E0


def dipole_field(pol: PolarizationParams, P, mu, nl: NeighborList, cell):
    """Field at each atom from all induced dipoles (Thole-damped)."""
    vec, d2, inv_r3, valid, lam3, lam5, _ = _pair_geometry(pol, P, nl, cell)
    muj = jnp.concatenate([mu, jnp.zeros((1, 3), mu.dtype)])[nl.idx]
    mu_dot_r = jnp.sum(muj * vec, axis=-1)
    # T.mu = (3 lam5 (mu.r) r / r^5 - lam3 mu / r^3)
    contrib = (
        3.0 * lam5 * mu_dot_r / d2
    )[..., None] * vec * inv_r3[..., None] - (lam3 * inv_r3)[..., None] * muj
    contrib = jnp.where(valid[..., None], contrib, 0.0)
    return units.COULOMB * jnp.sum(contrib, axis=1)


def induce_dipoles(pol: PolarizationParams, P, nl: NeighborList, cell):
    """Fixed-iteration SOR mutual induction; returns (mu [N,3], E0)."""
    E0 = permanent_field(pol, P, nl, cell)
    alpha = pol.alpha[:, None] / units.COULOMB  # e*A / (eV/e/A) units

    mu = alpha * E0

    def body(_, mu):
        E_mut = dipole_field(pol, P, mu, nl, cell)
        mu_new = alpha * (E0 + E_mut)
        return (1.0 - pol.sor) * mu + pol.sor * mu_new

    mu = jax.lax.fori_loop(0, pol.n_iter, body, mu)
    return mu, E0


def polarization_energy(pol: PolarizationParams, P, nl: NeighborList, cell):
    """Variational polarization energy at (stop-gradient) converged mu."""
    mu, E0 = induce_dipoles(pol, P, nl, cell)
    mu = jax.lax.stop_gradient(mu)
    alpha = pol.alpha[:, None] / units.COULOMB
    self_e = 0.5 * jnp.sum(mu * mu / jnp.maximum(alpha, 1e-9))
    perm_e = -jnp.sum(mu * E0)
    mut_e = -0.5 * jnp.sum(mu * dipole_field(pol, P, mu, nl, cell))
    return self_e + perm_e + mut_e


def polarization_energy_forces(pol: PolarizationParams, P, nl, cell):
    e, g = jax.value_and_grad(lambda p: polarization_energy(pol, p, nl, cell))(P)
    return e, -g

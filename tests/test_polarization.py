"""Induced-dipole polarization tests: analytic single-dipole limit, water
dimer induction sanity, SCF convergence, force consistency."""

import jax
import jax.numpy as jnp
import numpy as np

from ai2bmd_tpu import units
from ai2bmd_tpu.ops.neighbors import build_neighbor_list
from ai2bmd_tpu.physics import polarization as POL


def _nl(P, cutoff, cell=None):
    return build_neighbor_list(
        jnp.asarray(P, jnp.float32), cutoff, len(P),
        None if cell is None else jnp.asarray(cell, jnp.float32),
    )


def _params(numbers, charges, cutoff=12.0, n_iter=6, excl=None):
    if excl is None:
        excl = np.zeros((0, 2), np.int32)
    return POL.PolarizationParams.build(
        np.asarray(numbers), np.asarray(charges, float),
        np.asarray(excl, np.int32), cutoff=cutoff, n_iter=n_iter,
    )


WATER2_EXCL = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5)]


def test_single_polarizable_atom_in_charge_field():
    """One polarizable atom at distance r from a charge q:
    E_pol = -1/2 alpha E^2 with E = k q / r^2 (damping ~1 at 5 A)."""
    q = 1.0
    r = 5.0
    numbers = [8, 11]           # polarizable O + a sodium charge
    charges = [0.0, q]
    P = np.array([[0.0, 0.0, 0.0], [r, 0.0, 0.0]])
    pol = _params(numbers, charges)
    # sodium's polarizability also reacts; zero it for the analytic check
    pol.alpha = pol.alpha.at[1].set(1e-6)
    nl = _nl(P, 12.0)
    e = float(POL.polarization_energy(pol, jnp.asarray(P, jnp.float32), nl, None))
    E_field = units.COULOMB * q / r**2
    alpha = POL.POLARIZABILITY[8] / units.COULOMB
    expected = -0.5 * alpha * E_field**2
    assert abs(e - expected) < 5e-3 * abs(expected), (e, expected)


def test_water_dimer_induction_negative():
    """TIP3P-charged water dimer at H-bond distance: induction lowers E."""
    # donor O-H...O acceptor along x, O-O 2.8 A
    d = np.array(
        [[0.0, 0.0, 0.0], [0.96, 0.0, 0.0], [-0.24, 0.93, 0.0]]
    )  # O, H(donor), H
    a = np.array(
        [[2.8, 0.0, 0.0], [3.35, 0.76, 0.0], [3.35, -0.76, 0.0]]
    )
    P = np.concatenate([d, a])
    numbers = [8, 1, 1, 8, 1, 1]
    charges = [-0.834, 0.417, 0.417, -0.834, 0.417, 0.417]
    # AMOEBA-style polarization groups: intramolecular fields masked
    pol = _params(numbers, charges, excl=WATER2_EXCL)
    nl = _nl(P, 12.0)
    e = float(POL.polarization_energy(pol, jnp.asarray(P, jnp.float32), nl, None))
    # induction energy for a water dimer is around -2 to -8 kJ/mol
    kj = e / units.kJ_per_mol
    assert -15.0 < kj < -0.3, kj


def test_scf_converges():
    """Residual |mu - alpha(E0 + T mu)| shrinks with iterations."""
    rng = np.random.default_rng(0)
    n = 12
    P = rng.random((n, 3)) * 6 + np.arange(n)[:, None] * 0.5
    numbers = [8, 1, 1] * 4
    charges = [-0.834, 0.417, 0.417] * 4
    excl = [(3*m + a, 3*m + b) for m in range(4) for a, b in ((0,1),(0,2),(1,2))]
    residuals = []
    for it in (1, 3, 6):
        pol = _params(numbers, charges, n_iter=it, excl=excl)
        nl = _nl(P, 12.0)
        mu, E0 = POL.induce_dipoles(pol, jnp.asarray(P, jnp.float32), nl, None)
        alpha = pol.alpha[:, None] / units.COULOMB
        target = alpha * (
            E0 + POL.dipole_field(pol, jnp.asarray(P, jnp.float32), mu, nl, None)
        )
        residuals.append(float(jnp.abs(mu - target).max()))
    assert residuals[2] < residuals[0] * 0.2, residuals
    # converged to ~the reference's 0.01 D target (1 D ~ 0.2082 e*A)
    assert residuals[2] < 0.01 * 0.2082, residuals


def test_forces_match_finite_differences():
    P = np.array(
        [[0.0, 0.0, 0.0], [0.96, 0.0, 0.0], [-0.24, 0.93, 0.0],
         [2.9, 0.1, 0.0], [3.4, 0.8, 0.1], [3.4, -0.7, -0.1]]
    )
    numbers = [8, 1, 1, 8, 1, 1]
    charges = [-0.834, 0.417, 0.417, -0.834, 0.417, 0.417]
    pol = _params(numbers, charges, n_iter=10, excl=WATER2_EXCL)
    nl = _nl(P, 12.0)
    P32 = jnp.asarray(P, jnp.float32)
    f = jax.jit(lambda p: POL.polarization_energy_forces(pol, p, nl, None))
    e0, F = f(P32)
    h = 2e-3
    for (a_i, c) in [(0, 0), (3, 1)]:
        dp = jnp.zeros_like(P32).at[a_i, c].set(h)
        fd = -(float(f(P32 + dp)[0]) - float(f(P32 - dp)[0])) / (2 * h)
        # envelope theorem: exact up to the SCF residual
        assert abs(fd - float(F[a_i, c])) < 0.05 * max(0.05, abs(fd)), (
            a_i, c, fd, float(F[a_i, c])
        )

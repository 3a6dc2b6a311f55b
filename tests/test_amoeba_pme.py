"""Multipole SPME validation: the k-space direct reference pins every
convention (structure factor, spread stencils, self term, exclusion
adjustment), then the periodic AMOEBA water box checks forces and
invariances.  Mirrors tests/test_pme.py's strategy for the charge-only
SPME (reference: helPME usage at src/Calculators/pme.py:121-153)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai2bmd_tpu import units
from ai2bmd_tpu.physics import amoeba as AM
from ai2bmd_tpu.physics import amoeba_pme as MP


@pytest.fixture(autouse=True)
def _f64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _random_system(rng, n=8):
    # half-box 6.5 A: with beta >= 0.5 the nearest-image real-space
    # truncation is erfc(3.25) ~ 4e-6 — inside the test tolerances
    cell = np.array([14.0, 15.0, 13.0])
    P = rng.random((n, 3)) * cell
    q = rng.standard_normal(n)
    q -= q.mean()
    mu = rng.standard_normal((n, 3)) * 0.3
    A = rng.standard_normal((n, 3, 3)) * 0.2
    th = 0.5 * (A + np.transpose(A, (0, 2, 1)))
    th -= np.eye(3)[None] * np.trace(th, axis1=1, axis2=2)[:, None, None] / 3
    return cell, P, q, mu, th


@pytest.mark.slow
def test_direct_sum_beta_independent(rng):
    cell, P, q, mu, th = _random_system(rng)
    totals = []
    for beta in (0.5, 0.62):
        er, ek, es = MP.ewald_multipole_direct(P, q, mu, th, cell, beta, kmax=10)
        totals.append(er + ek + es)
    np.testing.assert_allclose(totals[0], totals[1], atol=5e-5)


@pytest.mark.slow
def test_mesh_matches_direct(rng):
    """SPME (order-6 splines, derivative stencils) vs the exact k-space sum
    — includes the q/mu/Theta cross terms that pin the relative spread
    signs."""
    cell, P, q, mu, th = _random_system(rng)
    beta = 0.5
    er, ek, es = MP.ewald_multipole_direct(P, q, mu, th, cell, beta, kmax=10)
    pme = MP.MultipoleEwaldParams.build(cell, beta=beta, grid_spacing=0.45)
    ii, jj = np.triu_indices(len(q), 1)
    mask = np.ones(len(ii), bool)
    e = MP.multipole_ewald_energy(
        pme, jnp.asarray(P), jnp.asarray(q), jnp.asarray(mu), jnp.asarray(th),
        jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(mask),
        jnp.asarray(ii[:1]), jnp.asarray(jj[:1]),
        jnp.asarray(np.zeros(1, bool)), 6.4,
    )
    np.testing.assert_allclose(float(e), er + ek + es, atol=2e-5)


def test_self_energy_closed_form(rng):
    """The autodiff self term must reproduce the standard closed forms for
    monopoles (-beta/sqrt(pi) q^2) and dipoles (-2 beta^3/(3 sqrt(pi)) mu^2)."""
    beta = 0.47
    q = jnp.asarray(rng.standard_normal(5))
    mu = jnp.asarray(rng.standard_normal((5, 3)) * 0.4)
    z33 = jnp.zeros((5, 3, 3))
    e_q = float(MP.self_energy(q, jnp.zeros((5, 3)), z33, beta))
    np.testing.assert_allclose(
        e_q, -beta / np.sqrt(np.pi) * float(jnp.sum(q * q)), rtol=1e-12
    )
    e_mu = float(MP.self_energy(jnp.zeros(5), mu, z33, beta))
    np.testing.assert_allclose(
        e_mu, -2.0 * beta**3 / (3.0 * np.sqrt(np.pi)) * float(jnp.sum(mu * mu)),
        rtol=1e-10,
    )


def test_erf_kernel_smooth_at_zero():
    g = MP.make_kernel_erf(0.4)
    v0 = float(g(jnp.zeros(3)))
    np.testing.assert_allclose(v0, 2 * 0.4 / np.sqrt(np.pi), rtol=1e-12)
    # gradient exists and is zero at the origin
    gr = jax.grad(g)(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(gr), 0.0, atol=1e-12)


def _lattice_box(nw=27, L=9.3, seed=2):
    cell = np.array([L, L, L])
    rng = np.random.default_rng(seed)
    P = []
    m = round(nw ** (1 / 3))
    for i in range(m):
        for j in range(m):
            for k in range(m):
                origin = (np.array([i, j, k]) + 0.5) * cell / m
                w, _ = np.linalg.qr(rng.standard_normal((3, 3)))
                if np.linalg.det(w) < 0:
                    w[:, 0] = -w[:, 0]
                P.append(AM.ideal_water(origin=origin, rot=w))
    return cell, np.concatenate(P)


@pytest.mark.slow
def test_water_box_forces_and_invariance():
    cell, P = _lattice_box()
    box = AM.AmoebaWaterBox.build(
        27, cell, cutoff=4.5, vdw_cutoff=4.5, sor_iters=30, grid_spacing=0.6
    )
    efn = jax.jit(lambda p: box.energy(p))
    e, f = jax.jit(lambda p: box.energy_forces(p))(jnp.asarray(P))
    assert np.isfinite(float(e)) and np.all(np.isfinite(np.asarray(f)))
    # translation invariance up to SPME interpolation jitter
    e2 = float(efn(jnp.asarray(P + np.array([1.7, -2.1, 0.9]))))
    assert abs(e2 - float(e)) < 5e-4
    # exact analytic forces
    for (i, a) in [(5, 1), (40, 0)]:
        h = 1e-5
        Pp = P.copy()
        Pp[i, a] += h
        Pm = P.copy()
        Pm[i, a] -= h
        fn = -(float(efn(jnp.asarray(Pp))) - float(efn(jnp.asarray(Pm)))) / (2 * h)
        assert abs(float(f[i, a]) - fn) < 2e-5 * max(1.0, abs(fn))


def test_water_box_bound_and_polarized():
    """Condensed-phase sanity: permanent + polarization attract, and the
    induced dipoles are a significant fraction of the permanent moment
    (AMOEBA liquid water enhances ~1.77 D -> ~2.6-2.9 D)."""
    cell, P = _lattice_box()
    box = AM.AmoebaWaterBox.build(
        27, cell, cutoff=4.5, vdw_cutoff=4.5, sor_iters=30, grid_spacing=0.6
    )
    ep = float(jax.jit(box.permanent_energy)(jnp.asarray(P)))
    epol = float(jax.jit(box.polarization_energy)(jnp.asarray(P)))
    assert ep < 0 and epol < 0
    mu_ind, _ = jax.jit(box.induced_dipoles)(jnp.asarray(P))
    per_mol = np.linalg.norm(
        np.asarray(mu_ind).reshape(27, 3, 3).sum(axis=1), axis=-1
    ) / 0.2081943
    assert per_mol.mean() > 0.2   # Debye; nonzero collective induction

"""Full-Ewald mutual induction: the variational CG solve must be
insensitive to the Ewald split (beta) and to the real-space cutoff —
exactly the properties the real-space-only SCF lacks (measured ~20-38%
cutoff swings on this box), matching Tinker's meshed induction field."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai2bmd_tpu import units
from ai2bmd_tpu.physics import amoeba as AM
from ai2bmd_tpu.physics.amoeba_protein import assign_amoeba
from ai2bmd_tpu.physics.amoeba_system import AmoebaPeriodicSystem


@pytest.fixture(autouse=True)
def _f64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def box64():
    m, L = 4, 12.4
    cell = np.array([L, L, L])
    rng = np.random.default_rng(5)
    P = []
    for i in range(m):
        for j in range(m):
            for k in range(m):
                origin = (np.array([i, j, k]) + 0.5) * cell / m + rng.normal(0, 0.15, 3)
                w, _ = np.linalg.qr(rng.standard_normal((3, 3)))
                if np.linalg.det(w) < 0:
                    w[:, 0] = -w[:, 0]
                P.append(AM.ideal_water(origin=origin, rot=w))
    P = np.concatenate(P)
    nw = m**3
    names = ["O", "H1", "H2"] * nw
    res = ["WAT"] * (3 * nw)
    bonds = np.array(
        [(3 * i, 3 * i + 1) for i in range(nw)]
        + [(3 * i, 3 * i + 2) for i in range(nw)]
    )
    return cell, P, assign_amoeba(names, res, P, bonds), nw


def _epol(asg, cell, P, cutoff, beta, cg=20):
    sys_ = AmoebaPeriodicSystem.build(
        asg, cell, cutoff=cutoff, beta=beta, grid_spacing=0.5,
        dtype=jnp.float64,
    )
    Pj = jnp.asarray(P)
    nl = sys_.neighbor_list(Pj, k_max=190)
    return float(sys_.polarization_energy_ewald(Pj, nl, cg_iters=cg))


@pytest.mark.slow
def test_ewald_induction_split_invariant(box64):
    cell, P, asg, nw = box64
    e1 = _epol(asg, cell, P, cutoff=5.0, beta=0.55)
    e2 = _epol(asg, cell, P, cutoff=6.0, beta=0.5)
    # measured: -75.951 vs -75.948 kcal/mol (the real-space-only SCF
    # swings ~20% over the same cutoffs)
    np.testing.assert_allclose(e1, e2, rtol=2e-4)


@pytest.mark.slow
def test_ewald_induction_forces_finite(box64):
    cell, P, asg, nw = box64
    sys_ = AmoebaPeriodicSystem.build(
        asg, cell, cutoff=5.0, beta=0.55, grid_spacing=0.6,
        dtype=jnp.float64,
    )
    Pj = jnp.asarray(P)
    nl = sys_.neighbor_list(Pj, k_max=190)
    e, g = jax.value_and_grad(
        lambda p: sys_.energy_ewald_induction(p, nl, cg_iters=10)
    )(Pj)
    assert np.isfinite(float(e))
    assert np.all(np.isfinite(np.asarray(g)))
    # numerical gradient on one component (autodiff through the CG solve)
    efn = jax.jit(lambda p: sys_.energy_ewald_induction(p, nl, cg_iters=10))
    i, a, h = 30, 1, 1e-5
    Pp = P.copy()
    Pp[i, a] += h
    Pm = P.copy()
    Pm[i, a] -= h
    fn = (float(efn(jnp.asarray(Pp))) - float(efn(jnp.asarray(Pm)))) / (2 * h)
    assert abs(float(g[i, a]) - fn) < 2e-4 * max(1.0, abs(fn))


@pytest.mark.slow
def test_warm_start_cuts_cg_budget(box64):
    """Warm-starting CG from the previous step's converged dipoles (the
    QM/MM aux carry) after an MD-step-sized displacement: measured ~13x
    error reduction at equal budget on this box (worth ~2.5 CG
    iterations — warm-4 beats cold-6), VERDICT round 2, item 6."""
    cell, P, asg, nw = box64
    sys_ = AmoebaPeriodicSystem.build(
        asg, cell, cutoff=5.0, beta=0.55, grid_spacing=0.6,
        dtype=jnp.float64,
    )
    P0 = jnp.asarray(P)
    nl0 = sys_.neighbor_list(P0, k_max=190)
    m_prev, _ = sys_.induced_dipoles_ewald(P0, nl0, cg_iters=30)

    # ~1 fs of 300 K motion: H atoms move ~0.02-0.04 A
    rng = np.random.default_rng(11)
    P1 = P0 + jnp.asarray(rng.normal(0.0, 0.02, P0.shape))
    nl1 = sys_.neighbor_list(P1, k_max=190)
    m_ref, _ = sys_.induced_dipoles_ewald(P1, nl1, cg_iters=40,
                                          m0=m_prev)

    m_cold4, _ = sys_.induced_dipoles_ewald(P1, nl1, cg_iters=4)
    m_cold6, _ = sys_.induced_dipoles_ewald(P1, nl1, cg_iters=6)
    m_warm4, _ = sys_.induced_dipoles_ewald(P1, nl1, cg_iters=4,
                                            m0=m_prev)
    err_cold4 = float(jnp.abs(m_cold4 - m_ref).max())
    err_cold6 = float(jnp.abs(m_cold6 - m_ref).max())
    err_warm4 = float(jnp.abs(m_warm4 - m_ref).max())
    # equal budget: warm must win by a wide margin (measured ~13x)
    assert err_warm4 < 0.25 * err_cold4, (err_warm4, err_cold4)
    # warm-4 at least matches cold-6
    assert err_warm4 <= err_cold6, (err_warm4, err_cold6)

    # warm carry API: energy matches the plain path given the same m0
    e_a, m_out = sys_.energy_ewald_induction_warm(P1, nl1, m_prev,
                                                  cg_iters=5)
    e_b = sys_.energy_ewald_induction(P1, nl1, cg_iters=5, m0=m_prev)
    np.testing.assert_allclose(float(e_a), float(e_b), rtol=1e-12)
    assert m_out.shape == m_ref.shape


@pytest.mark.slow
def test_pcg_beats_cg(box64):
    """The production solve is Jacobi-preconditioned (M^-1 = diag(alpha),
    Tinker's 'diagonal' induction preconditioner).  At equal iteration
    budget it must beat unpreconditioned CG on the same quadratic, and
    both must agree at convergence."""
    cell, P, asg, nw = box64
    sys_ = AmoebaPeriodicSystem.build(
        asg, cell, cutoff=5.0, beta=0.55, grid_spacing=0.6,
        dtype=jnp.float64,
    )
    Pj = jnp.asarray(P)
    nl = sys_.neighbor_list(Pj, k_max=190)
    m_ref, _ = sys_.induced_dipoles_ewald(Pj, nl, cg_iters=40)

    # plain CG on the identical quadratic (the pre-r4 production solver)
    F, _alpha, _pcorr = sys_._induction_functional(Pj, nl)
    g0, hvp = jax.linearize(jax.grad(F), jnp.zeros_like(m_ref))

    def plain_cg(k):
        m = jnp.zeros_like(m_ref)
        r = -g0
        p = r
        for _ in range(k):
            Ap = hvp(p)
            a = jnp.sum(r * r) / jnp.sum(p * Ap)
            m = m + a * p
            r_new = r - a * Ap
            b = jnp.sum(r_new * r_new) / jnp.sum(r * r)
            r, p = r_new, r_new + b * p
        return m

    for k in (4, 6):
        err_cg = float(jnp.abs(plain_cg(k) - m_ref).max())
        m_pcg, _ = sys_.induced_dipoles_ewald(Pj, nl, cg_iters=k)
        err_pcg = float(jnp.abs(m_pcg - m_ref).max())
        assert err_pcg < err_cg, (k, err_pcg, err_cg)

    # converged energies agree (same fixed point regardless of M)
    f_cg20 = F(plain_cg(20))
    m_pcg20, _ = sys_.induced_dipoles_ewald(Pj, nl, cg_iters=20)
    np.testing.assert_allclose(float(F(m_pcg20)), float(f_cg20), rtol=1e-9)

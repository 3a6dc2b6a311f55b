"""Dense (matmul) multipole spreading vs the scatter reference.

The production reciprocal path spreads q/mu/Theta with per-axis dense
B-spline weight matmuls (amoeba_pme._spread_multipoles_dense); the
N*6^3 segment_sum stencil (_spread_multipoles) stays as the parity
reference.  Values must agree to float roundoff, including gradients
(the force path differentiates through the spread)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai2bmd_tpu.physics import amoeba_pme as MP


@pytest.fixture(autouse=True)
def _f64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.fixture
def system(rng=None):
    rng = np.random.default_rng(7)
    n = 37
    cell = np.array([11.0, 9.5, 10.2])
    P = rng.uniform(0, 1, (n, 3)) * cell
    q = rng.normal(0, 0.3, n)
    q -= q.mean()
    mu = rng.normal(0, 0.1, (n, 3))
    th = rng.normal(0, 0.05, (n, 3, 3))
    th = 0.5 * (th + th.transpose(0, 2, 1))
    tr = np.trace(th, axis1=1, axis2=2) / 3.0
    th -= tr[:, None, None] * np.eye(3)
    pme = MP.MultipoleEwaldParams.build(cell, beta=0.5, grid_spacing=0.5)
    to = lambda a: jnp.asarray(a, jnp.float64)
    return pme, to(P), to(q), to(mu), to(th)


def test_dense_matches_scatter(system):
    pme, P, q, mu, th = system
    rho_s = MP._spread_multipoles(pme, P, q, mu, th)
    rho_d = MP._spread_multipoles_dense(pme, P, q, mu, th, chunk=16)
    np.testing.assert_allclose(
        np.asarray(rho_d), np.asarray(rho_s), rtol=1e-11, atol=1e-12
    )


def test_dense_energy_and_gradient(system):
    pme, P, q, mu, th = system

    def e(dense):
        return lambda P_: MP.reciprocal_energy(pme, P_, q, mu, th, dense=dense)

    e_d, g_d = jax.value_and_grad(e(True))(P)
    e_s, g_s = jax.value_and_grad(e(False))(P)
    np.testing.assert_allclose(float(e_d), float(e_s), rtol=1e-11)
    np.testing.assert_allclose(
        np.asarray(g_d), np.asarray(g_s), rtol=1e-8, atol=1e-11
    )

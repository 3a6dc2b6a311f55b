"""Rigid-water SETTLE constraints: closed form vs SHAKE oracle, exact
constraint satisfaction, RATTLE velocity projection, 2 fs NVE stability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import conftest
from ai2bmd_tpu.md import langevin as L
from ai2bmd_tpu.md.settle import SettleConstraint, shake_reference


def _random_waters(rng, W=32, spread=12.0):
    """W waters at exact TIP3P geometry, randomly placed/oriented."""
    con = SettleConstraint.build(
        np.arange(W) * 3, np.arange(W) * 3 + 1, np.arange(W) * 3 + 2
    )
    r_oh, th = 0.9572, np.deg2rad(104.52)
    local = np.array([
        [0.0, 0.0, 0.0],
        [r_oh, 0.0, 0.0],
        [r_oh * np.cos(th), r_oh * np.sin(th), 0.0],
    ])
    X = np.zeros((3 * W, 3))
    for w in range(W):
        # random rotation via QR
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        X[3 * w:3 * w + 3] = local @ q.T + rng.random(3) * spread
    masses = np.tile([15.9994, 1.008, 1.008], W)
    return con, jnp.asarray(X, jnp.float64), masses


@pytest.fixture(autouse=True)
def _f64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def test_settle_matches_shake_oracle(rng):
    """SETTLE's closed form and iterative SHAKE solve the same Lagrange
    system — they must agree on the projected positions."""
    con, X0, masses = _random_waters(rng)
    X1 = X0 + rng.standard_normal(X0.shape) * 0.08   # ~2 fs worth of motion
    X1 = jnp.asarray(X1)

    Xs = con.positions(X0, X1)
    Xk = shake_reference(con, X0, X1, masses, n_iter=500)
    np.testing.assert_allclose(np.asarray(Xs), np.asarray(Xk), atol=2e-5)


def test_settle_exact_constraints_and_com(rng):
    con, X0, masses = _random_waters(rng)
    X1 = X0 + rng.standard_normal(X0.shape) * 0.1
    Xs = con.positions(X0, jnp.asarray(X1))
    assert float(con.max_violation(Xs)) < 1e-9   # closed form is exact (f64)

    # COM of each water is untouched by the projection (constraint forces
    # are internal)
    m = np.array([15.9994, 1.008, 1.008])[:, None]
    for w in [0, 7, 31]:
        sl = slice(3 * w, 3 * w + 3)
        com1 = (np.asarray(X1)[sl] * m).sum(0) / m.sum()
        com_s = (np.asarray(Xs)[sl] * m).sum(0) / m.sum()
        np.testing.assert_allclose(com_s, com1, atol=1e-10)


def test_settle_identity_when_satisfied(rng):
    """Projecting positions that already satisfy the constraints is a
    no-op (rigid-body motion passes through).  SETTLE's closed form (like
    the original Miyamoto-Kollman derivation) assumes per-step rotations
    under 90 degrees, so the rigid motion here is a small one — the MD
    regime it is used in."""
    con, X0, masses = _random_waters(rng)
    # small rigid rotation (~3 deg about z) + translation of everything
    th = np.deg2rad(3.0)
    q = np.array([
        [np.cos(th), -np.sin(th), 0.0],
        [np.sin(th), np.cos(th), 0.0],
        [0.0, 0.0, 1.0],
    ])
    X1 = np.asarray(X0) @ q.T + np.array([1.0, -2.0, 0.5])
    Xs = con.positions(X0, jnp.asarray(X1))
    np.testing.assert_allclose(np.asarray(Xs), X1, atol=1e-9)


def test_rattle_velocity_projection(rng):
    con, X0, masses = _random_waters(rng)
    V = jnp.asarray(rng.standard_normal(X0.shape) * 0.05)
    Vc = con.velocities(X0, V)
    a, b, c = con.gather(X0)
    va, vb, vc_ = con.gather(Vc)

    def ddt(u, v, du, dv):
        e = np.array(u - v)
        e = e / np.linalg.norm(e, axis=-1, keepdims=True)
        return np.abs(np.sum(e * np.asarray(du - dv), -1)).max()

    assert ddt(a, b, va, vb) < 1e-12
    assert ddt(a, c, va, vc_) < 1e-12
    assert ddt(b, c, vb, vc_) < 1e-12
    # projection only removes constraint-violating components: applying it
    # twice changes nothing
    Vcc = con.velocities(X0, Vc)
    np.testing.assert_allclose(np.asarray(Vcc), np.asarray(Vc), atol=1e-12)


def test_rigid_water_nve_2fs(rng):
    """A small LJ+Coulomb water cluster under rigid constraints must hold
    total energy at 2 fs (the flexible model needs 1 fs; VERDICT round 1
    item 8)."""
    from ai2bmd_tpu import units

    # waters on a 2x2x2 grid (3.1 A spacing) so no initial clashes
    con, X0, masses = _random_waters(rng, W=8, spread=0.0)
    grid = np.stack(np.meshgrid(*[np.arange(2) * 3.1] * 3, indexing="ij"),
                    -1).reshape(-1, 3)
    X0 = jnp.asarray(np.asarray(X0) + np.repeat(grid, 3, axis=0))
    masses_j = jnp.asarray(masses)
    q = jnp.asarray(np.tile([-0.834, 0.417, 0.417], 8))
    sig = jnp.asarray(np.tile([3.15061, 0.4, 0.4], 8))
    eps = jnp.asarray(np.tile([0.1521, 0.0, 0.0], 8)) * units.kcal_per_mol

    excl = np.zeros((24, 24), bool)
    for w in range(8):
        excl[3 * w:3 * w + 3, 3 * w:3 * w + 3] = True

    excl_j = jnp.asarray(excl)

    def pot(P):
        d = jnp.linalg.norm(P[:, None, :] - P[None, :, :] + jnp.eye(24)[..., None], axis=-1)
        mask = (~excl_j) & (jnp.triu(jnp.ones((24, 24), bool), 1))
        qq = q[:, None] * q[None, :]
        e_c = jnp.sum(jnp.where(mask, units.COULOMB * qq / d, 0.0))
        s = 0.5 * (sig[:, None] + sig[None, :])
        e_ = jnp.sqrt(eps[:, None] * eps[None, :])
        c6 = (s / d) ** 6
        e_lj = jnp.sum(jnp.where(mask, 4.0 * e_ * (c6 * c6 - c6), 0.0))
        return e_c + e_lj

    def stateful(P, aux):
        e, g = jax.value_and_grad(pot)(P)
        return e, -g, aux

    key = jax.random.PRNGKey(0)
    vel = L.maxwell_boltzmann_velocities(key, masses_j, 150.0, dtype=X0.dtype)
    vel = con.velocities(X0, vel)
    e0, f0, _ = stateful(X0, ())
    state = L.MDState(X0, vel, f0, e0, key, jnp.asarray(0))

    @jax.jit
    def run(s):
        def body(s, _):
            return L.velocity_verlet_step(stateful, 2.0, masses_j, s,
                                          constraint=con), ()
        return jax.lax.scan(body, s, None, length=250)[0]

    etot0 = float(e0 + L.kinetic_energy(masses_j, vel))
    state = run(state)
    etot1 = float(state.energy + L.kinetic_energy(masses_j, state.velocities))
    assert float(con.max_violation(state.positions)) < 1e-8
    # 0.5 ps at 2 fs: drift well under k_B T
    assert abs(etot1 - etot0) < 0.02, (etot0, etot1)

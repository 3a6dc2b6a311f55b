"""AMOEBA water validation: parameter conversion, multipole conventions
(against an independent point-charge-cloud oracle), Thole induction
self-consistency, rotation invariance, and the published water monomer
dipole / dimer minimum (Ren & Ponder, J Phys Chem B 107:5933, 2003:
monomer mu = 1.77 D; dimer binding -4.96 kcal/mol at R_OO = 2.892 A)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai2bmd_tpu import units
from ai2bmd_tpu.physics import amoeba as AM


@pytest.fixture(autouse=True)
def _f64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _dimer(r_oo=2.9, flap_deg=55.0):
    """Standard trans water dimer: donor O-H pointing at acceptor O along
    x; acceptor tilted by the flap angle."""
    th = np.deg2rad(AM.WATER_THETA_DEG)
    don = AM.ideal_water()
    # rotate donor so one O-H points along +x
    a = th / 2
    rot = np.array([
        [np.cos(a), 0, np.sin(a)],
        [0, 1, 0],
        [-np.sin(a), 0, np.cos(a)],
    ])
    don = don @ rot.T  # H1 along +z? keep simple: place analytically below
    don = AM.ideal_water()
    # local: H's at (+-sin(t/2), 0, cos(t/2))*r; rotate so H1 bond -> +x
    c, s = np.cos(np.pi / 2 - th / 2), np.sin(np.pi / 2 - th / 2)
    R1 = np.array([[s, 0, c], [0, 1, 0], [-c, 0, s]])
    don = don @ R1.T
    f = np.deg2rad(flap_deg)
    Racc = np.array([
        [np.cos(f), 0, -np.sin(f)],
        [0, 1, 0],
        [np.sin(f), 0, np.cos(f)],
    ])
    acc = AM.ideal_water(rot=Racc @ np.diag([1.0, 1.0, -1.0]))
    acc = acc + np.array([r_oo, 0.0, 0.0])
    return np.concatenate([don, acc])


def test_asset_parsed():
    par = AM.AmoebaParams.load()
    assert par.multipole[AM.WATER_O_TYPE][0][1] == pytest.approx(-0.51966)
    assert par.polarize[AM.WATER_O_TYPE][0] == pytest.approx(0.837)
    # O vdw: class 90, Rmin 3.405 A, eps 0.11 kcal/mol
    assert par.vdw[par.type_to_class[AM.WATER_O_TYPE]][0] == pytest.approx(3.405)
    # biotypes cover all 20 amino acids + water
    assert ("O", "Water") in par.biotype
    assert ("CA", "Alanine") in par.biotype


def test_monomer_dipole_published():
    """Monopole+dipole conversion and frame rotation: the AMOEBA water
    monomer dipole is 1.77 D (Ren & Ponder 2003, Table 1)."""
    sys = AM.AmoebaWaterSystem.build(1)
    P = jnp.asarray(AM.ideal_water())
    d = float(AM.molecular_dipole_debye(sys, P))
    assert abs(d - 1.77) < 0.04, d


def _random_multipole(rng):
    q = float(rng.standard_normal()) * 0.5
    mu = rng.standard_normal(3) * 0.2
    A = rng.standard_normal((3, 3)) * 0.1
    Q = 0.5 * (A + A.T)
    Q = Q - np.eye(3) * np.trace(Q) / 3.0     # traceless
    return q, mu, Q


def _charge_cloud(q, mu, Q, rng, h=0.01, k=64):
    """Point charges reproducing (q, mu, Theta) exactly WITH vanishing 3rd
    and 4th raw moments (the charges scale as 1/h^2, so unconstrained
    octupole/hexadecapole noise would dominate the comparison) — the
    independent oracle: Theta_ab = sum q (3 x_a x_b - r^2 d_ab)/2."""
    pts = rng.standard_normal((k, 3)) * h
    rows = [np.ones(k)]
    rows += [pts[:, a] for a in range(3)]
    r2 = np.sum(pts * pts, axis=1)
    quad = lambda a, b: (3 * pts[:, a] * pts[:, b] - (a == b) * r2) / 2.0
    rows += [quad(0, 0), quad(1, 1), quad(0, 1), quad(0, 2), quad(1, 2)]
    b = [q, mu[0], mu[1], mu[2], Q[0, 0], Q[1, 1], Q[0, 1], Q[0, 2], Q[1, 2]]
    # zero all 3rd and 4th raw moments
    import itertools

    for order in (3, 4):
        for comb in itertools.combinations_with_replacement(range(3), order):
            m = np.ones(k)
            for a in comb:
                m = m * pts[:, a]
            rows.append(m)
            b.append(0.0)
    Amat = np.stack(rows)
    b = np.array(b)
    charges, *_ = np.linalg.lstsq(Amat, b, rcond=None)
    np.testing.assert_allclose(Amat @ charges, b, atol=1e-10)
    return pts, charges


def test_pair_energy_matches_charge_cloud_oracle(rng):
    """The analytic multipole pair energy must match the Coulomb energy of
    two explicit charge distributions with those moments (h/r -> 0)."""
    qi, mui, Qi = _random_multipole(rng)
    qj, muj, Qj = _random_multipole(rng)
    x = np.array([4.0, 2.5, -3.0])

    e_mp = float(AM.pair_permanent_energy(
        jnp.asarray(x), qi, jnp.asarray(mui), jnp.asarray(Qi),
        qj, jnp.asarray(muj), jnp.asarray(Qj),
    ))

    pi, ci = _charge_cloud(qi, mui, Qi, rng, h=0.005)
    pj, cj = _charge_cloud(qj, muj, Qj, rng, h=0.005)
    d = (x[None, None, :] + pj[None, :, :]) - pi[:, None, :]
    e_cloud = float(np.sum(
        ci[:, None] * cj[None, :] / np.linalg.norm(d, axis=-1)
    ))
    # octupole+ truncation error ~ (h/r)^3
    np.testing.assert_allclose(e_mp, e_cloud, rtol=2e-5, atol=1e-9)


def test_damped_field_matches_pair_energy_gradient(rng):
    """With damping off (lambda = 1), the field formula must equal the
    negative gradient of the multipole potential (same conventions)."""
    q, mu, Q = _random_multipole(rng)
    x = jnp.asarray(np.array([2.0, -1.0, 1.5]))
    E = AM.field_from_permanent(
        x, jnp.asarray(q), jnp.asarray(mu), jnp.asarray(Q), 1.0, 1.0, 1.0
    )
    g = jax.grad(lambda y: AM._phi(y, q, jnp.asarray(mu), jnp.asarray(Q)))(x)
    np.testing.assert_allclose(np.asarray(E), -np.asarray(g), rtol=1e-10)


def test_induced_dipoles_self_consistent():
    sys = AM.AmoebaWaterSystem.build(2, sor_iters=80)
    P = jnp.asarray(_dimer())
    mu_ind, E0 = sys.induced_dipoles(P)
    # residual of the SCF equation mu = alpha (E0 + E_mut(mu))
    N = sys.n_sites
    not_self = ~np.eye(N, dtype=bool)
    x = P[:, None, :] - P[None, :, :]
    x = jnp.where(not_self[..., None], x, jnp.array([10.0, 0.0, 0.0]))
    r = jnp.sqrt(jnp.sum(x * x, axis=-1))
    pd = sys.pdamp[:, None] * sys.pdamp[None, :]
    gm = jnp.minimum(sys.thole[:, None], sys.thole[None, :])
    l3, l5, _ = AM._thole_lambdas(r, pd, gm)
    Emut = AM.field_from_dipole(x, mu_ind[None], l3[..., None], l5[..., None])
    Emut = jnp.where(not_self[..., None], Emut, 0.0).sum(axis=1)
    target = sys.alpha[:, None] * (E0 + Emut)
    resid = float(jnp.max(jnp.abs(mu_ind - target)))
    assert resid < 1e-10, resid
    # induced dipoles enhance the molecular dipole toward the liquid value
    assert float(jnp.max(jnp.abs(mu_ind))) > 1e-3


def test_dimer_energy_rotation_invariant(rng):
    sys = AM.AmoebaWaterSystem.build(2)
    P = _dimer()
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    e1 = float(sys.energy(jnp.asarray(P), include_bonded=False))
    e2 = float(sys.energy(jnp.asarray(P @ q.T + 3.0), include_bonded=False))
    np.testing.assert_allclose(e1, e2, rtol=1e-9)


def _rotvec(w):
    """Rotation matrix from a rotation vector (Rodrigues)."""
    th = jnp.sqrt(jnp.sum(w * w) + 1e-18)
    k = w / th
    K = jnp.array([
        [0.0, -k[2], k[1]], [k[2], 0.0, -k[0]], [-k[1], k[0], 0.0]
    ])
    return jnp.eye(3) + jnp.sin(th) * K + (1 - jnp.cos(th)) * (K @ K)


def test_water_dimer_published_minimum():
    """Rigid-monomer minimization of the AMOEBA water dimer must land on
    the published minimum: E = -4.96 kcal/mol at R(O-O) = 2.892 A
    (Ren & Ponder 2003).  Minimization runs over rigid-body coordinates
    (rotation vector + translation per monomer) so descent is exact."""
    import optax

    sys = AM.AmoebaWaterSystem.build(2, sor_iters=60)
    local = jnp.asarray(AM.ideal_water())

    def assemble(params):
        w1, t1, w2, t2 = params
        m1 = local @ _rotvec(w1).T + t1
        m2 = local @ _rotvec(w2).T + t2
        return jnp.concatenate([m1, m2])

    def energy(params):
        return sys.energy(assemble(params), include_bonded=False)

    # random-orientation start; all random starts converge to the global
    # minimum with this schedule (measured: 6 seeds -> -4.923 @ 2.891)
    rr = np.random.default_rng(3)
    params = (
        jnp.asarray(rr.standard_normal(3)), jnp.zeros(3),
        jnp.asarray(rr.standard_normal(3)), jnp.array([2.9, 0.0, 0.0]),
    )
    sched = optax.cosine_decay_schedule(1e-2, 6000, 1e-3)
    opt = optax.adam(sched)
    st = opt.init(params)

    @jax.jit
    def step(params, st):
        e, g = jax.value_and_grad(energy)(params)
        up, st = opt.update(g, st)
        return optax.apply_updates(params, up), st, e

    for _ in range(6000):
        params, st, e = step(params, st)
    P = assemble(params)
    e_kcal = float(energy(params)) / units.kcal_per_mol
    r_oo = float(jnp.linalg.norm(P[3] - P[0]))
    # measured minimum -4.923 kcal/mol @ 2.891 A vs published -4.96 @
    # 2.892 (the 0.04 residual is the idealized rigid monomer geometry)
    assert -5.05 < e_kcal < -4.80, e_kcal
    assert 2.87 < r_oo < 2.91, r_oo

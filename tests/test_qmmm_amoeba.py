"""QM/MM with the AMOEBA MM backend (mm_backend='amoeba'): the full
polarizable solvent physics the reference delegates to Tinker9
(src/Calculators/tinker_async.py:127-145), evaluated in-framework for
both MM terms of the subtractive combiner."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import conftest
from ai2bmd_tpu.io.pdb import PDBAtoms, read_pdb
from ai2bmd_tpu.io.reorder import normalize_atom_order
from ai2bmd_tpu.physics.amoeba import ideal_water
from ai2bmd_tpu.physics.qmmm import QMMMPotential


def _synthetic_solvated(n_side=3, margin=6.0):
    """Chignolin (175 atoms) centered in a periodic box with a lattice of
    AMOEBA-geometry waters around it (no overlaps closer than 2.4 A)."""
    conftest.require_examples()
    prot = normalize_atom_order(read_pdb(conftest.example_pdb("chig")))
    P = prot.positions - prot.positions.mean(axis=0)
    span = P.max(axis=0) - P.min(axis=0)
    cell = span + 2 * margin
    P = P + cell / 2

    wats = []
    m = n_side
    for i in range(m):
        for j in range(m):
            for k in range(m):
                origin = (np.array([i, j, k]) + 0.5) * cell / m
                w = ideal_water(origin=origin)
                if np.min(
                    np.linalg.norm(P[:, None, :] - w[None, :, :], axis=-1)
                ) > 2.4:
                    wats.append(w)
    W = len(wats)
    wat_pos = np.concatenate(wats) if wats else np.zeros((0, 3))
    n_p = len(P)
    atoms = PDBAtoms(
        positions=np.concatenate([P, wat_pos]),
        numbers=np.concatenate(
            [prot.numbers, np.tile([8, 1, 1], W)]
        ).astype(np.int32),
        atom_names=np.concatenate(
            [prot.atom_names, np.array(["O", "H1", "H2"] * W)]
        ),
        residue_names=np.concatenate(
            [prot.residue_names, np.array(["WAT"] * (3 * W))]
        ),
        residue_numbers=np.concatenate(
            [
                prot.residue_numbers,
                (np.repeat(np.arange(W), 3) + prot.residue_numbers.max() + 1),
            ]
        ).astype(np.int32),
        cell=cell,
    )
    return atoms, n_p, W


@pytest.mark.slow
def test_amoeba_backend_qmmm_combiner():
    atoms, n_p, W = _synthetic_solvated()
    assert W >= 10

    def dummy_qm(Pq):
        # harmonic tether: a distinguishable, differentiable QM stand-in
        e = 0.5 * jnp.sum((Pq - jnp.asarray(atoms.positions[:n_p])) ** 2)
        return e, -(Pq - jnp.asarray(atoms.positions[:n_p]))

    pot = QMMMPotential.build(
        atoms, qm_energy_forces=dummy_qm, mm_backend="amoeba",
        cutoff=6.0, k_neighbors=256, amoeba_sor_iters=6,
    )
    P = jnp.asarray(atoms.positions, jnp.float32)
    aux = pot.init_aux(P)
    e, f, aux = jax.jit(lambda P, a: pot(P, a))(P, aux)
    assert np.isfinite(float(e))
    assert np.all(np.isfinite(np.asarray(f)))
    assert f.shape == (len(atoms), 3)
    # the QM stand-in contributes zero at the reference geometry, so the
    # energy equals mm2 - mm1; perturbing only a WATER must leave the
    # protein-only term (and thus E - E_mm2) unchanged
    P2 = P.at[n_p + 1, 0].add(0.05)
    e2, f2, _ = jax.jit(lambda P, a: pot(P, a))(P2, aux)
    assert abs(float(e2 - e)) > 1e-6      # water move changes the energy
    # forces on the moved water atom are nonzero
    assert float(jnp.linalg.norm(f2[n_p + 1])) > 1e-6


@pytest.mark.slow
def test_amoeba_backend_matches_ff19sb_structure(tmp_path):
    """Both backends run through the identical combiner: same aux
    structure, same shapes, finite results."""
    atoms, n_p, W = _synthetic_solvated()

    def dummy_qm(Pq):
        return jnp.asarray(0.0), jnp.zeros_like(Pq)

    for backend in ("ff19sb", "amoeba"):
        pot = QMMMPotential.build(
            atoms, qm_energy_forces=dummy_qm, mm_backend=backend,
            cutoff=6.0, k_neighbors=256,
        )
        P = jnp.asarray(atoms.positions, jnp.float32)
        aux = pot.init_aux(P)
        e, f, aux = jax.jit(lambda P, a: pot(P, a))(P, aux)
        assert np.isfinite(float(e)), backend
        assert np.all(np.isfinite(np.asarray(f))), backend

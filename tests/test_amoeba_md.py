"""Pure-AMOEBA periodic MD (physics/amoeba_md.py): composition of the
nonbonded engine + valence terms, NVE energy conservation, minimization.

Reference behavior being matched: Tinker9 dynamic/minimize with
amoebabio18.prm (src/utils/preprocess.py:184-244,
src/Calculators/tinker_async.py:127-145).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai2bmd_tpu.io.pdb import PDBAtoms
from ai2bmd_tpu.md import langevin as L
from ai2bmd_tpu.physics import amoeba as AM
from ai2bmd_tpu.physics.amoeba_md import AmoebaMD


def _water_box_atoms(n_side=3, spacing=3.1, jitter=0.0, seed=2) -> PDBAtoms:
    nw = n_side**3
    cell = np.array([spacing * n_side] * 3)
    rng = np.random.default_rng(seed)
    P = []
    for i in range(n_side):
        for j in range(n_side):
            for k in range(n_side):
                origin = (np.array([i, j, k]) + 0.5) * spacing
                w, _ = np.linalg.qr(rng.standard_normal((3, 3)))
                if np.linalg.det(w) < 0:
                    w[:, 0] = -w[:, 0]
                P.append(AM.ideal_water(origin=origin, rot=w))
    P = np.concatenate(P)
    if jitter:
        P = P + jitter * rng.standard_normal(P.shape)
    return PDBAtoms(
        positions=P,
        numbers=np.array([8, 1, 1] * nw, np.int32),
        atom_names=np.array(["O", "H1", "H2"] * nw),
        residue_names=np.array(["WAT"] * (3 * nw)),
        residue_numbers=np.repeat(np.arange(1, nw + 1), 3).astype(np.int32),
        cell=cell,
    )


@pytest.fixture(scope="module")
def box_md():
    atoms = _water_box_atoms()
    md = AmoebaMD.build(
        atoms, cutoff=4.0, skin=0.6, induction="ewald", cg_iters=8,
        grid_spacing=1.2,
    )
    return atoms, md


def test_valence_terms_cover_water(box_md):
    atoms, md = box_md
    nw = len(atoms) // 3
    assert md.val.bond_ij.shape[0] == 2 * nw
    assert md.val.ang_ijk.shape[0] == nw
    assert md.val.ub_ik.shape[0] == nw


@pytest.mark.slow
def test_energy_finite_and_forces_consistent(box_md):
    atoms, md = box_md
    P = jnp.asarray(atoms.positions, jnp.float32)
    nl = md.init_aux(P)
    e, f, _ = jax.jit(lambda p, a: md(p, a))(P, nl)
    assert np.isfinite(float(e))
    # directional finite difference of the TOTAL energy.  h balances the
    # f32 evaluation noise floor (~5e-5 eV, error ~ noise/2h) against
    # cutoff-crossing discontinuities that grow with h; the strong exact-
    # gradient guarantee comes from the NVE conservation test below, this
    # one guards against sign/term-composition mistakes (O(1) errors).
    rng = np.random.default_rng(0)
    d = rng.standard_normal(P.shape)
    d /= np.linalg.norm(d)
    h = 3e-3
    ep = float(md.energy(jnp.asarray(atoms.positions + h * d, jnp.float32), nl))
    em = float(md.energy(jnp.asarray(atoms.positions - h * d, jnp.float32), nl))
    num = -(ep - em) / (2 * h)
    ana = float(jnp.sum(f * d))
    assert abs(num - ana) < 2e-2 + 2e-2 * abs(num), (num, ana)


@pytest.mark.slow
def test_nve_energy_conservation(box_md):
    """Velocity-Verlet (Langevin at zero friction) on the flexible AMOEBA
    water box: total energy drift over 80 x 0.5 fs steps stays well under
    the kinetic energy scale.  Gradients flow through the unrolled
    induction CG, so the forces are the exact gradient of the variational
    energy — the standard polarizable-MD conservation test."""
    atoms, md = box_md
    state = md.initial_state(atoms.positions, temp_K=80.0, seed=3)
    coeffs = L.LangevinCoeffs.build(md.masses, 0.5, 80.0, 0.0)

    @jax.jit
    def chunk(s):
        def body(s, _):
            return L.langevin_step(md, coeffs, md.masses, s, fixcm=False), None
        return jax.lax.scan(body, s, None, length=20)[0]

    def etot(s):
        return float(s.energy) + float(L.kinetic_energy(md.masses, s.velocities))

    e0 = etot(chunk(state))          # skip the first-kick transient
    ekin = float(L.kinetic_energy(md.masses, state.velocities))
    es = []
    s = state
    for _ in range(4):
        s = chunk(s)
        es.append(etot(s))
    drift = max(abs(e - e0) for e in es)
    assert np.all(np.isfinite(np.asarray(s.positions)))
    assert drift < 0.05 * ekin, (drift, ekin, es, e0)


@pytest.mark.slow
def test_minimize_lowers_energy(box_md):
    atoms, _ = box_md
    jittered = _water_box_atoms(jitter=0.08)
    md = AmoebaMD.build(
        jittered, cutoff=4.0, skin=0.6, induction="ewald", cg_iters=8,
        grid_spacing=1.2,
    )
    P1, energies = md.minimize(jittered.positions, steps=50, chunk=25)
    assert energies[-1] < energies[0] - 0.05, (energies[0], energies[-1])
    assert np.all(np.isfinite(P1))

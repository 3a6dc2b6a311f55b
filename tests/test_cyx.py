"""Disulfide (CYX-CYX) merge path, exercised on a synthetic peptide
(no bundled protein contains cystine; reference logic:
src/Fragmentation/distancefrag.py:189-240, 804-844)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from ai2bmd_tpu import data
from ai2bmd_tpu.frag.indexer import build_fragment_index
from ai2bmd_tpu.frag.runtime import FragmentRuntime, fragment_energy_forces
from ai2bmd_tpu.io.build import build_peptide
from ai2bmd_tpu.models import visnet as V
from ai2bmd_tpu.system import Protein

TINY = V.ViSNetConfig(hidden_channels=16, num_heads=2, num_layers=2, num_rbf=4)


def _cyx_atoms():
    # non-adjacent cystines: sequence-adjacent CYX pairs share backbone
    # atoms between the merged halves (indexer raises; chemically such
    # disulfides do not exist)
    return build_peptide(["CYX", "ALA", "ALA", "ALA", "CYX"])


def test_cyx_merge_structure():
    atoms = _cyx_atoms()
    fi = build_fragment_index(atoms)
    # 7 residues -> 5 dipeptides; the two CYX merge into one 44-atom row
    assert fi.n_dipeptides == 5
    merged = [t for t in fi.row_type if t == "CYX"]
    empty = [t for t in fi.row_type if t == ""]
    assert len(merged) == 1 and len(empty) == 1
    cyx_row = fi.row_type.index("CYX")
    assert fi.row_natom[cyx_row] == 44
    tz = data.residue_templates()["z"]["CYX"]
    assert np.array_equal(fi.row_z[cyx_row, :44], tz)
    # both halves map to real protein atoms; exactly 2 sulfurs in the row
    z_real = fi.row_z[cyx_row][fi.valid[cyx_row] & ~fi.is_cap[cyx_row]]
    assert int((z_real == 16).sum()) == 2


def test_cyx_adjacent_merge_rejected():
    # sequence-adjacent cystines would duplicate shared backbone atoms
    # inside the merged fragment; the indexer must fail loudly
    with pytest.raises(ValueError, match="sequence-adjacent"):
        build_fragment_index(build_peptide(["CYX", "ALA", "CYX"]))


def test_cyx_stitch_coverage():
    atoms = _cyx_atoms()
    fi = build_fragment_index(atoms)
    real = fi.valid & ~fi.is_cap
    counts = np.zeros(fi.n_atoms, dtype=int)
    np.add.at(counts, fi.gather_idx[real], 1)
    np.add.at(counts, fi.ace_origin[~fi.ace_is_cap], -1)
    assert np.all(counts == 1)


def test_cyx_md_end_to_end(tmp_path):
    """100 MD steps through the merged 44-atom CYX row, end-to-end via the
    public simulator API (VERDICT r3 item 6): the merged-row fragment path
    must carry a real trajectory, not just single evaluations.  Reference
    production chemistry: src/Fragmentation/distancefrag.py:189-240."""
    from ai2bmd_tpu.io.pdb import write_pdb
    from ai2bmd_tpu.md.simulation import SimulationConfig
    from ai2bmd_tpu.simulators import ProteinSimulation

    atoms = _cyx_atoms()
    pdb = str(tmp_path / "cyx.pdb")
    write_pdb(pdb, atoms)
    sim = ProteinSimulation.from_pdb(
        pdb,
        log_dir=str(tmp_path / "logs"),
        mode="fragment",
        longrange="mm",
        model_cfg=TINY,
        sim_cfg=SimulationConfig(
            # random-init weights give unphysical-but-bounded forces; a short
            # timestep keeps 100 steps integrable (25 fs total, cf.
            # test_end_to_end.py bounds) while still driving 100 distinct
            # merged-row fragment evaluations
            timestep_fs=0.25,
            record_per_steps=50,
            preeq_steps=0,
            runaway_factor=1e9,
            seed=0,
        ),
        opt_iters=2,
    )
    # the trajectory actually crosses the merged row
    assert "CYX" in sim.potential.fi.row_type
    state = sim.simulate(100, log=lambda *_: None)
    assert int(state.step) == 100
    pos = np.asarray(state.positions)
    assert np.all(np.isfinite(pos))
    d = np.linalg.norm(pos - sim.prot.positions, axis=-1)
    assert d.max() < 20.0, f"atom moved {d.max():.2f} A in 25 fs"


@pytest.mark.slow
def test_cyx_forces_finite():
    atoms = _cyx_atoms()
    prot = Protein.from_atoms(atoms)
    fi = build_fragment_index(atoms)
    rt = FragmentRuntime.build(fi, opt_iters=2)
    params = V.init_params(jax.random.PRNGKey(0), TINY)
    P = jnp.asarray(prot.positions, jnp.float32)
    e, f = jax.jit(lambda P: fragment_energy_forces(params, rt, P, TINY))(P)
    assert np.isfinite(float(e))
    assert np.all(np.isfinite(np.asarray(f)))
    # every real atom receives force
    assert np.all(np.abs(np.asarray(f)).sum(axis=1) > 0)


def test_cyx_stitch_parity_vs_per_fragment_oracle():
    """The bucketed merged-row stitch must equal a plain per-fragment
    evaluation: each dipeptide row (incl. the 44-atom merged CYX row) and
    each ACE-NME run through ViSNet one at a time, stitched with np.add.at
    (the reference's combiner semantics, src/Calculators/combiner.py:23-41)."""
    from ai2bmd_tpu.frag.runtime import build_row_positions
    from ai2bmd_tpu.frag import hydrogen as FH

    atoms = _cyx_atoms()
    prot = Protein.from_atoms(atoms)
    fi = build_fragment_index(atoms)
    rt = FragmentRuntime.build(fi, opt_iters=2)
    params = V.init_params(jax.random.PRNGKey(0), TINY)
    P = jnp.asarray(prot.positions, jnp.float32)

    e_rt, f_rt = fragment_energy_forces(params, rt, P, TINY)

    # oracle: same optimized rows, per-fragment ViSNet, numpy stitch
    pos = FH.optimize_caps(rt.ht, build_row_positions(rt, P), n_iter=2)
    pos = np.asarray(pos)
    N = fi.n_atoms
    e_o = 0.0
    f_o = np.zeros((N, 3))
    for r in range(fi.n_rows):
        na = int(fi.row_natom[r])
        if na == 0:
            continue
        z = jnp.asarray(fi.row_z[r:r + 1, :na])
        m = jnp.asarray(fi.valid[r:r + 1, :na])
        e, f = V.energy_and_forces(params, z, jnp.asarray(pos[r:r + 1, :na]), m, TINY)
        e_o += float(e[0])
        real = fi.valid[r, :na] & ~fi.is_cap[r, :na]
        np.add.at(f_o, fi.gather_idx[r, :na][real], np.asarray(f[0])[real])
    for c in range(fi.n_acenmes):
        p_ace = pos[fi.ace_rows[c], fi.ace_slots[c]][None]
        z = jnp.asarray(np.asarray(rt.ace_z)[c:c + 1])
        e, f = V.energy_and_forces(
            params, z, jnp.asarray(p_ace), jnp.ones_like(z, bool), TINY
        )
        e_o -= float(e[0])
        real = ~fi.ace_is_cap[c]
        np.add.at(f_o, fi.ace_origin[c][real], -np.asarray(f[0])[real])

    assert abs(float(e_rt) - e_o) < 1e-4
    np.testing.assert_allclose(np.asarray(f_rt), f_o, atol=2e-4)


def test_cyx_md_100_steps_through_merged_row():
    """End-to-end MD across the merged disulfide row: 100 warm-cap Langevin
    steps stay finite and thermostated (VERDICT r3 item 6; reference
    chemistry src/Fragmentation/distancefrag.py:189-240,804-844)."""
    from ai2bmd_tpu.md import langevin as L
    from ai2bmd_tpu.potentials import FragmentPotential

    atoms = _cyx_atoms()
    prot = Protein.from_atoms(atoms)
    params = V.init_params(jax.random.PRNGKey(0), TINY)
    # random-weight ViSNet forces are unphysical (~50 eV/A here) and blow
    # up within steps; scale the output head so the full compute graph
    # (incl. the merged row) stays live while forces stay modest — the
    # same stabilizer bench.py documents for the solvated benchmark
    params = dict(params)
    params["std"] = params["std"] * 1e-2
    params["atomref"] = params["atomref"] * 1e-2
    pot = FragmentPotential.build(prot, params, TINY, longrange="mm")
    assert any(t == "CYX" for t in pot.fi.row_type)

    warm = lambda P, aux: pot.stateful_energy_forces(P, aux, warm_iters=1)
    coeffs = L.LangevinCoeffs.build(prot.masses, 1.0, 300.0, 0.001)
    P = jnp.asarray(prot.positions, jnp.float32)
    aux0 = pot.init_cap_delta(P)
    e0, f0, aux = jax.jit(warm)(P, aux0)
    key = jax.random.PRNGKey(1)
    vel = L.maxwell_boltzmann_velocities(key, prot.masses, 300.0)
    state = L.MDState(P, vel, f0, e0, key, jnp.asarray(0), aux=aux)

    @jax.jit
    def run(s):
        def body(s, _):
            return L.langevin_step(warm, coeffs, prot.masses, s), None

        return jax.lax.scan(body, s, None, length=100)[0]

    state = run(state)
    Pf = np.asarray(state.positions)
    assert np.all(np.isfinite(Pf))
    # trajectory is stable: the S-S separation stays near its start value
    # (the synthetic extended conformation starts the sulfurs apart; the
    # merged row is exercised regardless — merging keys off residue names)
    s_idx = np.where(prot.numbers == 16)[0]
    assert len(s_idx) == 2
    P0 = np.asarray(prot.positions)
    d0 = np.linalg.norm(P0[s_idx[0]] - P0[s_idx[1]])
    d_ss = np.linalg.norm(Pf[s_idx[0]] - Pf[s_idx[1]])
    assert abs(d_ss - d0) < 2.0
    # thermostat sanity: temperature finite and not runaway
    T = float(
        2.0
        * L.kinetic_energy(jnp.asarray(prot.masses), state.velocities)
        / (3.0 * len(prot.masses))
        / 8.617333262e-5
    )
    assert 0.0 < T < 900.0

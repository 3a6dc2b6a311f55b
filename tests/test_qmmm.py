"""Subtractive QM/MM on the solvated Chignolin box (SolventSimulator
equivalent; reference src/Calculators/qmmm.py + simulator.py:226-292)."""

import numpy as np
import pytest

import conftest
from ai2bmd_tpu.md.simulation import SimulationConfig
from ai2bmd_tpu.models.visnet import ViSNetConfig
from ai2bmd_tpu.simulators import ProteinSimulation

TINY = ViSNetConfig(hidden_channels=16, num_heads=2, num_layers=2, num_rbf=4)


@pytest.mark.slow
def test_solvated_qmmm_step(tmp_path):
    conftest.require_examples()
    sim = ProteinSimulation.from_pdb(
        conftest.example_pdb("chig-preeq"),
        log_dir=str(tmp_path),
        model_cfg=TINY,
        sim_cfg=SimulationConfig(
            record_per_steps=2, preeq_steps=0, runaway_factor=3.0,
            write_xyz=False, write_dcd=True,
        ),
        write_solvent=False,
        opt_iters=2,
    )
    assert len(sim.prot) == 17882
    logs = []
    state = sim.simulate(2, log=logs.append)
    pos = np.asarray(state.positions)
    assert np.all(np.isfinite(pos))
    # pre-equilibrated box must stay near 300 K for a couple of steps
    step_lines = [l for l in logs if "T = " in l]
    temp = float(step_lines[-1].split("T = ")[1].split("K")[0])
    assert 200.0 < temp < 450.0, temp
    # protein-only recording (write_solvent=False)
    from ai2bmd_tpu.io.trajectory import read_dcd

    frames = read_dcd(str(tmp_path / "chig-preeq-traj.dcd"))
    assert frames.shape[1] == 175


def test_subsystem_topology_consistency():
    conftest.require_examples()
    from ai2bmd_tpu.data.protein_topology import build_topology
    from ai2bmd_tpu.io.pdb import read_pdb
    from ai2bmd_tpu.physics.qmmm import _subsystem_topology

    atoms = read_pdb(conftest.example_pdb("chig-preeq"))
    top = build_topology(atoms)
    sub = _subsystem_topology(top, top.protein_atoms)
    # protein-only topology from the full box must match a direct build on
    # the nowat file
    nowat = build_topology(read_pdb(conftest.example_pdb("chig-preeq-nowat")))
    assert sub.n_atoms == nowat.n_atoms
    assert len(sub.bonds) == len(nowat.bonds)
    assert len(sub.angles) == len(nowat.angles)
    assert len(sub.dihedrals) == len(nowat.dihedrals)
    assert len(sub.excl_pairs) == len(nowat.excl_pairs)
    np.testing.assert_allclose(sub.charges, nowat.charges, atol=1e-6)


def test_cmap_cancels_in_subtraction():
    """The subtractive combiner must see identical protein CMAP terms in
    the full-box and protein-only MM systems, so the correction cancels
    exactly in E = mm2 + qm - mm1 (the ML potential owns the backbone
    physics)."""
    conftest.require_examples()
    import jax
    import jax.numpy as jnp

    from ai2bmd_tpu.data.protein_topology import build_topology
    from ai2bmd_tpu.io.pdb import read_pdb
    from ai2bmd_tpu.physics import mm as MM
    from ai2bmd_tpu.physics.qmmm import _subsystem_topology

    atoms = read_pdb(conftest.example_pdb("chig-preeq"))
    top = build_topology(atoms)
    sub = _subsystem_topology(top, top.protein_atoms)
    assert len(sub.cmap_atoms) == len(top.cmap_atoms) == 10
    mm_full = MM.MMSystem.build(top, atoms.cell, cutoff=8.0)
    mm_prot = MM.MMSystem.build(sub, atoms.cell, cutoff=8.0)
    P = jnp.asarray(atoms.positions, jnp.float32)
    e_full = float(jax.jit(lambda p: MM.cmap_energy(mm_full, p))(P))
    e_prot = float(
        jax.jit(lambda p: MM.cmap_energy(mm_prot, p))(P[top.protein_atoms])
    )
    np.testing.assert_allclose(e_full, e_prot, rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_solvated_rigid_water_2fs(tmp_path):
    """Rigid-water (SETTLE) solvated QM/MM at 2 fs: constraints hold and
    the box stays thermally sane (VERDICT round 1, item 8)."""
    conftest.require_examples()
    import jax.numpy as jnp

    from ai2bmd_tpu.md.settle import SettleConstraint

    sim = ProteinSimulation.from_pdb(
        conftest.example_pdb("chig-preeq"),
        log_dir=str(tmp_path),
        model_cfg=TINY,
        sim_cfg=SimulationConfig(
            timestep_fs=2.0, record_per_steps=2, preeq_steps=0,
            runaway_factor=3.0, write_xyz=False, write_dcd=False,
        ),
        opt_iters=2,
        rigid_water=True,
    )
    logs = []
    state = sim.simulate(4, log=logs.append)
    pos = np.asarray(state.positions)
    assert np.all(np.isfinite(pos))
    con = SettleConstraint.from_topology(sim.potential.top)
    viol = float(con.max_violation(jnp.asarray(pos)))
    assert viol < 5e-4, viol   # f32 positions; exact in f64
    step_lines = [l for l in logs if "T = " in l]
    temp = float(step_lines[-1].split("T = ")[1].split("K")[0])
    assert 150.0 < temp < 500.0, temp


@pytest.mark.slow
def test_cell_list_rebuild_matches_dense_on_real_box():
    """Forcing the O(N) cell-list rebuild onto the 17.9k-atom box must
    reproduce the dense-rebuild energy/forces exactly (same pair set)."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from ai2bmd_tpu.io.pdb import read_pdb
    from ai2bmd_tpu.io.reorder import normalize_atom_order
    from ai2bmd_tpu.ops.neighbors import cell_grid
    from ai2bmd_tpu.physics.qmmm import QMMMPotential

    atoms = normalize_atom_order(read_pdb(conftest.example_pdb("chig-preeq")))
    zero_qm = lambda P: (jnp.float32(0.0), jnp.zeros_like(P))
    pot = QMMMPotential.build(
        atoms, qm_energy_forces=zero_qm, pair_backend="nl", k_neighbors=768
    )
    assert pot.nl_grid is None          # 17.9k is under the auto threshold
    P = jnp.asarray(atoms.positions, jnp.float32)
    e_d, f_d, _ = pot(P, pot.init_aux(P))

    grid = cell_grid(atoms.cell, pot.cutoff + pot.skin, pot.n_atoms)
    pot_c = dataclasses.replace(pot, nl_grid=grid)
    e_c, f_c, _ = pot_c(P, pot_c.init_aux(P))
    np.testing.assert_allclose(float(e_d), float(e_c), rtol=0, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(f_d), np.asarray(f_c), rtol=0, atol=1e-4
    )

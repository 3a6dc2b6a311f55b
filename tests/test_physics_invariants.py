"""End-to-end physics invariants of the full fragment potential:
rotational equivariance of stitched forces, solvated restart continuity."""

import os

import jax
import pytest
import jax.numpy as jnp
import numpy as np

import conftest
from ai2bmd_tpu.frag.indexer import build_fragment_index
from ai2bmd_tpu.frag.runtime import FragmentRuntime, fragment_energy_forces
from ai2bmd_tpu.io.pdb import read_pdb
from ai2bmd_tpu.io.reorder import normalize_atom_order
from ai2bmd_tpu.models import visnet as V
from ai2bmd_tpu.system import Protein

TINY = V.ViSNetConfig(hidden_channels=16, num_heads=2, num_layers=2, num_rbf=4)


@pytest.mark.slow
def test_fragment_potential_equivariance():
    """Rotating the protein must rotate the stitched bonded forces: the
    whole pipeline (cap placement, L-BFGS, ViSNet, stitching) is
    rotation-covariant.  Exact 90-degree rotation keeps f32 tight."""
    conftest.require_examples()
    atoms = normalize_atom_order(read_pdb(conftest.example_pdb("chig")))
    prot = Protein.from_atoms(atoms)
    fi = build_fragment_index(atoms)
    rt = FragmentRuntime.build(fi, opt_iters=4)
    params = V.init_params(jax.random.PRNGKey(0), TINY)
    f = jax.jit(lambda P: fragment_energy_forces(params, rt, P, TINY))

    P0 = jnp.asarray(prot.positions, jnp.float32)
    R = jnp.asarray(np.array([[0, 1, 0], [-1, 0, 0], [0, 0, 1]], np.float32))
    e0, f0 = f(P0)
    e1, f1 = f(P0 @ R.T)
    assert abs(float(e0 - e1)) < 5e-4, (float(e0), float(e1))
    np.testing.assert_allclose(
        np.asarray(f1), np.asarray(f0 @ R.T), atol=2e-3
    )


@pytest.mark.slow
def test_solvated_restart_continuity(tmp_path):
    """QM/MM restart: positions/velocities resume exactly; the aux
    (neighbor list + cap offsets) self-heals on the first step."""
    conftest.require_examples()
    from ai2bmd_tpu.md.simulation import SimulationConfig
    from ai2bmd_tpu.simulators import ProteinSimulation

    def build():
        return ProteinSimulation.from_pdb(
            conftest.example_pdb("chig-preeq"),
            log_dir=str(tmp_path),
            model_cfg=TINY,
            sim_cfg=SimulationConfig(
                record_per_steps=2, preeq_steps=0, runaway_factor=5.0,
                write_xyz=False, write_dcd=False,
            ),
            opt_iters=2,
        )

    sim = build()
    state = sim.simulate(2, log=lambda *_: None)
    pos_a = np.asarray(state.positions)

    sim2 = build()
    state2 = sim2.simulate(2, restart=True, log=lambda *_: None)
    assert int(state2.step) == 4
    assert np.all(np.isfinite(np.asarray(state2.positions)))
    # restarted trajectory starts exactly from the checkpoint
    restart = np.load(tmp_path / "chig-preeq-restart.npz")
    assert restart["positions"].shape == pos_a.shape

"""End-to-end: Chignolin fragment-mode MD through the public API
(NoSolventSimulator-equivalent; the SURVEY.md section 7 minimum slice)."""

import numpy as np
import pytest

import conftest
from ai2bmd_tpu.md.simulation import SimulationConfig
from ai2bmd_tpu.models.visnet import ViSNetConfig
from ai2bmd_tpu.simulators import ProteinSimulation

TINY = ViSNetConfig(hidden_channels=32, num_heads=4, num_layers=2, num_rbf=8)


@pytest.fixture(scope="module")
def chig_sim(tmp_path_factory):
    conftest.require_examples()
    log_dir = str(tmp_path_factory.mktemp("chig_md"))
    return ProteinSimulation.from_pdb(
        conftest.example_pdb("chig"),
        log_dir=log_dir,
        mode="fragment",
        longrange="mm",
        model_cfg=TINY,
        sim_cfg=SimulationConfig(
            record_per_steps=5, preeq_steps=3, runaway_factor=1e9, seed=0
        ),
        opt_iters=4,
    )


@pytest.mark.slow
def test_chignolin_short_md(chig_sim):
    logs = []
    state = chig_sim.simulate(10, log=logs.append)
    assert int(state.step) == 3 * 5 + 10
    pos = np.asarray(state.positions)
    assert np.all(np.isfinite(pos))
    # structure should not have exploded in 25 fs (random-init weights give
    # unphysical-but-bounded ~1 eV/A forces; H atoms drift a few A)
    d = np.linalg.norm(pos - chig_sim.prot.positions, axis=-1)
    assert d.max() < 20.0, f"atom moved {d.max():.2f} A in 25 fs"
    assert any("Epot" in l for l in logs)


@pytest.mark.slow    # continues test_chignolin_short_md's trajectory
def test_chignolin_restart(chig_sim):
    state = chig_sim.simulate(5, restart=True, log=lambda *_: None)
    assert int(state.step) == 3 * 5 + 10 + 5


def test_visnet_whole_molecule_mode(tmp_path):
    conftest.require_examples()
    sim = ProteinSimulation.from_pdb(
        conftest.example_pdb("chig"),
        log_dir=str(tmp_path),
        mode="visnet",
        model_cfg=TINY,
        sim_cfg=SimulationConfig(record_per_steps=2, preeq_steps=0, runaway_factor=1e9),
    )
    state = sim.simulate(4, log=lambda *_: None)
    assert np.all(np.isfinite(np.asarray(state.positions)))

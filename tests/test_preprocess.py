"""Preprocessing pipeline + builder + device-strategy mapping tests."""

import numpy as np
import pytest

import jax

from ai2bmd_tpu.io.build import build_polyalanine
from ai2bmd_tpu.io.pdb import read_pdb, write_pdb
from ai2bmd_tpu.parallel.device_strategy import mesh_for_strategy
from ai2bmd_tpu.preprocess import Preprocessor, solvate


def test_polyalanine_builder_fragmentable():
    from ai2bmd_tpu.frag.indexer import build_fragment_index
    from ai2bmd_tpu.system import Protein

    atoms = build_polyalanine(5)
    fi = build_fragment_index(atoms)
    assert fi.n_dipeptides == 5
    prot = Protein.from_atoms(atoms)
    assert abs(prot.charges.sum()) < 1e-6
    d = np.linalg.norm(
        atoms.positions[None] - atoms.positions[:, None], axis=-1
    ) + np.eye(len(atoms)) * 9
    assert d.min() > 0.8


def test_solvation_geometry():
    atoms = build_polyalanine(3)
    box = solvate(atoms, padding=6.0, seed=0)
    assert box.cell is not None
    n_prot = len(atoms)
    # protein untouched (just shifted), waters added, no clashes
    waters = box.positions[n_prot:]
    prot = box.positions[:n_prot]
    heavy = prot[box.numbers[:n_prot] > 1]
    o_sites = waters[box.numbers[n_prot:] == 8]
    d = np.linalg.norm(o_sites[:, None] - heavy[None], axis=-1)
    assert d.min() > 2.3
    # neutral overall
    from ai2bmd_tpu.system import assign_nonbonded_params

    q = assign_nonbonded_params(box)[0]
    assert abs(q.sum()) < 1e-6


def test_preprocessor_end_to_end(tmp_path):
    atoms = build_polyalanine(2)
    pdb = str(tmp_path / "ala2.pdb")
    write_pdb(pdb, atoms)
    pre = Preprocessor(
        log_dir=str(tmp_path), max_cyc=10, padding=5.0,
        heat_stages=(100.0,), heat_steps=10, nvt_steps=10, npt_steps=10,
    )
    out = pre.run(pdb, log=lambda *_: None)
    box = read_pdb(out)
    assert np.all(np.isfinite(box.positions))
    assert (tmp_path / "ala2-preeq-nowat.pdb").exists()
    # idempotent
    assert pre.run(pdb, log=lambda *_: None) == out


@pytest.mark.slow
def test_preprocessor_amoeba_method(tmp_path):
    """--preprocess-method AMOEBA: solvate + full-AMOEBA minimization
    (the reference's pdbxyz8 + minimize9 protocol, preprocess.py:184-244)
    — no heat/NVT stages, outputs the same -preeq/-preeq-nowat pair."""
    atoms = build_polyalanine(2)
    pdb = str(tmp_path / "ala1.pdb")
    write_pdb(pdb, atoms)
    logs = []
    pre = Preprocessor(
        log_dir=str(tmp_path), max_cyc=20, padding=4.0, cutoff=5.0,
        method="AMOEBA",
    )
    out = pre.run(pdb, log=logs.append)
    box = read_pdb(out)
    assert np.all(np.isfinite(box.positions))
    assert (tmp_path / "ala1-preeq-nowat.pdb").exists()
    assert any("AMOEBA minimization" in str(m) for m in logs)
    # minimization must actually lower the energy across chunks
    es = [float(str(m).split("E = ")[1].split(" eV")[0])
          for m in logs if "E = " in str(m)]
    assert es and np.all(np.isfinite(es))


def test_strategy_mesh_mapping():
    assert dict(mesh_for_strategy("excess-compute").shape) == {
        "dp": len(jax.devices()), "mp": 1
    }
    assert dict(mesh_for_strategy("small-molecule").shape) == {
        "dp": 1, "mp": len(jax.devices())
    }
    m = mesh_for_strategy("large-molecule", n_fragments=2)
    assert m.shape["mp"] <= 2
    with pytest.raises(ValueError):
        mesh_for_strategy("nonsense")

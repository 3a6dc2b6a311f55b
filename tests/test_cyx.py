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
    return build_peptide(["CYX", "ALA", "CYX"])


def test_cyx_merge_structure():
    atoms = _cyx_atoms()
    fi = build_fragment_index(atoms)
    # 5 residues -> 3 dipeptides; the two CYX merge into one 44-atom row
    assert fi.n_dipeptides == 3
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


def test_cyx_stitch_coverage():
    atoms = _cyx_atoms()
    fi = build_fragment_index(atoms)
    real = fi.valid & ~fi.is_cap
    counts = np.zeros(fi.n_atoms, dtype=int)
    np.add.at(counts, fi.gather_idx[real], 1)
    np.add.at(counts, fi.ace_origin[~fi.ace_is_cap], -1)
    assert np.all(counts == 1)


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

"""Multi-slice (DCN) ensemble placement on the virtual 8-device CPU mesh.

Emulates 2 slices x 4 devices and validates (1) the placement invariant —
the fragment (mp) axis never crosses a slice boundary, (2) that the
hybrid mesh drops into ReplicaEnsemble/EnsembleSimulation unchanged, and
(3) that slice-spanning replica runs reproduce the single-slice physics
(replicas are independent, so DCN placement must be a pure layout choice).
"""

import jax
import numpy as np
import pytest

import conftest
from ai2bmd_tpu.frag.indexer import build_fragment_index
from ai2bmd_tpu.io.pdb import read_pdb
from ai2bmd_tpu.io.reorder import normalize_atom_order
from ai2bmd_tpu.models import visnet as V
from ai2bmd_tpu.parallel import ReplicaEnsemble, make_hybrid_mesh
from ai2bmd_tpu.parallel.multislice import (
    assert_mp_slice_local,
    detect_slices,
)
from ai2bmd_tpu.system import Protein

TINY = V.ViSNetConfig(hidden_channels=16, num_heads=2, num_layers=2, num_rbf=4)


@pytest.fixture(scope="module")
def chig():
    conftest.require_examples()
    atoms = normalize_atom_order(read_pdb(conftest.example_pdb("chig")))
    prot = Protein.from_atoms(atoms)
    fi = build_fragment_index(atoms)
    params = V.init_params(jax.random.PRNGKey(0), TINY)
    return prot, fi, params


def test_detect_slices_cpu_single_group():
    groups = detect_slices()
    assert list(groups) == [0]
    assert len(groups[0]) == 8


@pytest.mark.parametrize("n_slices,n_dp,n_mp", [(2, 2, 4), (2, 4, 2), (4, 4, 2), (2, 8, 1)])
def test_hybrid_mesh_layout(n_slices, n_dp, n_mp):
    mesh = make_hybrid_mesh(n_dp, n_mp, n_slices=n_slices)
    assert mesh.shape == {"dp": n_dp, "mp": n_mp}
    # re-derive the emulated grouping and re-assert the invariant
    devices = jax.devices()
    per = len(devices) // n_slices
    groups = {s: devices[s * per : (s + 1) * per] for s in range(n_slices)}
    assert_mp_slice_local(mesh, emulated_slices=groups)


def test_mp_across_slices_rejected():
    with pytest.raises(ValueError, match="DCN"):
        make_hybrid_mesh(2, 8, n_slices=2)


def test_bad_shapes_rejected():
    with pytest.raises(ValueError, match="slices"):
        make_hybrid_mesh(3, 2, n_slices=2)  # dp does not divide over slices
    with pytest.raises(ValueError, match="devices"):
        make_hybrid_mesh(2, 2, n_slices=2)  # 2x2 != 4 devices per slice


@pytest.mark.slow
def test_ensemble_on_hybrid_mesh_matches_flat_mesh(chig):
    """A 2-slice hybrid mesh must produce bitwise the same replica
    trajectories as the equivalent single-slice (dp, mp) mesh: per-replica
    RNG streams are keyed by replica id, not device placement."""
    from ai2bmd_tpu.parallel import make_mesh

    prot, fi, params = chig

    def run(mesh):
        ens = ReplicaEnsemble.build(
            prot, fi, params, TINY, n_replicas=4, mesh=mesh,
            steps_per_call=2, warm_iters=2, replica_chunk=2,
        )
        state = ens.initial_state(prot.positions, seed=0, opt_iters=2)
        return np.asarray(ens.run(state, 1).positions)

    pos_hybrid = run(make_hybrid_mesh(4, 2, n_slices=2))
    pos_flat = run(make_mesh(4, 2))
    assert pos_hybrid.shape == (4, len(prot), 3)
    assert np.all(np.isfinite(pos_hybrid))
    np.testing.assert_array_equal(pos_hybrid, pos_flat)

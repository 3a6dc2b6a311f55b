"""Fused cap-gradient Pallas kernel vs jax.grad of the jnp AMBER energy.

Runs the kernel in interpret mode (CPU): validates the analytic term
gradients (bond / angle-atan2 / dihedral with the hydrogen.py phi
convention / scaled nonbonded) and the one-hot gather/scatter layout.
"""

import jax
import jax.numpy as jnp
import numpy as np

import conftest
from ai2bmd_tpu.frag import hydrogen as H
from ai2bmd_tpu.frag.indexer import build_fragment_index
from ai2bmd_tpu.frag.runtime import FragmentRuntime, build_row_positions
from ai2bmd_tpu.io.pdb import read_pdb
from ai2bmd_tpu.io.reorder import normalize_atom_order
from ai2bmd_tpu.ops.pallas.caps import CapKernelTables, amber_grad_rows


def _chig_rows():
    conftest.require_examples()
    atoms = normalize_atom_order(read_pdb(conftest.example_pdb("chig")))
    fi = build_fragment_index(atoms)
    rt = FragmentRuntime.build(fi)
    pos = build_row_positions(rt, jnp.asarray(atoms.positions, jnp.float32))
    return rt.ht, pos


def test_fused_cap_grad_matches_autodiff():
    ht, pos = _chig_rows()
    ct = CapKernelTables.build(
        ht.tables, np.asarray(ht.type_id), S=pos.shape[1],
        scee=ht.scee, scnb=ht.scnb, interpret=True,
    )
    g_ref = jax.grad(lambda p: H.amber_energy(ht, p))(pos)
    g_fused = amber_grad_rows(ct, pos)
    scale = float(jnp.abs(g_ref).max())
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref),
        rtol=0, atol=2e-4 * max(scale, 1.0),
    )


def test_fused_cap_grad_after_perturbation():
    """Same parity off the template geometry (caps displaced) — exercises
    nonzero forces through every term type."""
    ht, pos = _chig_rows()
    rng = np.random.default_rng(3)
    pos = pos + jnp.asarray(rng.normal(0.0, 0.05, pos.shape), jnp.float32)
    ct = CapKernelTables.build(
        ht.tables, np.asarray(ht.type_id), S=pos.shape[1],
        scee=ht.scee, scnb=ht.scnb, interpret=True,
    )
    g_ref = jax.grad(lambda p: H.amber_energy(ht, p))(pos)
    g_fused = amber_grad_rows(ct, pos)
    scale = float(jnp.abs(g_ref).max())
    assert scale > 0.1  # perturbed geometry: real gradients
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref),
        rtol=0, atol=2e-4 * scale,
    )


def test_fused_optimize_caps_matches_jnp_path(monkeypatch):
    """optimize_caps with ht.fused set must walk (near-)identical
    iterates to the autodiff path."""
    import dataclasses

    ht, pos = _chig_rows()
    ct = CapKernelTables.build(
        ht.tables, np.asarray(ht.type_id), S=pos.shape[1],
        scee=ht.scee, scnb=ht.scnb, interpret=True,
    )
    ht_fused = dataclasses.replace(ht, fused=ct)
    out_ref = H.optimize_caps(ht, pos, n_iter=2)
    out_fused = H.optimize_caps(ht_fused, pos, n_iter=2)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), rtol=0, atol=5e-5,
    )

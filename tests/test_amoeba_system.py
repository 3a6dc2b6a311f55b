"""Neighbor-listed periodic AMOEBA engine: must reproduce the dense
AmoebaWaterBox on a small periodic box, with exact forces (the
production-scale path for the reference's Tinker9-evaluated solvated
systems, src/Calculators/tinker_async.py:155-181)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai2bmd_tpu.physics import amoeba as AM
from ai2bmd_tpu.physics.amoeba_protein import assign_amoeba
from ai2bmd_tpu.physics.amoeba_system import AmoebaPeriodicSystem


@pytest.fixture(autouse=True)
def _f64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def water_box():
    nw = 27
    cell = np.array([9.3, 9.3, 9.3])
    rng = np.random.default_rng(2)
    P = []
    for i in range(3):
        for j in range(3):
            for k in range(3):
                origin = (np.array([i, j, k]) + 0.5) * cell / 3
                w, _ = np.linalg.qr(rng.standard_normal((3, 3)))
                if np.linalg.det(w) < 0:
                    w[:, 0] = -w[:, 0]
                P.append(AM.ideal_water(origin=origin, rot=w))
    P = np.concatenate(P)
    names = ["O", "H1", "H2"] * nw
    res = ["WAT"] * (3 * nw)
    bonds = np.array(
        [(3 * i, 3 * i + 1) for i in range(nw)]
        + [(3 * i, 3 * i + 2) for i in range(nw)]
    )
    asg = assign_amoeba(names, res, P, bonds)
    return cell, P, asg


def test_water_assignment_via_generic_path(water_box):
    _, _, asg = water_box
    np.testing.assert_allclose(asg.q.sum(), 0.0, atol=1e-10)
    assert len(set(asg.group_id.tolist())) == 27     # one group per water


@pytest.mark.slow
def test_nl_matches_dense_box(water_box):
    """Every component must agree with the dense-mask AmoebaWaterBox to
    machine precision (vdW: to the atom-vs-reduced-site border tolerance)."""
    cell, P, asg = water_box
    sys_ = AmoebaPeriodicSystem.build(
        asg, cell, cutoff=4.5, beta=0.4, grid_spacing=0.6, sor_iters=30,
        dtype=jnp.float64,
    )
    Pj = jnp.asarray(P)
    nl = sys_.neighbor_list(Pj, k_max=80)
    assert not bool(nl.overflow)
    box = AM.AmoebaWaterBox.build(
        27, cell, cutoff=4.5, vdw_cutoff=4.5, sor_iters=30, grid_spacing=0.6
    )
    np.testing.assert_allclose(
        float(sys_.permanent_energy(Pj, nl)),
        float(box.permanent_energy(Pj)), atol=1e-10,
    )
    np.testing.assert_allclose(
        float(sys_.polarization_energy(Pj, nl)),
        float(box.polarization_energy(Pj)), atol=1e-10,
    )
    np.testing.assert_allclose(
        float(sys_.vdw_energy(Pj, nl)),
        float(box.vdw_energy(Pj)), atol=2e-4,
    )


def test_nl_forces_exact(water_box):
    cell, P, asg = water_box
    sys_ = AmoebaPeriodicSystem.build(
        asg, cell, cutoff=4.5, beta=0.4, grid_spacing=0.6, sor_iters=20,
        dtype=jnp.float64,
    )
    Pj = jnp.asarray(P)
    nl = sys_.neighbor_list(Pj, k_max=80)
    e, f = jax.jit(lambda p: sys_.energy_forces(p, nl))(Pj)
    assert np.isfinite(float(e)) and np.all(np.isfinite(np.asarray(f)))
    efn = jax.jit(lambda p: sys_.energy(p, nl))
    i, a, h = 40, 0, 1e-5
    Pp = P.copy()
    Pp[i, a] += h
    Pm = P.copy()
    Pm[i, a] -= h
    fn = -(float(efn(jnp.asarray(Pp))) - float(efn(jnp.asarray(Pm)))) / (2 * h)
    assert abs(float(f[i, a]) - fn) < 2e-5 * max(1.0, abs(fn))

"""Variational (implicit-gradient) induction vs the unrolled-CG path.

The production QM/MM AMOEBA backend computes polarization forces from
the fixed-dipole functional Phi (amoeba_system.induction_variational)
instead of differentiating through the CG scan.  At converged iteration
budgets the two must agree in energy AND position gradient — including
the p-vs-d cross-correction term, whose dm/dP contribution the old path
picked up through the unrolled solver and the new path picks up through
the second (p-field) solve."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import conftest
from ai2bmd_tpu import units
from ai2bmd_tpu.data.protein_topology import build_topology
from ai2bmd_tpu.io.pdb import read_pdb
from ai2bmd_tpu.io.reorder import normalize_atom_order
from ai2bmd_tpu.physics import amoeba as AM
from ai2bmd_tpu.physics.amoeba_protein import assign_amoeba
from ai2bmd_tpu.physics.amoeba_system import AmoebaPeriodicSystem


@pytest.fixture(autouse=True)
def _f64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _water_box(m=3, L=9.3, seed=11):
    cell = np.array([L, L, L])
    rng = np.random.default_rng(seed)
    P = []
    for i in range(m):
        for j in range(m):
            for k in range(m):
                origin = (np.array([i, j, k]) + 0.5) * cell / m
                origin = origin + rng.normal(0, 0.12, 3)
                w, _ = np.linalg.qr(rng.standard_normal((3, 3)))
                if np.linalg.det(w) < 0:
                    w[:, 0] = -w[:, 0]
                P.append(AM.ideal_water(origin=origin, rot=w))
    P = np.concatenate(P)
    nw = m**3
    names = ["O", "H1", "H2"] * nw
    res = ["WAT"] * (3 * nw)
    bonds = np.array(
        [(3 * i, 3 * i + 1) for i in range(nw)]
        + [(3 * i, 3 * i + 2) for i in range(nw)]
    )
    return cell, P, assign_amoeba(names, res, P, bonds)


def _compare(sys_, P, cg=25, rtol_e=1e-10, atol_f=5e-9):
    Pj = jnp.asarray(P)
    nl = sys_.neighbor_list(Pj, k_max=min(150, sys_.n_atoms - 1))

    def e_unrolled(p):
        return sys_.polarization_energy_ewald(p, nl, cg_iters=cg)

    def e_var(p):
        _, _, phi = sys_.induction_variational(p, nl, cg_iters=cg)
        return units.COULOMB * phi

    e_u, g_u = jax.jit(jax.value_and_grad(e_unrolled))(Pj)
    e_v, g_v = jax.jit(jax.value_and_grad(e_var))(Pj)
    np.testing.assert_allclose(float(e_v), float(e_u), rtol=rtol_e)
    scale = max(float(jnp.abs(g_u).max()), 1e-12)
    np.testing.assert_allclose(
        np.asarray(g_v), np.asarray(g_u), atol=atol_f * scale + 1e-12
    )


def test_water_box_energy_and_forces_match():
    cell, P, asg = _water_box(m=2, L=6.4, seed=3)
    sys_ = AmoebaPeriodicSystem.build(
        asg, cell, cutoff=3.0, beta=0.6, grid_spacing=0.7,
        dtype=jnp.float64,
    )
    _compare(sys_, P, cg=12, atol_f=5e-7)


@pytest.mark.slow
def test_protein_pcorr_forces_match():
    """chig in a vacuum-padded box: protein 1-2/1-3 pairs spanning
    polarization groups make pcorr nonzero, exercising the mu_p solve's
    contribution to the gradient."""
    conftest.require_examples()
    atoms = normalize_atom_order(read_pdb(conftest.example_pdb("chig")))
    top = build_topology(atoms)
    asg = assign_amoeba(
        atoms.atom_names, atoms.residue_names, atoms.positions, top.bonds
    )
    span = atoms.positions.max(0) - atoms.positions.min(0)
    cell = span + 14.0
    P = atoms.positions - atoms.positions.min(0) + 7.0
    sys_ = AmoebaPeriodicSystem.build(
        asg, cell, cutoff=5.0, beta=0.45, grid_spacing=0.8,
        dtype=jnp.float64,
    )
    # sanity: the cross-correction really is nonzero for a protein
    Pj = jnp.asarray(P)
    nl = sys_.neighbor_list(Pj, k_max=150)

    @jax.jit
    def pcorr_at_md(p):
        m_d, _, _ = sys_.induction_variational(p, nl, cg_iters=25)
        _, _, pcorr = sys_._induction_functional(p, nl)
        return pcorr(m_d)

    assert abs(float(pcorr_at_md(Pj))) > 1e-8
    _compare(sys_, P, cg=30, atol_f=2e-6)


def test_mutual_operator_matches_hvp():
    """The explicit Hessian application (_mutual_operator) must equal the
    autodiff hvp of the induction functional exactly — it is what every
    CG iteration of the production solve applies."""
    cell, P, asg = _water_box(m=3, L=9.3, seed=7)
    sys_ = AmoebaPeriodicSystem.build(
        asg, cell, cutoff=4.0, beta=0.5, grid_spacing=0.7,
        dtype=jnp.float64,
    )
    Pj = jnp.asarray(P)
    nl = sys_.neighbor_list(Pj, k_max=120)
    F, _, _ = sys_._induction_functional(Pj, nl)
    zeros = jnp.zeros((sys_.n_atoms, 3), Pj.dtype)
    _, hvp_auto = jax.linearize(jax.grad(F), zeros)
    apply_explicit = sys_._mutual_operator(Pj, nl)
    rng = np.random.default_rng(0)
    for _ in range(3):
        p = jnp.asarray(rng.standard_normal((sys_.n_atoms, 3)))
        a = np.asarray(jax.jit(hvp_auto)(p))
        b = np.asarray(jax.jit(apply_explicit)(p))
        np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-11)


def test_warm_start_consistency():
    """Warm-started variational solves reach the same (m_d, m_p, E)."""
    cell, P, asg = _water_box(m=2, L=6.4, seed=3)
    sys_ = AmoebaPeriodicSystem.build(
        asg, cell, cutoff=3.0, beta=0.6, grid_spacing=0.6,
        dtype=jnp.float64,
    )
    Pj = jnp.asarray(P)
    nl = sys_.neighbor_list(Pj, k_max=100)
    md0, mp0, phi0 = jax.jit(
        lambda p: sys_.induction_variational(p, nl, cg_iters=30)
    )(Pj)
    md1, mp1, phi1 = jax.jit(
        lambda p, md, mp: sys_.induction_variational(
            p, nl, cg_iters=5, m0_d=md, m0_p=mp
        )
    )(Pj, md0, mp0)
    np.testing.assert_allclose(float(phi1), float(phi0), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(md1), np.asarray(md0), atol=1e-10)

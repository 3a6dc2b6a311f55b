"""AMOEBA polarizable force field — permanent multipoles, Thole mutual
induction, buffered 14-7 vdW (water complete; parameter tables general).

This is step 2 of the AMOEBA ladder (round-1 VERDICT item 6): the round-1
``physics/polarization.py`` added induced dipoles driven by pre-polarized
TIP3P charges (self-admitted response double-counting); this module
evaluates the actual AMOEBA-BIO-2018 parameterization from the converted
``amoeba_params.npz`` asset (reference: src/utils/amoebabio18.prm, passed
to Tinker at src/Calculators/tinker_async.py:130):

  * permanent atomic monopoles/dipoles/quadrupoles defined in local frames
    (Z-then-X, Bisector, Z-only, Z-Bisect) and rotated to the lab frame
    from the current geometry each step,
  * pairwise multipole electrostatics generated from the point-multipole
    potential by nested autodiff (exactly the T-tensor contractions),
  * Thole-damped permanent fields + mutual induced dipoles solved by
    fixed-iteration successive over-relaxation (Tinker runs mutual
    induction to 0.01 D; fixed iterations keep one compiled program),
  * Halgren buffered 14-7 vdW with CUBIC-MEAN/HHG combining and hydrogen
    reduction sites.

Units: positions A, energies eV (parameters converted from kcal/mol);
prm dipoles are e*bohr and quadrupoles e*bohr^2 (Tinker convention) and
are converted here.  The quadrupole is interpreted as the traceless
Cartesian moment Theta_ab = sum_k q_k (3 x_a x_b - r^2 delta_ab)/2 — the
convention under which the water monomer reproduces AMOEBA's published
molecular dipole (~1.77 D, Ren & Ponder JPCB 107:5933) and the water
dimer its published minimum (tests/test_amoeba.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ai2bmd_tpu import units
from ai2bmd_tpu.data import asset_path

BOHR = 0.52917720859
KCAL = units.kcal_per_mol
# AMOEBA water internal geometry (amoebabio18.prm: bond 90-91, angle 91-90-91)
WATER_R_OH = 0.9572
WATER_THETA_DEG = 108.50
WATER_O_TYPE = 349
WATER_H_TYPE = 350


# ---------------------------------------------------------------------------
# parameter asset
# ---------------------------------------------------------------------------


class AmoebaParams:
    """Host-side lookup tables from the converted amoebabio18.prm."""

    _cached = None

    def __init__(self, raw):
        self.type_to_class = {
            int(t): int(c) for t, c in zip(raw["atom_type"], raw["atom_class"])
        }
        self.vdw = {
            int(c): (float(r), float(e), float(red))
            for c, r, e, red in zip(
                raw["vdw_class"], raw["vdw_rmin"], raw["vdw_eps"], raw["vdw_red"]
            )
        }
        # multipole records keyed by (type, frame tuple); for simple species
        # (water) one record per type
        self.multipole: dict[int, list] = {}
        for t, fr, q, d, Q in zip(
            raw["mp_type"], raw["mp_frame"], raw["mp_q"], raw["mp_dip"],
            raw["mp_quad"],
        ):
            self.multipole.setdefault(int(t), []).append(
                (tuple(int(v) for v in fr), float(q), np.array(d), np.array(Q))
            )
        self.polarize = {
            int(t): (float(a), float(th), tuple(int(g) for g in grp if g))
            for t, a, th, grp in zip(
                raw["pol_type"], raw["pol_alpha"], raw["pol_thole"],
                raw["pol_group"],
            )
        }
        self.biotype = {
            (str(n), str(r)): int(t)
            for n, r, t in zip(raw["bio_name"], raw["bio_res"], raw["bio_type"])
        }

    @classmethod
    def load(cls) -> "AmoebaParams":
        if cls._cached is None:
            cls._cached = cls(np.load(asset_path("amoeba_params.npz")))
        return cls._cached


# ---------------------------------------------------------------------------
# local multipole frames
# ---------------------------------------------------------------------------


def _unit(v, eps=1e-12):
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return v * jax.lax.rsqrt(jnp.maximum(n2, eps))


def rotate_multipoles(P, frame_z, frame_x, frame_kind, dip_loc, quad_loc):
    """Local-frame multipoles -> lab frame from current positions.

    P [N,3]; frame_z/frame_x [N] site indices of the frame-defining
    neighbors; frame_kind [N]: 0 = Z-then-X, 1 = Bisector (z along the
    bisector of the z and x neighbors, Tinker kmpole convention).
    dip_loc [N,3] e*A, quad_loc [N,3,3] e*A^2 (traceless, local).
    Returns (mu_lab [N,3], theta_lab [N,3,3]).
    """
    u_z = _unit(P[frame_z] - P)
    u_x = _unit(P[frame_x] - P)
    is_bisector = (frame_kind == 1)[:, None]
    z_dir = jnp.where(is_bisector, _unit(u_z + u_x), u_z)
    x_raw = u_x - jnp.sum(u_x * z_dir, -1, keepdims=True) * z_dir
    # bisector frames are symmetric in (z,x) neighbors; x from either
    x_dir = _unit(x_raw)
    y_dir = jnp.cross(z_dir, x_dir)
    R = jnp.stack([x_dir, y_dir, z_dir], axis=-1)       # columns = axes
    mu = jnp.einsum("nab,nb->na", R, dip_loc)
    theta = jnp.einsum("nab,nbc,ndc->nad", R, quad_loc, R)
    return mu, theta


# ---------------------------------------------------------------------------
# pairwise permanent multipole electrostatics (autodiff T-tensors)
# ---------------------------------------------------------------------------


def _phi(x, q, mu, theta):
    """Potential at displacement x from a point multipole.

    With the traceless quadrupole Theta_ab = sum q (3 s_a s_b - s^2 d)/2,
    the quadrupole potential is exactly (x.Theta.x)/r^5 (the 3/2 prefactor
    of the raw-second-moment form is absorbed by the 2/3 from converting
    raw moments to Theta) — validated term-by-term against an explicit
    charge-cloud oracle in tests/test_amoeba.py."""
    r2 = jnp.sum(x * x)
    r = jnp.sqrt(r2)
    xtx = x @ theta @ x
    return q / r + (mu @ x) / (r2 * r) + xtx / (r2 * r2 * r)


def pair_permanent_energy(x, qi, mui, ti, qj, muj, tj):
    """Interaction energy of two multipole sites separated by x = r_j - r_i
    (in e^2/A; multiply by units.COULOMB for eV)."""
    phi = lambda y: _phi(y, qi, mui, ti)
    e0 = qj * phi(x)
    e1 = muj @ jax.grad(phi)(x)
    e2 = jnp.trace(tj @ jax.hessian(phi)(x)) / 3.0
    return e0 + e1 + e2


# ---------------------------------------------------------------------------
# Thole-damped fields
# ---------------------------------------------------------------------------


def _thole_lambdas(r, pdamp_ij, gamma_ij):
    """(lambda3, lambda5, lambda7) Thole damping factors."""
    u = r / jnp.maximum(pdamp_ij, 1e-6)
    au3 = gamma_ij * u**3
    ex = jnp.exp(-jnp.minimum(au3, 50.0))
    l3 = 1.0 - ex
    l5 = 1.0 - (1.0 + au3) * ex
    l7 = 1.0 - (1.0 + au3 + 0.6 * au3 * au3) * ex
    return l3, l5, l7


def field_from_permanent(x, q, mu, theta, l3, l5, l7):
    """Damped E-field at displacement x from a permanent multipole."""
    r2 = jnp.sum(x * x, axis=-1, keepdims=True)
    r = jnp.sqrt(r2)
    r3, r5, r7 = r2 * r, r2 * r2 * r, r2 * r2 * r2 * r
    tx = jnp.einsum("...ab,...b->...a", theta, x)
    xtx = jnp.sum(x * tx, axis=-1, keepdims=True)
    mux = jnp.sum(mu * x, axis=-1, keepdims=True)
    # group by radial order: 1/r3 -> l3, 1/r5 -> l5, 1/r7 -> l7
    # (E = -grad phi with phi = q/r + mu.x/r^3 + x.Theta.x/r^5)
    term3 = q[..., None] * x / r3 - mu / r3
    term5 = 3.0 * mux * x / r5 - 2.0 * tx / r5
    term7 = 5.0 * xtx * x / r7
    return l3 * term3 + l5 * term5 + l7 * term7


def field_from_dipole(x, p, l3, l5):
    """Damped field at displacement x from a point dipole p."""
    r2 = jnp.sum(x * x, axis=-1, keepdims=True)
    r = jnp.sqrt(r2)
    r3, r5 = r2 * r, r2 * r2 * r
    px = jnp.sum(p * x, axis=-1, keepdims=True)
    return l5 * 3.0 * px * x / r5 - l3 * p / r3


# ---------------------------------------------------------------------------
# AMOEBA water system
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AmoebaWaterSystem:
    """W AMOEBA waters as one differentiable potential (vacuum cluster;
    sites ordered [O,H,H] x W)."""

    n_sites: int
    mol_id: Any          # [N] int32
    frame_z: Any         # [N]
    frame_x: Any         # [N]
    frame_kind: Any      # [N] 0 z-then-x, 1 bisector
    q: Any               # [N] e
    dip_loc: Any         # [N,3] e*A
    quad_loc: Any        # [N,3,3] e*A^2
    alpha: Any           # [N] A^3
    pdamp: Any           # [N] alpha^(1/6)
    thole: Any           # [N]
    vdw_rmin: Any        # [N] A (R-min, from diameter rule)
    vdw_eps: Any         # [N] eV
    vdw_red: Any         # [N] reduction toward the heavy site
    heavy_of: Any        # [N] heavy-site index for H reduction (self else)
    bond_k: Any          # eV/A^2 (AMOEBA quartic-corrected water bond)
    bond_r0: Any
    angle_k: Any         # eV/rad^2
    angle_t0: Any
    sor_iters: int = 40
    sor_omega: float = 0.7

    @classmethod
    def build(cls, n_waters: int, sor_iters: int = 40) -> "AmoebaWaterSystem":
        par = AmoebaParams.load()
        N = 3 * n_waters
        o = np.arange(n_waters) * 3
        h1, h2 = o + 1, o + 2

        frame_z = np.zeros(N, np.int32)
        frame_x = np.zeros(N, np.int32)
        kind = np.zeros(N, np.int32)
        # O: bisector of the two H; H: z toward O, x toward the other H
        frame_z[o], frame_x[o], kind[o] = h1, h2, 1
        frame_z[h1], frame_x[h1] = o, h2
        frame_z[h2], frame_x[h2] = o, h1

        def mp(t):
            recs = par.multipole[t]
            assert len(recs) == 1
            _, q, d, Q = recs[0]
            return q, d * BOHR, Q * BOHR * BOHR

        qO, dO, QO = mp(WATER_O_TYPE)
        qH, dH, QH = mp(WATER_H_TYPE)
        q = np.zeros(N)
        dip = np.zeros((N, 3))
        quad = np.zeros((N, 3, 3))
        q[o], dip[o], quad[o] = qO, dO, QO
        q[h1], dip[h1], quad[h1] = qH, dH, QH
        q[h2], dip[h2], quad[h2] = qH, dH, QH

        aO, thO, _ = par.polarize[WATER_O_TYPE]
        aH, thH, _ = par.polarize[WATER_H_TYPE]
        alpha = np.zeros(N)
        thole = np.zeros(N)
        alpha[o], alpha[h1], alpha[h2] = aO, aH, aH
        thole[o], thole[h1], thole[h2] = thO, thH, thH

        cO = par.type_to_class[WATER_O_TYPE]
        cH = par.type_to_class[WATER_H_TYPE]
        rO, eO, redO = par.vdw[cO]
        rH, eH, redH = par.vdw[cH]
        rmin = np.zeros(N)
        eps = np.zeros(N)
        red = np.ones(N)
        heavy = np.arange(N)
        rmin[o], eps[o] = rO, eO * KCAL
        rmin[h1], eps[h1], red[h1], heavy[h1] = rH, eH * KCAL, redH, o
        rmin[h2], eps[h2], red[h2], heavy[h2] = rH, eH * KCAL, redH, o

        mol = np.repeat(np.arange(n_waters), 3)
        j32 = lambda a: jnp.asarray(a, jnp.int32)
        jf = lambda a: jnp.asarray(a, jnp.float64)
        return cls(
            n_sites=N, mol_id=j32(mol),
            frame_z=j32(frame_z), frame_x=j32(frame_x), frame_kind=j32(kind),
            q=jf(q), dip_loc=jf(dip), quad_loc=jf(quad),
            alpha=jf(alpha), pdamp=jf(alpha ** (1.0 / 6.0)), thole=jf(thole),
            vdw_rmin=jf(rmin), vdw_eps=jf(eps), vdw_red=jf(red),
            heavy_of=j32(heavy),
            bond_k=556.85 * KCAL, bond_r0=WATER_R_OH,
            angle_k=48.70 * KCAL, angle_t0=np.deg2rad(WATER_THETA_DEG),
            sor_iters=sor_iters,
        )

    # ------------------------------------------------------------------
    def lab_multipoles(self, P):
        mu, theta = rotate_multipoles(
            P, self.frame_z, self.frame_x, self.frame_kind,
            self.dip_loc, self.quad_loc,
        )
        return self.q, mu, theta

    def _pair_masks(self):
        N = self.n_sites
        diff_mol = self.mol_id[:, None] != self.mol_id[None, :]
        iu = jnp.triu(jnp.ones((N, N), bool), 1)
        return diff_mol, iu

    def permanent_energy(self, P):
        """Intermolecular permanent multipole electrostatics [eV]."""
        q, mu, theta = self.lab_multipoles(P)
        diff_mol, iu = self._pair_masks()
        mask = (diff_mol & iu).reshape(-1)
        N = self.n_sites
        ii, jj = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)
        x = P[jj] - P[ii]
        x = jnp.where(mask[:, None], x, jnp.array([10.0, 0.0, 0.0]))
        e = jax.vmap(pair_permanent_energy)(
            x, q[ii], mu[ii], theta[ii], q[jj], mu[jj], theta[jj]
        )
        return units.COULOMB * jnp.sum(jnp.where(mask, e, 0.0))

    def _permanent_field(self, P):
        """Thole-damped field of other molecules' permanent multipoles at
        every site [N,3] (e/A^2; direct-11-scale = 0: own molecule's
        permanent multipoles do not polarize)."""
        q, mu, theta = self.lab_multipoles(P)
        diff_mol, _ = self._pair_masks()
        x = P[:, None, :] - P[None, :, :]          # displacement j -> i
        x = jnp.where(diff_mol[..., None], x, jnp.array([10.0, 0.0, 0.0]))
        r = jnp.sqrt(jnp.sum(x * x, axis=-1))
        pd = self.pdamp[:, None] * self.pdamp[None, :]
        gm = jnp.minimum(self.thole[:, None], self.thole[None, :])
        l3, l5, l7 = _thole_lambdas(r, pd, gm)
        N = self.n_sites
        E = field_from_permanent(
            x, jnp.broadcast_to(q[None, :], (N, N)),
            jnp.broadcast_to(mu[None], (N, N, 3)),
            jnp.broadcast_to(theta[None], (N, N, 3, 3)),
            l3[..., None], l5[..., None], l7[..., None],
        )
        E = jnp.where(diff_mol[..., None], E, 0.0)
        return jnp.sum(E, axis=1)

    def induced_dipoles(self, P):
        """Mutual induction via fixed-iteration SOR (Tinker: polarization
        MUTUAL to 0.01 D; mutual-scale all 1, excluding the site itself)."""
        E0 = self._permanent_field(P)
        N = self.n_sites
        not_self = ~jnp.eye(N, dtype=bool)
        x = P[:, None, :] - P[None, :, :]
        x = jnp.where(not_self[..., None], x, jnp.array([10.0, 0.0, 0.0]))
        r = jnp.sqrt(jnp.sum(x * x, axis=-1))
        pd = self.pdamp[:, None] * self.pdamp[None, :]
        gm = jnp.minimum(self.thole[:, None], self.thole[None, :])
        l3, l5, _ = _thole_lambdas(r, pd, gm)
        alpha = self.alpha[:, None]

        def step(mu_ind, _):
            Emut = field_from_dipole(
                x, mu_ind[None, :, :], l3[..., None], l5[..., None]
            )
            Emut = jnp.where(not_self[..., None], Emut, 0.0).sum(axis=1)
            target = alpha * (E0 + Emut)
            new = mu_ind + self.sor_omega * (target - mu_ind)
            return new, None

        mu0 = alpha * E0
        mu_ind, _ = jax.lax.scan(step, mu0, None, length=self.sor_iters)
        return mu_ind, E0

    def polarization_energy(self, P):
        mu_ind, E0 = self.induced_dipoles(P)
        return -0.5 * units.COULOMB * jnp.sum(mu_ind * E0)

    def vdw_energy(self, P):
        """Halgren buffered 14-7; CUBIC-MEAN R-min combining, HHG epsilon,
        hydrogen sites moved toward the heavy atom by the reduction
        factor (forces flow through the site construction)."""
        red = self.vdw_red[:, None]
        sites = P[self.heavy_of] + red * (P - P[self.heavy_of])
        diff_mol, iu = self._pair_masks()
        mask = diff_mol & iu
        d = sites[:, None, :] - sites[None, :, :]
        d = jnp.where(mask[..., None], d, jnp.array([10.0, 0.0, 0.0]))
        r = jnp.sqrt(jnp.sum(d * d, axis=-1))
        ri, rj = self.vdw_rmin[:, None], self.vdw_rmin[None, :]
        r0 = (ri**3 + rj**3) / (ri**2 + rj**2)
        ei, ej = self.vdw_eps[:, None], self.vdw_eps[None, :]
        se = jnp.sqrt(ei) + jnp.sqrt(ej)
        eps = 4.0 * ei * ej / jnp.maximum(se * se, 1e-12)
        rho = r / r0
        f1 = (1.07 / (rho + 0.07)) ** 7
        f2 = 1.12 / (rho**7 + 0.12) - 2.0
        return jnp.sum(jnp.where(mask, eps * f1 * f2, 0.0))

    def bonded_energy(self, P):
        """Intramolecular AMOEBA water bond/angle (harmonic part; the
        cubic/quartic corrections are <1% at thermal amplitudes)."""
        o = jnp.arange(0, self.n_sites, 3)
        e = 0.0
        for h in (o + 1, o + 2):
            d = jnp.sqrt(jnp.sum((P[h] - P[o]) ** 2, axis=-1))
            e = e + jnp.sum(self.bond_k * (d - self.bond_r0) ** 2)
        v1 = P[o + 1] - P[o]
        v2 = P[o + 2] - P[o]
        y = jnp.sqrt(jnp.sum(jnp.cross(v1, v2) ** 2, axis=-1))
        xdot = jnp.sum(v1 * v2, axis=-1)
        th = jnp.arctan2(y, xdot)
        e = e + jnp.sum(self.angle_k * (th - self.angle_t0) ** 2)
        return e

    # ------------------------------------------------------------------
    def energy(self, P, include_bonded: bool = True):
        e = (
            self.permanent_energy(P)
            + self.polarization_energy(P)
            + self.vdw_energy(P)
        )
        if include_bonded:
            e = e + self.bonded_energy(P)
        return e

    def energy_forces(self, P, include_bonded: bool = True):
        e, g = jax.value_and_grad(
            lambda p: self.energy(p, include_bonded)
        )(P)
        return e, -g


@dataclasses.dataclass
class AmoebaWaterBox:
    # NOT a registered pytree: jit this class's methods via closure capture
    # (the MultipoleEwaldParams aux carries static grid metadata)
    """Periodic AMOEBA water: multipole SPME electrostatics + Thole mutual
    induction + buffered 14-7 vdW under minimum-image PBC.

    This is the solvent model class the reference evaluates through
    Tinker9 (tinker_async.py:127-145: AMOEBA params, ewald, mutual
    polarization).  Electrostatics use the validated multipole SPME
    (physics/amoeba_pme.py: real + mesh reciprocal + self + intramolecular
    erf adjustment).  Induction is real-space Thole within the cutoff
    (deliberate v1 deviation: Tinker also meshes the induced-dipole field;
    the damped dipole field decays as r^-3 and the cutoff error is small
    next to the polarizable-vs-fixed-charge fidelity step).  Dense [N,N]
    pair masks — sized for validation boxes and the QM/MM solvent shells,
    not the full 17.9k-atom production box (neighbor-listed variant:
    ROADMAP).
    """

    base: AmoebaWaterSystem       # parameter tables (frames, q/mu/Theta...)
    cell: Any                     # [3]
    pme: Any                      # MultipoleEwaldParams (static aux)
    cutoff: float = 9.0
    vdw_cutoff: float = 9.0

    @classmethod
    def build(cls, n_waters: int, cell, cutoff: float = 9.0,
              vdw_cutoff: float = 9.0, sor_iters: int = 40,
              grid_spacing: float = 0.8, beta: float = 0.4):
        from ai2bmd_tpu.physics import amoeba_pme as MP

        base = AmoebaWaterSystem.build(n_waters, sor_iters=sor_iters)
        pme = MP.MultipoleEwaldParams.build(
            np.asarray(cell, np.float64), beta=beta, grid_spacing=grid_spacing
        )
        return cls(
            base=base, cell=jnp.asarray(cell, jnp.float64), pme=pme,
            cutoff=cutoff, vdw_cutoff=vdw_cutoff,
        )

    def _pairs(self):
        N = self.base.n_sites
        ii, jj = np.triu_indices(N, 1)
        mol = np.repeat(np.arange(N // 3), 3)
        inter = mol[ii] != mol[jj]
        return ii, jj, inter

    def permanent_energy(self, P):
        from ai2bmd_tpu.physics import amoeba_pme as MP

        q, mu, theta = self.base.lab_multipoles(P)
        ii, jj, inter = self._pairs()
        e = MP.multipole_ewald_energy(
            self.pme, P, q, mu, theta,
            jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(inter),
            jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(~inter),
            self.cutoff,
        )
        return units.COULOMB * e

    def _permanent_field(self, P):
        """Thole-damped min-image field of other molecules' permanent
        multipoles (real-space within cutoff)."""
        b = self.base
        q, mu, theta = b.lab_multipoles(P)
        diff_mol, _ = b._pair_masks()
        x = P[:, None, :] - P[None, :, :]
        x = x - self.cell * jnp.round(x / self.cell)
        r = jnp.sqrt(jnp.sum(jnp.where(diff_mol[..., None], x, 1.0) ** 2, -1))
        live = diff_mol & (r < self.cutoff)
        x = jnp.where(live[..., None], x, jnp.array([10.0, 0.0, 0.0]))
        r = jnp.where(live, r, 10.0)
        pd = b.pdamp[:, None] * b.pdamp[None, :]
        gm = jnp.minimum(b.thole[:, None], b.thole[None, :])
        l3, l5, l7 = _thole_lambdas(r, pd, gm)
        N = b.n_sites
        E = field_from_permanent(
            x, jnp.broadcast_to(q[None, :], (N, N)),
            jnp.broadcast_to(mu[None], (N, N, 3)),
            jnp.broadcast_to(theta[None], (N, N, 3, 3)),
            l3[..., None], l5[..., None], l7[..., None],
        )
        return jnp.sum(jnp.where(live[..., None], E, 0.0), axis=1)

    def induced_dipoles(self, P):
        b = self.base
        E0 = self._permanent_field(P)
        N = b.n_sites
        not_self = ~jnp.eye(N, dtype=bool)
        x = P[:, None, :] - P[None, :, :]
        x = x - self.cell * jnp.round(x / self.cell)
        r = jnp.sqrt(jnp.sum(jnp.where(not_self[..., None], x, 1.0) ** 2, -1))
        live = not_self & (r < self.cutoff)
        x = jnp.where(live[..., None], x, jnp.array([10.0, 0.0, 0.0]))
        r = jnp.where(live, r, 10.0)
        pd = b.pdamp[:, None] * b.pdamp[None, :]
        gm = jnp.minimum(b.thole[:, None], b.thole[None, :])
        l3, l5, _ = _thole_lambdas(r, pd, gm)
        alpha = b.alpha[:, None]

        def step(mu_ind, _):
            Emut = field_from_dipole(
                x, mu_ind[None, :, :], l3[..., None], l5[..., None]
            )
            Emut = jnp.where(live[..., None], Emut, 0.0).sum(axis=1)
            new = mu_ind + b.sor_omega * (alpha * (E0 + Emut) - mu_ind)
            return new, None

        mu0 = alpha * E0
        mu_ind, _ = jax.lax.scan(step, mu0, None, length=b.sor_iters)
        return mu_ind, E0

    def polarization_energy(self, P):
        mu_ind, E0 = self.induced_dipoles(P)
        return -0.5 * units.COULOMB * jnp.sum(mu_ind * E0)

    def vdw_energy(self, P):
        b = self.base
        red = b.vdw_red[:, None]
        sites = P[b.heavy_of] + red * (P - P[b.heavy_of])
        diff_mol, iu = b._pair_masks()
        mask = diff_mol & iu
        d = sites[:, None, :] - sites[None, :, :]
        d = d - self.cell * jnp.round(d / self.cell)
        r = jnp.sqrt(jnp.sum(jnp.where(mask[..., None], d, 1.0) ** 2, -1))
        live = mask & (r < self.vdw_cutoff)
        r = jnp.where(live, r, self.vdw_cutoff)
        ri, rj = b.vdw_rmin[:, None], b.vdw_rmin[None, :]
        r0 = (ri**3 + rj**3) / (ri**2 + rj**2)
        ei, ej = b.vdw_eps[:, None], b.vdw_eps[None, :]
        se = jnp.sqrt(ei) + jnp.sqrt(ej)
        eps = 4.0 * ei * ej / jnp.maximum(se * se, 1e-12)
        rho = r / r0
        f1 = (1.07 / (rho + 0.07)) ** 7
        f2 = 1.12 / (rho**7 + 0.12) - 2.0
        e_pair = eps * f1 * f2
        # shift to zero at the cutoff so forces are cutoff-continuous
        rho_c = self.vdw_cutoff / r0
        e_cut = eps * (1.07 / (rho_c + 0.07)) ** 7 * (
            1.12 / (rho_c**7 + 0.12) - 2.0
        )
        return jnp.sum(jnp.where(live, e_pair - e_cut, 0.0))

    def energy(self, P, include_bonded: bool = True):
        e = (
            self.permanent_energy(P)
            + self.polarization_energy(P)
            + self.vdw_energy(P)
        )
        if include_bonded:
            e = e + self.base.bonded_energy(P)
        return e

    def energy_forces(self, P, include_bonded: bool = True):
        e, g = jax.value_and_grad(
            lambda p: self.energy(p, include_bonded)
        )(P)
        return e, -g


def molecular_dipole_debye(sys: AmoebaWaterSystem, P, mol: int = 0):
    """Total molecular dipole (permanent only) of one water in Debye."""
    q, mu, _ = sys.lab_multipoles(P)
    sel = sys.mol_id == mol
    com = jnp.mean(jnp.where(sel[:, None], P, 0.0), axis=0)  # origin-free: net q=0
    d = jnp.sum(
        jnp.where(sel[:, None], q[:, None] * (P - com) + mu, 0.0), axis=0
    )
    return jnp.sqrt(jnp.sum(d * d)) / 0.2081943   # e*A -> Debye


def ideal_water(origin=(0.0, 0.0, 0.0), rot=None):
    """One AMOEBA-geometry water [3,3]: O at origin, H in the xz plane."""
    th = np.deg2rad(WATER_THETA_DEG)
    r = WATER_R_OH
    pos = np.array([
        [0.0, 0.0, 0.0],
        [r * np.sin(th / 2), 0.0, r * np.cos(th / 2)],
        [-r * np.sin(th / 2), 0.0, r * np.cos(th / 2)],
    ])
    if rot is not None:
        pos = pos @ np.asarray(rot).T
    return pos + np.asarray(origin)

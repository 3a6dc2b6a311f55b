"""AMOEBA valence (bonded) terms: the Tinker energy the reference runs
through Tinker9 for minimization / pure-AMOEBA dynamics
(src/utils/preprocess.py:184-244 pdbxyz8+minimize9;
src/Calculators/tinker_async.py:127-145 full-AMOEBA key file).

Inside the subtractive QM/MM combiner these terms cancel exactly
(physics/qmmm.py evaluates MM2-MM1 over identical valence topology), which
is why the production QM/MM path omits them; this module supplies them for
everything else the reference can do with Tinker: pure-AMOEBA MD,
minimization, and AMOEBA preprocessing.

Functional forms and unit conventions follow Tinker's defaults with the
amoebabio18.prm header overrides (tools/convert_assets.py
convert_amoeba_valence):

  bond       k*dt^2*(1 + c3*dt + c4*dt^2), dt = r-r0 [A], bondunit 1
  angle      k*dt^2*(1 + c3*dt + ... + c6*dt^4), dt in DEGREES,
             angleunit (pi/180)^2 — i.e. k is kcal/mol/rad^2
  anglep     same expansion on the PROJECTED in-plane angle at trigonal
             centers (central atom projected onto the plane of its three
             attachments)
  strbnd     (pi/180) * (k1*dr1 + k2*dr2) * dt_deg
  ureybrad   k*(r13-r0)^2 (water H...H)
  opbend     Allinger out-of-plane angle chi (bond d-b vs the a-c-d
             plane at trigonal center b), same sextic expansion as angle
  torsion    0.5 * sum_m amp_m*(1 + cos(m*phi - phase_m))  (torsionunit)
  pitors     k*(1 + cos(2*phi - pi)) over the pi-orbital torsion angle
  strtors    sum over the 3 bonds: dr_b * sum_m v[b,m]*(1+cos(m phi - ph_m))
  angtors    (pi/180) * sum over the 2 angles: dt_a_deg * sum_m v[a,m]*(...)
  tortors    CMAP-style bicubic spline over (phi1, phi2) in degrees, with
             the Tinker chirality sign check at the central atom

All terms are assigned host-side from atom classes + connectivity
(AmoebaAssignment) and evaluated as one jitted dense tensor program;
forces come from jax.grad.  Energies are returned in eV.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ai2bmd_tpu import units
from ai2bmd_tpu.data import asset_path
from ai2bmd_tpu.physics.amoeba import AmoebaParams
from ai2bmd_tpu.physics.mm import (
    _dihedral_angle,
    _pbc_diff,
    _safe_norm,
    _safe_unit,
    cmap_bicubic_coeffs,
)

DEG = 180.0 / math.pi
ANGLE_UNIT = (math.pi / 180.0) ** 2     # Tinker angleunit default
STRBND_UNIT = math.pi / 180.0           # Tinker stbnunit default
ANGTOR_UNIT = math.pi / 180.0           # Tinker atorunit default


_raw_valence = None


def load_valence_tables():
    global _raw_valence
    if _raw_valence is None:
        _raw_valence = dict(np.load(asset_path("amoeba_valence.npz")))
    return _raw_valence


@dataclasses.dataclass
class AmoebaValence:
    """Flat assigned term arrays (device) + scalar conventions."""

    n_atoms: int
    # bonds / urey-bradley
    bond_ij: Any; bond_k: Any; bond_r0: Any
    ub_ik: Any; ub_k: Any; ub_r0: Any
    # angles: regular and in-plane kept separate (different geometry)
    ang_ijk: Any; ang_k: Any; ang_t0: Any                 # [A,3], t0 deg
    angp_ijkd: Any; angp_k: Any; angp_t0: Any             # [P,4] i,j,k,4th
    # stretch-bend rides its parent angle's theta0 (regular + projected)
    sb_ijk: Any; sb_k1: Any; sb_k2: Any; sb_r01: Any; sb_r02: Any; sb_t0: Any
    # out-of-plane bend: (d, b, a, c) — d out-of-plane, b trigonal center
    opb_dbac: Any; opb_k: Any
    # torsions
    tor_ijkl: Any; tor_amp: Any; tor_phase: Any; tor_n: Any   # [T,3] each
    # pi-orbital torsion: (b, c, a, d, e, f): central bond b-c, a/d on b,
    # e/f on c
    pit_atoms: Any; pit_k: Any
    # stretch-torsion / angle-torsion
    st_ijkl: Any; st_k: Any; st_r0: Any                   # k [.,9], r0 [.,3]
    at_ijkl: Any; at_k: Any; at_t0: Any                   # k [.,6], t0 [.,2]
    # torsion-torsion: atoms [.,5], spline type id, chirality sign
    tt_atoms: Any; tt_type: Any; tt_sign: Any
    tt_coeffs: Any                                        # [G,R,R,4,4] kcal
    tt_res: int
    scalars: dict

    # ------------------------------------------------------------------
    @classmethod
    def build(cls, asg, par: AmoebaParams | None = None) -> "AmoebaValence":
        """Assign terms from classes + connectivity.

        asg: physics.amoeba_protein.AmoebaAssignment (uses .atype, .bonds,
        .n_atoms).  Raises KeyError listing the class tuple if any bond /
        angle / torsion lacks parameters (coverage must be total).
        """
        par = par or AmoebaParams.load()
        val = load_valence_tables()
        raw = np.load(asset_path("amoeba_params.npz"))
        elem_of_type = {
            int(t): int(e) for t, e in zip(raw["atom_type"], raw["atom_elem"])
        }

        n = asg.n_atoms
        acls = np.array([par.type_to_class[int(t)] for t in asg.atype])
        elem = np.array([elem_of_type[int(t)] for t in asg.atype])
        adj: list[list[int]] = [[] for _ in range(n)]
        for i, j in asg.bonds:
            adj[int(i)].append(int(j))
            adj[int(j)].append(int(i))

        # ---- lookup dicts -------------------------------------------------
        bond_tab = {
            (int(a), int(b)): (k, r0)
            for a, b, k, r0 in val["bond"]
            for (a, b) in [sorted((a, b))]
        }
        ang_tab = {}
        for a, b, c, k, t0, t1, t2 in val["angle"]:
            ang_tab[(int(a), int(b), int(c))] = (k, (t0, t1, t2))
            ang_tab[(int(c), int(b), int(a))] = (k, (t0, t1, t2))
        angp_tab = {}
        for a, b, c, k, t0, t1, t2 in val["anglep"]:
            angp_tab[(int(a), int(b), int(c))] = (k, (t0, t1, t2))
            angp_tab[(int(c), int(b), int(a))] = (k, (t0, t1, t2))
        sb_tab = {}
        for a, b, c, k1, k2 in val["strbnd"]:
            sb_tab[(int(a), int(b), int(c))] = (k1, k2)
            sb_tab.setdefault((int(c), int(b), int(a)), (k2, k1))
        opb_tab = {
            (int(d), int(b)): k for d, b, _, _, k in val["opbend"]
        }
        ub_tab = {}
        for a, b, c, k, r0 in val["ureybrad"]:
            ub_tab[(int(a), int(b), int(c))] = (k, r0)
            ub_tab[(int(c), int(b), int(a))] = (k, r0)
        tor_tab = {}
        for row in val["torsion"]:
            a, b, c, d = (int(v) for v in row[:4])
            amp, phase, per = row[4:7], row[7:10], row[10:13]
            tor_tab[(a, b, c, d)] = (amp, phase, per)
            tor_tab.setdefault((d, c, b, a), (amp, phase, per))
        pit_tab = {
            (int(a), int(b)): k
            for a, b, k in val["pitors"]
            for (a, b) in [sorted((a, b))]
        }
        st_tab = {}
        for row in val["strtors"]:
            a, b, c, d = (int(v) for v in row[:4])
            k9 = np.asarray(row[4:13])
            st_tab[(a, b, c, d)] = k9
            # reversed chain: bond1 <-> bond3 swap
            st_tab.setdefault(
                (d, c, b, a), np.concatenate([k9[6:9], k9[3:6], k9[0:3]])
            )
        at_tab = {}
        for row in val["angtors"]:
            a, b, c, d = (int(v) for v in row[:4])
            k6 = np.asarray(row[4:10])
            at_tab[(a, b, c, d)] = k6
            at_tab.setdefault((d, c, b, a), np.concatenate([k6[3:6], k6[0:3]]))
        tt_tab = {}
        for g, cls5 in enumerate(val["tortors_cls"]):
            cls5 = tuple(int(v) for v in cls5)
            tt_tab[cls5] = (g, False)
            tt_tab.setdefault(cls5[::-1], (g, True))

        # ---- bonds --------------------------------------------------------
        bond_ij, bond_k, bond_r0 = [], [], []
        bond_r0_of = {}
        for i, j in np.asarray(asg.bonds):
            i, j = int(i), int(j)
            key = tuple(sorted((acls[i], acls[j])))
            if key not in bond_tab:
                raise KeyError(f"no AMOEBA bond parameters for classes {key}")
            k, r0 = bond_tab[key]
            bond_ij.append((i, j)); bond_k.append(k); bond_r0.append(r0)
            bond_r0_of[(i, j)] = r0
            bond_r0_of[(j, i)] = r0

        # ---- angles / in-plane / strbnd / urey-bradley / opbend -----------
        ang_ijk, ang_k, ang_t0 = [], [], []
        angp_ijkd, angp_k, angp_t0 = [], [], []
        sb_ijk, sb_k1, sb_k2, sb_r01, sb_r02, sb_t0 = [], [], [], [], [], []
        ub_ik, ub_k, ub_r0 = [], [], []
        t0_of = {}
        for j in range(n):
            nbrs = sorted(adj[j])
            for a in range(len(nbrs)):
                for b in range(a + 1, len(nbrs)):
                    i, k = nbrs[a], nbrs[b]
                    ckey = (int(acls[i]), int(acls[j]), int(acls[k]))
                    if len(nbrs) == 3 and ckey in angp_tab:
                        inplane = True
                        kf, t0s = angp_tab[ckey]
                    elif ckey in ang_tab:
                        inplane = False
                        kf, t0s = ang_tab[ckey]
                    elif ckey in angp_tab:
                        # anglep record at a non-trigonal center: evaluate
                        # as a regular angle (no projection plane exists)
                        inplane = False
                        kf, t0s = angp_tab[ckey]
                    else:
                        raise KeyError(
                            f"no AMOEBA angle parameters for classes {ckey}"
                        )
                    # theta0 variant by # extra hydrogens on the center
                    nh = sum(
                        1 for m in nbrs if m not in (i, k) and elem[m] == 1
                    )
                    t0 = t0s[nh] if nh <= 2 and t0s[min(nh, 2)] != 0.0 else t0s[0]
                    if inplane:
                        d = [m for m in nbrs if m not in (i, k)][0]
                        angp_ijkd.append((i, j, k, d))
                        angp_k.append(kf); angp_t0.append(t0)
                    else:
                        ang_ijk.append((i, j, k))
                        ang_k.append(kf); ang_t0.append(t0)
                    t0_of[(i, j, k)] = t0
                    t0_of[(k, j, i)] = t0
                    if ckey in sb_tab:
                        k1, k2 = sb_tab[ckey]
                        sb_ijk.append((i, j, k))
                        sb_k1.append(k1); sb_k2.append(k2)
                        sb_r01.append(bond_r0_of[(i, j)])
                        sb_r02.append(bond_r0_of[(k, j)])
                        sb_t0.append(t0)
                    if ckey in ub_tab:
                        ku, ru = ub_tab[ckey]
                        ub_ik.append((i, k)); ub_k.append(ku); ub_r0.append(ru)

        opb_dbac, opb_k = [], []
        for bcen in range(n):
            nbrs = sorted(adj[bcen])
            if len(nbrs) != 3:
                continue
            for d in nbrs:
                key = (acls[d], acls[bcen])
                if key in opb_tab:
                    a, c = [m for m in nbrs if m != d]
                    opb_dbac.append((d, bcen, a, c))
                    opb_k.append(opb_tab[key])

        # ---- torsions + coupled terms -------------------------------------
        tor_ijkl, tor_amp, tor_phase, tor_n = [], [], [], []
        st_ijkl, st_k, st_r0 = [], [], []
        at_ijkl, at_k, at_t0 = [], [], []
        for j, k in np.asarray(asg.bonds):
            j, k = int(j), int(k)
            for i in adj[j]:
                if i == k:
                    continue
                for l in adj[k]:
                    if l == j or l == i:
                        continue
                    ckey = (acls[i], acls[j], acls[k], acls[l])
                    if ckey not in tor_tab:
                        raise KeyError(
                            f"no AMOEBA torsion parameters for classes {ckey}"
                        )
                    amp, phase, per = tor_tab[ckey]
                    tor_ijkl.append((i, j, k, l))
                    tor_amp.append(amp)
                    tor_phase.append(np.asarray(phase) * math.pi / 180.0)
                    tor_n.append(per)
                    if ckey in st_tab:
                        st_ijkl.append((i, j, k, l))
                        st_k.append(st_tab[ckey])
                        st_r0.append((
                            bond_r0_of[(i, j)], bond_r0_of[(j, k)],
                            bond_r0_of[(k, l)],
                        ))
                    if ckey in at_tab:
                        at_ijkl.append((i, j, k, l))
                        at_k.append(at_tab[ckey])
                        at_t0.append((t0_of[(i, j, k)], t0_of[(j, k, l)]))

        # ---- pi-orbital torsions -------------------------------------------
        pit_atoms, pit_k = [], []
        for bb, cc in np.asarray(asg.bonds):
            bb, cc = int(bb), int(cc)
            if len(adj[bb]) != 3 or len(adj[cc]) != 3:
                continue
            key = tuple(sorted((acls[bb], acls[cc])))
            if key not in pit_tab:
                continue
            a, d = [m for m in adj[bb] if m != cc]
            e, f = [m for m in adj[cc] if m != bb]
            pit_atoms.append((bb, cc, a, d, e, f))
            pit_k.append(pit_tab[key])

        # ---- torsion-torsions ----------------------------------------------
        # enumerate 5-chains from the CENTRAL atom (each chain once via
        # j < l; enumerating from a bond would miss chains whose middle
        # bonds are both stored in the unfavourable orientation)
        tt_atoms, tt_type, tt_sign = [], [], []
        for k in range(n):
            for j in adj[k]:
                for l in adj[k]:
                    if l <= j:
                        continue
                    for i in adj[j]:
                        if i == k or i == l:
                            continue
                        for m in adj[l]:
                            if m in (k, j, i):
                                continue
                            ckey = (
                                int(acls[i]), int(acls[j]), int(acls[k]),
                                int(acls[l]), int(acls[m]),
                            )
                            if ckey not in tt_tab:
                                continue
                            g, rev = tt_tab[ckey]
                            chain = (
                                (m, l, k, j, i) if rev else (i, j, k, l, m)
                            )
                            tt_atoms.append(chain)
                            tt_type.append(g)
                            # chirality sign needs coordinates: defaults
                            # to +1 (the L convention);
                            # resolve_chirality_signs fixes it from a
                            # build geometry (Tinker chkttor)
                            tt_sign.append(1.0)

        # tortors grids: 25x25 includes the duplicated +180 row/col; drop it
        # for the periodic spline (R=24, same convention as ff19SB CMAP)
        grids = val["tortors_grid"][:, :-1, :-1]
        tt_coeffs = cmap_bicubic_coeffs(grids) * units.kcal_per_mol

        scalars = {
            k: float(val[k])
            for k in (
                "bond_cubic", "bond_quartic",
                "angle_cubic", "angle_quartic", "angle_pentic", "angle_sextic",
                "opbend_cubic", "opbend_quartic", "opbend_pentic",
                "opbend_sextic", "torsionunit",
            )
        }

        f32 = lambda x, shape: jnp.asarray(
            np.asarray(x, np.float64).reshape(shape), jnp.float32
        )
        i32 = lambda x, shape: jnp.asarray(
            np.asarray(x, np.int64).reshape(shape), jnp.int32
        )
        return cls(
            n_atoms=n,
            bond_ij=i32(bond_ij, (-1, 2)), bond_k=f32(bond_k, (-1,)),
            bond_r0=f32(bond_r0, (-1,)),
            ub_ik=i32(ub_ik, (-1, 2)), ub_k=f32(ub_k, (-1,)),
            ub_r0=f32(ub_r0, (-1,)),
            ang_ijk=i32(ang_ijk, (-1, 3)), ang_k=f32(ang_k, (-1,)),
            ang_t0=f32(ang_t0, (-1,)),
            angp_ijkd=i32(angp_ijkd, (-1, 4)), angp_k=f32(angp_k, (-1,)),
            angp_t0=f32(angp_t0, (-1,)),
            sb_ijk=i32(sb_ijk, (-1, 3)), sb_k1=f32(sb_k1, (-1,)),
            sb_k2=f32(sb_k2, (-1,)), sb_r01=f32(sb_r01, (-1,)),
            sb_r02=f32(sb_r02, (-1,)), sb_t0=f32(sb_t0, (-1,)),
            opb_dbac=i32(opb_dbac, (-1, 4)), opb_k=f32(opb_k, (-1,)),
            tor_ijkl=i32(tor_ijkl, (-1, 4)), tor_amp=f32(tor_amp, (-1, 3)),
            tor_phase=f32(tor_phase, (-1, 3)), tor_n=f32(tor_n, (-1, 3)),
            pit_atoms=i32(pit_atoms, (-1, 6)), pit_k=f32(pit_k, (-1,)),
            st_ijkl=i32(st_ijkl, (-1, 4)), st_k=f32(st_k, (-1, 9)),
            st_r0=f32(st_r0, (-1, 3)),
            at_ijkl=i32(at_ijkl, (-1, 4)), at_k=f32(at_k, (-1, 6)),
            at_t0=f32(at_t0, (-1, 2)),
            tt_atoms=i32(tt_atoms, (-1, 5)), tt_type=i32(tt_type, (-1,)),
            tt_sign=f32(tt_sign, (-1,)),
            tt_coeffs=jnp.asarray(tt_coeffs, jnp.float32),
            tt_res=int(grids.shape[1]) if grids.size else 24,
            scalars=scalars,
        )

    # ------------------------------------------------------------------
    def energy(self, P: jnp.ndarray, cell=None) -> jnp.ndarray:
        """Total valence energy [eV]; autodiff for forces."""
        s = self.scalars
        KCAL = units.kcal_per_mol
        e = jnp.zeros((), jnp.float32)

        def diff(a, b):
            v = P[a] - P[b]
            return _pbc_diff(v, cell) if cell is not None else v

        if self.bond_ij.shape[0]:
            dt = _safe_norm(diff(self.bond_ij[:, 0], self.bond_ij[:, 1])) \
                - self.bond_r0
            e = e + jnp.sum(
                self.bond_k * dt * dt
                * (1.0 + s["bond_cubic"] * dt + s["bond_quartic"] * dt * dt)
            )

        if self.ub_ik.shape[0]:
            du = _safe_norm(diff(self.ub_ik[:, 0], self.ub_ik[:, 1])) \
                - self.ub_r0
            e = e + jnp.sum(self.ub_k * du * du)

        def sextic(k, dt_deg):
            d2 = dt_deg * dt_deg
            return ANGLE_UNIT * k * d2 * (
                1.0 + s["angle_cubic"] * dt_deg + s["angle_quartic"] * d2
                + s["angle_pentic"] * d2 * dt_deg + s["angle_sextic"] * d2 * d2
            )

        def plain_angle(ijk):
            v0 = diff(ijk[:, 0], ijk[:, 1])
            v1 = diff(ijk[:, 2], ijk[:, 1])
            y = _safe_norm(jnp.cross(v0, v1))
            x = jnp.sum(v0 * v1, axis=-1)
            ok = (x * x + y * y) > 1e-12
            return jnp.arctan2(jnp.where(ok, y, 0.0), jnp.where(ok, x, 1.0))

        if self.ang_ijk.shape[0]:
            th = plain_angle(self.ang_ijk) * DEG
            e = e + jnp.sum(sextic(self.ang_k, th - self.ang_t0))

        if self.angp_ijkd.shape[0]:
            # project the center onto the plane of its three attachments
            # (Tinker eangle in-plane branch), then measure i-proj-k
            pi_ = P[self.angp_ijkd[:, 0]]
            pb = P[self.angp_ijkd[:, 1]]
            pk = P[self.angp_ijkd[:, 2]]
            pd = P[self.angp_ijkd[:, 3]]
            ad = _mimg(pi_ - pd, cell)
            cd = _mimg(pk - pd, cell)
            bd = _mimg(pb - pd, cell)
            t = jnp.cross(ad, cd)
            rt2 = jnp.maximum(jnp.sum(t * t, axis=-1), 1e-12)
            delta = -jnp.sum(t * bd, axis=-1) / rt2
            pip = pb + t * delta[:, None]
            v0 = _mimg(pi_ - pip, cell)
            v1 = _mimg(pk - pip, cell)
            y = _safe_norm(jnp.cross(v0, v1))
            x = jnp.sum(v0 * v1, axis=-1)
            ok = (x * x + y * y) > 1e-12
            th = jnp.arctan2(jnp.where(ok, y, 0.0), jnp.where(ok, x, 1.0)) * DEG
            e = e + jnp.sum(sextic(self.angp_k, th - self.angp_t0))

        if self.sb_ijk.shape[0]:
            th = plain_angle(self.sb_ijk) * DEG
            dr1 = _safe_norm(diff(self.sb_ijk[:, 0], self.sb_ijk[:, 1])) \
                - self.sb_r01
            dr2 = _safe_norm(diff(self.sb_ijk[:, 2], self.sb_ijk[:, 1])) \
                - self.sb_r02
            e = e + STRBND_UNIT * jnp.sum(
                (self.sb_k1 * dr1 + self.sb_k2 * dr2) * (th - self.sb_t0)
            )

        if self.opb_dbac.shape[0]:
            # Allinger chi: angle between bond b->d and the a-c-d plane
            pd = P[self.opb_dbac[:, 0]]
            pb = P[self.opb_dbac[:, 1]]
            pa = P[self.opb_dbac[:, 2]]
            pc = P[self.opb_dbac[:, 3]]
            ab = _mimg(pa - pb, cell)
            cb = _mimg(pc - pb, cell)
            db = _mimg(pd - pb, cell)
            ad = _mimg(pa - pd, cell)
            cd = _mimg(pc - pd, cell)
            dot = jnp.sum(ad * cd, axis=-1)
            cc = jnp.maximum(
                jnp.sum(ad * ad, axis=-1) * jnp.sum(cd * cd, axis=-1)
                - dot * dot, 1e-12,
            )
            ee = jnp.sum(db * jnp.cross(ab, cb), axis=-1)
            rdb2 = jnp.maximum(jnp.sum(db * db, axis=-1), 1e-12)
            sin2 = jnp.clip(ee * ee / (cc * rdb2), 0.0, 1.0)
            chi = jnp.arcsin(jnp.sqrt(sin2)) * DEG
            d2 = chi * chi
            e = e + jnp.sum(
                ANGLE_UNIT * self.opb_k * d2 * (
                    1.0 + s["opbend_cubic"] * chi + s["opbend_quartic"] * d2
                    + s["opbend_pentic"] * d2 * chi
                    + s["opbend_sextic"] * d2 * d2
                )
            )

        def dihedral(ijkl):
            return _dihedral_angle(
                P[ijkl[:, 0]], P[ijkl[:, 1]], P[ijkl[:, 2]], P[ijkl[:, 3]],
                cell,
            )

        if self.tor_ijkl.shape[0]:
            phi = dihedral(self.tor_ijkl)[:, None]
            e = e + s["torsionunit"] * jnp.sum(
                self.tor_amp
                * (1.0 + jnp.cos(self.tor_n * phi - self.tor_phase))
            )

        if self.pit_atoms.shape[0]:
            # dummy points: pb + normal of (a-c, d-c); pc + normal of
            # (e-b, f-b) — then the 2-fold torsion ip-b-c-iq (Tinker
            # epitors geometry)
            pb = P[self.pit_atoms[:, 0]]
            pc = P[self.pit_atoms[:, 1]]
            pa = P[self.pit_atoms[:, 2]]
            pd = P[self.pit_atoms[:, 3]]
            pe = P[self.pit_atoms[:, 4]]
            pf = P[self.pit_atoms[:, 5]]
            ad = _mimg(pa - pc, cell)
            bd = _mimg(pd - pc, cell)
            ec = _mimg(pe - pb, cell)
            gc = _mimg(pf - pb, cell)
            ip = jnp.cross(ad, bd) + pb
            iq = jnp.cross(ec, gc) + pc
            phi = _dihedral_angle(ip, pb, pc, iq, None)
            e = e + jnp.sum(self.pit_k * (1.0 - jnp.cos(2.0 * phi)))

        if self.st_ijkl.shape[0]:
            phi = dihedral(self.st_ijkl)[:, None]
            fold = 1.0 + jnp.cos(
                jnp.asarray([1.0, 2.0, 3.0]) * phi
                - jnp.asarray([0.0, math.pi, 0.0])
            )                                           # [M,3]
            dr = jnp.stack(
                [
                    _safe_norm(diff(self.st_ijkl[:, 0], self.st_ijkl[:, 1])),
                    _safe_norm(diff(self.st_ijkl[:, 1], self.st_ijkl[:, 2])),
                    _safe_norm(diff(self.st_ijkl[:, 2], self.st_ijkl[:, 3])),
                ],
                axis=-1,
            ) - self.st_r0                               # [M,3]
            e = e + jnp.sum(
                dr * jnp.sum(self.st_k.reshape(-1, 3, 3) * fold[:, None, :],
                             axis=-1)
            )

        if self.at_ijkl.shape[0]:
            phi = dihedral(self.at_ijkl)[:, None]
            fold = 1.0 + jnp.cos(
                jnp.asarray([1.0, 2.0, 3.0]) * phi
                - jnp.asarray([0.0, math.pi, 0.0])
            )
            th1 = plain_angle(self.at_ijkl[:, 0:3]) * DEG - self.at_t0[:, 0]
            th2 = plain_angle(self.at_ijkl[:, 1:4]) * DEG - self.at_t0[:, 1]
            dth = jnp.stack([th1, th2], axis=-1)         # [M,2]
            e = e + ANGTOR_UNIT * jnp.sum(
                dth * jnp.sum(self.at_k.reshape(-1, 2, 3) * fold[:, None, :],
                              axis=-1)
            )

        if self.tt_atoms.shape[0]:
            a = self.tt_atoms
            phi1 = _dihedral_angle(P[a[:, 0]], P[a[:, 1]], P[a[:, 2]],
                                   P[a[:, 3]], cell) * self.tt_sign
            phi2 = _dihedral_angle(P[a[:, 1]], P[a[:, 2]], P[a[:, 3]],
                                   P[a[:, 4]], cell) * self.tt_sign
            R = self.tt_res

            def locate(angle):
                x = (angle + jnp.pi) * (R / (2.0 * jnp.pi))
                xi = jnp.floor(x)
                return jnp.mod(xi.astype(jnp.int32), R), x - xi

            gi, t = locate(phi1)
            gj, u = locate(phi2)
            C = self.tt_coeffs[self.tt_type, gi, gj]     # [M,4,4]
            tp = jnp.stack([jnp.ones_like(t), t, t * t, t * t * t], axis=-1)
            up = jnp.stack([jnp.ones_like(u), u, u * u, u * u * u], axis=-1)
            # tt_coeffs already in eV; counted separately below
            e_tt = jnp.einsum("mij,mi,mj->", C, tp, up)
            return e * KCAL + e_tt

        return e * KCAL

    def energy_forces(self, P: jnp.ndarray, cell=None):
        e, g = jax.value_and_grad(lambda p: self.energy(p, cell))(P)
        return e, -g


def _mimg(v, cell):
    return _pbc_diff(v, cell) if cell is not None else v


def resolve_chirality_signs(av: AmoebaValence, positions: np.ndarray,
                            bonds: np.ndarray, elem: np.ndarray | None = None
                            ) -> AmoebaValence:
    """Fix tt_sign from a build geometry (Tinker chkttor logic).

    For each torsion-torsion chain i-j-k-l-m: if k has four attachments,
    take its two off-chain attachments, pick the heavier (larger atomic
    number; ties by class), and compute the signed volume
    (r_j - r_k) . [(r_l - r_k) x (r_x - r_k)].  Negative volume = opposite
    chirality to the grid convention -> both spline angles are negated
    (Tinker chkttor.f).  Standard L-amino-acid backbones give +1.
    """
    if av.tt_atoms.shape[0] == 0:
        return av
    n = int(np.max(bonds)) + 1 if len(bonds) else 0
    adj: list[list[int]] = [[] for _ in range(max(n, av.n_atoms))]
    for i, j in np.asarray(bonds):
        adj[int(i)].append(int(j))
        adj[int(j)].append(int(i))
    signs = []
    P = np.asarray(positions)
    for chain in np.asarray(av.tt_atoms):
        i, j, k, l, m = (int(v) for v in chain)
        nbrs = [x for x in adj[k] if x not in (j, l)]
        if len(adj[k]) != 4 or len(nbrs) != 2:
            signs.append(1.0)
            continue
        if elem is not None:
            x = nbrs[0] if elem[nbrs[0]] >= elem[nbrs[1]] else nbrs[1]
        else:
            x = max(nbrs)
        vol = np.dot(
            P[j] - P[k], np.cross(P[l] - P[k], P[x] - P[k])
        )
        signs.append(1.0 if vol >= 0.0 else -1.0)
    return dataclasses.replace(
        av, tt_sign=jnp.asarray(np.asarray(signs, np.float32))
    )

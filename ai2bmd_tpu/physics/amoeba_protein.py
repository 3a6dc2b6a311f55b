"""AMOEBA parameter assignment for proteins (and any biotype-covered
molecule) + a vacuum nonbonded evaluator.

The reference gets AMOEBA-on-protein by shipping the geometry to Tinker9
(src/Calculators/tinker_async.py, amoebabio18.prm at :130); this module
performs Tinker's parameter machinery in-framework from the converted
asset (amoeba_params.npz):

  biotype lookup  (atom name, residue) -> atom type, with the prm's
      generic-name convention (HB covers HB2/HB3, OD covers OD1/OD2 —
      but TRP's CD1/CD2 etc. stay distinct, so exact match is tried first)
  multipole frames: per-type records are matched against the bonded
      neighborhood (z among neighbors, x among neighbors of i or of z —
      Tinker kmpole's search order), supporting Z-then-X (+ chirality
      y-site) and Bisector definitions; the chkpole handedness flip is
      baked into the local dipole/quadrupole at build time (chirality
      cannot invert during MD)
  scale matrices: mpole 1-2/3/4/5 = 0/0/0.4/0.8, polar p-scale
      1-2/3 = 0, vdw 1-2/3 = 0 (bond-path BFS), and the group-based
      direct-11 = 0 mask from the prm's `polarize` group lists
      (connected components of in-group bonds)

Only the NONBONDED AMOEBA terms are assigned.  In the subtractive QM/MM
scheme (E = E_MM(all) + E_QM(prot) - E_MM(prot), qmmm.py:73-79) the
protein's MM valence terms cancel exactly between the two MM evaluations
of the identical geometry, so multipoles + polarization + buffered 14-7
are the complete requirement for solvated-AMOEBA parity.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ai2bmd_tpu import units
from ai2bmd_tpu.physics.amoeba import (
    BOHR,
    AmoebaParams,
    _thole_lambdas,
    field_from_dipole,
    field_from_permanent,
    rotate_multipoles,
)

# PDB residue code -> prm biotype residue description
RESIDUE_DESC = {
    "ALA": "Alanine", "ARG": "Arginine", "ASN": "Asparagine",
    "ASP": "Aspartic Acid", "ASH": "Aspartic Acid (COOH)",
    "CYS": "Cysteine (SH)", "CYX": "Cystine (SS)", "CYM": "Cysteine (S-)",
    "GLN": "Glutamine", "GLU": "Glutamic Acid",
    "GLH": "Glutamic Acid (COOH)", "GLY": "Glycine",
    "HIS": "Histidine (HE)", "HIE": "Histidine (HE)",
    "HID": "Histidine (HD)", "HIP": "Histidine (+)",
    "ILE": "Isoleucine", "LEU": "Leucine", "LYS": "Lysine",
    "LYN": "Lysine (NH2)", "MET": "Methionine", "PHE": "Phenylalanine",
    "PRO": "Proline", "SER": "Serine", "THR": "Threonine",
    "TRP": "Tryptophan", "TYR": "Tyrosine", "VAL": "Valine",
    "ACE": "Acetyl N-Terminus", "NME": "N-MeAmide C-Terminus",
    "NHE": "Amide C-Terminus",
    "WAT": "Water", "HOH": "Water",
    "NA": "Sodium Ion", "NA+": "Sodium Ion", "CL": "Chloride Ion",
    "CL-": "Chloride Ion", "K": "Potassium Ion", "K+": "Potassium Ion",
}


def _biotype(par: AmoebaParams, res: str, name: str) -> int:
    desc = RESIDUE_DESC.get(res.upper())
    if desc is None:
        raise KeyError(f"no AMOEBA biotype mapping for residue {res!r}")
    # Resolution order: (1) PDB amide 'H' -> prm 'HN' (before the exact
    # match: NME has BOTH an amide H named HN and a methyl H named plain H
    # in the prm, and the PDB's amide atom is the bare 'H'); (2) exact
    # name (TRP CD1 vs CD2 are distinct types); (3) strip trailing digits
    # one at a time (HG21 -> HG2 -> HG covers THR's methyl and generic
    # HB2 -> HB); (4) methyl-hydrogen fallback HH3x -> 'H' (NME/ACE caps).
    cands = []
    if name == "H":
        cands.append("HN")
    cands.append(name)
    # ion atom names: 'Na+' -> prm 'NA', 'Cl-' -> 'CL'
    cands.append(name.upper().rstrip("+-"))
    stripped = name
    while stripped and stripped[-1].isdigit():
        stripped = stripped[:-1]
        cands.append(stripped)
    if name.startswith("H"):
        cands.append("H")
    for cand in cands:
        if cand and (cand, desc) in par.biotype:
            return par.biotype[(cand, desc)]
    raise KeyError(f"no biotype for atom {name!r} in {desc!r}")


# scale factors by bonded-path order (amoebabio18.prm header keywords)
MPOLE_SCALES = {1: 0.0, 2: 0.0, 3: 0.4, 4: 0.8}
POLAR_SCALES = {1: 0.0, 2: 0.0, 3: 1.0, 4: 1.0}
VDW_SCALES = {1: 0.0, 2: 0.0, 3: 1.0, 4: 1.0}


@dataclasses.dataclass
class AmoebaAssignment:
    """Host-side per-atom AMOEBA nonbonded parameterization.

    Scale information is stored SPARSELY (unique i<j pairs within 4 bonds
    + intra-polarization-group pairs) so solvated-box systems don't need
    [N,N] matrices; the dense matrices used by the small-system vacuum
    evaluator are built on demand via `mscale`/`pscale`/`dmask`/`vscale`.
    """

    n_atoms: int
    atype: np.ndarray        # [N] prm atom type
    q: np.ndarray            # [N] e
    dip_loc: np.ndarray      # [N,3] e*A (chirality flip baked in)
    quad_loc: np.ndarray     # [N,3,3] e*A^2
    frame_z: np.ndarray      # [N]
    frame_x: np.ndarray      # [N]
    frame_kind: np.ndarray   # [N] 0 z-then-x, 1 bisector (monatomic: self)
    alpha: np.ndarray        # [N] A^3
    thole: np.ndarray        # [N]
    group_id: np.ndarray     # [N] polarization group
    vdw_rmin: np.ndarray     # [N] A
    vdw_eps: np.ndarray      # [N] eV
    vdw_red: np.ndarray      # [N]
    heavy_of: np.ndarray     # [N]
    scale_pairs: np.ndarray  # [M,2] i<j pairs within 4 bonds
    scale_order: np.ndarray  # [M] bonded-path order 1..4
    group_pairs: np.ndarray  # [G,2] i<j pairs in the same polarization group
    bonds: np.ndarray        # [B,2]

    def _dense(self, table, default=1.0):
        n = self.n_atoms
        m = np.full((n, n), default)
        i, j = self.scale_pairs.T if len(self.scale_pairs) else ([], [])
        s = np.array([table[int(o)] for o in self.scale_order])
        if len(self.scale_pairs):
            m[i, j] = s
            m[j, i] = s
        m[np.eye(n, dtype=bool)] = 0.0
        return m

    @property
    def mscale(self):
        return self._dense(MPOLE_SCALES)

    @property
    def pscale(self):
        return self._dense(POLAR_SCALES)

    @property
    def vscale(self):
        return self._dense(VDW_SCALES)

    @property
    def dmask(self):
        return (self.group_id[:, None] != self.group_id[None, :]).astype(
            np.float64
        )


def _bond_path_pairs(n, bonds, max_order=4):
    """Sparse bonded-path orders: (pairs [M,2] i<j, order [M]) plus the
    adjacency list.  O(N * local-neighborhood), no [N,N] allocation."""
    adj = [[] for _ in range(n)]
    for i, j in bonds:
        adj[int(i)].append(int(j))
        adj[int(j)].append(int(i))
    pairs, orders = [], []
    for s in range(n):
        dist = {s: 0}
        frontier = [s]
        for depth in range(1, max_order + 1):
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = depth
                        nxt.append(v)
                        if v > s:
                            pairs.append((s, v))
                            orders.append(depth)
            frontier = nxt
    pairs = np.asarray(pairs, np.int32).reshape(-1, 2)
    return pairs, np.asarray(orders, np.int8), adj


def assign_amoeba(atom_names, residue_names, positions, bonds) -> AmoebaAssignment:
    """Assign AMOEBA nonbonded parameters from names + connectivity.

    positions are only used to bake the chkpole chirality flips.
    """
    par = AmoebaParams.load()
    n = len(atom_names)
    P = np.asarray(positions, np.float64)
    scale_pairs, scale_order, adj = _bond_path_pairs(n, bonds)

    atype = np.array(
        [_biotype(par, str(r), str(a)) for a, r in zip(atom_names, residue_names)],
        np.int64,
    )

    q = np.zeros(n)
    dip = np.zeros((n, 3))
    quad = np.zeros((n, 3, 3))
    fz = np.arange(n)
    fx = np.arange(n)
    kind = np.zeros(n, np.int32)

    for i in range(n):
        recs = par.multipole.get(int(atype[i]))
        if recs is None:
            raise KeyError(f"no multipole records for type {atype[i]}")
        nbrs = adj[i]
        assigned = False
        for (frame, qq, d, Q) in recs:
            kz, kx, ky = (list(frame) + [0, 0, 0])[:3]
            if kz == 0:                           # monatomic ion
                q[i], dip[i], quad[i] = qq, 0.0, 0.0
                fz[i] = fx[i] = i
                kind[i] = 0
                assigned = True
                break
            z_cands = [j for j in nbrs if atype[j] == abs(kz)]
            if not z_cands:
                continue
            if kz < 0 and kx < 0:                 # bisector
                done = False
                for z in z_cands:
                    xs = [j for j in nbrs if j != z and atype[j] == abs(kx)]
                    if xs:
                        fz[i], fx[i], kind[i] = z, xs[0], 1
                        done = True
                        break
                if not done:
                    continue
            else:                                 # z-then-x (+ optional y)
                done = False
                for z in z_cands:
                    # x bonded to i first, then bonded to z (kmpole order)
                    xs = [j for j in nbrs if j != z and atype[j] == abs(kx)]
                    xs += [j for j in adj[z] if j != i and atype[j] == abs(kx)]
                    for x in xs:
                        if ky:
                            ys = [
                                j for j in nbrs + adj[z]
                                if j not in (i, z, x) and atype[j] == abs(ky)
                            ]
                            if not ys:
                                continue
                        fz[i], fx[i], kind[i] = z, x, 0
                        done = True
                        y_site = ys[0] if ky else None
                        break
                    if done:
                        break
                if not done:
                    continue
            q[i] = qq
            d_loc = np.asarray(d, np.float64) * BOHR
            Q_loc = np.asarray(Q, np.float64) * BOHR * BOHR
            if (kz > 0 or kx > 0) and ky and y_site is not None:
                # chkpole: if the y reference site sits on the -y side of
                # the right-handed (z, x) frame, the prm values describe
                # the mirror image — flip the y-sensitive components
                uz = P[fz[i]] - P[i]
                uz = uz / np.linalg.norm(uz)
                ux = P[fx[i]] - P[i]
                ux = ux - (ux @ uz) * uz
                ux = ux / np.linalg.norm(ux)
                uy = np.cross(uz, ux)
                if (P[y_site] - P[i]) @ uy < 0.0:
                    d_loc[1] *= -1.0
                    Q_loc[0, 1] *= -1.0
                    Q_loc[1, 0] *= -1.0
                    Q_loc[1, 2] *= -1.0
                    Q_loc[2, 1] *= -1.0
            dip[i] = d_loc
            quad[i] = Q_loc
            assigned = True
            break
        if not assigned:
            raise ValueError(
                f"no multipole frame of type {atype[i]} matches atom {i} "
                f"({atom_names[i]} {residue_names[i]}; neighbor types "
                f"{[int(atype[j]) for j in nbrs]})"
            )

    alpha = np.zeros(n)
    thole = np.zeros(n)
    group_types = {}
    for i in range(n):
        a, th, grp = par.polarize[int(atype[i])]
        alpha[i], thole[i] = a, th
        group_types[i] = set(grp)

    # polarization groups: connected components over in-group bonds
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i, j in bonds:
        i, j = int(i), int(j)
        if atype[j] in group_types[i] or atype[i] in group_types[j]:
            parent[find(i)] = find(j)
    group_id = np.array([find(i) for i in range(n)], np.int64)

    vdw_rmin = np.zeros(n)
    vdw_eps = np.zeros(n)
    vdw_red = np.ones(n)
    heavy = np.arange(n)
    for i in range(n):
        r, e, red = par.vdw[par.type_to_class[int(atype[i])]]
        vdw_rmin[i], vdw_eps[i] = r, e * units.kcal_per_mol
        if red != 1.0 and len(adj[i]) == 1:
            vdw_red[i] = red
            heavy[i] = adj[i][0]

    # intra-polarization-group pairs (groups are small connected sets)
    import collections

    members = collections.defaultdict(list)
    for i in range(n):
        members[int(group_id[i])].append(i)
    group_pairs = [
        (a, b)
        for mem in members.values()
        for ai, a in enumerate(mem)
        for b in mem[ai + 1:]
    ]
    group_pairs = np.asarray(group_pairs, np.int32).reshape(-1, 2)

    return AmoebaAssignment(
        n_atoms=n, atype=atype, q=q, dip_loc=dip, quad_loc=quad,
        frame_z=fz.astype(np.int32), frame_x=fx.astype(np.int32),
        frame_kind=kind, alpha=alpha, thole=thole, group_id=group_id,
        vdw_rmin=vdw_rmin, vdw_eps=vdw_eps, vdw_red=vdw_red,
        heavy_of=heavy.astype(np.int32),
        scale_pairs=scale_pairs, scale_order=scale_order,
        group_pairs=group_pairs,
        bonds=np.asarray(bonds, np.int32).reshape(-1, 2),
    )


# ---------------------------------------------------------------------------
# vacuum evaluator (dense; the QM/MM protein-only MM term)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class AmoebaVacuumSystem:
    """Nonbonded AMOEBA energy of one molecule in vacuum (dense masks)."""

    asg: AmoebaAssignment
    sor_iters: int = 40
    sor_omega: float = 0.7

    def _jnp(self, name):
        return jnp.asarray(getattr(self.asg, name))

    def lab_multipoles(self, P):
        a = self.asg
        mu, theta = rotate_multipoles(
            P, jnp.asarray(a.frame_z), jnp.asarray(a.frame_x),
            jnp.asarray(a.frame_kind), jnp.asarray(a.dip_loc),
            jnp.asarray(a.quad_loc),
        )
        # monatomic sites (frame_z == self) carry no dip/quad: rotation of
        # a zero vector is zero, safe as-is
        return jnp.asarray(a.q), mu, theta

    def permanent_energy(self, P):
        from ai2bmd_tpu.physics.amoeba import pair_permanent_energy

        a = self.asg
        q, mu, theta = self.lab_multipoles(P)
        n = a.n_atoms
        ii, jj = np.triu_indices(n, 1)
        scale = jnp.asarray(a.mscale[ii, jj])
        live = np.asarray(a.mscale[ii, jj] > 0)
        x = P[jj] - P[ii]
        x = jnp.where(jnp.asarray(live)[:, None], x, jnp.array([10.0, 0.0, 0.0]))
        e = jax.vmap(pair_permanent_energy)(
            x, q[ii], mu[ii], theta[ii], q[jj], mu[jj], theta[jj]
        )
        return units.COULOMB * jnp.sum(jnp.where(jnp.asarray(live), scale * e, 0.0))

    def _fields(self, P):
        a = self.asg
        q, mu, theta = self.lab_multipoles(P)
        n = a.n_atoms
        not_self = ~jnp.eye(n, dtype=bool)
        x = P[:, None, :] - P[None, :, :]
        x = jnp.where(not_self[..., None], x, jnp.array([10.0, 0.0, 0.0]))
        r = jnp.sqrt(jnp.sum(x * x, axis=-1))
        alpha = jnp.asarray(a.alpha)
        pd6 = alpha ** (1.0 / 6.0)
        pd = pd6[:, None] * pd6[None, :]
        th = jnp.asarray(a.thole)
        gm = jnp.minimum(th[:, None], th[None, :])
        l3, l5, l7 = _thole_lambdas(r, pd, gm)
        E = field_from_permanent(
            x, jnp.broadcast_to(q[None, :], (n, n)),
            jnp.broadcast_to(mu[None], (n, n, 3)),
            jnp.broadcast_to(theta[None], (n, n, 3, 3)),
            l3[..., None], l5[..., None], l7[..., None],
        )
        E = jnp.where(not_self[..., None], E, 0.0)
        E_d = jnp.sum(E * jnp.asarray(a.dmask)[..., None], axis=1)
        E_p = jnp.sum(E * jnp.asarray(a.pscale)[..., None], axis=1)
        return E_d, E_p, x, r, l3, l5, not_self, alpha

    def induced_dipoles(self, P):
        """SCF with the group d-mask; returns (mu_ind, E_p) where E_p is
        the p-scaled permanent field used for the energy."""
        E_d, E_p, x, r, l3, l5, not_self, alpha = self._fields(P)
        al = alpha[:, None]

        def step(mu_ind, _):
            Emut = field_from_dipole(
                x, mu_ind[None, :, :], l3[..., None], l5[..., None]
            )
            Emut = jnp.where(not_self[..., None], Emut, 0.0).sum(axis=1)
            new = mu_ind + self.sor_omega * (al * (E_d + Emut) - mu_ind)
            return new, None

        mu0 = al * E_d
        mu_ind, _ = jax.lax.scan(step, mu0, None, length=self.sor_iters)
        return mu_ind, E_p

    def polarization_energy(self, P):
        mu_ind, E_p = self.induced_dipoles(P)
        return -0.5 * units.COULOMB * jnp.sum(mu_ind * E_p)

    def vdw_energy(self, P):
        a = self.asg
        red = jnp.asarray(a.vdw_red)[:, None]
        hv = jnp.asarray(a.heavy_of)
        sites = P[hv] + red * (P - P[hv])
        n = a.n_atoms
        iu = jnp.asarray(np.triu(np.ones((n, n), bool), 1))
        vs = jnp.asarray(a.vscale)
        live = iu & (vs > 0)
        d = sites[:, None, :] - sites[None, :, :]
        r = jnp.sqrt(jnp.sum(jnp.where(live[..., None], d, 1.0) ** 2, -1))
        rm = jnp.asarray(a.vdw_rmin)
        ri, rj = rm[:, None], rm[None, :]
        r0 = (ri**3 + rj**3) / jnp.maximum(ri**2 + rj**2, 1e-12)
        em = jnp.asarray(a.vdw_eps)
        ei, ej = em[:, None], em[None, :]
        se = jnp.sqrt(ei) + jnp.sqrt(ej)
        eps = 4.0 * ei * ej / jnp.maximum(se * se, 1e-12)
        rho = r / jnp.maximum(r0, 1e-12)
        f1 = (1.07 / (rho + 0.07)) ** 7
        f2 = 1.12 / (rho**7 + 0.12) - 2.0
        return jnp.sum(jnp.where(live, vs * eps * f1 * f2, 0.0))

    def energy(self, P):
        return (
            self.permanent_energy(P)
            + self.polarization_energy(P)
            + self.vdw_energy(P)
        )

    def energy_forces(self, P):
        e, g = jax.value_and_grad(self.energy)(P)
        return e, -g

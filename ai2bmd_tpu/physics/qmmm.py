"""Subtractive QM/MM with explicit solvent.

The reference scheme (src/Calculators/qmmm.py:48-83):

    E = E_MM(full solvated box) + E_QM(protein) - E_MM(protein only)
    F = F_MM(full);  F[protein] += F_QM - F_MM1(protein)

where the reference's E_MM evaluations are Tinker9 AMOEBA co-processes over
sockets; here both are the in-graph MM engine (ai2bmd_tpu.physics.mm) and
the three evaluations fuse into one jitted program (the reference's
3-thread executor, qmmm.py:60-65, becomes XLA scheduling).

The protein's internal bonded terms cancel exactly between the two MM
evaluations, but both are evaluated faithfully so that a different MM
backend (e.g. a polarizable one, where cancellation is not exact) can slot
in without touching this combiner.

Neighbor-list state rides the integrator's aux carry; rebuilds happen
in-graph whenever the max displacement exceeds half the skin
(lax.cond — data-dependent but shape-static).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ai2bmd_tpu.data.protein_topology import SystemTopology, build_topology
from ai2bmd_tpu.io.pdb import PDBAtoms
from ai2bmd_tpu.ops import neighbors as NL
from ai2bmd_tpu.physics import mm as MM


def _subsystem_topology(top: SystemTopology, idx: np.ndarray) -> SystemTopology:
    """Restrict a topology to a subset of atoms (index-remapped)."""
    remap = -np.ones(top.n_atoms, dtype=np.int64)
    remap[idx] = np.arange(len(idx))

    def keep_terms(atoms_arr, *params):
        if len(atoms_arr) == 0:
            return (atoms_arr,) + params
        mask = np.all(remap[atoms_arr] >= 0, axis=1)
        out = (remap[atoms_arr[mask]].astype(np.int32),)
        return out + tuple(p[mask] for p in params)

    bonds, bond_k, bond_r0 = keep_terms(top.bonds, top.bond_k, top.bond_r0)
    angles, angle_k, angle_t0 = keep_terms(top.angles, top.angle_k, top.angle_t0)
    dih, dk, dn, dp = keep_terms(top.dihedrals, top.dih_k, top.dih_n, top.dih_phase)
    excl, = keep_terms(top.excl_pairs)
    p14, = keep_terms(top.pairs14)
    # CMAP must subset too: the subtractive combiner relies on the protein
    # MM evaluation carrying the SAME terms as the full one so they cancel
    cmap_atoms = np.zeros((0, 5), np.int32)
    cmap_type = np.zeros((0,), np.int32)
    cmap_grids = np.zeros((0, 24, 24))
    if top.cmap_atoms is not None and len(top.cmap_atoms):
        cmap_atoms, cmap_type = keep_terms(top.cmap_atoms, top.cmap_type)
        cmap_grids = top.cmap_grids
    return SystemTopology(
        n_atoms=len(idx),
        charges=top.charges[idx], sigmas=top.sigmas[idx],
        epsilons=top.epsilons[idx], masses=top.masses[idx],
        bonds=bonds, bond_k=bond_k, bond_r0=bond_r0,
        angles=angles, angle_k=angle_k, angle_t0=angle_t0,
        dihedrals=dih, dih_k=dk, dih_n=dn, dih_phase=dp,
        excl_pairs=excl, pairs14=p14,
        water_oxygens=np.zeros(0, np.int32),
        protein_atoms=np.arange(len(idx), dtype=np.int32),
        cmap_atoms=cmap_atoms, cmap_type=cmap_type, cmap_grids=cmap_grids,
    )


@dataclasses.dataclass
class QMMMPotential:
    """Stateful potential: (P_full, aux) -> (E, F_full, aux).

    aux = (full-system neighbor list, QM-side carry).  The QM term may
    itself be stateful (warm-started cap optimization): pass
    qm_stateful=(P_prot, qm_aux) -> (E, F, qm_aux); a stateless
    qm_energy_forces is lifted automatically.

    The MM backend is pluggable: "ff19sb" (fixed-charge engine,
    physics/mm.py, the shipping default) or "amoeba" (the full
    polarizable engine, physics/amoeba_system.py — the reference's actual
    solvent physics, tinker_async.py:127-145).  With the AMOEBA backend
    the protein's valence terms are OMITTED from BOTH MM evaluations —
    they cancel exactly in the subtractive combiner, so only the AMOEBA
    water bond/angle terms are added on the full-system side."""

    mm_full_ef: Any              # (P_full, nl) -> (E, F)
    mm_prot_ef: Any              # (P_prot, nl_prot) -> (E, F)
    qm_energy_forces: Any        # (P_prot, qm_aux) -> (E, F, qm_aux)
    qm_init_aux: Any
    sel: Any                     # [n_prot] int32 protein atom indices
    n_atoms: int
    k_neighbors: int
    skin: float
    top: SystemTopology
    cutoff: float
    cell: Any
    dense: bool = False          # dense tiled pair path: no neighbor lists
    #                              in aux at all (the nl closures then
    #                              ignore their nl argument)
    cp: Any = None               # physics.cellpair.CellPairs: cell-bucket
    #                              tile-pair path (ff19sb production
    #                              default, r4 — full MM E+F 38 -> 11 ms
    #                              on the 17.9k box); aux slot 0 carries
    #                              its CellState
    nl_grid: Any = None          # (nc, max_occ) for the O(N) cell-list
    #                              rebuild on >24k-atom boxes; None = the
    #                              exact tiled dense O(N^2) rebuild
    mm_init_carry: Any = ((), ())  # (full, prot) MM warm-start carry —
    #                              converged induced dipoles for the
    #                              amoeba-ewald backend, () otherwise

    @classmethod
    def build(
        cls,
        atoms: PDBAtoms,
        qm_energy_forces=None,
        cutoff: float = 9.0,
        beta: float = 0.35,
        grid_spacing: float = 1.0,
        k_neighbors: int = 640,
        skin: float = 1.5,
        qm_stateful=None,
        qm_init_aux=(),
        polarizable: bool = False,
        mm_backend: str = "ff19sb",
        amoeba_sor_iters: int = 8,
        amoeba_induction: str = "ewald",   # ewald (meshed field) | sor
        amoeba_cg_iters: int = 8,          # CG budget per solve.  The
        #   solve is warm-started from the previous step's dipoles and
        #   Jacobi-preconditioned (r4): warm-PCG-8 reaches max|dmu|
        #   ~1e-6 e*A vs a 60-iter reference on the water test box —
        #   ~2000x tighter than the reference's production 'polarization
        #   0.01' (debye) Tinker tolerance (tinker_async.py:127-145) —
        #   and warm-PCG-4 is still ~25x tighter (measured alongside
        #   test_amoeba_induction::test_pcg_beats_cg).
        pair_backend: str = "auto",        # dense | nl | auto
    ) -> "QMMMPotential":
        if atoms.cell is None:
            raise ValueError("solvated QM/MM needs a periodic cell (CRYST1)")
        top = build_topology(atoms)
        sel = top.protein_atoms
        top_prot = _subsystem_topology(top, sel)

        # pair-backend ladder (ff19sb):
        #   cellpair — cell-bucket tile blocks (physics/cellpair.py): the
        #              production default whenever the box fits a 3^3 cell
        #              grid.  Full MM E+F measured 38 -> 11 ms at 17.9k
        #              atoms on v5e vs the dense path.
        #   dense    — O(N^2) tiled slabs: small boxes, NPT (dynamic
        #              cell), and the explicit fallback.
        #   nl       — [N,K] gather lists: the polarizable backends
        #              consume these directly.
        cp = None
        if pair_backend in ("auto", "cellpair") and mm_backend == "ff19sb" \
                and not polarizable:
            from ai2bmd_tpu.physics import cellpair as CPm

            cp = CPm.build_cellpairs(atoms.cell, cutoff, top.n_atoms)
            if cp is None and pair_backend == "cellpair":
                raise ValueError(
                    "box too small for the cellpair backend (needs >= 3 "
                    "cells per axis at the cutoff); use dense"
                )
            if cp is not None and pair_backend == "auto":
                # the occ sizing assumes liquid-like (near-Poisson) cell
                # occupancy; a sparse synthetic box with one dense cluster
                # overflows a cell.  Under "auto", probe the input
                # structure once and fall back to the dense path instead
                # of failing at init_aux (explicit "cellpair" still
                # raises there).
                import jax as _jax

                probe = CPm.assign(
                    cp, jnp.asarray(atoms.positions, jnp.float32)
                )
                if bool(_jax.device_get(probe.overflow)):
                    cp = None
        dense = cp is None and (
            pair_backend == "dense"
            or (
                pair_backend == "auto"
                and mm_backend == "ff19sb"
                and not polarizable
                and top.n_atoms <= 40_000
            )
        )

        mm_init_carry = ((), ())
        if mm_backend == "amoeba":
            dense = False
            cp = None
            mm_full_ef, mm_prot_ef, mm_init_carry = cls._build_amoeba_backend(
                atoms, top, top_prot, sel, cutoff, amoeba_sor_iters,
                amoeba_induction, amoeba_cg_iters,
            )
        elif mm_backend == "ff19sb" and cp is not None:
            from ai2bmd_tpu.physics import cellpair as CPm

            mm_full = MM.MMSystem.build(
                top, atoms.cell, cutoff=cutoff, beta=beta,
                grid_spacing=grid_spacing,
            )
            mm_prot = MM.MMSystem.build(
                top_prot, atoms.cell, cutoff=cutoff, beta=beta,
                grid_spacing=grid_spacing,
            )
            n_prot = len(sel)
            mm_full_ef = lambda P, cps, c: (
                *CPm.mm_energy_forces_cellpair(mm_full, P, cps, cp), c
            )
            # protein-only subsystem stays dense (175-700 atoms)
            mm_prot_ef = lambda Pp, nlp, c: (
                *MM.mm_energy_forces_dense(mm_prot, Pp, tile=min(2048, n_prot)),
                c,
            )
        elif mm_backend == "ff19sb" and dense:
            mm_full = MM.MMSystem.build(
                top, atoms.cell, cutoff=cutoff, beta=beta,
                grid_spacing=grid_spacing,
            )
            mm_prot = MM.MMSystem.build(
                top_prot, atoms.cell, cutoff=cutoff, beta=beta,
                grid_spacing=grid_spacing,
            )
            n_prot = len(sel)
            mm_full_ef = lambda P, nl, c: (
                *MM.mm_energy_forces_dense(mm_full, P), c
            )
            mm_prot_ef = lambda Pp, nlp, c: (
                *MM.mm_energy_forces_dense(mm_prot, Pp, tile=min(2048, n_prot)),
                c,
            )
        elif mm_backend == "ff19sb":
            pol_full = pol_prot = None
            if polarizable:
                # induced dipoles driven by the fixed charges (round-1
                # hybrid; superseded by mm_backend="amoeba")
                from ai2bmd_tpu.physics.polarization import PolarizationParams

                pol_full = PolarizationParams.build(
                    atoms.numbers, top.charges, top.excl_pairs, cutoff=cutoff
                )
                pol_prot = PolarizationParams.build(
                    atoms.numbers[sel], top_prot.charges,
                    top_prot.excl_pairs, cutoff=cutoff,
                )
            mm_full = MM.MMSystem.build(
                top, atoms.cell, cutoff=cutoff, beta=beta,
                grid_spacing=grid_spacing, polarization=pol_full,
            )
            mm_prot = MM.MMSystem.build(
                top_prot, atoms.cell, cutoff=cutoff, beta=beta,
                grid_spacing=grid_spacing, polarization=pol_prot,
            )
            mm_full_ef = lambda P, nl, c: (
                *MM.mm_energy_forces(mm_full, P, nl), c
            )
            mm_prot_ef = lambda Pp, nlp, c: (
                *MM.mm_energy_forces(mm_prot, Pp, nlp), c
            )
        else:
            raise ValueError(f"unknown mm_backend {mm_backend!r}")

        if qm_stateful is None:
            fn = qm_energy_forces

            def qm_stateful(Pq, qa):
                e, f = fn(Pq)
                return e, f, qa

        return cls(
            mm_full_ef=mm_full_ef, mm_prot_ef=mm_prot_ef,
            qm_energy_forces=qm_stateful,
            qm_init_aux=qm_init_aux,
            sel=jnp.asarray(sel, jnp.int32),
            n_atoms=top.n_atoms,
            k_neighbors=k_neighbors, skin=skin, top=top,
            cutoff=cutoff, cell=jnp.asarray(atoms.cell, jnp.float32),
            dense=dense,
            cp=cp,
            # O(N) cell-list rebuild once the O(N^2) dense pass stops
            # being negligible (>24k atoms); exact same pair set
            nl_grid=(
                NL.cell_grid(atoms.cell, cutoff + skin, top.n_atoms)
                if top.n_atoms > 24_000 else None
            ),
            mm_init_carry=mm_init_carry,
        )

    @staticmethod
    def _build_amoeba_backend(atoms, top, top_prot, sel, cutoff, sor_iters,
                              induction: str = "ewald", cg_iters: int = 12):
        from ai2bmd_tpu import units
        from ai2bmd_tpu.physics.amoeba import WATER_R_OH, WATER_THETA_DEG
        from ai2bmd_tpu.physics.amoeba_protein import assign_amoeba
        from ai2bmd_tpu.physics.amoeba_system import AmoebaPeriodicSystem

        asg_full = assign_amoeba(
            atoms.atom_names, atoms.residue_names, atoms.positions, top.bonds
        )
        sys_full = AmoebaPeriodicSystem.build(
            asg_full, atoms.cell, cutoff=cutoff, sor_iters=sor_iters,
            grid_spacing=0.9,
        )
        names_p = [atoms.atom_names[i] for i in sel]
        res_p = [atoms.residue_names[i] for i in sel]
        asg_prot = assign_amoeba(
            names_p, res_p, atoms.positions[sel], top_prot.bonds
        )
        sys_prot = AmoebaPeriodicSystem.build(
            asg_prot, atoms.cell, cutoff=cutoff, sor_iters=sor_iters,
            grid_spacing=0.9,
        )

        # AMOEBA water valence terms (amoebabio18.prm bond 90-91 / angle
        # 91-90-91, harmonic part); solvated PDBs order waters O,H1,H2
        wat_o = jnp.asarray(top.water_oxygens, jnp.int32)
        bond_k = 556.85 * units.kcal_per_mol
        angle_k = 48.70 * units.kcal_per_mol
        theta0 = float(np.deg2rad(WATER_THETA_DEG))

        def water_bonded(P):
            if wat_o.shape[0] == 0:
                return 0.0
            o = wat_o
            e = 0.0
            for h in (o + 1, o + 2):
                d = jnp.sqrt(jnp.sum((P[h] - P[o]) ** 2, axis=-1))
                e = e + jnp.sum(bond_k * (d - WATER_R_OH) ** 2)
            v1 = P[o + 1] - P[o]
            v2 = P[o + 2] - P[o]
            y = jnp.sqrt(jnp.sum(jnp.cross(v1, v2) ** 2, axis=-1))
            x = jnp.sum(v1 * v2, axis=-1)
            th = jnp.arctan2(y, x)
            return e + jnp.sum(angle_k * (th - theta0) ** 2)

        if induction == "ewald":
            # full-Ewald (meshed) induction — cutoff/split-invariant
            # (the real-space SCF swings ~20% with cutoff; see
            # tests/test_amoeba_induction.py).  The variational
            # (implicit-gradient) path: both Tinker fields' converged
            # dipoles are carried across steps (warm PCG starts — at 1 fs
            # displacements they barely move) and forces come from the
            # fixed-dipole functional, so the CG solve costs forward
            # passes only (amoeba_system.induction_variational).
            def mm_full_ef(P, nl, mu):
                def e_of(p):
                    e, m = sys_full.energy_ewald_variational(
                        p, nl, mu[0], mu[1], cg_iters=cg_iters
                    )
                    return e + water_bonded(p), m

                (e, m), g = jax.value_and_grad(e_of, has_aux=True)(P)
                return e, -g, m

            def mm_prot_ef(Pp, nlp, mu):
                def e_of(p):
                    return sys_prot.energy_ewald_variational(
                        p, nlp, mu[0], mu[1], cg_iters=cg_iters
                    )

                (e, m), g = jax.value_and_grad(e_of, has_aux=True)(Pp)
                return e, -g, m

            zf = jnp.zeros((sys_full.n_atoms, 3), jnp.float32)
            zp = jnp.zeros((sys_prot.n_atoms, 3), jnp.float32)
            init_carry = ((zf, zf), (zp, zp))
            return mm_full_ef, mm_prot_ef, init_carry

        if induction != "sor":
            raise ValueError(f"unknown amoeba_induction {induction!r}")

        def mm_full_ef(P, nl, c):
            e, g = jax.value_and_grad(
                lambda p: sys_full.energy(p, nl) + water_bonded(p)
            )(P)
            return e, -g, c

        def mm_prot_ef(Pp, nlp, c):
            e, g = jax.value_and_grad(
                lambda p: sys_prot.energy(p, nlp)
            )(Pp)
            return e, -g, c

        return mm_full_ef, mm_prot_ef, ((), ())

    # -- aux = (full-system neighbor list | (), QM carry) --------------------
    def _build_nl(self, P):
        if self.nl_grid is not None:
            nc, max_occ = self.nl_grid
            return NL.build_neighbor_list_cells(
                P, self.cutoff + self.skin, self.k_neighbors, self.cell,
                nc, max_occ,
            )
        return NL.build_neighbor_list(
            P, self.cutoff + self.skin, self.k_neighbors, self.cell
        )

    def init_aux(self, P: jnp.ndarray):
        if self.cp is not None:
            from ai2bmd_tpu.physics import cellpair as CPm

            state = CPm.assign(self.cp, P)
            if bool(jax.device_get(state.overflow)):
                raise ValueError(
                    f"cell-bucket overflow at build time: some cell holds "
                    f"more than occ={self.cp.occ} atoms; the box density "
                    f"is far from liquid-like (check the input structure)"
                )
            return (state, self.qm_init_aux, self.mm_init_carry)
        if self.dense:
            return ((), self.qm_init_aux, self.mm_init_carry)
        nl = self._build_nl(P)
        # init_aux runs outside jit: surface an undersized K immediately
        # rather than silently truncating interactions for the whole run
        if bool(jax.device_get(nl.overflow)):
            raise ValueError(
                f"neighbor list overflow at build time: some atom has more "
                f"than k_neighbors={self.k_neighbors} neighbors within "
                f"cutoff+skin={self.cutoff + self.skin:.2f} A; raise "
                f"k_neighbors in QMMMPotential.build"
            )
        return (nl, self.qm_init_aux, self.mm_init_carry)

    def __call__(self, P: jnp.ndarray, aux):
        nl, qm_aux, (carry_full, carry_prot) = aux
        if self.cp is not None:
            from ai2bmd_tpu.physics import cellpair as CPm

            nl = jax.lax.cond(
                CPm.needs_rebuild(self.cp, nl, P),
                lambda: CPm.assign(self.cp, P),
                lambda: nl,
            )
        elif not self.dense:
            nl = jax.lax.cond(
                NL.needs_rebuild(nl, P, self.skin, self.cell),
                lambda: self._build_nl(P),
                lambda: nl,
            )

        e2, f2, carry_full = self.mm_full_ef(P, nl, carry_full)

        P_prot = P[self.sel]
        n_prot = self.sel.shape[0]
        if self.dense or self.cp is not None:
            nl_prot = ()
        else:
            nl_prot = NL.build_neighbor_list(
                P_prot, self.cutoff, min(self.k_neighbors, n_prot),
                self.cell, tile=min(512, n_prot),
            )
        e1, f1, carry_prot = self.mm_prot_ef(P_prot, nl_prot, carry_prot)

        eq, fq, qm_aux = self.qm_energy_forces(P_prot, qm_aux)

        energy = e2 + eq - e1
        forces = f2.at[self.sel].add(fq - f1)
        return energy, forces, (nl, qm_aux, (carry_full, carry_prot))

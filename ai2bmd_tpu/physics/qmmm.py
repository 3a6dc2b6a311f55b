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
    qm_energy_forces is lifted automatically."""

    mm_full: MM.MMSystem
    mm_prot: MM.MMSystem
    qm_energy_forces: Any        # (P_prot, qm_aux) -> (E, F, qm_aux)
    qm_init_aux: Any
    sel: Any                     # [n_prot] int32 protein atom indices
    n_atoms: int
    k_neighbors: int
    skin: float
    top: SystemTopology

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
    ) -> "QMMMPotential":
        if atoms.cell is None:
            raise ValueError("solvated QM/MM needs a periodic cell (CRYST1)")
        top = build_topology(atoms)
        sel = top.protein_atoms
        top_prot = _subsystem_topology(top, sel)
        pol_full = pol_prot = None
        if polarizable:
            # AMOEBA-class mutual induced dipoles on both MM evaluations;
            # 1-2/1-3 pairs act as polarization-group masking
            from ai2bmd_tpu.physics.polarization import PolarizationParams

            pol_full = PolarizationParams.build(
                atoms.numbers, top.charges, top.excl_pairs, cutoff=cutoff
            )
            pol_prot = PolarizationParams.build(
                atoms.numbers[sel], top_prot.charges, top_prot.excl_pairs,
                cutoff=cutoff,
            )
        mm_full = MM.MMSystem.build(
            top, atoms.cell, cutoff=cutoff, beta=beta,
            grid_spacing=grid_spacing, polarization=pol_full,
        )
        mm_prot = MM.MMSystem.build(
            top_prot, atoms.cell, cutoff=cutoff, beta=beta,
            grid_spacing=grid_spacing, polarization=pol_prot,
        )
        if qm_stateful is None:
            fn = qm_energy_forces

            def qm_stateful(Pq, qa):
                e, f = fn(Pq)
                return e, f, qa

        return cls(
            mm_full=mm_full, mm_prot=mm_prot,
            qm_energy_forces=qm_stateful,
            qm_init_aux=qm_init_aux,
            sel=jnp.asarray(sel, jnp.int32),
            n_atoms=top.n_atoms,
            k_neighbors=k_neighbors, skin=skin, top=top,
        )

    # -- aux = (full-system neighbor list, QM carry) -------------------------
    def init_aux(self, P: jnp.ndarray):
        nl = NL.build_neighbor_list(
            P, self.mm_full.cutoff + self.skin, self.k_neighbors, self.mm_full.cell
        )
        return (nl, self.qm_init_aux)

    def __call__(self, P: jnp.ndarray, aux):
        nl, qm_aux = aux
        nl = jax.lax.cond(
            NL.needs_rebuild(nl, P, self.skin, self.mm_full.cell),
            lambda: NL.build_neighbor_list(
                P, self.mm_full.cutoff + self.skin, self.k_neighbors,
                self.mm_full.cell,
            ),
            lambda: nl,
        )

        e2, f2 = MM.mm_energy_forces(self.mm_full, P, nl)

        P_prot = P[self.sel]
        n_prot = self.sel.shape[0]
        nl_prot = NL.build_neighbor_list(
            P_prot, self.mm_prot.cutoff, min(self.k_neighbors, n_prot),
            self.mm_prot.cell, tile=min(512, n_prot),
        )
        e1, f1 = MM.mm_energy_forces(self.mm_prot, P_prot, nl_prot)

        eq, fq, qm_aux = self.qm_energy_forces(P_prot, qm_aux)

        energy = e2 + eq - e1
        forces = f2.at[self.sel].add(fq - f1)
        return energy, forces, (nl, qm_aux)

"""Pure-python AMBER prmtop reader.

Parses the sections of an AMBER topology file that the engine needs:
nonbonded parameters (charges, LJ type tables), bonded terms
(bonds/angles/dihedrals with and without hydrogen) and exclusion lists.

This replaces two native/third-party dependencies of the reference stack:
OpenMM's ForceField parameter extraction (reference:
src/AIMD/protein.py:153-175) and the torch-based prmtop loader (reference:
src/Fragmentation/hydrogen/ctable.py:58-166).  Everything here is host-side,
setup-time code; outputs are plain numpy arrays that get baked into static
jax-side tables.

Units as stored by AMBER:
  * CHARGE is in internal Amber charge units: q_e * 18.2223
    (sqrt(kcal/mol * A)); divide by 18.2223 to get elementary charges.
  * BOND_FORCE_CONSTANT kcal/mol/A^2, ANGLE kcal/mol/rad^2,
    DIHEDRAL kcal/mol; LJ acoef kcal/mol*A^12, bcoef kcal/mol*A^6.
"""

from __future__ import annotations

import dataclasses

import numpy as np

AMBER_CHARGE_UNIT = 18.2223


def _read_sections(path: str) -> dict[str, list[str]]:
    sections: dict[str, list[str]] = {}
    current: list[str] | None = None
    with open(path) as f:
        for line in f:
            if line.startswith("%FLAG"):
                name = line.split()[1]
                current = sections.setdefault(name, [])
            elif line.startswith("%"):
                continue
            elif current is not None:
                current.append(line.rstrip("\n"))
    return sections


@dataclasses.dataclass
class Prmtop:
    natom: int
    ntypes: int
    atom_names: list[str]
    residue_labels: list[str]
    residue_pointers: np.ndarray       # [nres] 0-based first atom of residue
    charges: np.ndarray                # [natom] in elementary charges
    masses: np.ndarray                 # [natom]
    atomic_numbers: np.ndarray         # [natom]
    atom_type_index: np.ndarray        # [natom] 0-based
    nonbonded_parm_index: np.ndarray   # [ntypes*ntypes] 0-based
    lj_acoef: np.ndarray
    lj_bcoef: np.ndarray
    bond_k: np.ndarray
    bond_r0: np.ndarray
    angle_k: np.ndarray
    angle_t0: np.ndarray
    dihedral_k: np.ndarray
    dihedral_n: np.ndarray
    dihedral_phase: np.ndarray
    scee: np.ndarray
    scnb: np.ndarray
    bonds_h: np.ndarray                # [nbh, 3]  (i, j, type) 0-based atoms
    bonds_noh: np.ndarray
    angles_h: np.ndarray               # [nah, 4]
    angles_noh: np.ndarray
    dihedrals_h: np.ndarray            # [ndh, 5] raw signed k/l convention kept
    dihedrals_noh: np.ndarray
    number_excluded: np.ndarray        # [natom]
    excluded_list: np.ndarray          # 0-based (may contain -1 placeholders)
    # CMAP (ff19SB backbone phi/psi cross-term correction maps)
    cmap_resolution: np.ndarray        # [n_types] grid points per axis
    cmap_grids: np.ndarray             # [n_types, R, R] kcal/mol, phi-major,
    #                                    grid point g <-> angle -pi + g*2pi/R
    cmap_index: np.ndarray             # [n_terms, 6] = 5 atoms (0-based) + type

    # ------------------------------------------------------------------
    def residue_of_atom(self) -> np.ndarray:
        res = np.zeros(self.natom, dtype=np.int32)
        for i, start in enumerate(self.residue_pointers):
            res[start:] = i
        return res

    def lj_sigma_eps(self) -> tuple[np.ndarray, np.ndarray]:
        """Per-atom-type sigma (A) / epsilon (kcal/mol) from diagonal LJ."""
        sigma = np.zeros(self.ntypes)
        eps = np.zeros(self.ntypes)
        for t in range(self.ntypes):
            idx = self.nonbonded_parm_index[self.ntypes * t + t]
            a, b = self.lj_acoef[idx], self.lj_bcoef[idx]
            if a > 0 and b > 0:
                sigma[t] = (a / b) ** (1.0 / 6.0)
                eps[t] = b * b / (4.0 * a)
        return sigma, eps

    def exclusion_pairs(self) -> np.ndarray:
        """(i, j) excluded pairs with i < j, 0-based."""
        out = []
        ptr = 0
        for i in range(self.natom):
            n = int(self.number_excluded[i])
            for j in self.excluded_list[ptr:ptr + n]:
                if j >= 0:
                    out.append((i, int(j)))
            ptr += n
        if not out:
            return np.zeros((0, 2), dtype=np.int32)
        return np.asarray(out, dtype=np.int32)

    def lj_pair_index(self, ti: np.ndarray, tj: np.ndarray) -> np.ndarray:
        return self.nonbonded_parm_index[self.ntypes * ti + tj]


def load_prmtop(path: str) -> Prmtop:
    sec = _read_sections(path)

    def ints(name):
        return np.array(" ".join(sec[name]).split(), dtype=np.int64)

    def floats(name):
        return np.array(" ".join(sec[name]).split(), dtype=np.float64)

    def fixed_names(name, width=4):
        out = []
        for line in sec[name]:
            for k in range(0, len(line), width):
                token = line[k:k + width].strip()
                if token:
                    out.append(token)
        return out

    pointers = ints("POINTERS")
    natom, ntypes = int(pointers[0]), int(pointers[1])

    def triplets(name, stride):
        raw = ints(name).reshape(-1, stride)
        out = raw.copy()
        out[:, :-1] = raw[:, :-1] // 3        # atom entries stored as 3*i
        out[:, -1] = raw[:, -1] - 1           # parameter index is 1-based
        return out.astype(np.int32)

    return Prmtop(
        natom=natom,
        ntypes=ntypes,
        atom_names=fixed_names("ATOM_NAME"),
        residue_labels=fixed_names("RESIDUE_LABEL"),
        residue_pointers=(ints("RESIDUE_POINTER") - 1).astype(np.int32),
        charges=floats("CHARGE") / AMBER_CHARGE_UNIT,
        masses=floats("MASS"),
        atomic_numbers=ints("ATOMIC_NUMBER").astype(np.int32),
        atom_type_index=(ints("ATOM_TYPE_INDEX") - 1).astype(np.int32),
        nonbonded_parm_index=(ints("NONBONDED_PARM_INDEX") - 1).astype(np.int32),
        lj_acoef=floats("LENNARD_JONES_ACOEF"),
        lj_bcoef=floats("LENNARD_JONES_BCOEF"),
        bond_k=floats("BOND_FORCE_CONSTANT"),
        bond_r0=floats("BOND_EQUIL_VALUE"),
        angle_k=floats("ANGLE_FORCE_CONSTANT"),
        angle_t0=floats("ANGLE_EQUIL_VALUE"),
        dihedral_k=floats("DIHEDRAL_FORCE_CONSTANT"),
        dihedral_n=floats("DIHEDRAL_PERIODICITY"),
        dihedral_phase=floats("DIHEDRAL_PHASE"),
        scee=floats("SCEE_SCALE_FACTOR"),
        scnb=floats("SCNB_SCALE_FACTOR"),
        bonds_h=triplets("BONDS_INC_HYDROGEN", 3),
        bonds_noh=triplets("BONDS_WITHOUT_HYDROGEN", 3),
        angles_h=triplets("ANGLES_INC_HYDROGEN", 4),
        angles_noh=triplets("ANGLES_WITHOUT_HYDROGEN", 4),
        dihedrals_h=_dihedrals(sec),
        dihedrals_noh=_dihedrals(sec, with_h=False),
        number_excluded=ints("NUMBER_EXCLUDED_ATOMS").astype(np.int32),
        excluded_list=(ints("EXCLUDED_ATOMS_LIST") - 1).astype(np.int32),
        **_cmap_sections(sec),
    )


def _cmap_sections(sec) -> dict:
    """CMAP sections (ff19SB): CMAP_COUNT = (n_terms, n_types);
    CMAP_RESOLUTION = grid points per type; CMAP_PARAMETER_XX = R*R energies
    (kcal/mol) for type XX, phi-major with grid point 0 at -180 deg;
    CMAP_INDEX = 5 atoms (1-based, NOT 3*index like the bonded sections)
    plus the 1-based type."""
    empty = dict(
        cmap_resolution=np.zeros((0,), np.int32),
        cmap_grids=np.zeros((0, 0, 0), np.float64),
        cmap_index=np.zeros((0, 6), np.int32),
    )
    if "CMAP_COUNT" not in sec:
        return empty
    vals = np.array(" ".join(sec["CMAP_COUNT"]).split(), dtype=np.int64)
    n_terms, n_types = int(vals[0]), int(vals[1])
    if n_terms == 0 or n_types == 0:
        return empty
    res = np.array(
        " ".join(sec["CMAP_RESOLUTION"]).split(), dtype=np.int64
    ).astype(np.int32)
    R = int(res.max())
    grids = np.zeros((n_types, R, R), np.float64)
    for t in range(n_types):
        raw = np.array(
            " ".join(sec[f"CMAP_PARAMETER_{t + 1:02d}"]).split(), dtype=np.float64
        )
        r = int(res[t])
        grids[t, :r, :r] = raw.reshape(r, r)
    idx = np.array(
        " ".join(sec["CMAP_INDEX"]).split(), dtype=np.int64
    ).reshape(-1, 6)
    idx = idx - 1                         # atoms and type to 0-based
    return dict(
        cmap_resolution=res,
        cmap_grids=grids,
        cmap_index=idx.astype(np.int32),
    )


def _dihedrals(sec, with_h=True) -> np.ndarray:
    """Dihedral rows (i, j, k, l, type) with sign conventions preserved.

    AMBER stores k<0 to flag 1-4 exclusion suppression and l<0 for impropers;
    atoms are stored as 3*index (possibly negative).  We keep sign info in
    separate columns: output is [n, 7]: i, j, |k|, |l|, type, k_neg, l_neg.
    """
    name = "DIHEDRALS_INC_HYDROGEN" if with_h else "DIHEDRALS_WITHOUT_HYDROGEN"
    raw = np.array(" ".join(sec[name]).split(), dtype=np.int64).reshape(-1, 5)
    i = raw[:, 0] // 3
    j = raw[:, 1] // 3
    k = np.abs(raw[:, 2]) // 3
    l = np.abs(raw[:, 3]) // 3
    t = raw[:, 4] - 1
    kneg = (raw[:, 2] < 0).astype(np.int64)
    lneg = (raw[:, 3] < 0).astype(np.int64)
    return np.stack([i, j, k, l, t, kneg, lneg], axis=1).astype(np.int32)

#!/usr/bin/env python
"""Convert the reference repository's load-bearing data assets into the
numpy archives shipped under ai2bmd_tpu/data/assets/.

The reference (microsoft/AI2BMD) carries three families of data that any
reimplementation must reproduce bit-for-bit (SURVEY.md section 1 "Data
assets"):

  * per-residue fragment templates (atomic numbers, covalent bond graphs,
    DFT self energies) — /root/reference/src/utils/reference.py:7-286
  * the residue-triple -> AMBER atom-order permutation LUT
    — /root/reference/src/utils/seq_dict.pkl (gzip pickle)
  * AMBER ff19SB capped-dipeptide topologies
    — /root/reference/src/Fragmentation/prmtop/*.prmtop

This script converts them once, offline, into compact .npz archives.  Run:

    python tools/convert_assets.py [--reference /root/reference]
"""

import argparse
import glob
import gzip
import importlib.util
import os
import pickle
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ai2bmd_tpu.data.prmtop import load_prmtop  # noqa: E402

ASSETS = os.path.join(REPO, "ai2bmd_tpu", "data", "assets")


def _load_reference_tables(reference: str):
    path = os.path.join(reference, "src", "utils", "reference.py")
    spec = importlib.util.spec_from_file_location("_ref_tables", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def convert_residue_templates(reference: str):
    mod = _load_reference_tables(reference)
    out = {}
    names = sorted(mod.fragment_atomic_numbers.keys())
    out["names"] = np.array(names)
    for name in names:
        out[f"z_{name}"] = np.asarray(mod.fragment_atomic_numbers[name], dtype=np.int32)
        out[f"atoms_{name}"] = np.array(list(mod.fragment_atoms_str.get(name, "")))
        if name in mod.fragment_covalent_bonds:
            src, dst, length = mod.fragment_covalent_bonds[name]
            out[f"bond_src_{name}"] = np.asarray(src, dtype=np.int32)
            out[f"bond_dst_{name}"] = np.asarray(dst, dtype=np.int32)
            out[f"bond_len_{name}"] = np.asarray(length, dtype=np.float64)
    info_names = sorted(mod.fragment_info.keys())
    out["info_names"] = np.array(info_names)
    out["info_type"] = np.array([mod.fragment_info[n][0] for n in info_names])
    out["info_charge"] = np.array([mod.fragment_info[n][1] for n in info_names], dtype=np.int32)
    out["info_mult"] = np.array([mod.fragment_info[n][2] for n in info_names], dtype=np.int32)
    zs = sorted(mod.self_energies.keys())
    out["self_energy_z"] = np.array(zs, dtype=np.int32)
    out["self_energy_hartree"] = np.array([mod.self_energies[z] for z in zs])
    np.savez_compressed(os.path.join(ASSETS, "residue_templates.npz"), **out)
    print(f"residue_templates.npz: {len(names)} templates")


def convert_seq_dict(reference: str):
    with gzip.open(os.path.join(reference, "src", "utils", "seq_dict.pkl")) as f:
        seq = pickle.load(f)
    keys = sorted(seq.keys())
    flat, offsets = [], [0]
    for k in keys:
        perm_src = list(seq[k].keys())      # source index for target slot 0..n-1
        vals = list(seq[k].values())
        assert vals == list(range(len(vals))), f"non-identity value order for {k}"
        flat.extend(perm_src)
        offsets.append(len(flat))
    np.savez_compressed(
        os.path.join(ASSETS, "seq_permutations.npz"),
        keys=np.array(keys),
        flat=np.array(flat, dtype=np.int32),
        offsets=np.array(offsets, dtype=np.int64),
    )
    print(f"seq_permutations.npz: {len(keys)} residue triples")


def convert_prmtops(reference: str):
    out = {}
    files = sorted(glob.glob(os.path.join(reference, "src", "Fragmentation", "prmtop", "*.prmtop")))
    names = []
    for path in files:
        name = os.path.basename(path)[:-len(".prmtop")]
        names.append(name)
        top = load_prmtop(path)
        for field in (
            "charges", "masses", "atomic_numbers", "atom_type_index",
            "nonbonded_parm_index", "lj_acoef", "lj_bcoef",
            "bond_k", "bond_r0", "angle_k", "angle_t0",
            "dihedral_k", "dihedral_n", "dihedral_phase", "scee", "scnb",
            "bonds_h", "bonds_noh", "angles_h", "angles_noh",
            "dihedrals_h", "dihedrals_noh",
            "number_excluded", "excluded_list", "residue_pointers",
            "cmap_resolution", "cmap_grids", "cmap_index",
        ):
            out[f"{name}/{field}"] = getattr(top, field)
        out[f"{name}/atom_names"] = np.array(top.atom_names)
        out[f"{name}/residue_labels"] = np.array(top.residue_labels)
        out[f"{name}/ntypes"] = np.array(top.ntypes)
    out["names"] = np.array(names)
    np.savez_compressed(os.path.join(ASSETS, "fragment_topologies.npz"), **out)
    print(f"fragment_topologies.npz: {len(names)} capped-dipeptide topologies")


def build_ff_table(reference: str):
    """Per-(residue, atom-name) nonbonded parameters derived from the
    ff19SB capped-dipeptide topologies: charge (e), sigma (A), eps (kcal/mol).

    Replaces the reference's one-time OpenMM amber14 parameter extraction
    (src/AIMD/protein.py:153-175) without an OpenMM dependency.
    """
    table: dict[tuple[str, str], tuple[float, float, float]] = {}
    files = sorted(glob.glob(os.path.join(reference, "src", "Fragmentation", "prmtop", "*.prmtop")))
    for path in files:
        top = load_prmtop(path)
        sigma_t, eps_t = top.lj_sigma_eps()
        res_of = top.residue_of_atom()
        for i in range(top.natom):
            res = top.residue_labels[res_of[i]]
            key = (res, top.atom_names[i])
            t = top.atom_type_index[i]
            val = (float(top.charges[i]), float(sigma_t[t]), float(eps_t[t]))
            if key in table:
                old = table[key]
                if not np.allclose(old, val, atol=5e-4):
                    # keep first occurrence; conflicts only expected for
                    # termini-adjacent atoms which we don't hit mid-chain
                    continue
            table[key] = val
    keys = sorted(table.keys())
    np.savez_compressed(
        os.path.join(ASSETS, "ff_nonbonded.npz"),
        residue=np.array([k[0] for k in keys]),
        atom=np.array([k[1] for k in keys]),
        charge=np.array([table[k][0] for k in keys]),
        sigma=np.array([table[k][1] for k in keys]),
        eps=np.array([table[k][2] for k in keys]),
    )
    print(f"ff_nonbonded.npz: {len(keys)} (residue, atom) entries")


def convert_reorder_table(reference: str):
    """Amber -> tinker per-residue atom-order permutations.

    Extracted from the literal table in the reference's pdb utilities
    (src/utils/pdb.py:196-226, reorder_coord_amber2tinker).  The simulation
    input PDBs (and hence the seq_permutations LUT) use this "tinker" layout:
    N,CA,C,O,H,HA, heavy sidechain, sidechain hydrogens.
    """
    import ast

    path = os.path.join(reference, "src", "utils", "pdb.py")
    with open(path) as f:
        text = f.read()
    start = text.index("reorder_dict = {")
    open_brace = text.index("{", start)
    depth = 0
    for i in range(open_brace, len(text)):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                end = i + 1
                break
    table = ast.literal_eval(text[open_brace:end])
    out = {}
    for res, perm in table.items():
        out[res] = np.array(perm, dtype=np.int32)
    np.savez_compressed(os.path.join(ASSETS, "amber2tinker.npz"), **out)
    print(f"amber2tinker.npz: {len(out)} residue orderings")



def convert_amoeba(reference: str):
    """amoebabio18.prm (AMOEBA-BIO-2018, Tinker format) -> amoeba_params.npz.

    Extracts: atom type table, buffered-14-7 vdW by class (R-min diameter,
    epsilon kcal/mol, optional hydrogen reduction), permanent multipoles in
    their local frames (monopole e, dipole e*bohr, quadrupole e*bohr^2 —
    raw prm units; physics/amoeba.py applies the bohr conversions), Thole
    polarizabilities + polarization groups, and the biotype table mapping
    (atom name, residue description) -> atom type.  Reference usage:
    src/Calculators/tinker_async.py:130 passes this file to Tinker.
    """
    import re as _re

    path = os.path.join(reference, "src", "utils", "amoebabio18.prm")
    lines = open(path).read().splitlines()

    atom_type, atom_class, atom_name, atom_elem, atom_mass = [], [], [], [], []
    vdw_class, vdw_rmin, vdw_eps, vdw_red = [], [], [], []
    mp_type, mp_frame, mp_q, mp_dip, mp_quad = [], [], [], [], []
    pol_type, pol_alpha, pol_thole, pol_group = [], [], [], []
    bio_name, bio_res, bio_type = [], [], []

    i = 0
    while i < len(lines):
        t = lines[i].split()
        if not t:
            i += 1
            continue
        key = t[0].lower()
        if key == "atom":
            # atom  TYPE CLASS NAME "description" Z MASS VALENCE
            m = _re.match(r'\s*atom\s+(\d+)\s+(\d+)\s+(\S+)\s+"[^"]*"\s+(\d+)\s+([\d.]+)', lines[i])
            atom_type.append(int(m.group(1)))
            atom_class.append(int(m.group(2)))
            atom_name.append(m.group(3))
            atom_elem.append(int(m.group(4)))
            atom_mass.append(float(m.group(5)))
        elif key == "vdw":
            vdw_class.append(int(t[1]))
            vdw_rmin.append(float(t[2]))
            vdw_eps.append(float(t[3]))
            vdw_red.append(float(t[4]) if len(t) > 4 else 1.0)
        elif key == "multipole":
            # header: multipole TYPE [frame 1-3 ints, signed] CHARGE
            vals = t[1:]
            frame = [int(v) for v in vals[:-1]]
            q = float(vals[-1])
            typ = frame[0]
            axes = frame[1:] + [0] * (3 - len(frame[1:]))
            d = [float(v) for v in lines[i + 1].split()]
            qxx = float(lines[i + 2].split()[0])
            qxy, qyy = (float(v) for v in lines[i + 3].split())
            qxz, qyz, qzz = (float(v) for v in lines[i + 4].split())
            quad = [[qxx, qxy, qxz], [qxy, qyy, qyz], [qxz, qyz, qzz]]
            mp_type.append(typ)
            mp_frame.append(axes)
            mp_q.append(q)
            mp_dip.append(d)
            mp_quad.append(quad)
            i += 4
        elif key == "polarize":
            pol_type.append(int(t[1]))
            pol_alpha.append(float(t[2]))
            pol_thole.append(float(t[3]))
            grp = [int(v) for v in t[4:]]
            pol_group.append(grp + [0] * (8 - len(grp)))
        elif key == "biotype":
            m = _re.match(r'\s*biotype\s+\d+\s+(\S+)\s+"([^"]*)"\s+(-?\d+)', lines[i])
            bio_name.append(m.group(1))
            bio_res.append(m.group(2))
            bio_type.append(int(m.group(3)))
        i += 1

    np.savez_compressed(
        os.path.join(ASSETS, "amoeba_params.npz"),
        atom_type=np.array(atom_type, np.int32),
        atom_class=np.array(atom_class, np.int32),
        atom_name=np.array(atom_name),
        atom_elem=np.array(atom_elem, np.int32),
        atom_mass=np.array(atom_mass),
        vdw_class=np.array(vdw_class, np.int32),
        vdw_rmin=np.array(vdw_rmin),
        vdw_eps=np.array(vdw_eps),
        vdw_red=np.array(vdw_red),
        mp_type=np.array(mp_type, np.int32),
        mp_frame=np.array(mp_frame, np.int32),
        mp_q=np.array(mp_q),
        mp_dip=np.array(mp_dip),
        mp_quad=np.array(mp_quad),
        pol_type=np.array(pol_type, np.int32),
        pol_alpha=np.array(pol_alpha),
        pol_thole=np.array(pol_thole),
        pol_group=np.array(pol_group, np.int32),
        bio_name=np.array(bio_name),
        bio_res=np.array(bio_res),
        bio_type=np.array(bio_type, np.int32),
    )
    print(
        f"amoeba_params.npz: {len(atom_type)} types, {len(mp_type)} multipole "
        f"records, {len(pol_type)} polarize, {len(vdw_class)} vdw, "
        f"{len(bio_type)} biotypes"
    )


def convert_amoeba_valence(reference: str):
    """amoebabio18.prm valence records -> amoeba_valence.npz.

    Extracts the bonded-term tables the reference evaluates via Tinker9
    (src/Calculators/tinker_async.py:127-145 runs full AMOEBA including
    valence terms; src/utils/preprocess.py:184-244 minimizes with them):
    bond / angle / anglep (in-plane) / strbnd / opbend / ureybrad /
    torsion / pitors / strtors / angtors / tortors (25x25 CMAP-style
    grids), each keyed by atom-class tuples, plus the global expansion
    coefficients and unit conventions from the file header.  Values are
    raw prm units (kcal/mol, A, degrees); physics/amoeba_valence.py
    applies Tinker's default unit factors.
    """
    path = os.path.join(reference, "src", "utils", "amoebabio18.prm")
    lines = open(path).read().splitlines()

    bond, angle, anglep, strbnd, opbend, ureybrad = [], [], [], [], [], []
    torsion, pitors, strtors, angtors = [], [], [], []
    tortors_cls, tortors_dims, tortors_grid = [], [], []
    scalars = {}
    scalar_keys = {
        "bond-cubic", "bond-quartic",
        "angle-cubic", "angle-quartic", "angle-pentic", "angle-sextic",
        "opbend-cubic", "opbend-quartic", "opbend-pentic", "opbend-sextic",
        "torsionunit",
    }

    i = 0
    while i < len(lines):
        t = lines[i].split()
        if not t:
            i += 1
            continue
        key = t[0].lower()
        if key in scalar_keys:
            scalars[key.replace("-", "_")] = float(t[1])
        elif key == "bond":
            bond.append((int(t[1]), int(t[2]), float(t[3]), float(t[4])))
        elif key in ("angle", "anglep"):
            # up to three theta0 columns: variants selected by the number
            # of extra hydrogens on the central atom (Tinker kangle)
            th = [float(v) for v in t[5:8]]
            th += [0.0] * (3 - len(th))
            rec = (int(t[1]), int(t[2]), int(t[3]), float(t[4]), *th)
            (angle if key == "angle" else anglep).append(rec)
        elif key == "strbnd":
            strbnd.append(
                (int(t[1]), int(t[2]), int(t[3]), float(t[4]), float(t[5]))
            )
        elif key == "opbend":
            opbend.append(
                (int(t[1]), int(t[2]), int(t[3]), int(t[4]), float(t[5]))
            )
        elif key == "ureybrad":
            ureybrad.append(
                (int(t[1]), int(t[2]), int(t[3]), float(t[4]), float(t[5]))
            )
        elif key == "torsion":
            cls = [int(v) for v in t[1:5]]
            amp, phase, per = [0.0] * 3, [0.0] * 3, [0] * 3
            vals = t[5:]
            for j in range(len(vals) // 3):
                amp[j] = float(vals[3 * j])
                phase[j] = float(vals[3 * j + 1])
                per[j] = int(vals[3 * j + 2])
            torsion.append((*cls, *amp, *phase, *per))
        elif key == "pitors":
            pitors.append((int(t[1]), int(t[2]), float(t[3])))
        elif key == "strtors":
            strtors.append(
                tuple(int(v) for v in t[1:5]) + tuple(float(v) for v in t[5:14])
            )
        elif key == "angtors":
            angtors.append(
                tuple(int(v) for v in t[1:5]) + tuple(float(v) for v in t[5:11])
            )
        elif key == "tortors":
            cls = [int(v) for v in t[1:6]]
            nx, ny = int(t[6]), int(t[7])
            grid = np.zeros((nx, ny))
            for j in range(nx * ny):
                gx, gy, gv = (float(v) for v in lines[i + 1 + j].split())
                # rows are listed x-fastest: (x index, y index)
                grid[j % nx, j // nx] = gv
            tortors_cls.append(cls)
            tortors_dims.append((nx, ny))
            tortors_grid.append(grid)
            i += nx * ny
        i += 1

    np.savez_compressed(
        os.path.join(ASSETS, "amoeba_valence.npz"),
        bond=np.array(bond),
        angle=np.array(angle),
        anglep=np.array(anglep),
        strbnd=np.array(strbnd),
        opbend=np.array(opbend),
        ureybrad=np.array(ureybrad),
        torsion=np.array(torsion),
        pitors=np.array(pitors),
        strtors=np.array(strtors),
        angtors=np.array(angtors),
        tortors_cls=np.array(tortors_cls, np.int32),
        tortors_dims=np.array(tortors_dims, np.int32),
        tortors_grid=np.array(tortors_grid),
        **{k: np.float64(v) for k, v in scalars.items()},
    )
    print(
        f"amoeba_valence.npz: {len(bond)} bond, {len(angle)} angle, "
        f"{len(anglep)} anglep, {len(strbnd)} strbnd, {len(opbend)} opbend, "
        f"{len(torsion)} torsion, {len(pitors)} pitors, "
        f"{len(ureybrad)} ureybrad, {len(strtors)} strtors, "
        f"{len(angtors)} angtors, {len(tortors_cls)} tortors"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    args = ap.parse_args()
    os.makedirs(ASSETS, exist_ok=True)
    convert_residue_templates(args.reference)
    convert_seq_dict(args.reference)
    convert_prmtops(args.reference)
    build_ff_table(args.reference)
    convert_reorder_table(args.reference)
    convert_amoeba(args.reference)
    convert_amoeba_valence(args.reference)


if __name__ == "__main__":
    main()

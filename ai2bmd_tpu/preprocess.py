"""Preprocessing: solvation + minimization + heating + equilibration.

Replaces the reference's external AmberTools/Tinker preprocessing pipeline
(src/AIMD/preprocess.py:111-507: tleap solvate + ions, sander min/heat/
3xNVT/NPT, cpptraj export) with in-framework stages on the MM engine:

  1. solvate: TIP3P lattice box with a padding buffer around the protein,
     clash-culled, randomly oriented; neutralizing Na+/Cl- replace the
     waters farthest from the protein
  2. minimize: restrained steepest descent with backtracking (max_cyc)
  3. heat: staged Berendsen NVT ramp to the target temperature with the
     protein tethered
  4. equilibrate: NVT Langevin stages; optional Berendsen-barostat NPT
     stage with dynamic-cell PME

Outputs {prot}-preeq.pdb (solvated) and {prot}-preeq-nowat.pdb, idempotent
like the reference's check_exist (preprocess.py:529-565).  Pre-equilibrated
inputs can always be supplied directly (the reference's --preprocess-dir
workflow).
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from ai2bmd_tpu import units
from ai2bmd_tpu.data.protein_topology import build_topology
from ai2bmd_tpu.io.pdb import PDBAtoms, read_pdb, write_pdb
from ai2bmd_tpu.io.reorder import normalize_atom_order
from ai2bmd_tpu.md import langevin as L
from ai2bmd_tpu.physics import mm as MM

WATER_DENSITY = 0.0334  # molecules / A^3 at 997 kg/m^3
TIP3P_R_OH = 0.9572
TIP3P_ANGLE = np.deg2rad(104.52)


def solvate(
    atoms: PDBAtoms,
    padding: float = 10.0,
    clash_dist: float = 2.4,
    seed: int = 0,
) -> PDBAtoms:
    """Embed the protein in a TIP3P box with neutralizing ions."""
    rng = np.random.default_rng(seed)
    pos = atoms.positions
    lo = pos.min(0) - padding
    hi = pos.max(0) + padding
    cell = hi - lo
    pos = pos - lo  # shift protein into [0, cell)

    spacing = WATER_DENSITY ** (-1.0 / 3.0)
    n_side = np.floor(cell / spacing).astype(int)
    waters = []
    for ix in range(n_side[0]):
        for iy in range(n_side[1]):
            for iz in range(n_side[2]):
                o = (np.array([ix, iy, iz]) + 0.5) * cell / n_side
                o = o + (rng.random(3) - 0.5) * 0.4
                waters.append(o)
    waters = np.array(waters)
    # cull clashes with protein heavy atoms
    heavy = pos[atoms.numbers > 1]
    d = np.linalg.norm(waters[:, None, :] - heavy[None, :, :], axis=-1)
    waters = waters[d.min(axis=1) > clash_dist]

    # neutralizing ions replace the waters farthest from the protein
    from ai2bmd_tpu.system import assign_nonbonded_params

    q_prot = assign_nonbonded_params(atoms)[0].sum()
    n_ions = int(round(abs(q_prot)))
    ion_name = "Na+" if q_prot < 0 else "Cl-"
    ion_z = 11 if q_prot < 0 else 17
    d_prot = np.linalg.norm(
        waters[:, None, :] - pos[None, :, :], axis=-1
    ).min(axis=1)
    ion_slots = np.argsort(-d_prot)[:n_ions]
    ion_pos = waters[ion_slots]
    waters = np.delete(waters, ion_slots, axis=0)

    positions = [pos]
    names, resnames, resnums, numbers = (
        list(atoms.atom_names),
        list(atoms.residue_names),
        list(atoms.residue_numbers),
        list(atoms.numbers),
    )
    next_res = int(atoms.residue_numbers.max())
    for o in waters:
        next_res += 1
        # random orientation
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        ref = np.array([0.0, 0.0, 1.0]) if abs(axis[2]) < 0.9 else np.array([1.0, 0.0, 0.0])
        u = np.cross(axis, ref)
        u /= np.linalg.norm(u)
        h1 = o + TIP3P_R_OH * axis
        h2 = o + TIP3P_R_OH * (
            np.cos(TIP3P_ANGLE) * axis + np.sin(TIP3P_ANGLE) * u
        )
        positions.append(np.stack([o, h1, h2]))
        names += ["O", "H1", "H2"]
        resnames += ["WAT"] * 3
        resnums += [next_res] * 3
        numbers += [8, 1, 1]
    for ipos in ion_pos:
        next_res += 1
        positions.append(ipos[None])
        names.append(ion_name)
        resnames.append(ion_name)
        resnums.append(next_res)
        numbers.append(ion_z)

    return PDBAtoms(
        positions=np.concatenate(positions),
        numbers=np.array(numbers, np.int32),
        atom_names=np.array(names),
        residue_names=np.array(resnames),
        residue_numbers=np.array(resnums, np.int32),
        cell=cell,
    )


@dataclasses.dataclass
class Preprocessor:
    log_dir: str
    max_cyc: int = 100
    seed: int = 0
    padding: float = 10.0
    heat_stages: tuple = (50.0, 150.0, 300.0)
    heat_steps: int = 200
    nvt_steps: int = 400
    npt_steps: int = 4000        # Berendsen NPT stage (density convergence)
    taup_fs: float = 200.0       # barostat time constant
    target_temp: float = 300.0
    cutoff: float = 9.0
    restraint_kcal: float = 10.0
    method: str = "FF19SB"       # FF19SB (min/heat/NVT[/NPT]) | AMOEBA

    def run(self, prot_file: str, log=print) -> str:
        prot_name = os.path.basename(prot_file).rsplit(".", 1)[0]
        preeq = os.path.join(self.log_dir, f"{prot_name}-preeq.pdb")
        nowat = os.path.join(self.log_dir, f"{prot_name}-preeq-nowat.pdb")
        if os.path.exists(preeq) and os.path.exists(nowat):
            log(f"preprocessing outputs exist, skipping ({preeq})")
            return preeq

        atoms = normalize_atom_order(read_pdb(prot_file))
        log(f"solvating {prot_name} ({len(atoms)} atoms, {self.padding} A buffer)")
        box = solvate(atoms, padding=self.padding, seed=self.seed)
        n_prot = len(atoms)
        log(f"solvated: {len(box)} atoms, cell {np.round(box.cell, 2)}")

        if self.method.upper() == "AMOEBA":
            return self._run_amoeba(box, n_prot, preeq, nowat, log)

        top = build_topology(box)
        mm = MM.MMSystem.build(top, box.cell, cutoff=self.cutoff)
        P = jnp.asarray(box.positions, jnp.float32)
        masses = top.masses
        prot_mask = jnp.zeros((top.n_atoms, 1), jnp.float32).at[
            jnp.asarray(top.protein_atoms)
        ].set(1.0)
        tether_ref = P
        k_tether = self.restraint_kcal * units.kcal_per_mol

        # dense tiled pair path (physics/mm.py): no neighbor list, no
        # rebuild cond, no K-overflow risk — the previous [N,384] list
        # silently truncated (a 10.5 A sphere in water holds ~485 atoms)
        def potential(P, nl):
            e, f = MM.mm_energy_forces_dense(mm, P)
            # protein tether during preprocessing
            d = (P - tether_ref) * prot_mask
            e = e + 0.5 * k_tether * jnp.sum(d * d)
            f = f - k_tether * d
            return e, f, nl

        nl = ()

        # --- stage 1: restrained minimization (steepest descent, backtrack)
        log(f"minimizing (max {self.max_cyc} cycles)")

        @jax.jit
        def min_step(P, nl, step_size):
            e, f, nl = potential(P, nl)
            P_new = P + jnp.clip(step_size * f, -0.2, 0.2)
            e_new, f_new, nl = potential(P_new, nl)
            accept = e_new < e
            step_size = jnp.where(accept, step_size * 1.2, step_size * 0.5)
            P = jnp.where(accept, P_new, P)
            return P, nl, step_size, jnp.where(accept, e_new, e)

        step_size = jnp.asarray(1e-3)
        for i in range(self.max_cyc):
            P, nl, step_size, e = min_step(P, nl, step_size)
            if i % 20 == 0:
                log(f"  min cycle {i}: E = {float(e):.2f} eV")

        # --- stage 2: heat (Berendsen NVT ramp, tethered protein)
        key = jax.random.PRNGKey(self.seed)
        vel = L.maxwell_boltzmann_velocities(key, masses, self.heat_stages[0] / 2)
        e, f, nl = jax.jit(potential)(P, nl)
        state = L.MDState(P, vel, f, e, key, jnp.asarray(0), aux=nl)

        def make_chunk(temp, n, dt=1.0):
            @jax.jit
            def chunk(state):
                def body(s, _):
                    s = L.berendsen_step(
                        lambda p, aux: potential(p, aux), dt, temp, 100.0, masses, s
                    )
                    return s, None

                return jax.lax.scan(body, state, None, length=n)[0]

            return chunk

        for temp in self.heat_stages:
            log(f"heating to {temp} K ({self.heat_steps} steps)")
            state = make_chunk(temp, self.heat_steps)(state)
            t_now = float(L.temperature(masses, state.velocities))
            log(f"  T = {t_now:.1f} K, E = {float(state.energy):.2f} eV")

        # --- stage 3: NVT equilibration (Langevin)
        coeffs = L.LangevinCoeffs.build(masses, 1.0, self.target_temp, 0.002)

        # dispatch in <=500-step chunks: one multi-thousand-step scan is a
        # single device execution, which long-running transports (e.g. the
        # tunneled-TPU proxy) can kill; chunking also gives progress logs
        chunk_n = 500

        @jax.jit
        def nvt_chunk(state):
            def body(s, _):
                s = L.langevin_step(
                    lambda p, aux: potential(p, aux), coeffs, masses, s
                )
                return s, None

            return jax.lax.scan(body, state, None, length=chunk_n)[0]

        log(f"NVT equilibration ({self.nvt_steps} steps)")
        done = 0
        while done < self.nvt_steps:
            state = nvt_chunk(state)
            done += chunk_n
            log(
                f"  [{min(done, self.nvt_steps)}/{self.nvt_steps}] "
                f"T = {float(L.temperature(masses, state.velocities)):.1f} K, "
                f"E = {float(state.energy):.2f} eV"
            )

        # --- stage 4 (optional): Berendsen-barostat NPT with dynamic-cell
        # PME (the reference's final sander NPT stage, preprocess.py:435-479)
        cell = jnp.asarray(box.cell, jnp.float32)
        if self.npt_steps > 0:
            taup_fs = self.taup_fs
            compressibility = 4.6e-5 / 1.01325  # water, 1/bar -> 1/atm-ish
            bar_in_ev_a3 = 1e5 * 1e-30 / 1.602176634e-19  # eV/A^3 per bar

            @jax.jit
            def npt_chunk(state, cell):
                def body(carry, _):
                    s, cell = carry

                    def pot_cell(p, aux):
                        e, f = MM.mm_energy_forces_dense(mm, p, cell)
                        return e, f, aux

                    s = L.langevin_step(
                        pot_cell,
                        L.LangevinCoeffs.build(masses, 1.0, self.target_temp, 0.002),
                        masses, s,
                    )
                    ekin = L.kinetic_energy(masses, s.velocities)
                    pres = MM.mm_pressure_dense(mm, s.positions, cell, ekin)
                    pres_bar = pres / bar_in_ev_a3
                    lam = (
                        1.0
                        - compressibility * (1.0 / taup_fs) * (1.0 - pres_bar)
                    ) ** (1.0 / 3.0)
                    s = dataclasses.replace(s, positions=s.positions * lam)
                    return (s, cell * lam), pres_bar

                (state, cell), pres = jax.lax.scan(
                    body, (state, cell), None, length=min(chunk_n, self.npt_steps)
                )
                return state, cell, pres

            log(f"NPT equilibration ({self.npt_steps} steps)")
            done = 0
            chunk_means = []
            while done < self.npt_steps:
                state, cell, pres = npt_chunk(state, cell)
                done += chunk_n
                # chunk-mean instantaneous pressure: single-step values
                # fluctuate by hundreds of bar on small boxes
                chunk_means.append(float(np.asarray(pres).mean()))
                log(
                    f"  [{min(done, self.npt_steps)}/{self.npt_steps}] "
                    f"cell = {np.round(np.asarray(cell), 2)}, "
                    f"<P> = {chunk_means[-1]:.1f} bar"
                )
            # converged-stage pressure: mean over the final half of NPT
            half = chunk_means[len(chunk_means) // 2:]
            self.last_npt_pressure_bar = float(np.mean(half))
            log(f"NPT final-half <P> = {self.last_npt_pressure_bar:.1f} bar")
            box.cell = np.asarray(cell, np.float64)

        # --- outputs ---
        final = np.asarray(state.positions)
        return self._write_outputs(box, final, n_prot, preeq, nowat, log)

    def _run_amoeba(self, box, n_prot, preeq, nowat, log) -> str:
        """AMOEBA preprocessing: solvate + full-AMOEBA minimization.

        The reference's AMOEBA path (src/AIMD/preprocess.py:184-244) is
        tleap-solvate -> Tinker minimize9 with amoebabio18.prm (mutual
        polarization, Ewald) to RMS gradient 0.1 kcal/mol/A -> write
        -preeq.pdb / -preeq-nowat.pdb; it runs NO heat/NVT/NPT stages.
        This is the in-framework equivalent on physics/amoeba_md.py."""
        from ai2bmd_tpu.physics.amoeba_md import AmoebaMD

        cutoff = min(self.cutoff, 0.5 * float(np.min(box.cell)) - 1.1)
        log(
            f"AMOEBA minimization (mutual polarization, Ewald induction, "
            f"cutoff {cutoff:.1f} A, max {self.max_cyc} cycles)"
        )
        md = AmoebaMD.build(box, cutoff=cutoff, induction="ewald")
        P = jnp.asarray(box.positions, jnp.float32)
        rms_target = 0.1 * units.kcal_per_mol  # minimize9's 0.1 kcal/mol/A
        ef = jax.jit(lambda p, a: md(p, a))
        chunk = 50
        done = 0
        while done < self.max_cyc:
            n = min(chunk, self.max_cyc - done)
            P, energies = md.minimize(np.asarray(P), steps=n, chunk=n)
            P = jnp.asarray(P, jnp.float32)
            done += n
            e, f, _ = ef(P, md.init_aux(P))
            rms = float(jnp.sqrt(jnp.mean(jnp.sum(f * f, axis=-1))))
            log(
                f"  [{done}/{self.max_cyc}] E = {float(e):.2f} eV, "
                f"RMS |F| = {rms / units.kcal_per_mol:.3f} kcal/mol/A"
            )
            if rms < rms_target:
                log("  converged to the reference RMS-gradient criterion")
                break
        return self._write_outputs(box, np.asarray(P), n_prot, preeq, nowat, log)

    def _write_outputs(self, box, final, n_prot, preeq, nowat, log) -> str:
        write_pdb(preeq, box, positions=final)
        prot_only = PDBAtoms(
            positions=final[:n_prot],
            numbers=box.numbers[:n_prot],
            atom_names=box.atom_names[:n_prot],
            residue_names=box.residue_names[:n_prot],
            residue_numbers=box.residue_numbers[:n_prot],
            cell=box.cell,
        )
        write_pdb(nowat, prot_only)
        log(f"wrote {preeq} and {nowat}")
        return preeq

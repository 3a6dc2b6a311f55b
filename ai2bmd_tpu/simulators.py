"""High-level simulation assembly — reference simulator API equivalents.

Mirrors src/AIMD/simulator.py's three entry shapes:
  * NoSolventSimulator: fragment-mode MD of the capped protein in vacuum
    (reference simulator.py:295-313)
  * visnet mode: whole molecule straight through ViSNet
    (simulator.py:74-79)
  * SolventSimulator: subtractive QM/MM with explicit solvent
    (simulator.py:226-292) — backed by the in-graph MM engine
    (ai2bmd_tpu.physics.solvent) instead of Tinker co-processes.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import numpy as np

from ai2bmd_tpu.io.pdb import read_pdb
from ai2bmd_tpu.io.reorder import normalize_atom_order
from ai2bmd_tpu.md.constraints import BondRestraint
from ai2bmd_tpu.md.simulation import SimulationConfig, Simulator
from ai2bmd_tpu.models import visnet as V
from ai2bmd_tpu.models.checkpoint import load_checkpoint, load_converted
from ai2bmd_tpu.potentials import FragmentPotential, ViSNetPotential
from ai2bmd_tpu.system import Protein


def load_model(ckpt_path: str | None, cfg: V.ViSNetConfig | None = None, seed: int = 0):
    """Load a converted/.ckpt model, or random-init when no checkpoint is
    available (this build environment has no reference weights;
    .MISSING_LARGE_BLOBS in the reference snapshot)."""
    if ckpt_path and ckpt_path.endswith(".npz"):
        return load_converted(ckpt_path)
    if ckpt_path and os.path.exists(ckpt_path):
        return load_checkpoint(ckpt_path)
    cfg = cfg or V.ViSNetConfig()
    params = V.init_params(jax.random.PRNGKey(seed), cfg)
    scale = float(os.environ.get("AI2BMD_RANDOM_HEAD_SCALE", "1"))
    if scale != 1.0:
        # benchmark stabilizer: full-scale RANDOM weights produce unphysical
        # force magnitudes that blow up long trajectories; scaling the
        # output head keeps the run stable while the step COST stays
        # weight-independent (used by benchmarks/e2e_cli.py and the sweeps)
        params = dict(params)
        params["std"] = params["std"] * scale
        params["atomref"] = params["atomref"] * scale
    return params, cfg


def _bench_protein_mm(qmmm):
    """Benchmark stabilizer (AI2BMD_BENCH_PROT_MM=1; benchmarks/e2e_cli.py).

    With a zeroed random-weight QM head (AI2BMD_RANDOM_HEAD_SCALE=1e-30 —
    no trained checkpoint ships with the reference snapshot) the
    subtractive combiner cancels ALL protein-internal forces (MM1's
    protein part minus MM2), so the bare protein collapses: measured NaN
    within ~100 solvated steps (SWEEP_r05 first e2e attempt).  Re-adding
    the protein's internal MM term makes the physics classical MD of the
    full box (stable), and the measured step cost strictly UPPER-bounds
    the production step: every production term still runs, plus one extra
    protein-size MM eval.  Same stabilizer as benchmarks/run_all.py."""
    import jax.numpy as jnp

    def potential(P, aux):
        e, f, aux = qmmm(P, aux)
        Pp = P[qmmm.sel]
        if qmmm.dense or qmmm.cp is not None:
            e1, f1, _ = qmmm.mm_prot_ef(Pp, (), ())
        else:
            from ai2bmd_tpu.ops import neighbors as NL

            n_prot = qmmm.sel.shape[0]
            nlp = NL.build_neighbor_list(
                Pp, qmmm.cutoff, min(qmmm.k_neighbors, n_prot),
                qmmm.cell, tile=min(512, n_prot),
            )
            e1, f1, _ = qmmm.mm_prot_ef(Pp, nlp, qmmm.mm_init_carry[1])
        return e + e1, f.at[qmmm.sel].add(f1), aux

    return potential


@dataclasses.dataclass
class ProteinSimulation:
    """One assembled simulation: protein + potential + driver."""

    prot: Protein
    sim: Simulator
    potential: object
    log_dir: str
    prot_name: str

    record_subset: object = None

    @classmethod
    def from_pdb(
        cls,
        prot_file: str,
        log_dir: str | None = None,
        mode: str = "fragment",          # fragment | visnet
        longrange: str = "mm",           # mm | pme
        solvent: bool | None = None,     # None = auto-detect waters
        write_solvent: bool = True,
        ckpt_path: str | None = None,
        model_cfg: V.ViSNetConfig | None = None,
        sim_cfg: SimulationConfig | None = None,
        opt_iters: int = 10,
        warm_caps: bool = True,
        polarizable_mm: bool = False,
        rigid_water: bool = False,
        mm_backend: str = "ff19sb",
    ) -> "ProteinSimulation":
        prot_name = os.path.basename(prot_file).rsplit(".", 1)[0]
        log_dir = log_dir or os.path.join(os.getcwd(), f"Logs-{prot_name}")
        atoms = normalize_atom_order(read_pdb(prot_file))
        full = Protein.from_atoms(atoms)
        sim_cfg = sim_cfg or SimulationConfig()

        qm_idx = full.protein_indices()
        has_solvent = len(qm_idx) < len(full)
        if solvent is None:
            solvent = has_solvent
        if solvent and not has_solvent:
            raise ValueError("solvent=True but the input has no water/ions")

        prot = full.select(qm_idx) if has_solvent else full

        params, cfg = load_model(ckpt_path, model_cfg)
        if mode == "fragment":
            pot = FragmentPotential.build(
                prot, params, cfg, longrange=longrange, opt_iters=opt_iters
            )
        elif mode == "visnet":
            pot = ViSNetPotential.build(prot.numbers, params, cfg)
        else:
            raise ValueError(f"unknown mode {mode!r}")

        hbond = None
        if sim_cfg.hydrogen_constraints:
            hbond = BondRestraint.find_hydrogen_bonds(prot.atoms)

        # warm-started cap optimization: carry optimized cap offsets in the
        # integrator aux.  Justified by the round-5 stitched-force
        # decomposition (benchmarks/fidelity.py --decompose, SWEEP_r05 /
        # BASELINE.md): warm-1's deviation from a converged-cap oracle is
        # 0.90-1.45x the reference's own cold 10-iteration L-BFGS protocol
        # across the four bundled proteins (BETTER than the reference on
        # the two largest), and all protocols in this family sit inside
        # the oracle's own 30-vs-50-iteration ambiguity — at ~0.3 ms/step
        # per extra iteration, 1 is the measured sweet spot.
        import jax.numpy as jnp

        use_warm = warm_caps and mode == "fragment"
        warm_iters = 1
        if use_warm:
            qm_pos0 = jnp.asarray(prot.positions, jnp.float32)
            qm_aux0 = pot.init_cap_delta(qm_pos0)
            qm_stateful = lambda Pq, qa: pot.stateful_energy_forces(
                Pq, qa, warm_iters=warm_iters
            )

        record_subset = None
        if solvent:
            # SolventSimulator path: subtractive QM/MM over the full box
            from ai2bmd_tpu.physics.qmmm import QMMMPotential

            if use_warm:
                qmmm = QMMMPotential.build(
                    atoms, qm_stateful=qm_stateful, qm_init_aux=qm_aux0,
                    polarizable=polarizable_mm, mm_backend=mm_backend,
                )
            else:
                qmmm = QMMMPotential.build(
                    atoms, pot.energy_forces, polarizable=polarizable_mm,
                    mm_backend=mm_backend,
                )
            init_aux = qmmm.init_aux(jnp.asarray(full.positions, jnp.float32))
            potential_fn = qmmm
            if os.environ.get("AI2BMD_BENCH_PROT_MM") == "1":
                potential_fn = _bench_protein_mm(qmmm)
            constraint = None
            if rigid_water:
                # rigid TIP3P (SETTLE): removes the O-H stretch modes so the
                # solvated system steps stably at 2 fs
                from ai2bmd_tpu.md.settle import SettleConstraint

                constraint = SettleConstraint.from_topology(qmmm.top)
            sim = Simulator(
                potential=potential_fn,
                masses=full.masses,
                numbers=full.numbers,
                cfg=sim_cfg,
                log_dir=log_dir,
                prot_name=prot_name,
                hbond_restraint=hbond,
                stateful=True,
                init_aux=init_aux,
                cell=full.cell,
                constraint=constraint,
            )
            if not write_solvent:
                record_subset = qm_idx
            return cls(prot=full, sim=sim, potential=qmmm, log_dir=log_dir,
                       prot_name=prot_name, record_subset=record_subset)

        if use_warm:
            sim = Simulator(
                potential=qm_stateful,
                masses=prot.masses,
                numbers=prot.numbers,
                cfg=sim_cfg,
                log_dir=log_dir,
                prot_name=prot_name,
                hbond_restraint=hbond,
                stateful=True,
                init_aux=qm_aux0,
            )
        else:
            sim = Simulator(
                potential=pot.energy_forces,
                masses=prot.masses,
                numbers=prot.numbers,
                cfg=sim_cfg,
                log_dir=log_dir,
                prot_name=prot_name,
                hbond_restraint=hbond,
            )
        return cls(prot=prot, sim=sim, potential=pot, log_dir=log_dir,
                   prot_name=prot_name)

    def simulate(
        self,
        simulation_steps: int,
        restart: bool = False,
        log=print,
    ):
        restart_path = None
        if restart:
            restart_path = os.path.join(self.log_dir, f"{self.prot_name}-restart.npz")
            if not os.path.exists(restart_path):
                raise FileNotFoundError(f"no restart checkpoint at {restart_path}")
        state = self.sim.initial_state(self.prot.positions, restart=restart_path)
        if not restart:
            state = self.sim.pre_equilibrate(state, log=log)
        log(
            ("Re-start" if restart else "Start")
            + f" simulation for {simulation_steps} steps"
        )
        state = self.sim.run(
            state, simulation_steps, log=log, record_subset=self.record_subset,
            # a restarted run writes {prot}-traj-restart.* instead of
            # truncating the original trajectory (reference simulator.py:119)
            traj_suffix="-restart" if restart else "",
        )
        log("Simulation finished!")
        return state

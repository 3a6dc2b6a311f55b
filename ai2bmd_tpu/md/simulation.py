"""MD driver: the whole simulation as one jitted scan.

Replaces the reference's BaseSimulator/ASE-Langevin/MDObserver stack
(src/AIMD/simulator.py:34-223, src/utils/utils.py:114-166).  Architecture
inversion (SURVEY.md section 7): instead of a host-orchestrated calculator
tree called per step, the integrator runs `record_per_steps` Langevin steps
inside one `lax.scan`; positions/velocities/forces stay in device memory
and only the recorded frame (positions + scalars) is fetched back per
chunk.  Next-chunk dispatch overlaps with host-side trajectory writing
(the WorkQueue latency-hiding trick becomes plain async dispatch).

Feature parity:
  * Maxwell-Boltzmann init, seeded (simulator.py:96)
  * pre-equilibration tether ladder [10,5,1,0.5,0.1] kcal/mol/A^2 x
    preeq_steps (simulator.py:139-166) — one compiled program serves all
    ladder stages (spring constant is a dynamic scalar)
  * optional hydrogen-bond restraints (simulator.py:168-180)
  * temperature-runaway guard at 1.5x target (utils.py:154-155)
  * restart from saved positions+velocities with step offset
    (simulator.py:86-96,118-133)
  * energy/temperature printout per record interval (utils.py:143-159)
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ai2bmd_tpu import units
from ai2bmd_tpu.io import trajectory as traj_io
from ai2bmd_tpu.md import langevin as L
from ai2bmd_tpu.md.constraints import BondRestraint


class TemperatureRunawayError(RuntimeError):
    def __init__(self, temp: float):
        self.temp = temp
        super().__init__(f"temperature runaway: {temp:.1f} K")


@dataclasses.dataclass
class SimulationConfig:
    timestep_fs: float = 1.0
    temp_K: float = 300.0
    friction_per_fs: float = 0.001
    record_per_steps: int = 100
    seed: int = 0
    preeq_steps: int = 200
    preeq_restraints_kcal: tuple = (10.0, 5.0, 1.0, 0.5, 0.1)
    hydrogen_constraints: bool = False
    write_xyz: bool = True
    write_dcd: bool = True
    runaway_factor: float = 1.5


class Simulator:
    """Drives a potential function over a protein state."""

    def __init__(
        self,
        potential: Callable,
        masses: np.ndarray,
        numbers: np.ndarray,
        cfg: SimulationConfig,
        log_dir: str,
        prot_name: str,
        hbond_restraint: BondRestraint | None = None,
        stateful: bool = False,
        init_aux=(),
        cell: np.ndarray | None = None,
        constraint=None,
    ):
        self.cfg = cfg
        self.masses = jnp.asarray(masses, jnp.float32)
        self.numbers = numbers
        self.log_dir = log_dir
        self.prot_name = prot_name
        self.cell = None if cell is None or not np.any(cell) else np.asarray(cell)
        os.makedirs(log_dir, exist_ok=True)

        self.coeffs = L.LangevinCoeffs.build(
            self.masses, cfg.timestep_fs, cfg.temp_K, cfg.friction_per_fs
        )
        self._base_potential = (
            potential if stateful else L.lift_potential(potential)
        )
        self._init_aux = init_aux
        self._hbond = hbond_restraint
        self._constraint = constraint   # e.g. settle.SettleConstraint

        def full_potential(P, aux, tether_ref, tether_k):
            e, f, aux = self._base_potential(P, aux)
            # pre-eq tether (k=0 disables; kept dynamic so one program
            # serves every ladder stage and the production run)
            d = P - tether_ref
            e = e + 0.5 * tether_k * jnp.sum(d * d)
            f = f - tether_k * d
            if self._hbond is not None:
                er, gr = jax.value_and_grad(self._hbond.energy)(P)
                e, f = e + er, f - gr
            return e, f, aux

        def chunk(state: L.MDState, tether_ref, tether_k, n_steps: int):
            def body(s, _):
                s = L.langevin_step(
                    lambda P, aux: full_potential(P, aux, tether_ref, tether_k),
                    self.coeffs,
                    self.masses,
                    s,
                    constraint=self._constraint,
                )
                return s, None

            state, _ = jax.lax.scan(body, state, None, length=n_steps)
            return state

        self._chunk = jax.jit(chunk, static_argnames=("n_steps",))
        self._temp = jax.jit(lambda v: L.temperature(self.masses, v))
        self._ekin = jax.jit(lambda v: L.kinetic_energy(self.masses, v))

    # ------------------------------------------------------------------
    def initial_state(self, positions: np.ndarray, restart: str | None = None):
        if restart:
            treedef = jax.tree.structure(self._init_aux)
            pos, vel, step, key, extras = traj_io.load_restart(restart, treedef)
            P = jnp.asarray(pos, jnp.float32)
            if "aux" in extras and "forces" in extras:
                # bit-continuous restart: the checkpointed forces/energy/aux
                # resume the trajectory exactly where it stopped
                aux = jax.tree.map(jnp.asarray, extras["aux"])
                forces = jnp.asarray(extras["forces"], jnp.float32)
                energy = jnp.asarray(extras.get("energy", 0.0), jnp.float32)
            else:
                # legacy checkpoint: recompute forces from a fresh aux
                forces, aux = self._first_forces(P)
                energy = jnp.asarray(0.0)
            return L.MDState(
                positions=P,
                velocities=jnp.asarray(vel, jnp.float32),
                forces=forces,
                energy=energy,
                key=jnp.asarray(key, jnp.uint32),
                step=jnp.asarray(step, jnp.int32),
                aux=aux,
            )
        key = jax.random.PRNGKey(self.cfg.seed)
        key, k_init = jax.random.split(key)
        P = jnp.asarray(positions, jnp.float32)
        vel = L.maxwell_boltzmann_velocities(k_init, self.masses, self.cfg.temp_K)
        if self._constraint is not None:
            # snap waters onto the rigid geometry; project the thermal
            # velocities so d/dt(constraints) = 0 from step one
            P = jax.jit(self._constraint.snap)(P)
            vel = jax.jit(self._constraint.velocities)(P, vel)
        forces, aux = self._first_forces(P)
        return L.MDState(
            positions=P,
            velocities=vel,
            forces=forces,
            energy=jnp.asarray(0.0),
            key=key,
            step=jnp.asarray(0, jnp.int32),
            aux=aux,
        )

    def _first_forces(self, P):
        _, f, aux = jax.jit(lambda p, a: self._base_potential(p, a))(
            P, self._init_aux
        )
        return f, aux

    # ------------------------------------------------------------------
    def pre_equilibrate(self, state: L.MDState, log=print) -> L.MDState:
        if self.cfg.preeq_steps == 0:
            return state
        kcal2ev = units.kcal_per_mol
        log("Start pre-equilibration")
        for k_kcal in self.cfg.preeq_restraints_kcal:
            log(
                f"Pre-equilibration with {k_kcal} kcal/mol/A^2 for "
                f"{self.cfg.preeq_steps} steps"
            )
            tether_ref = state.positions
            k = jnp.asarray(k_kcal * kcal2ev, jnp.float32)
            state = self._chunk(state, tether_ref, k, self.cfg.preeq_steps)
            self._check_runaway(state)
        log("Pre-equilibration finished!")
        return state

    # ------------------------------------------------------------------
    def run(
        self,
        state: L.MDState,
        n_steps: int,
        log=print,
        record_subset: np.ndarray | None = None,
        traj_suffix: str = "",
    ) -> L.MDState:
        """Production run with trajectory recording every record interval."""
        cfg = self.cfg
        writers = []
        subset = record_subset
        numbers = self.numbers if subset is None else self.numbers[subset]
        xyz_path = os.path.join(
            self.log_dir, f"{self.prot_name}-traj{traj_suffix}.xyz"
        )
        dcd_path = os.path.join(
            self.log_dir, f"{self.prot_name}-traj{traj_suffix}.dcd"
        )
        if cfg.write_xyz or cfg.write_dcd:
            try:
                # native background-thread writer (C++ runtime); file IO
                # fully overlaps the next chunk's device compute
                from ai2bmd_tpu.runtime import AsyncTrajectoryWriter

                writers.append(
                    AsyncTrajectoryWriter(
                        dcd_path if cfg.write_dcd else None,
                        xyz_path if cfg.write_xyz else None,
                        numbers, cfg.timestep_fs, cfg.record_per_steps,
                        cell=self.cell,
                    )
                )
            except (RuntimeError, OSError):
                if cfg.write_xyz:
                    writers.append(traj_io.XYZTrajectory(xyz_path, numbers))
                if cfg.write_dcd:
                    writers.append(
                        traj_io.DCDTrajectory(
                            dcd_path, len(numbers), cfg.timestep_fs,
                            cfg.record_per_steps, cell=self.cell,
                        )
                    )

        from ai2bmd_tpu.utils.logging_utils import MetricsLog

        metrics = MetricsLog(
            os.path.join(self.log_dir, f"{self.prot_name}-metrics.csv")
        )
        zero_ref = state.positions
        zero_k = jnp.asarray(0.0, jnp.float32)
        remaining = n_steps
        t_start = time.perf_counter()
        t_last = t_start
        try:
            while remaining > 0:
                n = min(cfg.record_per_steps, remaining)
                state = self._chunk(state, zero_ref, zero_k, n)
                remaining -= n
                # host readback of the recorded frame
                epot = float(state.energy)
                ekin = float(self._ekin(state.velocities))
                if not np.isfinite(epot) or not np.isfinite(ekin):
                    raise FloatingPointError(
                        f"non-finite energy at step {int(state.step)} "
                        f"(Epot={epot}, Ekin={ekin}); restart from the last "
                        f"checkpoint with a smaller timestep"
                    )
                self._check_overflow(state)
                temp = self._check_runaway(state)
                step = int(state.step)
                now = time.perf_counter()
                ms_per_step = 1e3 * (now - t_last) / n
                t_last = now
                log(
                    f"Step {step}: Epot = {epot:.3f}eV Ekin = {ekin:.3f}eV "
                    f"Etot = {epot + ekin:.3f}eV T = {temp:.1f}K"
                )
                metrics.write(step, epot, ekin, temp, ms_per_step)
                pos = np.asarray(state.positions)
                if subset is not None:
                    pos = pos[subset]
                for w in writers:
                    w.write(pos, energy=epot, step=step)
                traj_io.save_restart(
                    os.path.join(self.log_dir, f"{self.prot_name}-restart.npz"),
                    state.positions,
                    state.velocities,
                    step,
                    state.key,
                    forces=state.forces,
                    energy=state.energy,
                    aux=state.aux,
                )
        finally:
            metrics.close()
            for w in writers:
                w.close()
        dt_wall = time.perf_counter() - t_start
        if n_steps:
            log(
                f"{n_steps} steps in {dt_wall:.2f}s: "
                f"{1e3 * dt_wall / n_steps:.2f} ms/step, "
                f"{86.4 * cfg.timestep_fs * n_steps / max(dt_wall, 1e-9) / 1e3:.3f} ns/day"
            )
        return state

    def _check_runaway(self, state) -> float:
        temp = float(self._temp(state.velocities))
        if temp > self.cfg.runaway_factor * self.cfg.temp_K:
            raise TemperatureRunawayError(temp)
        return temp

    def _check_overflow(self, state):
        """Neighbor-list overflow surfaced from the aux carry (solvated
        runs): an overflowed list silently drops interactions."""
        from ai2bmd_tpu.ops.neighbors import NeighborList

        lists = jax.tree.leaves(
            state.aux, is_leaf=lambda x: isinstance(x, NeighborList)
        )
        for nl in lists:
            if isinstance(nl, NeighborList) and bool(nl.overflow):
                raise RuntimeError(
                    "neighbor list overflow: increase k_neighbors (some atoms "
                    "have more neighbors than the list capacity)"
                )

"""Langevin dynamics with ASE-compatible semantics, jitted.

Implements the Vanden-Eijnden / Ciccotti third-order Langevin integrator
exactly as ASE's `Langevin` (the reference drives it at timestep*fs,
friction 0.001/fs, reference src/AIMD/simulator.py:110-116), with the
Maxwell-Boltzmann velocity init (simulator.py:96).  The RNG-pool latency
trick (utils.py:28-49) is unnecessary: normals are generated in-graph from
a threaded jax.random key.

Units: ASE internal (A, eV, amu, time = A*sqrt(amu/eV)); temperature enters
as kB*T in eV.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ai2bmd_tpu import units


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MDState:
    positions: Any      # [N,3] A
    velocities: Any     # [N,3] A / internal-time
    forces: Any         # [N,3] eV/A (forces at `positions`)
    energy: Any         # scalar eV
    key: Any            # jax PRNG key
    step: Any           # int32
    aux: Any = ()       # potential-side carry (e.g. neighbor lists)


def lift_potential(potential):
    """Wrap a stateless P -> (E, F) potential into the stateful
    (P, aux) -> (E, F, aux) protocol the integrators use."""

    def wrapped(P, aux):
        e, f = potential(P)
        return e, f, aux

    return wrapped


@dataclasses.dataclass(frozen=True)
class LangevinCoeffs:
    dt: float
    c1: float
    c2: float
    c3: Any
    c4: Any
    c5: Any

    @classmethod
    def build(cls, masses, timestep_fs: float, temp_K: float, friction_per_fs: float):
        dt = timestep_fs * units.fs
        fr = friction_per_fs / units.fs
        T = temp_K * units.kB
        m = jnp.asarray(masses)[:, None]
        sigma = jnp.sqrt(2.0 * T * fr / m)
        return cls(
            dt=dt,
            c1=dt / 2.0 - dt * dt * fr / 8.0,
            c2=dt * fr / 2.0 - dt * dt * fr * fr / 8.0,
            c3=jnp.sqrt(dt) * sigma / 2.0 - dt**1.5 * fr * sigma / 8.0,
            c4=fr / 2.0 * (dt**1.5 * sigma / (2.0 * jnp.sqrt(3.0))),
            c5=dt**1.5 * sigma / (2.0 * jnp.sqrt(3.0)),
        )


def maxwell_boltzmann_velocities(key, masses, temp_K: float, dtype=jnp.float32):
    m = jnp.asarray(masses, dtype)[:, None]
    std = jnp.sqrt(temp_K * units.kB / m)
    return std * jax.random.normal(key, (len(masses), 3), dtype)


def kinetic_energy(masses, velocities):
    m = jnp.asarray(masses)[:, None]
    return 0.5 * jnp.sum(m * velocities * velocities)


def temperature(masses, velocities):
    ekin = kinetic_energy(masses, velocities)
    n = velocities.shape[0]
    return 2.0 * ekin / (3.0 * n * units.kB)


def langevin_step(
    potential: Callable,
    coeffs: LangevinCoeffs,
    masses,
    state: MDState,
    fixcm: bool = True,
    constraint=None,
) -> MDState:
    """One Langevin step (two half-kicks around the position update).

    `potential` uses the stateful protocol (P, aux) -> (E, F, aux); wrap
    plain potentials with lift_potential.  `constraint` (optional, e.g.
    md.settle.SettleConstraint) provides .positions(x_old, x_new) and
    .velocities(x, v): positions are projected after the drift (with the
    corresponding velocity correction, RATTLE-style) and velocities after
    the final kick."""
    m = jnp.asarray(masses, state.velocities.dtype)[:, None]
    key, k1, k2 = jax.random.split(state.key, 3)
    shape = state.positions.shape
    xi = jax.random.normal(k1, shape, state.positions.dtype)
    eta = jax.random.normal(k2, shape, state.positions.dtype)

    v = state.velocities
    f = state.forces
    v = v + (coeffs.c1 * f / m - coeffs.c2 * v + coeffs.c3 * xi - coeffs.c4 * eta)
    x = state.positions + coeffs.dt * v + coeffs.c5 * eta
    if constraint is not None:
        x_c = constraint.positions(state.positions, x)
        v = v + (x_c - x) / coeffs.dt
        x = x_c
    if fixcm:
        shift = jnp.sum((x - state.positions) * m, axis=0) / jnp.sum(m)
        x = x - shift

    energy, f_new, aux = potential(x, state.aux)
    v = v + (coeffs.c1 * f_new / m - coeffs.c2 * v + coeffs.c3 * xi - coeffs.c4 * eta)
    if constraint is not None:
        v = constraint.velocities(x, v)

    return MDState(
        positions=x,
        velocities=v,
        forces=f_new,
        energy=energy,
        key=key,
        step=state.step + 1,
        aux=aux,
    )


def langevin_step_batched(
    potential_batched: Callable,
    coeffs: LangevinCoeffs,
    masses,
    state: MDState,
    fixcm: bool = True,
) -> MDState:
    """Langevin step over a replica batch: every state leaf carries a
    leading replica axis; `potential_batched` maps (Ps [R,N,3], aux) ->
    (E [R], F [R,N,3], aux) so the force evaluation can batch across
    replicas (frag.runtime.ensemble_fragment_energy_forces_warm) instead
    of vmapping the whole potential.  Per-replica RNG streams are split
    exactly like langevin_step does for a single replica, so a replica's
    trajectory is bitwise the one it would follow alone."""
    m = jnp.asarray(masses, state.velocities.dtype)[:, None]
    keys = jax.vmap(lambda k: jax.random.split(k, 3))(state.key)   # [R,3,2]
    key, k1, k2 = keys[:, 0], keys[:, 1], keys[:, 2]
    shape = state.positions.shape[1:]
    xi = jax.vmap(lambda k: jax.random.normal(k, shape, state.positions.dtype))(k1)
    eta = jax.vmap(lambda k: jax.random.normal(k, shape, state.positions.dtype))(k2)

    v = state.velocities
    f = state.forces
    v = v + (coeffs.c1 * f / m - coeffs.c2 * v + coeffs.c3 * xi - coeffs.c4 * eta)
    x = state.positions + coeffs.dt * v + coeffs.c5 * eta
    if fixcm:
        shift = jnp.sum((x - state.positions) * m, axis=1, keepdims=True) / jnp.sum(m)
        x = x - shift

    energy, f_new, aux = potential_batched(x, state.aux)
    v = v + (coeffs.c1 * f_new / m - coeffs.c2 * v + coeffs.c3 * xi - coeffs.c4 * eta)

    return MDState(
        positions=x,
        velocities=v,
        forces=f_new,
        energy=energy,
        key=key,
        step=state.step + 1,
        aux=aux,
    )


def velocity_verlet_step(potential, dt_fs: float, masses, state: MDState,
                         constraint=None) -> MDState:
    """NVE velocity-Verlet (for energy-conservation tests and NVE runs);
    with `constraint`, the constrained RATTLE variant."""
    dt = dt_fs * units.fs
    m = jnp.asarray(masses, state.velocities.dtype)[:, None]
    v_half = state.velocities + 0.5 * dt * state.forces / m
    x = state.positions + dt * v_half
    if constraint is not None:
        x_c = constraint.positions(state.positions, x)
        v_half = v_half + (x_c - x) / dt
        x = x_c
    energy, f_new, aux = potential(x, state.aux)
    v = v_half + 0.5 * dt * f_new / m
    if constraint is not None:
        v = constraint.velocities(x, v)
    return MDState(
        positions=x, velocities=v, forces=f_new, energy=energy,
        key=state.key, step=state.step + 1, aux=aux,
    )


def berendsen_step(potential, dt_fs: float, temp_K: float, taut_fs: float,
                   masses, state: MDState) -> MDState:
    """NVT Berendsen thermostat (the reference keeps a commented-out
    NVTBerendsen configuration, simulator.py:98-105)."""
    dt = dt_fs * units.fs
    m = jnp.asarray(masses, state.velocities.dtype)[:, None]
    t_inst = temperature(masses, state.velocities)
    lam = jnp.sqrt(
        1.0 + (dt_fs / taut_fs) * (temp_K / jnp.maximum(t_inst, 1e-6) - 1.0)
    )
    v = state.velocities * lam
    v_half = v + 0.5 * dt * state.forces / m
    x = state.positions + dt * v_half
    energy, f_new, aux = potential(x, state.aux)
    v = v_half + 0.5 * dt * f_new / m
    return MDState(
        positions=x, velocities=v, forces=f_new, energy=energy,
        key=state.key, step=state.step + 1, aux=aux,
    )

"""Pure-AMOEBA periodic MD / minimization — Tinker9's standalone role.

The reference can minimize and run dynamics with full AMOEBA through
Tinker (src/utils/preprocess.py:184-244 pdbxyz8 + minimize9;
src/Calculators/tinker_async.py:127-145 builds the key file with
`parameters amoebabio18.prm`).  This module composes the in-framework
equivalents into one differentiable potential:

    E = E_nonbonded (physics/amoeba_system.py: permanent SPME multipoles,
        mutual induction, buffered 14-7)
      + E_valence   (physics/amoeba_valence.py: bond/angle/anglep/strbnd/
        opbend/UB/torsion/pitors/strtors/angtors/tortors)

with the [N,K] neighbor list carried as MD aux and rebuilt in-graph on a
skin-displacement trigger, so a whole trajectory chunk is one jitted
lax.scan like every other potential in the framework.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ai2bmd_tpu.data.protein_topology import build_topology
from ai2bmd_tpu.io.pdb import PDBAtoms
from ai2bmd_tpu.md import langevin as L
from ai2bmd_tpu.ops import neighbors as NL
from ai2bmd_tpu.physics.amoeba_protein import assign_amoeba
from ai2bmd_tpu.physics.amoeba_system import AmoebaPeriodicSystem
from ai2bmd_tpu.physics.amoeba_valence import (
    AmoebaValence,
    resolve_chirality_signs,
)


@dataclasses.dataclass
class AmoebaMD:
    """Full-AMOEBA potential of one periodic system (protein + water)."""

    sys: AmoebaPeriodicSystem
    val: AmoebaValence
    cell: Any
    cutoff: float
    skin: float
    k_max: int
    cg_iters: int
    induction: str            # "ewald" | "sor"
    masses: np.ndarray

    @classmethod
    def build(
        cls,
        atoms: PDBAtoms,
        cutoff: float = 9.0,
        skin: float = 1.0,
        induction: str = "ewald",
        cg_iters: int = 12,
        sor_iters: int = 8,
        grid_spacing: float = 0.9,
        beta: float | None = None,
    ) -> "AmoebaMD":
        if atoms.cell is None:
            raise ValueError("pure-AMOEBA MD needs a periodic cell (CRYST1)")
        # beta scaled to the cutoff so the real-space erfc tail at the
        # cutoff is uniformly negligible (erfc(3.6) ~ 3.6e-7): an
        # unswitched real-space term with a fat tail makes every
        # cutoff-crossing a visible energy jump and NVE drifts.  3.6/9.0
        # = 0.4, the engine default at the production 9 A cutoff.
        if beta is None:
            beta = 3.6 / cutoff
        top = build_topology(atoms)
        asg = assign_amoeba(
            atoms.atom_names, atoms.residue_names, atoms.positions, top.bonds
        )
        sys = AmoebaPeriodicSystem.build(
            asg, atoms.cell, cutoff=cutoff, sor_iters=sor_iters,
            grid_spacing=grid_spacing, beta=beta,
        )
        val = AmoebaValence.build(asg)
        val = resolve_chirality_signs(val, atoms.positions, asg.bonds)
        return cls(
            sys=sys, val=val,
            cell=jnp.asarray(atoms.cell, jnp.float32),
            cutoff=cutoff, skin=skin,
            k_max=_k_for(cutoff + skin),
            cg_iters=cg_iters, induction=induction,
            masses=np.asarray(top.masses, np.float64),
        )

    # -- potential (stateful aux = neighbor list) --------------------------
    def init_aux(self, P: jnp.ndarray) -> NL.NeighborList:
        nl = NL.build_neighbor_list(
            P, self.cutoff + self.skin, self.k_max, self.cell
        )
        if bool(jax.device_get(nl.overflow)):
            raise ValueError(
                f"AMOEBA neighbor list overflow at k_max={self.k_max}"
            )
        return nl

    def energy(self, P: jnp.ndarray, nl: NL.NeighborList) -> jnp.ndarray:
        if self.induction == "ewald":
            e_nb = self.sys.energy_ewald_induction(P, nl, self.cg_iters)
        else:
            e_nb = self.sys.energy(P, nl)
        return e_nb + self.val.energy(P, self.cell)

    def __call__(self, P: jnp.ndarray, nl):
        nl = jax.lax.cond(
            NL.needs_rebuild(nl, P, self.skin, self.cell),
            lambda: NL.build_neighbor_list(
                P, self.cutoff + self.skin, self.k_max, self.cell
            ),
            lambda: nl,
        )
        e, g = jax.value_and_grad(lambda p: self.energy(p, nl))(P)
        return e, -g, nl

    # -- drivers -----------------------------------------------------------
    def minimize(self, positions: np.ndarray, steps: int = 200,
                 lr: float = 1e-3, chunk: int = 50):
        """Steepest descent with backtracking (same protocol as the ff19SB
        preprocessor's restrained minimization, without the tether)."""
        P = jnp.asarray(positions, jnp.float32)
        nl = self.init_aux(P)

        @jax.jit
        def descend(P, nl, step_size):
            def body(carry, _):
                P, nl, s = carry
                e, f, nl = self(P, nl)
                fmax = jnp.maximum(jnp.max(jnp.abs(f)), 1e-9)
                P2 = P + jnp.minimum(s, 0.2 / fmax) * f
                e2, f2, nl2 = self(P2, nl)
                ok = e2 < e
                P = jnp.where(ok, P2, P)
                nl = jax.tree.map(lambda a, b: jnp.where(ok, a, b), nl2, nl)
                s = jnp.where(ok, s * 1.2, s * 0.5)
                return (P, nl, s), e
            (P, nl, s), es = jax.lax.scan(
                body, (P, nl, step_size), None, length=chunk
            )
            return P, nl, s, es

        s = jnp.asarray(lr, jnp.float32)
        energies = []
        for _ in range(max(1, steps // chunk)):
            P, nl, s, es = descend(P, nl, s)
            energies.extend(np.asarray(es).tolist())
        return np.asarray(P), energies

    def make_step_fn(self, timestep_fs: float = 1.0, temp_K: float = 300.0,
                     friction_per_fs: float = 0.001, steps_per_call: int = 100):
        coeffs = L.LangevinCoeffs.build(
            self.masses, timestep_fs, temp_K, friction_per_fs
        )

        @jax.jit
        def chunk(state):
            def body(s, _):
                return L.langevin_step(self, coeffs, self.masses, s), None
            return jax.lax.scan(body, state, None, length=steps_per_call)[0]

        return chunk

    def initial_state(self, positions: np.ndarray, temp_K: float = 300.0,
                      seed: int = 0) -> L.MDState:
        P = jnp.asarray(positions, jnp.float32)
        nl = self.init_aux(P)
        key = jax.random.PRNGKey(seed)
        vel = L.maxwell_boltzmann_velocities(key, self.masses, temp_K)
        e, f, nl = jax.jit(lambda p, a: self(p, a))(P, nl)
        return L.MDState(P, vel, f, e, jax.random.PRNGKey(seed + 1),
                         jnp.asarray(0), aux=nl)


def _k_for(cutoff: float) -> int:
    """[N,K] slot count at ~1.3x liquid-water density for `cutoff`."""
    return int(np.ceil(0.13 * 4.19 * cutoff**3 / 64.0)) * 64

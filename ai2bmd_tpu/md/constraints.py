"""Restraint force terms (ASE Hookean equivalents) as pure functions.

The reference uses ASE Hookean constraints two ways (simulator.py:139-180):
  * pre-equilibration ladder: per-atom tethers to reference positions with
    spring constants [10, 5, 1, 0.5, 0.1] kcal/mol/A^2 (rt = 0)
  * optional hydrogen-bond restraints: pairwise springs engaging beyond a
    threshold length (k = 15 eV/A^2, rt = covalent length + 0.2 A,
    utils.py:201-221)
Both become additive force-field terms inside the jitted potential.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class TetherRestraint:
    """E = 0.5 k sum_i |x_i - x0_i|^2 over selected atoms."""

    reference: Any   # [N,3]
    k: Any           # scalar eV/A^2
    weight: Any      # [N,1] selection mask

    def energy(self, P):
        d = (P - self.reference) * self.weight
        return 0.5 * self.k * jnp.sum(d * d)


@dataclasses.dataclass
class BondRestraint:
    """Pairwise one-sided springs: E = 0.5 k (|d| - rt)^2 for |d| > rt."""

    pairs: Any       # [M,2] int32
    rt: Any          # [M]
    k: Any           # [M]

    @classmethod
    def find_hydrogen_bonds(cls, atoms, k: float = 15.0, slack: float = 0.2):
        """Covalent-radius-based H-bond finder (reference
        utils.py:169-221): each hydrogen is paired with every atom within
        (r_cov(H) + r_cov(X) + slack)."""
        radii = {1: 0.31, 6: 0.76, 7: 0.71, 8: 0.66, 15: 1.07, 16: 1.05}
        pos = atoms.positions
        z = atoms.numbers
        h_idx = np.flatnonzero(z == 1)
        pairs, rts = [], []
        for i in h_idx:
            for j in range(len(z)):
                if i == j:
                    continue
                ideal = radii.get(1, 0) + radii.get(int(z[j]), 0)
                if np.linalg.norm(pos[i] - pos[j]) <= ideal + slack:
                    pairs.append((i, j))
                    rts.append(ideal + slack)
        if len(pairs) != len(h_idx):
            raise AssertionError(
                f"hydrogen constraint mismatch: {len(h_idx)} hydrogens vs "
                f"{len(pairs)} covalent bonds found"
            )
        return cls(
            pairs=jnp.asarray(np.array(pairs, dtype=np.int32)),
            rt=jnp.asarray(np.array(rts, dtype=np.float32)),
            k=jnp.full((len(pairs),), k, jnp.float32),
        )

    def energy(self, P):
        d = P[self.pairs[:, 0]] - P[self.pairs[:, 1]]
        dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
        over = jnp.maximum(dist - self.rt, 0.0)
        return 0.5 * jnp.sum(self.k * over * over)


def with_restraints(potential, restraints):
    """Wrap a potential fn with additive restraint terms."""
    if not restraints:
        return potential

    def wrapped(P):
        e, f = potential(P)
        for r in restraints:
            er, gr = jax.value_and_grad(r.energy)(P)
            e = e + er
            f = f - gr
        return e, f

    return wrapped

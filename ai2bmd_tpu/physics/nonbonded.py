"""Intra-protein long-range nonbonded terms (fragment 'mm' mode).

LJ + bare Coulomb over the exclusion complement (all pairs except
same-dipeptide pairs), as the reference's MMNonBondedCalculator
(src/Calculators/nonbonded.py:33-63) — but computed as one dense masked
[N,N] tensor program (TPU: two matmul-shaped reductions instead of a pair
list + scatter_add), with forces by jax.grad of the energy (analytically
identical to the reference's hand-derived forces).

Units: positions A, charges e, sigma A, epsilon eV; energy eV.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ai2bmd_tpu import units
from ai2bmd_tpu.system import Protein


@dataclasses.dataclass
class NonbondedParams:
    sigma: Any      # [N] A
    eps: Any        # [N] eV
    charge: Any     # [N] e
    mask: Any       # [N,N] bool: i!=j and not same-dipeptide

    @classmethod
    def build(cls, prot: Protein, exclusion_mask: np.ndarray) -> "NonbondedParams":
        n = len(prot)
        pair = ~np.eye(n, dtype=bool) & ~exclusion_mask
        return cls(
            sigma=jnp.asarray(prot.sigmas, jnp.float32),
            eps=jnp.asarray(prot.epsilons * units.kcal_per_mol, jnp.float32),
            charge=jnp.asarray(prot.charges, jnp.float32),
            mask=jnp.asarray(pair),
        )


def nonbonded_energy(nb: NonbondedParams, P: jnp.ndarray) -> jnp.ndarray:
    """0.5 * sum over ordered pairs of LJ + Coulomb (eV)."""
    vec = P[None, :, :] - P[:, None, :]
    d2 = jnp.sum(vec * vec, axis=-1)
    d2 = jnp.where(nb.mask, d2, 1.0)
    inv_d = jax.lax.rsqrt(d2)

    sig = 0.5 * (nb.sigma[:, None] + nb.sigma[None, :])
    eps = jnp.sqrt(nb.eps[:, None] * nb.eps[None, :])
    c6 = (sig * sig / d2) ** 3
    c12 = c6 * c6
    e_lj = 4.0 * eps * (c12 - c6)

    qq = nb.charge[:, None] * nb.charge[None, :]
    e_coul = units.COULOMB * qq * inv_d

    return 0.5 * jnp.sum(jnp.where(nb.mask, e_lj + e_coul, 0.0))


def nonbonded_energy_forces(nb: NonbondedParams, P: jnp.ndarray):
    e, g = jax.value_and_grad(lambda p: nonbonded_energy(nb, p))(P)
    return e, -g

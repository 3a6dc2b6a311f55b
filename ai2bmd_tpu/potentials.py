"""Potential assemblies — the calculator-tree equivalents.

The reference composes ASE Calculator objects at runtime
(FragmentCalculator = DLBondedCalculator + {MM,PME}NonBonded,
src/Calculators/fragment.py:16-68; ViSNetCalculator whole-molecule mode,
visnet_calculator.py:121-155).  Here each "calculator" is a pure function
P -> (E, F) closed over static runtime tables; composition is addition
inside one jitted program, so bonded/nonbonded "concurrency" is simply XLA
scheduling rather than thread pools.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax.numpy as jnp
import numpy as np

from ai2bmd_tpu.frag.indexer import FragmentIndex, build_fragment_index
from ai2bmd_tpu.frag.runtime import FragmentRuntime, fragment_energy_forces
from ai2bmd_tpu.models import visnet as V
from ai2bmd_tpu.physics.nonbonded import NonbondedParams, nonbonded_energy_forces
from ai2bmd_tpu.system import Protein

PotentialFn = Callable[[jnp.ndarray], tuple[jnp.ndarray, jnp.ndarray]]


@dataclasses.dataclass
class FragmentPotential:
    """Divide-and-conquer ML potential + classical long-range terms."""

    params: dict
    cfg: V.ViSNetConfig
    rt: FragmentRuntime
    nb: NonbondedParams | None
    pme: Any | None = None
    fi: FragmentIndex | None = None

    @classmethod
    def build(
        cls,
        prot: Protein,
        params: dict,
        cfg: V.ViSNetConfig,
        longrange: str = "mm",
        opt_iters: int = 10,
    ) -> "FragmentPotential":
        cfg = V.resolve_config(cfg)
        fi = build_fragment_index(prot.atoms)
        rt = FragmentRuntime.build(fi, opt_iters=opt_iters)
        nb = pme = None
        if longrange == "mm":
            nb = NonbondedParams.build(prot, fi.exclusion_mask())
        elif longrange == "pme":
            from ai2bmd_tpu.physics.pme import PMEParams

            pme = PMEParams.build(prot, fi.exclusion_pairs)
        else:
            raise ValueError(f"unknown long-range mode {longrange!r}")
        return cls(params=params, cfg=cfg, rt=rt, nb=nb, pme=pme, fi=fi)

    def energy_forces(self, P: jnp.ndarray):
        e_b, f_b = fragment_energy_forces(self.params, self.rt, P, self.cfg)
        e_nb, f_nb = self._longrange(P)
        return e_b + e_nb, f_b + f_nb

    def _longrange(self, P):
        if self.nb is not None:
            return nonbonded_energy_forces(self.nb, P)
        from ai2bmd_tpu.physics.pme import pme_energy_forces

        return pme_energy_forces(self.pme, P)

    # -- warm-started stateful variant (aux = cap offsets) -------------------
    def init_cap_delta(self, P: jnp.ndarray):
        from ai2bmd_tpu.frag.runtime import initial_cap_delta

        return initial_cap_delta(self.rt, P)

    def stateful_energy_forces(self, P: jnp.ndarray, aux, warm_iters: int = 1):
        from ai2bmd_tpu.frag.runtime import fragment_energy_forces_warm

        e_b, f_b, aux = fragment_energy_forces_warm(
            self.params, self.rt, P, self.cfg, aux, warm_iters=warm_iters
        )
        e_nb, f_nb = self._longrange(P)
        return e_b + e_nb, f_b + f_nb, aux


@dataclasses.dataclass
class ViSNetPotential:
    """Whole-molecule mode (reference `--mode visnet`): the entire system is
    one padded fragment — used for arbitrary molecules with a user-trained
    checkpoint."""

    params: dict
    cfg: V.ViSNetConfig
    z: Any
    mask: Any
    pad_to: int

    @classmethod
    def build(cls, numbers: np.ndarray, params: dict, cfg: V.ViSNetConfig,
              pad_multiple: int = 8) -> "ViSNetPotential":
        cfg = V.resolve_config(cfg)
        n = len(numbers)
        pad_to = ((n + pad_multiple - 1) // pad_multiple) * pad_multiple
        z = np.zeros((1, pad_to), dtype=np.int32)
        z[0, :n] = numbers
        mask = np.zeros((1, pad_to), dtype=bool)
        mask[0, :n] = True
        return cls(params=params, cfg=cfg, z=jnp.asarray(z),
                   mask=jnp.asarray(mask), pad_to=pad_to)

    def energy_forces(self, P: jnp.ndarray):
        n = P.shape[0]
        pos = jnp.full((1, self.pad_to, 3), 1e4, P.dtype)
        pos = pos.at[0, :n].set(P)
        e, f = V.energy_and_forces(self.params, self.z, pos, self.mask, self.cfg)
        return e[0], f[0, :n]

"""Smooth particle-mesh Ewald, fully in-graph and differentiable.

Replaces helPME (C++ pybind module; reference src/Calculators/pme.py:1-214)
with a JAX SPME: order-4 cardinal B-spline charge spreading (scatter-add),
jnp.fft reciprocal sum with the Euler-spline influence function, plus the
reference's direct/self/adjusted-exclusion/neutralizing terms
(pme.py:77-110,155-214 term-for-term):

    E = E_dir + E_rec + E_self + E_adj + E_neutral + E_LJ(excl-complement)

One deliberate upgrade: the reference's forces are plain truncated Coulomb
(pme.py:203-206, reciprocal contribution missing from forces); here forces
are exact gradients of the full PME energy via jax.grad — the B-spline
spreading is C^2, so autodiff through the mesh is well-defined.

Units: q in e, lengths in A; energies in eV (COULOMB = 1/(4 pi eps0)).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ai2bmd_tpu import units
from ai2bmd_tpu.system import Protein

SPLINE_ORDER = 4


def _bspline4(x):
    """Cardinal B-spline M4 on [0, 4)."""
    return jnp.where(
        x < 1.0,
        x**3 / 6.0,
        jnp.where(
            x < 2.0,
            (-3 * x**3 + 12 * x**2 - 12 * x + 4) / 6.0,
            jnp.where(
                x < 3.0,
                (3 * x**3 - 24 * x**2 + 60 * x - 44) / 6.0,
                jnp.where(x < 4.0, (4 - x) ** 3 / 6.0, 0.0),
            ),
        ),
    )


def _euler_spline_mod2(K: int) -> np.ndarray:
    """|b(m)|^2 for order-4 splines on a K-point grid (SPME influence)."""
    m = np.arange(K)
    k = np.arange(SPLINE_ORDER - 1)
    # M4 at integer nodes 1, 2, 3
    M = np.array([1.0 / 6.0, 4.0 / 6.0, 1.0 / 6.0])
    denom = (M[None, :] * np.exp(2j * np.pi * m[:, None] * k[None, :] / K)).sum(1)
    b2 = 1.0 / np.maximum(np.abs(denom) ** 2, 1e-14)
    return b2


@dataclasses.dataclass
class PMEParams:
    beta: float
    cutoff: float
    cell: Any                 # [3] box lengths
    grid: tuple               # (Kx, Ky, Kz)
    influence: Any            # [Kx,Ky,Kz] exp(-pi^2 m^2/b^2)/m^2 * B(m) (0 at k=0)
    charge: Any               # [N]
    sigma: Any                # [N] A
    eps: Any                  # [N] eV
    excl_pairs: Any           # [M,2] same-dipeptide exclusions
    pair_mask: Any            # [N,N] i != j
    excl_mask: Any            # [N,N] excluded pairs (sym)
    e_self: float
    e_neutral: float

    @classmethod
    def build(
        cls,
        prot: Protein,
        exclusion_pairs: np.ndarray,
        beta: float = 0.3,
        cutoff: float = 9.0,
        grid_spacing: float = 1.0,
    ) -> "PMEParams":
        if prot.cell is None:
            raise ValueError("PME requires a periodic cell (CRYST1 record)")
        from ai2bmd_tpu.physics.gridutil import smooth_grid

        cell = np.asarray(prot.cell, np.float64)
        grid = smooth_grid(
            max(int(c / grid_spacing), 2 * SPLINE_ORDER) for c in cell
        )
        volume = float(np.prod(cell))

        # influence function on the half/full FFT grid
        infl = np.zeros(grid)
        ms = []
        for K, L in zip(grid, cell):
            m = np.fft.fftfreq(K) * K
            ms.append(m / L)                       # reciprocal coords 1/A
        MX, MY, MZ = np.meshgrid(*ms, indexing="ij")
        m2 = MX**2 + MY**2 + MZ**2
        b2 = (
            _euler_spline_mod2(grid[0])[:, None, None]
            * _euler_spline_mod2(grid[1])[None, :, None]
            * _euler_spline_mod2(grid[2])[None, None, :]
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            infl = np.exp(-np.pi**2 * m2 / beta**2) / m2 * b2
        infl.flat[0] = 0.0
        infl = infl / (2.0 * np.pi * volume)

        q = prot.charges.astype(np.float64)
        e_self = -beta / np.sqrt(np.pi) * float(np.sum(q * q))
        e_neutral = -np.pi / (2.0 * beta**2 * volume) * float(np.sum(q)) ** 2

        n = len(prot)
        excl_mask = np.zeros((n, n), dtype=bool)
        if len(exclusion_pairs):
            i, j = np.asarray(exclusion_pairs).T
            excl_mask[i, j] = True
            excl_mask[j, i] = True

        return cls(
            beta=beta,
            cutoff=cutoff,
            cell=jnp.asarray(cell, jnp.float32),
            grid=grid,
            influence=jnp.asarray(infl, jnp.float32),
            charge=jnp.asarray(prot.charges, jnp.float32),
            sigma=jnp.asarray(prot.sigmas, jnp.float32),
            eps=jnp.asarray(prot.epsilons * units.kcal_per_mol, jnp.float32),
            excl_pairs=jnp.asarray(exclusion_pairs, jnp.int32),
            pair_mask=jnp.asarray(~np.eye(n, dtype=bool)),
            excl_mask=jnp.asarray(excl_mask),
            e_self=e_self,
            e_neutral=e_neutral,
        )


def _spread_charges(pme: PMEParams, P: jnp.ndarray) -> jnp.ndarray:
    """Order-4 B-spline charge assignment to the mesh (differentiable)."""
    Kx, Ky, Kz = pme.grid
    K = jnp.asarray(pme.grid)
    u = P / pme.cell * K                      # fractional grid coords [N,3]
    i0 = jnp.floor(u).astype(jnp.int32)
    t = u - i0
    # offsets j=0..3 -> grid point i0-3+j, weight M4(t+3-j)
    offs = jnp.arange(SPLINE_ORDER)
    w = _bspline4(t[:, None, :] + 3.0 - offs[None, :, None])   # [N,4,3]
    idx = (i0[:, None, :] - 3 + offs[None, :, None]) % K       # [N,4,3]

    # outer product over dims -> 64 (grid cell, weight) pairs per atom
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    ix, iy, iz = idx[..., 0], idx[..., 1], idx[..., 2]
    W = (
        wx[:, :, None, None] * wy[:, None, :, None] * wz[:, None, None, :]
    )                                                           # [N,4,4,4]
    lin = (
        ix[:, :, None, None] * (Ky * Kz)
        + iy[:, None, :, None] * Kz
        + iz[:, None, None, :]
    )
    contrib = (pme.charge[:, None, None, None] * W).reshape(-1)
    rho = jax.ops.segment_sum(
        contrib, lin.reshape(-1), num_segments=Kx * Ky * Kz
    )
    return rho.reshape(Kx, Ky, Kz)


def reciprocal_energy(pme: PMEParams, P: jnp.ndarray) -> jnp.ndarray:
    rho = _spread_charges(pme, P)
    rho_k = jnp.fft.fftn(rho)
    return jnp.sum(pme.influence * jnp.abs(rho_k) ** 2)


def _minimum_image(vec, cell):
    return vec - cell * jnp.round(vec / cell)


def pme_energy(pme: PMEParams, P: jnp.ndarray) -> jnp.ndarray:
    """Full PME + LJ energy in eV."""
    vec = _minimum_image(P[None, :, :] - P[:, None, :], pme.cell)
    d2 = jnp.sum(vec * vec, axis=-1)
    d2s = jnp.where(pme.pair_mask, d2, 1.0)
    d = jnp.sqrt(d2s)
    within = pme.pair_mask & (d2 < pme.cutoff**2)
    qq = pme.charge[:, None] * pme.charge[None, :]

    # direct space (erfc), exclusion-complement within cutoff
    coul_mask = within & ~pme.excl_mask
    e_dir = 0.5 * jnp.sum(
        jnp.where(coul_mask, qq * jax.lax.erfc(pme.beta * d) / d, 0.0)
    )

    # adjusted exclusion (erf over excluded pairs, no cutoff)
    e_adj = -0.5 * jnp.sum(
        jnp.where(pme.excl_mask, qq * jax.lax.erf(pme.beta * d) / d, 0.0)
    )

    e_rec = reciprocal_energy(pme, P)
    e_coulomb = (e_dir + e_adj + e_rec + pme.e_self + pme.e_neutral) * units.COULOMB

    # LJ: exclusion complement within cutoff
    sig = 0.5 * (pme.sigma[:, None] + pme.sigma[None, :])
    eps = jnp.sqrt(pme.eps[:, None] * pme.eps[None, :])
    c6 = (sig * sig / d2s) ** 3
    e_lj = 0.5 * jnp.sum(jnp.where(coul_mask, 4.0 * eps * (c6 * c6 - c6), 0.0))

    return e_coulomb + e_lj


def pme_energy_forces(pme: PMEParams, P: jnp.ndarray):
    e, g = jax.value_and_grad(lambda p: pme_energy(pme, p))(P)
    return e, -g


# ---------------------------------------------------------------------------
# reference checker: direct Ewald sum (O(N^2 * K^3), tests only)
# ---------------------------------------------------------------------------

def ewald_direct_sum(q, P, cell, beta, kmax=8):
    """Textbook Ewald summation (real + reciprocal + self + background),
    for validating the mesh implementation on small systems.  Returns the
    Coulomb energy in e^2/A units (multiply by units.COULOMB for eV)."""
    q = np.asarray(q, np.float64)
    P = np.asarray(P, np.float64)
    cell = np.asarray(cell, np.float64)
    n = len(q)
    V = float(np.prod(cell))

    e_real = 0.0
    from math import erfc

    for i in range(n):
        for j in range(i + 1, n):
            d = P[i] - P[j]
            d = d - cell * np.round(d / cell)
            r = np.linalg.norm(d)
            e_real += q[i] * q[j] * erfc(beta * r) / r

    e_rec = 0.0
    for mx in range(-kmax, kmax + 1):
        for my in range(-kmax, kmax + 1):
            for mz in range(-kmax, kmax + 1):
                if mx == my == mz == 0:
                    continue
                mvec = np.array([mx, my, mz]) / cell
                m2 = float(mvec @ mvec)
                s = np.sum(q * np.exp(2j * np.pi * (P @ mvec)))
                e_rec += np.exp(-np.pi**2 * m2 / beta**2) / m2 * abs(s) ** 2
    e_rec /= 2.0 * np.pi * V

    e_self = -beta / np.sqrt(np.pi) * np.sum(q * q)
    e_neutral = -np.pi / (2.0 * beta**2 * V) * np.sum(q) ** 2
    return e_real + e_rec + e_self + e_neutral

"""Generic classical MM engine (ff19SB protein + TIP3P water + ions, PME).

This is the in-framework replacement for the Tinker9 co-process the
reference drives over sockets for every step (src/Calculators/
tinker_async.py:127-200): a fixed-charge periodic force field evaluated as
one jitted tensor program — bonded terms, neighbor-list LJ + erfc Coulomb,
and reciprocal-space PME, with AMBER 1-2/1-3 exclusions and scaled 1-4
pairs handled by explicit pair-list corrections.

Fidelity note (SURVEY.md section 7 phase 4): the reference's solvent model
is polarizable AMOEBA; this engine is the fixed-charge class
(amber/TIP3P).  The QM/MM combiner (ai2bmd_tpu.physics.qmmm) is written
against this module's interface so a polarizable backend can slot in.

Units: positions A, energy eV, forces eV/A.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ai2bmd_tpu import units
from ai2bmd_tpu.data.protein_topology import SystemTopology
from ai2bmd_tpu.ops.neighbors import NeighborList, _pbc_diff
from ai2bmd_tpu.physics.pme import SPLINE_ORDER, _bspline4, _euler_spline_mod2

KCAL = units.kcal_per_mol


@dataclasses.dataclass
class MMSystem:
    """Device-side MM tables for one (sub)system."""

    n_atoms: int
    cell: Any
    cutoff: float
    beta: float
    grid: tuple
    influence: Any
    charge: Any           # [N] e
    sigma: Any            # [N] A
    eps: Any              # [N] eV
    bonds: Any
    bond_k: Any           # eV/A^2
    bond_r0: Any
    angles: Any
    angle_k: Any
    angle_t0: Any
    dihedrals: Any
    dih_k: Any
    dih_n: Any
    dih_phase: Any
    excl_pairs: Any
    pairs14: Any
    scee: float
    scnb: float
    e_self: float         # eV
    e_neutral: float      # eV
    polarization: Any = None   # optional PolarizationParams (AMOEBA-class)
    # ff19SB CMAP cross-terms (None/empty when the topology carries none)
    cmap_atoms: Any = None     # [M,5] int32: C(-1) N CA C N(+1)
    cmap_type: Any = None      # [M] int32
    cmap_coeffs: Any = None    # [T,R,R,4,4] bicubic coefficients, eV
    # analytic LJ dispersion tail beyond the cutoff (g(r)=1 assumption):
    # U_tail = lj_tail_a / V.  Without it a 9 A truncation reads ~100-200
    # bar low on liquid water, which is why the round-2 NPT stage stalled
    # at negative pressure (sander applies the same correction, vdwmeth=1)
    lj_tail_a: float = 0.0     # eV * A^3

    @classmethod
    def build(
        cls,
        top: SystemTopology,
        cell: np.ndarray,
        cutoff: float = 9.0,
        beta: float = 0.35,
        grid_spacing: float = 1.0,
        scee: float = 1.2,
        scnb: float = 2.0,
        polarization=None,
    ) -> "MMSystem":
        from ai2bmd_tpu.physics.gridutil import smooth_grid

        cell = np.asarray(cell, np.float64)
        grid = smooth_grid(
            max(int(c / grid_spacing), 2 * SPLINE_ORDER) for c in cell
        )
        volume = float(np.prod(cell))
        ms = [np.fft.fftfreq(K) * K / L for K, L in zip(grid, cell)]
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
        infl /= 2.0 * np.pi * volume

        q = top.charges
        e_self = -beta / np.sqrt(np.pi) * float(np.sum(q * q)) * units.COULOMB
        lj_tail_a = _lj_tail_coefficient(
            np.asarray(top.sigmas, np.float64),
            np.asarray(top.epsilons, np.float64) * KCAL,
            cutoff,
        )
        e_neutral = (
            -np.pi / (2.0 * beta**2 * volume) * float(np.sum(q)) ** 2 * units.COULOMB
        )

        f32 = lambda a: jnp.asarray(a, jnp.float32)
        i32 = lambda a: jnp.asarray(a, jnp.int32)

        cmap_atoms = cmap_type = cmap_coeffs = None
        top_cmap = getattr(top, "cmap_atoms", None)
        if top_cmap is not None and len(top_cmap):
            cmap_atoms = i32(top.cmap_atoms)
            cmap_type = i32(top.cmap_type)
            cmap_coeffs = f32(cmap_bicubic_coeffs(top.cmap_grids) * KCAL)

        return cls(
            n_atoms=top.n_atoms,
            cell=f32(cell),
            cutoff=cutoff,
            beta=beta,
            grid=grid,
            influence=f32(infl),
            charge=f32(q),
            sigma=f32(top.sigmas),
            eps=f32(top.epsilons * KCAL),
            bonds=i32(top.bonds),
            bond_k=f32(top.bond_k * KCAL),
            bond_r0=f32(top.bond_r0),
            angles=i32(top.angles),
            angle_k=f32(top.angle_k * KCAL),
            angle_t0=f32(top.angle_t0),
            dihedrals=i32(top.dihedrals),
            dih_k=f32(top.dih_k * KCAL),
            dih_n=f32(top.dih_n),
            dih_phase=f32(top.dih_phase),
            excl_pairs=i32(top.excl_pairs),
            pairs14=i32(top.pairs14),
            scee=scee,
            scnb=scnb,
            e_self=e_self,
            e_neutral=e_neutral,
            polarization=polarization,
            cmap_atoms=cmap_atoms,
            cmap_type=cmap_type,
            cmap_coeffs=cmap_coeffs,
            lj_tail_a=lj_tail_a,
        )


def _lj_tail_coefficient(sigma: np.ndarray, eps: np.ndarray, cutoff: float):
    """A such that U_tail = A / V (eV), the standard analytic correction
    for truncating 4*eps*((s/r)^12 - (s/r)^6) at rc with g(r)=1:

        U_tail = (2*pi/V) * sum_{i != j} 4*eps_ij *
                 (sigma_ij^12/(9 rc^9) - sigma_ij^6/(3 rc^3))

    with Lorentz-Berthelot mixing.  Grouped over unique (sigma, eps)
    types so the double sum is O(T^2), not O(N^2)."""
    types, counts = np.unique(
        np.stack([sigma, eps], axis=1), axis=0, return_counts=True
    )
    s_t, e_t = types[:, 0], types[:, 1]
    n_t = counts.astype(np.float64)
    sij = 0.5 * (s_t[:, None] + s_t[None, :])
    eij = np.sqrt(e_t[:, None] * e_t[None, :])
    per_pair = 4.0 * eij * (
        sij**12 / (9.0 * cutoff**9) - sij**6 / (3.0 * cutoff**3)
    )
    pair_count = n_t[:, None] * n_t[None, :]
    # remove the i == j self terms from the diagonal type blocks
    total = np.sum(pair_count * per_pair) - np.sum(n_t * np.diag(per_pair))
    return float(2.0 * np.pi * total)


def cmap_bicubic_coeffs(grids: np.ndarray) -> np.ndarray:
    """Periodic bicubic (Hermite) spline coefficients for CMAP grids.

    grids [T,R,R] kcal/mol, phi-major rows, grid point g at angle
    -180 + g*360/R deg (the AMBER prmtop CMAP convention, as written by
    tleap for ff19SB; the same grid-plus-finite-difference-derivatives
    construction CHARMM and OpenMM's CMAPTorsionForce use).  Node
    derivatives come from centered differences on the periodic grid,
    expressed in normalized cell units, so the resulting surface is C1 and
    exactly interpolates the node values.

    Returns [T,R,R,4,4]: cell (i,j) evaluates as
    E(t,u) = sum_{m,n} C[i,j,m,n] t^m u^n for local coords t,u in [0,1).
    """
    grids = np.asarray(grids, np.float64)
    if grids.size == 0:
        return np.zeros((0, 0, 0, 4, 4))
    f = grids
    # normalized-derivative stencils (d/dt = h * d/dphi absorbed into units)
    fp = (np.roll(f, -1, axis=1) - np.roll(f, 1, axis=1)) / 2.0      # d/dphi
    fs = (np.roll(f, -1, axis=2) - np.roll(f, 1, axis=2)) / 2.0      # d/dpsi
    fps = (np.roll(fp, -1, axis=2) - np.roll(fp, 1, axis=2)) / 2.0   # cross

    def corners(a):
        a10 = np.roll(a, -1, axis=1)
        a01 = np.roll(a, -1, axis=2)
        a11 = np.roll(a10, -1, axis=2)
        return a, a10, a01, a11

    f00, f10, f01, f11 = corners(f)
    p00, p10, p01, p11 = corners(fp)
    s00, s10, s01, s11 = corners(fs)
    x00, x10, x01, x11 = corners(fps)
    # F layout: rows = [value(t=0), value(t=1), d/dt(0), d/dt(1)],
    #           cols = [u=0, u=1, d/du(0), d/du(1)]
    F = np.stack(
        [
            np.stack([f00, f01, s00, s01], axis=-1),
            np.stack([f10, f11, s10, s11], axis=-1),
            np.stack([p00, p01, x00, x01], axis=-1),
            np.stack([p10, p11, x10, x11], axis=-1),
        ],
        axis=-2,
    )                                                   # [T,R,R,4,4]
    B = np.array(
        [[1, 0, 0, 0], [0, 0, 1, 0], [-3, 3, -2, -1], [2, -2, 1, 1]],
        np.float64,
    )
    return np.einsum("mi,tpqij,nj->tpqmn", B, F, B)


def _dihedral_angle(p0, p1, p2, p3, cell=None):
    """Signed dihedral in (-pi, pi] (same convention as bonded_energy)."""
    v0 = _pbc_diff(p1 - p2, cell) if cell is not None else p1 - p2
    v1 = _pbc_diff(p1 - p0, cell) if cell is not None else p1 - p0
    v2 = _pbc_diff(p3 - p2, cell) if cell is not None else p3 - p2
    n1 = _safe_unit(jnp.cross(v1, v0))
    n2 = _safe_unit(jnp.cross(v0, v2))
    m1 = jnp.cross(n1, _safe_unit(v0))
    x = jnp.sum(n1 * n2, axis=-1)
    y = jnp.sum(m1 * n2, axis=-1)
    ok = (x * x + y * y) > 1e-12
    return jnp.arctan2(jnp.where(ok, y, 0.0), jnp.where(ok, x, 1.0))


def cmap_energy(mm: "MMSystem", P: jnp.ndarray, cell=None) -> jnp.ndarray:
    """ff19SB CMAP correction: bicubic-interpolated E(phi, psi) per term.

    The reference obtains these terms implicitly through sander/Tinker
    (src/AIMD/preprocess.py:111-177 builds ff19SB topologies); here they are
    part of the differentiable MM energy.  Gradient flows through phi/psi
    analytically; the spline is C1 so forces are continuous across cells.
    """
    a = mm.cmap_atoms
    R = mm.cmap_coeffs.shape[1]
    phi = _dihedral_angle(P[a[:, 0]], P[a[:, 1]], P[a[:, 2]], P[a[:, 3]], cell)
    psi = _dihedral_angle(P[a[:, 1]], P[a[:, 2]], P[a[:, 3]], P[a[:, 4]], cell)

    def locate(angle):
        x = (angle + jnp.pi) * (R / (2.0 * jnp.pi))
        xi = jnp.floor(x)
        t = x - xi
        return jnp.mod(xi.astype(jnp.int32), R), t

    gi, t = locate(phi)
    gj, u = locate(psi)
    C = mm.cmap_coeffs[mm.cmap_type, gi, gj]            # [M,4,4]
    tp = jnp.stack([jnp.ones_like(t), t, t * t, t * t * t], axis=-1)
    up = jnp.stack([jnp.ones_like(u), u, u * u, u * u * u], axis=-1)
    return jnp.einsum("mij,mi,mj->", C, tp, up)


def _safe_norm(v, axis=-1, eps=1e-12):
    d2 = jnp.sum(v * v, axis=axis)
    nz = d2 > eps
    return jnp.where(nz, jnp.sqrt(jnp.where(nz, d2, 1.0)), 0.0)


def _safe_unit(v, axis=-1, eps=1e-12):
    d2 = jnp.sum(v * v, axis=axis, keepdims=True)
    nz = d2 > eps
    return v * jnp.where(nz, jax.lax.rsqrt(jnp.where(nz, d2, 1.0)), 0.0)


def bonded_energy(mm: MMSystem, P: jnp.ndarray, cell=None) -> jnp.ndarray:
    cell = mm.cell if cell is None else cell
    e = jnp.asarray(0.0, jnp.float32)
    if mm.bonds.shape[0]:
        d = _safe_norm(_pbc_diff(P[mm.bonds[:, 0]] - P[mm.bonds[:, 1]], cell))
        e = e + jnp.sum(mm.bond_k * (d - mm.bond_r0) ** 2)
    if mm.angles.shape[0]:
        v0 = _pbc_diff(P[mm.angles[:, 0]] - P[mm.angles[:, 1]], cell)
        v1 = _pbc_diff(P[mm.angles[:, 2]] - P[mm.angles[:, 1]], cell)
        y = _safe_norm(jnp.cross(v0, v1))
        x = jnp.sum(v0 * v1, axis=-1)
        theta = jnp.arctan2(y, x)
        e = e + jnp.sum(mm.angle_k * (theta - mm.angle_t0) ** 2)
    if mm.dihedrals.shape[0]:
        p0, p1 = P[mm.dihedrals[:, 0]], P[mm.dihedrals[:, 1]]
        p2, p3 = P[mm.dihedrals[:, 2]], P[mm.dihedrals[:, 3]]
        v0 = _pbc_diff(p1 - p2, cell)
        v1 = _pbc_diff(p1 - p0, cell)
        v2 = _pbc_diff(p3 - p2, cell)
        n1 = _safe_unit(jnp.cross(v1, v0))
        n2 = _safe_unit(jnp.cross(v0, v2))
        m1 = jnp.cross(n1, _safe_unit(v0))
        x = jnp.sum(n1 * n2, axis=-1)
        y = jnp.sum(m1 * n2, axis=-1)
        ok = (x * x + y * y) > 1e-12
        phi = jnp.arctan2(jnp.where(ok, y, 0.0), jnp.where(ok, x, 1.0))
        e = e + jnp.sum(mm.dih_k * (1.0 + jnp.cos(mm.dih_n * phi - mm.dih_phase)))
    if mm.cmap_atoms is not None and mm.cmap_atoms.shape[0]:
        e = e + cmap_energy(mm, P, cell)
    return e


def _pair_terms(mm: MMSystem, P, pairs, cell=None):
    """(qq/r, LJ) raw terms for an explicit pair list (minimum image)."""
    cell = mm.cell if cell is None else cell
    i, j = pairs[:, 0], pairs[:, 1]
    d = _safe_norm(_pbc_diff(P[i] - P[j], cell))
    d = jnp.maximum(d, 1e-3)
    qq = mm.charge[i] * mm.charge[j]
    coul = units.COULOMB * qq / d
    sig = 0.5 * (mm.sigma[i] + mm.sigma[j])
    eps = jnp.sqrt(mm.eps[i] * mm.eps[j])
    c6 = (sig / d) ** 6
    lj = 4.0 * eps * (c6 * c6 - c6)
    return coul, lj, d


def dynamic_influence(mm: MMSystem, cell):
    """Influence function + self/neutral terms for a dynamic cell (NPT)."""
    ms = [
        jnp.fft.fftfreq(K) * K / cell[d] for d, K in enumerate(mm.grid)
    ]
    MX, MY, MZ = jnp.meshgrid(*ms, indexing="ij")
    m2 = MX**2 + MY**2 + MZ**2
    b2 = (
        jnp.asarray(_euler_spline_mod2(mm.grid[0]))[:, None, None]
        * jnp.asarray(_euler_spline_mod2(mm.grid[1]))[None, :, None]
        * jnp.asarray(_euler_spline_mod2(mm.grid[2]))[None, None, :]
    )
    volume = cell[0] * cell[1] * cell[2]
    m2_safe = jnp.where(m2 > 0, m2, 1.0)
    infl = jnp.where(
        m2 > 0, jnp.exp(-jnp.pi**2 * m2_safe / mm.beta**2) / m2_safe * b2, 0.0
    ) / (2.0 * jnp.pi * volume)
    qsum2 = jnp.sum(mm.charge) ** 2
    e_neutral = -jnp.pi / (2.0 * mm.beta**2 * volume) * qsum2 * units.COULOMB
    return infl.astype(jnp.float32), e_neutral


def nonbonded_nl_energy(
    mm: MMSystem, P: jnp.ndarray, nl: NeighborList, cell=None
):
    """Neighbor-list LJ + erfc-Coulomb (counted twice, halved) + PME rec.

    `cell` overrides the static box (dynamic-cell NPT); the mesh size stays
    fixed, only the influence function and volume terms are recomputed.
    """
    if cell is None:
        cell = mm.cell
    Pj = jnp.concatenate([P, jnp.zeros((1, 3), P.dtype)])[nl.idx]   # [N,K,3]
    vec = _pbc_diff(Pj - P[:, None, :], cell)
    d2 = jnp.sum(vec * vec, axis=-1)
    valid = nl.valid & (d2 < mm.cutoff**2)
    d2 = jnp.where(valid, d2, 1.0)
    d = jnp.sqrt(d2)

    qj = jnp.concatenate([mm.charge, jnp.zeros(1)])[nl.idx]
    qq = mm.charge[:, None] * qj
    e_coul_dir = 0.5 * jnp.sum(
        jnp.where(valid, units.COULOMB * qq * jax.lax.erfc(mm.beta * d) / d, 0.0)
    )

    sj = jnp.concatenate([mm.sigma, jnp.zeros(1)])[nl.idx]
    ej = jnp.concatenate([mm.eps, jnp.zeros(1)])[nl.idx]
    sig = 0.5 * (mm.sigma[:, None] + sj)
    eps = jnp.sqrt(mm.eps[:, None] * ej)
    c6 = (sig * sig / d2) ** 3
    e_lj = 0.5 * jnp.sum(jnp.where(valid, 4.0 * eps * (c6 * c6 - c6), 0.0))

    # reciprocal space + exclusion corrections (shared with the dense path)
    return e_coul_dir + e_lj + _recip_excl_energy(
        mm, P, None if cell is mm.cell else cell
    )


def _spread_scatter(mm: MMSystem, P, cell=None):
    """Scatter-based B-spline spreading (reference implementation).

    segment_sum of N*64 contributions — measured 12 ms fwd / 23 ms with
    grad at 17.9k atoms on v5e (TPU scatters serialize, and the autodiff
    backward is an equally irregular gather).  Kept for parity tests; the
    production path is the separable matmul form below."""
    cell = mm.cell if cell is None else cell
    Kx, Ky, Kz = mm.grid
    K = jnp.asarray(mm.grid)
    u = P / cell * K
    i0 = jnp.floor(u).astype(jnp.int32)
    t = u - i0
    offs = jnp.arange(SPLINE_ORDER)
    w = _bspline4(t[:, None, :] + 3.0 - offs[None, :, None])
    idx = (i0[:, None, :] - 3 + offs[None, :, None]) % K
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    ix, iy, iz = idx[..., 0], idx[..., 1], idx[..., 2]
    W = wx[:, :, None, None] * wy[:, None, :, None] * wz[:, None, None, :]
    lin = (
        ix[:, :, None, None] * (Ky * Kz)
        + iy[:, None, :, None] * Kz
        + iz[:, None, None, :]
    )
    contrib = (mm.charge[:, None, None, None] * W).reshape(-1)
    rho = jax.ops.segment_sum(contrib, lin.reshape(-1), num_segments=Kx * Ky * Kz)
    return rho.reshape(Kx, Ky, Kz)


def _axis_weights(u, K: int):
    """Dense periodic B-spline weight matrix for one axis.

    u [N] fractional grid coordinates -> W [N, K] with
    W[n, g] = M4((u_n - g) mod K) on the 4-point support, 0 elsewhere.
    Identical values to the scatter path's per-point weights, laid out
    densely so spreading becomes a matmul (MXU) instead of a scatter."""
    g = jnp.arange(K, dtype=u.dtype)
    d = jnp.mod(u[:, None] - g[None, :], K)
    inside = (d > 0.0) & (d < 4.0)
    return jnp.where(inside, _bspline4(jnp.where(inside, d, 1.0)), 0.0)


def _spread(mm: MMSystem, P, cell=None, chunk: int = 2048):
    """Separable dense B-spline spreading (TPU-native, scatter-free).

    rho[gx, gy, gz] = sum_n q_n wx[n,gx] wy[n,gy] wz[n,gz] evaluated as a
    per-atom-chunk matmul: Wx_t^T @ (q * wy (x) wz)_t — the N*4^3 scatter
    becomes MXU contractions whose autodiff backward is also matmuls.
    Measured 23.5 -> ~2 ms for the reciprocal gradient at 17.9k atoms."""
    cell = mm.cell if cell is None else cell
    Kx, Ky, Kz = mm.grid
    K = jnp.asarray(mm.grid, P.dtype)
    u = P / cell * K
    n = P.shape[0]
    chunk = min(chunk, n)
    npad = ((n + chunk - 1) // chunk) * chunk
    upad = jnp.pad(u, ((0, npad - n), (0, 0)))
    qpad = jnp.pad(mm.charge, (0, npad - n))

    def one_chunk(rho, start):
        uc = jax.lax.dynamic_slice(upad, (start, 0), (chunk, 3))
        qc = jax.lax.dynamic_slice(qpad, (start,), (chunk,))
        wx = _axis_weights(uc[:, 0], Kx)                 # [c, Kx]
        wy = _axis_weights(uc[:, 1], Ky)
        wz = _axis_weights(uc[:, 2], Kz)
        cyz = (qc[:, None] * wy)[:, :, None] * wz[:, None, :]
        rho = rho + jnp.dot(
            wx.T, cyz.reshape(chunk, Ky * Kz),
            preferred_element_type=jnp.float32,
        )
        return rho, None

    rho0 = jnp.zeros((Kx, Ky * Kz), jnp.float32)
    rho, _ = jax.lax.scan(one_chunk, rho0, jnp.arange(0, npad, chunk))
    return rho.reshape(Kx, Ky, Kz)


def dense_pair_energy_forces(mm: MMSystem, P: jnp.ndarray, cell=None,
                             tile: int = 2048):
    """Direct-space erfc-Coulomb + LJ over ALL pairs, tiled dense — the
    production solvated path (<=~32k atoms).

    No neighbor list at all: the [N,K] gather machinery, the O(N^2) top_k
    rebuild (measured 530 ms at 17.9k atoms on v5e) and the scatter in
    autodiff's gather-backward are all gone.  Each [tile, N] block is a
    dense masked pair slab; forces use the analytic pair derivative with
    the symmetric full pair matrix, so every atom sums its own row —
    F_i = sum_j C_ij vec_ij with C = phi'(r)/r — and no scatter is
    needed.  (A per-axis flat-[T,N] variant with MXU row sums measured
    14x SLOWER than this [T,N,3] einsum form on v5e — XLA fuses the slab
    chain better; keep this formulation.)  Replaces the reference's
    Tinker9-side pair loop (src/Calculators/tinker_async.py:155-181).

    Returns (E, F) with E = half-sum over the full pair matrix.
    """
    cell = mm.cell if cell is None else cell
    n = P.shape[0]
    tile = min(tile, n)
    npad = ((n + tile - 1) // tile) * tile
    Ppad = jnp.pad(P, ((0, npad - n), (0, 0)), constant_values=1e6)
    qpad = jnp.pad(mm.charge, (0, npad - n))
    spad = jnp.pad(mm.sigma, (0, npad - n))
    epad = jnp.pad(mm.eps, (0, npad - n))
    beta = mm.beta
    two_beta_rpi = 2.0 * beta / np.sqrt(np.pi)

    def one_tile(start):
        Pi = jax.lax.dynamic_slice(Ppad, (start, 0), (tile, 3))
        qi = jax.lax.dynamic_slice(qpad, (start,), (tile,))
        si = jax.lax.dynamic_slice(spad, (start,), (tile,))
        ei = jax.lax.dynamic_slice(epad, (start,), (tile,))
        vec = _pbc_diff(P[None, :, :] - Pi[:, None, :], cell)   # [T,N,3]
        d2 = jnp.sum(vec * vec, axis=-1)
        row = start + jax.lax.broadcasted_iota(jnp.int32, (tile, n), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (tile, n), 1)
        m = (d2 < mm.cutoff * mm.cutoff) & (col != row)
        d2s = jnp.where(m, d2, 1.0)
        inv2 = 1.0 / d2s
        r = jnp.sqrt(d2s)
        inv_r = r * inv2
        qq = qi[:, None] * mm.charge[None, :]
        erfc = jax.lax.erfc(beta * r)
        e_c = units.COULOMB * qq * erfc * inv_r
        sig = 0.5 * (si[:, None] + mm.sigma[None, :])
        epsij = jnp.sqrt(ei[:, None] * mm.eps[None, :])
        c6 = (sig * sig * inv2) ** 3
        e_l = 4.0 * epsij * (c6 * c6 - c6)
        e = jnp.sum(jnp.where(m, e_c + e_l, 0.0))
        dphi = (
            units.COULOMB * qq
            * (-erfc * inv2 - two_beta_rpi * jnp.exp(-beta * beta * d2s) * inv_r)
            + 4.0 * epsij * (6.0 * c6 - 12.0 * c6 * c6) * inv_r
        )
        C = jnp.where(m, dphi * inv_r, 0.0)       # [T,N] = phi'(r)/r
        f = jnp.einsum("tn,tnc->tc", C, vec)      # F_i = sum_j C_ij vec_ij
        w = jnp.sum(C * d2s * m)                  # sum phi'(r)*r  (virial)
        return e, f, w

    starts = jnp.arange(0, npad, tile)
    es, fs, ws = jax.lax.map(one_tile, starts)
    return 0.5 * jnp.sum(es), fs.reshape(npad, 3)[:n], 0.5 * jnp.sum(ws)


def mm_energy_forces_dense(mm: MMSystem, P: jnp.ndarray, cell=None,
                           tile: int = 2048):
    """(E, F) with the dense direct-space path; no neighbor list needed.

    bonded + PME reciprocal + exclusion corrections go through autodiff
    (small pair lists / mesh); the O(N^2) direct space uses the analytic
    tiled kernel above.
    """
    if mm.polarization is not None:
        raise ValueError(
            "dense path does not support the legacy polarization hybrid; "
            "use mm_backend='amoeba' for polarizable MM"
        )

    def smooth(p):
        return bonded_energy(mm, p, cell) + _recip_excl_energy(mm, p, cell)

    e_s, g_s = jax.value_and_grad(smooth)(P)
    e_p, f_p, _ = dense_pair_energy_forces(mm, P, cell, tile)
    return e_s + e_p, f_p - g_s


def mm_pressure_dense(mm: MMSystem, P, cell, kinetic_energy, tile: int = 2048):
    """Instantaneous pressure on the dense path: the pair virial is the
    analytic sum(phi'(r) r) from the tiled kernel; bonded + reciprocal go
    through the strain derivative like mm_pressure."""

    def scaled_smooth(s):
        return bonded_energy(mm, P * s, cell * s) + _recip_excl_energy(
            mm, P * s, cell * s
        )

    dU_smooth = jax.grad(scaled_smooth)(jnp.asarray(1.0, jnp.float32))
    _, _, w_pair = dense_pair_energy_forces(mm, P, cell, tile)
    V = cell[0] * cell[1] * cell[2]
    return (2.0 * kinetic_energy - dU_smooth - w_pair) / (3.0 * V)


def _recip_excl_energy(mm: MMSystem, P, cell=None):
    """PME reciprocal + self/neutral + exclusion/1-4 corrections."""
    if cell is None:
        cell = mm.cell
        influence, e_neutral = mm.influence, mm.e_neutral
    else:
        influence, e_neutral = dynamic_influence(mm, cell)
    rho = _spread(mm, P, cell)
    e = (
        jnp.sum(influence * jnp.abs(jnp.fft.fftn(rho)) ** 2) * units.COULOMB
        + mm.e_self + e_neutral
        + mm.lj_tail_a / (cell[0] * cell[1] * cell[2])
    )
    if mm.excl_pairs.shape[0]:
        coul, lj, _ = _pair_terms(mm, P, mm.excl_pairs, cell)
        e = e - jnp.sum(coul) - jnp.sum(lj)
    if mm.pairs14.shape[0]:
        coul, lj, _ = _pair_terms(mm, P, mm.pairs14, cell)
        e = e - jnp.sum(coul) * (1.0 - 1.0 / mm.scee)
        e = e - jnp.sum(lj) * (1.0 - 1.0 / mm.scnb)
    return e


def mm_energy(mm: MMSystem, P: jnp.ndarray, nl: NeighborList, cell=None) -> jnp.ndarray:
    e = bonded_energy(mm, P, cell) + nonbonded_nl_energy(mm, P, nl, cell)
    if mm.polarization is not None:
        from ai2bmd_tpu.physics.polarization import polarization_energy

        e = e + polarization_energy(
            mm.polarization, P, nl, mm.cell if cell is None else cell
        )
    return e


def mm_energy_forces(mm: MMSystem, P: jnp.ndarray, nl: NeighborList, cell=None):
    e, g = jax.value_and_grad(lambda p: mm_energy(mm, p, nl, cell))(P)
    return e, -g


def mm_pressure(mm: MMSystem, P, nl, cell, kinetic_energy):
    """Instantaneous isotropic pressure via the strain derivative:
    P = (2 K - dU/d(ln s)) / (3 V) with s the uniform scale factor."""

    def scaled_energy(s):
        return mm_energy(mm, P * s, nl, cell * s)

    dU_ds = jax.grad(scaled_energy)(jnp.asarray(1.0, jnp.float32))
    V = cell[0] * cell[1] * cell[2]
    return (2.0 * kinetic_energy - dU_ds) / (3.0 * V)

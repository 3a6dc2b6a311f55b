"""Neighbor-listed periodic AMOEBA nonbonded engine (production scale).

Evaluates the full AMOEBA nonbonded energy of an arbitrary assigned system
(protein + water, physics/amoeba_protein.assign_amoeba) under PBC with
static-shape [N, K] Verlet lists (ops/neighbors.py) — the in-framework
replacement for the solvated-system evaluations the reference ships to
Tinker9 every step (src/Calculators/tinker_async.py:155-181).

TPU layout rules learned the hard way (17.9k-atom chignolin box):

  * [M,3]/[M,3,3] per-pair tensors tile to T(4,128) with up to 57x
    padding — the array-of-structures autodiff formulation needed 62 GB
    HBM.  All pair math here is flat [N,K] scalars (lane dim = K).
  * per-pair cost is dominated by the NUMBER of gathers, not FLOPs
    (~25-50 ms per 6.3M-row gather on v5e): every per-atom quantity is
    packed into ONE [N,C] matrix and each pair set does a single row
    gather, then slices columns.  This took the real-space multipole sum
    from 1.27 s (one gather per component) to 30 ms — bitwise identical.

The multipole interactions use the closed-form Bn-scalar decomposition
(physics/amoeba_pme.py SoA section), exact for traceless quadrupoles.

Term structure:

  permanent  real-space erfc multipole pairs over the neighbor list
             (each unordered pair once), order-6 SPME reciprocal, self
             term, plus per-pair corrections (s-1) * full-kernel for the
             1-2/1-3/1-4/1-5 mpole-scaled pairs — with Ewald, a pair
             scaled by s needs total s*full, and real+mesh already give
             full, so the correction is exact and needs no erf pass
  induction  two solvers.  Default (production, wired as
             amoeba_induction="ewald" in physics/qmmm.py): variational
             CG over the FULL Ewald interaction (erfc real space +
             SPME reciprocal + self), Thole damping folded in as
             Bn_erfc - (1-lambda)*Bn_coulomb, group d-mask on the
             permanent cross term, and the p-vs-d energy-field cross
             correction added at the minimum — cutoff/beta-invariant
             where real-space SOR swings 20-38%.  Legacy "sor": Thole-
             damped real-space-only fields over the list with mutual
             SOR sweeps (u-scales are all 1), kept for speed comparisons
  vdW        buffered 14-7 over the list with cutoff shift + scaled-pair
             corrections

Units: positions A, energy eV.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ai2bmd_tpu import units
from ai2bmd_tpu.ops.neighbors import (
    NeighborList,
    build_neighbor_list,
    build_neighbor_list_cells,
    cell_grid,
)
from ai2bmd_tpu.physics import amoeba_pme as MP
from ai2bmd_tpu.physics.amoeba import _thole_lambdas, rotate_multipoles
from ai2bmd_tpu.physics.amoeba_protein import (
    MPOLE_SCALES,
    POLAR_SCALES,
    VDW_SCALES,
    AmoebaAssignment,
)

_T6 = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
# packed per-atom matrix columns: q, mu(3), theta6(6), pdamp, thole, pos(3)
_Q, _MU, _T, _PD, _TH, _POS = 0, 1, 4, 10, 11, 12
_C = 15


def _minimum_image(d, L):
    return d - L * jnp.floor(d / L + 0.5)


@dataclasses.dataclass
class AmoebaPeriodicSystem:
    """Device-side arrays for the nonbonded AMOEBA energy of one system."""

    n_atoms: int
    cell: Any
    pme: Any                  # MultipoleEwaldParams
    cutoff: float
    sor_iters: int
    sor_omega: float
    # per-atom parameters (jnp)
    q: Any
    dip_loc: Any
    quad_loc: Any
    frame_z: Any
    frame_x: Any
    frame_kind: Any
    alpha: Any
    pdamp: Any
    thole: Any
    vdw_rmin: Any
    vdw_eps: Any
    vdw_red: Any
    heavy_of: Any
    # exception pair lists (flat, i<j)
    mx_pairs: Any             # [Mm,2] pairs with mscale != 1
    mx_scale: Any             # [Mm]
    vx_pairs: Any             # [Mv,2] pairs with vscale != 1
    vx_scale: Any             # [Mv]
    px_pairs: Any             # [Mp,2] pairs with pscale != 1
    px_scale: Any             # [Mp]
    grp_pairs: Any            # [Gp,2] intra-polarization-group pairs
    nl_grid: Any = None       # (nc, max_occ): O(N) cell-list rebuild for
    #                           >24k-atom boxes; None = tiled dense O(N^2)

    @classmethod
    def build(
        cls,
        asg: AmoebaAssignment,
        cell,
        cutoff: float = 9.0,
        beta: float = 0.4,
        grid_spacing: float = 0.8,
        sor_iters: int = 30,
        sor_omega: float = 0.7,
        dtype=jnp.float32,
    ) -> "AmoebaPeriodicSystem":
        pme = MP.MultipoleEwaldParams.build(
            np.asarray(cell, np.float64), beta=beta, grid_spacing=grid_spacing
        )

        def exceptions(table):
            s = np.array([table[int(o)] for o in asg.scale_order])
            sel = s != 1.0
            return (
                jnp.asarray(asg.scale_pairs[sel]),
                jnp.asarray(s[sel], dtype),
            )

        mx_p, mx_s = exceptions(MPOLE_SCALES)
        vx_p, vx_s = exceptions(VDW_SCALES)
        px_p, px_s = exceptions(POLAR_SCALES)
        jf = lambda a: jnp.asarray(a, dtype)
        return cls(
            n_atoms=asg.n_atoms,
            cell=jf(np.asarray(cell)), pme=pme, cutoff=cutoff,
            sor_iters=sor_iters, sor_omega=sor_omega,
            q=jf(asg.q), dip_loc=jf(asg.dip_loc), quad_loc=jf(asg.quad_loc),
            frame_z=jnp.asarray(asg.frame_z), frame_x=jnp.asarray(asg.frame_x),
            frame_kind=jnp.asarray(asg.frame_kind),
            alpha=jf(asg.alpha), pdamp=jf(asg.alpha ** (1.0 / 6.0)),
            thole=jf(asg.thole),
            vdw_rmin=jf(asg.vdw_rmin), vdw_eps=jf(asg.vdw_eps),
            vdw_red=jf(asg.vdw_red), heavy_of=jnp.asarray(asg.heavy_of),
            mx_pairs=mx_p, mx_scale=mx_s,
            vx_pairs=vx_p, vx_scale=vx_s,
            px_pairs=px_p, px_scale=px_s,
            grp_pairs=jnp.asarray(asg.group_pairs),
            nl_grid=(
                cell_grid(np.asarray(cell, np.float64), cutoff, len(asg.q))
                if len(asg.q) > 24_000 else None
            ),
        )

    def neighbor_list(self, P, k_max: int | None = None) -> NeighborList:
        """Build the [N,K] list.  Default K is derived from the cutoff at
        ~1.3x liquid-water atom density (0.10 atoms/A^3): at the default
        9 A cutoff liquid water has ~310 in-cutoff neighbors, so a fixed
        small K would silently overflow.  Callers running inside jit
        should surface nl.overflow host-side after the first build (the
        QM/MM production path does)."""
        if k_max is None:
            k_max = int(np.ceil(0.13 * 4.19 * self.cutoff**3 / 64.0)) * 64
        if self.nl_grid is not None:
            nc, max_occ = self.nl_grid
            return build_neighbor_list_cells(
                P, self.cutoff, k_max, self.cell, nc, max_occ
            )
        return build_neighbor_list(P, self.cutoff, k_max, cell=self.cell)

    # ------------------------------------------------------------------
    def lab_multipoles(self, P):
        mu, theta = rotate_multipoles(
            P, self.frame_z, self.frame_x, self.frame_kind,
            self.dip_loc.astype(P.dtype), self.quad_loc.astype(P.dtype),
        )
        return self.q.astype(P.dtype), mu, theta

    def _packed(self, P):
        """One [N,15] matrix: q, mu, theta6, pdamp, thole, positions —
        a single row gather per pair set replaces ~14 component gathers."""
        q, mu, theta = self.lab_multipoles(P)
        t6 = [theta[:, a, b] for a, b in _T6]
        return (
            jnp.concatenate(
                [
                    q[:, None], mu,
                    jnp.stack(t6, axis=-1),
                    self.pdamp[:, None].astype(P.dtype),
                    self.thole[:, None].astype(P.dtype),
                    P,
                ],
                axis=-1,
            ),
            q, mu, theta,
        )

    @staticmethod
    def _slices(M):
        """(q, mu3, t6, pdamp, thole, pos3) column views of a packed
        gather result (any leading shape)."""
        return (
            M[..., _Q],
            (M[..., _MU], M[..., _MU + 1], M[..., _MU + 2]),
            tuple(M[..., _T + c] for c in range(6)),
            M[..., _PD],
            M[..., _TH],
            (M[..., _POS], M[..., _POS + 1], M[..., _POS + 2]),
        )

    def _pair_geom(self, pm, nl: NeighborList):
        """Packed j-side rows + displacements/liveness, all [N,K]."""
        Mj = pm[nl.idx]
        qj, mj3, tj6, pdj, thj, (pjx, pjy, pjz) = self._slices(Mj)
        dx = _minimum_image(pjx - pm[:, None, _POS], self.cell[0])
        dy = _minimum_image(pjy - pm[:, None, _POS + 1], self.cell[1])
        dz = _minimum_image(pjz - pm[:, None, _POS + 2], self.cell[2])
        r2 = dx * dx + dy * dy + dz * dz
        live = nl.valid & (r2 < self.cutoff * self.cutoff)
        # dead slots clamp to the last atom (idx == n), giving r = 0; park
        # them at a finite displacement so the masked-out branch never
        # divides by zero (0 * inf = NaN in the backward pass)
        dx = jnp.where(live, dx, 10.0)
        dy = jnp.where(live, dy, 0.0)
        dz = jnp.where(live, dz, 0.0)
        r2 = jnp.where(live, r2, 100.0)
        return (qj, mj3, tj6, pdj, thj), (dx, dy, dz), r2, live

    def permanent_energy(self, P, nl: NeighborList):
        pm, q, mu, theta = self._packed(P)
        (qj, mj3, tj6, _, _), (dx, dy, dz), r2, live = self._pair_geom(pm, nl)
        row = jax.lax.broadcasted_iota(jnp.int32, nl.idx.shape, 0)
        live = live & (nl.idx > row)              # each unordered pair once
        r2s = jnp.where(live, r2, 1.0)
        qi, mi3, ti6, _, _, _ = self._slices(pm[:, None, :])
        e = MP.multipole_pair_energy_soa(
            dx, dy, dz, qi, qj, mi3, mj3, ti6, tj6,
            MP.bn_chain_erfc(r2s, self.pme.beta),
        )
        e_real = jnp.sum(jnp.where(live, e, 0.0))

        e_rec = MP.reciprocal_energy(self.pme, P, q, mu, theta)
        e_self = MP.self_energy(q, mu, theta, self.pme.beta)

        # scaled-pair corrections with the plain Coulomb chain (flat)
        e_pair = self._exception_pair_energy(pm, self.mx_pairs)
        e_corr = jnp.sum((self.mx_scale - 1.0) * e_pair)
        return units.COULOMB * (e_real + e_rec + e_self + e_corr)

    def _exception_pair_energy(self, pm, pairs):
        Mi = pm[pairs[:, 0]]
        Mj = pm[pairs[:, 1]]
        qi, mi3, ti6, _, _, (ix, iy, iz) = self._slices(Mi)
        qj, mj3, tj6, _, _, (jx, jy, jz) = self._slices(Mj)
        dx = _minimum_image(jx - ix, self.cell[0])
        dy = _minimum_image(jy - iy, self.cell[1])
        dz = _minimum_image(jz - iz, self.cell[2])
        r2 = dx * dx + dy * dy + dz * dz
        return MP.multipole_pair_energy_soa(
            dx, dy, dz, qi, qj, mi3, mj3, ti6, tj6, MP.bn_chain_coulomb(r2)
        )

    # ------------------------------------------------------------------
    def _fields(self, pm, nl: NeighborList):
        """(E_d [N,3], E_p [N,3], SOR geometry) — packed-gather fields."""
        (qj, mj3, tj6, pdj, thj), (dx, dy, dz), r2, live = self._pair_geom(pm, nl)
        # field-point convention: x = r_i - r_j
        fx_, fy_, fz_ = -dx, -dy, -dz
        r = jnp.sqrt(jnp.where(live, r2, 100.0))
        pd = pm[:, None, _PD] * pdj
        gm = jnp.minimum(pm[:, None, _TH], thj)
        l3, l5, l7 = _thole_lambdas(r, pd, gm)
        ex, ey, ez = MP.field_soa(fx_, fy_, fz_, qj, mj3, tj6, l3, l5, l7)
        E_full = jnp.stack(
            [
                jnp.sum(jnp.where(live, ex, 0.0), axis=1),
                jnp.sum(jnp.where(live, ey, 0.0), axis=1),
                jnp.sum(jnp.where(live, ez, 0.0), axis=1),
            ],
            axis=-1,
        )

        n = self.n_atoms

        def corrections(pairs, weight):
            Mi = pm[pairs[:, 0]]
            Mj = pm[pairs[:, 1]]
            qi, mi3, ti6, pdi, thi, (ix, iy, iz) = self._slices(Mi)
            qj_, mj3_, tj6_, pdj_, thj_, (jx, jy, jz) = self._slices(Mj)
            cx = _minimum_image(ix - jx, self.cell[0])     # r_i - r_j
            cy = _minimum_image(iy - jy, self.cell[1])
            cz = _minimum_image(iz - jz, self.cell[2])
            cr = jnp.sqrt(cx * cx + cy * cy + cz * cz)
            cl3, cl5, cl7 = _thole_lambdas(
                cr, pdi * pdj_, jnp.minimum(thi, thj_)
            )
            f_i = MP.field_soa(cx, cy, cz, qj_, mj3_, tj6_, cl3, cl5, cl7)
            f_j = MP.field_soa(-cx, -cy, -cz, qi, mi3, ti6, cl3, cl5, cl7)
            src = jnp.concatenate(
                [
                    weight[:, None] * jnp.stack(f_i, axis=-1),
                    weight[:, None] * jnp.stack(f_j, axis=-1),
                ]
            )
            dst = jnp.concatenate([pairs[:, 0], pairs[:, 1]])
            return jax.ops.segment_sum(src, dst, num_segments=n)

        E_d = E_full - corrections(
            self.grp_pairs, jnp.ones(self.grp_pairs.shape[0], pm.dtype)
        )
        E_p = E_full - corrections(self.px_pairs, 1.0 - self.px_scale)
        return E_d, E_p, (fx_, fy_, fz_), live, l3, l5

    def induced_dipoles(self, P, nl: NeighborList):
        pm, *_ = self._packed(P)
        E_d, E_p, (dx, dy, dz), live, l3, l5 = self._fields(pm, nl)
        alpha = self.alpha[:, None].astype(P.dtype)

        def step(mu_ind, _):
            Mj = mu_ind[nl.idx]                    # 1 row gather per iter
            fx, fy, fz = MP.dipole_field_soa(
                dx, dy, dz, (Mj[..., 0], Mj[..., 1], Mj[..., 2]), l3, l5
            )
            Em = jnp.stack(
                [
                    jnp.sum(jnp.where(live, fx, 0.0), axis=1),
                    jnp.sum(jnp.where(live, fy, 0.0), axis=1),
                    jnp.sum(jnp.where(live, fz, 0.0), axis=1),
                ],
                axis=-1,
            )
            return mu_ind + self.sor_omega * (alpha * (E_d + Em) - mu_ind), None

        mu0 = alpha * E_d
        mu_ind, _ = jax.lax.scan(step, mu0, None, length=self.sor_iters)
        return mu_ind, E_p

    def polarization_energy(self, P, nl: NeighborList):
        mu_ind, E_p = self.induced_dipoles(P, nl)
        return -0.5 * units.COULOMB * jnp.sum(mu_ind * E_p)

    # ------------------------------------------------------------------
    # full-Ewald mutual induction (matches Tinker's meshed induction)
    #
    # The real-space-only SCF above truncates the permanent field and the
    # mutual coupling at the cutoff; measured on a 64-water box the
    # polarization energy still swings ~20% between 5 and 6 A cutoffs —
    # the damped dipole field converges too slowly for cutoff truncation.
    # Here induction is solved variationally over the EWALD interaction:
    #
    #   F(m) = sum |m|^2 / (2 alpha)  +  E_cross(m)  +  E_mut(m)
    #
    # with E_cross/E_mut evaluated as full Ewald sums (erfc real space
    # over the neighbor list + order-6 SPME reciprocal + self term) plus
    # Thole damping applied as the real-space correction
    # Bn_eff = Bn_erfc - (1 - lambda_n) Bn_coulomb  (so near pairs see the
    # damped FULL interaction once real and mesh are combined), and the
    # group d-mask subtracting the same-group permanent cross terms.
    # F is quadratic in m: a fixed-iteration conjugate gradient converges
    # in ~10 steps; forces autodiff through the unrolled solve.
    # ------------------------------------------------------------------

    def _induction_functional(self, P, nl: NeighborList):
        """Returns F(m) (in e^2/A) and the p-scaled field closure."""
        pm, q, mu_perm, theta = self._packed(P)
        (qj, mj3, tj6, pdj, thj), (dx, dy, dz), r2, live = self._pair_geom(pm, nl)
        row = jax.lax.broadcasted_iota(jnp.int32, nl.idx.shape, 0)
        live_u = live & (nl.idx > row)                # unordered pairs once
        r2s = jnp.where(live_u, r2, 1.0)
        r = jnp.sqrt(r2s)
        pd = pm[:, None, _PD] * pdj
        gm = jnp.minimum(pm[:, None, _TH], thj)
        l3, l5, l7 = _thole_lambdas(r, pd, gm)
        bn_erfc = MP.bn_chain_erfc(r2s, self.pme.beta)
        bn_coul = MP.bn_chain_coulomb(r2s)
        lam = (1.0, l3, l5, l7, jnp.ones_like(l3))    # order-n damping
        bn_eff = [be - (1.0 - ln) * bc
                  for be, bc, ln in zip(bn_erfc, bn_coul, lam)]
        zero6 = tuple(jnp.zeros_like(qj) for _ in range(6))
        qi = pm[:, None, _Q]
        mi3 = (pm[:, None, _MU], pm[:, None, _MU + 1], pm[:, None, _MU + 2])
        ti6 = tuple(pm[:, None, _T + c] for c in range(6))
        zq = jnp.zeros_like(qj)
        n = self.n_atoms

        def nl_m(m):
            """Gathered j-side induced dipoles [N,K] components."""
            Mj = m[nl.idx]
            return (Mj[..., 0], Mj[..., 1], Mj[..., 2])

        def e_real(m):
            mi = (m[:, None, 0], m[:, None, 1], m[:, None, 2])
            mj = nl_m(m)
            # cross: m_i <-> (q,mu,theta)_j  and  (q,mu,theta)_i <-> m_j
            e_c = MP.multipole_pair_energy_soa(
                dx, dy, dz, zq, qj, mi, mj3, zero6, tj6, bn_eff
            ) + MP.multipole_pair_energy_soa(
                dx, dy, dz, qi, zq, mi3, mj, ti6, zero6, bn_eff
            )
            # mutual: m_i <-> m_j
            e_m = MP.multipole_pair_energy_soa(
                dx, dy, dz, zq, zq, mi, mj, zero6, zero6, bn_eff
            )
            return jnp.sum(jnp.where(live_u, e_c + e_m, 0.0))

        def _damped_cross(pairs):
            """Closure m -> per-pair cross energy [P]: induced dipole m_i
            with permanents (q,mu,theta)_j plus m_j with permanents at i,
            Thole-damped plain-Coulomb kernel (connectivity pairs, always
            well inside the box)."""
            pi, pj = pairs[:, 0], pairs[:, 1]
            gx = _minimum_image(pm[pj, _POS] - pm[pi, _POS], self.cell[0])
            gy = _minimum_image(
                pm[pj, _POS + 1] - pm[pi, _POS + 1], self.cell[1]
            )
            gz = _minimum_image(
                pm[pj, _POS + 2] - pm[pi, _POS + 2], self.cell[2]
            )
            gr2 = gx * gx + gy * gy + gz * gz
            gpd = pm[pi, _PD] * pm[pj, _PD]
            ggm = jnp.minimum(pm[pi, _TH], pm[pj, _TH])
            gl3, gl5, gl7 = _thole_lambdas(jnp.sqrt(gr2), gpd, ggm)
            g_bn = [bc * ln for bc, ln in
                    zip(MP.bn_chain_coulomb(gr2),
                        (1.0, gl3, gl5, gl7, jnp.ones_like(gl3)))]
            g_zero6 = tuple(jnp.zeros_like(gx) for _ in range(6))
            gqi, gqj = pm[pi, _Q], pm[pj, _Q]
            gmi3 = (pm[pi, _MU], pm[pi, _MU + 1], pm[pi, _MU + 2])
            gmj3 = (pm[pj, _MU], pm[pj, _MU + 1], pm[pj, _MU + 2])
            gti6 = tuple(pm[pi, _T + c] for c in range(6))
            gtj6 = tuple(pm[pj, _T + c] for c in range(6))
            gzq = jnp.zeros_like(gqi)

            def cross(m):
                mi = (m[pi, 0], m[pi, 1], m[pi, 2])
                mj = (m[pj, 0], m[pj, 1], m[pj, 2])
                return MP.multipole_pair_energy_soa(
                    gx, gy, gz, gzq, gqj, mi, gmj3, g_zero6, gtj6, g_bn
                ) + MP.multipole_pair_energy_soa(
                    gx, gy, gz, gqi, gzq, gmi3, mj, gti6, g_zero6, g_bn
                )

            return cross

        # group d-mask: same-group permanents do not polarize — remove
        # their lambda-damped FULL cross interaction
        cross_grp = _damped_cross(self.grp_pairs)
        cross_px = _damped_cross(self.px_pairs)

        def e_dmask(m):
            return -jnp.sum(cross_grp(m))

        def pcorr(m):
            """p-vs-d energy-field correction (e^2/A): the SCF minimizes
            against the d-masked field E_d, but AMOEBA's polarization
            energy is -1/2 m.E_p with the p-scaled field.  E_p - E_d =
            [group-pair fields] - [(1-p)-weighted connectivity-pair
            fields], and -1/2 m.(pair field) = +1/2 (pair cross energy),
            so E_pol = F(m) + 1/2 U_grp(m) - 1/2 (1-p) U_px(m).  Exactly
            zero for water (every intramolecular pair is group-internal
            AND p=0); nonzero for protein 1-2/1-3 pairs that span
            polarization groups.  Tinker reference: epolar1 p/d cross
            terms."""
            return 0.5 * jnp.sum(cross_grp(m)) - 0.5 * jnp.sum(
                (1.0 - self.px_scale) * cross_px(m)
            )

        def e_recip_self(m):
            mu_tot = mu_perm + m
            e1 = MP.reciprocal_energy(self.pme, P, q, mu_tot, theta)
            e0 = MP.reciprocal_energy(self.pme, P, q, mu_perm, theta)
            s1 = MP.self_energy(q, mu_tot, theta, self.pme.beta)
            s0 = MP.self_energy(q, mu_perm, theta, self.pme.beta)
            return (e1 - e0) + (s1 - s0)

        alpha = jnp.maximum(self.alpha.astype(P.dtype), 1e-6)

        def F(m):
            return (
                jnp.sum(m * m / (2.0 * alpha[:, None]))
                + e_real(m) + e_dmask(m) + e_recip_self(m)
            )

        return F, alpha, pcorr

    def _mutual_operator(self, P, nl: NeighborList):
        """Explicit Hessian application A(p) of the induction functional.

        The Hessian of F (quadratic in m) has four parts:

          * diag(1/alpha)                      (the self-polarization term)
          * real-space Thole/Ewald dipole T:   from the mutual term of
            e_real, e_m = sum_pairs B1_eff (m_i.m_j) - B2_eff (m_i.x)(m_j.x)
            so (T p)_i = sum_j [B1_eff p_j - B2_eff (p_j.x) x]
          * reciprocal + self:  e_recip_self's quadratic part is the
            homogeneous form E(m) = reciprocal_energy(0, m, 0) +
            self_energy(0, m, 0) whose gradient AT p equals Hessian @ p.

        The cross (permanent<->induced) and d-mask terms are linear in m
        and contribute to the RHS only.  Using this operator instead of
        `jax.linearize(grad(F))` removes the tangent chains through the
        full multipole energy from every CG iteration — the linearized
        hvp was both ~4x the FLOPs and the source of the [N,K,3] pad-
        blowup copies that OOM'd profiling on the 17.9k-atom box.

        Exactness vs the autodiff hvp is pinned by
        tests/test_amoeba_variational.py::test_mutual_operator_matches_hvp.
        """
        pd = self.pdamp.astype(P.dtype)
        th = self.thole.astype(P.dtype)
        G = jnp.concatenate([pd[:, None], th[:, None], P], axis=-1)
        Gj = G[nl.idx]                                   # [N,K,5]
        dx = _minimum_image(Gj[..., 2] - P[:, None, 0], self.cell[0])
        dy = _minimum_image(Gj[..., 3] - P[:, None, 1], self.cell[1])
        dz = _minimum_image(Gj[..., 4] - P[:, None, 2], self.cell[2])
        r2 = dx * dx + dy * dy + dz * dz
        live = nl.valid & (r2 < self.cutoff * self.cutoff)
        dx = jnp.where(live, dx, 10.0)
        dy = jnp.where(live, dy, 0.0)
        dz = jnp.where(live, dz, 0.0)
        r2s = jnp.where(live, r2, 100.0)
        l3, l5, _ = _thole_lambdas(
            jnp.sqrt(r2s), pd[:, None] * Gj[..., 0],
            jnp.minimum(th[:, None], Gj[..., 1]),
        )
        be = MP.bn_chain_erfc(r2s, self.pme.beta, n=3)
        bc = MP.bn_chain_coulomb(r2s, n=3)
        b1 = jnp.where(live, be[1] - (1.0 - l3) * bc[1], 0.0)
        b2 = jnp.where(live, be[2] - (1.0 - l5) * bc[2], 0.0)
        inv_alpha = 1.0 / jnp.maximum(self.alpha.astype(P.dtype), 1e-6)
        zq = jnp.zeros((self.n_atoms,), P.dtype)
        zt = jnp.zeros((self.n_atoms, 3, 3), P.dtype)

        def recip_self(m):
            return MP.reciprocal_energy(self.pme, P, zq, m, zt) + (
                MP.self_energy(zq, m, zt, self.pme.beta)
            )

        recip_grad = jax.grad(recip_self)
        idx = nl.idx

        def apply(p):
            Pj = p[idx]                                  # [N,K,3]
            pjx, pjy, pjz = Pj[..., 0], Pj[..., 1], Pj[..., 2]
            pr = pjx * dx + pjy * dy + pjz * dz
            b2pr = b2 * pr
            T = jnp.stack(
                [
                    jnp.sum(b1 * pjx - b2pr * dx, axis=1),
                    jnp.sum(b1 * pjy - b2pr * dy, axis=1),
                    jnp.sum(b1 * pjz - b2pr * dz, axis=1),
                ],
                axis=-1,
            )
            return p * inv_alpha[:, None] + T + recip_grad(p)

        return apply

    def _mutual_operator_batched(self, P, nl: NeighborList):
        """[N,3,R] multi-RHS variant of _mutual_operator: the per-pair
        scalars (b1, b2, displacements) are read once per iteration and
        shared across the R right-hand sides, and the R reciprocal FFTs
        batch.  Cheap now that the operator is explicit — batching the
        LINEARIZED hvp kept both columns' full tangent chains live and
        OOM'd the 17.9k-atom box."""
        apply_one = self._mutual_operator(P, nl)
        return jax.vmap(apply_one, in_axes=-1, out_axes=-1)

    def induced_dipoles_ewald(self, P, nl: NeighborList, cg_iters: int = 12,
                              m0=None):
        """Fixed-iteration CG minimization of the quadratic induction
        functional; returns (mu_ind [N,3], E_pol(mu_ind) in e^2/A,
        including the p-vs-d energy-field cross correction).

        `m0` warm-starts the CG (e.g. the previous MD step's converged
        dipoles, threaded through the QM/MM aux): at 1 fs displacements
        the minimizer moves little, so a warm start reaches a given
        residual in ~half the iterations of a cold start (measured in
        tests/test_amoeba_induction.py).  m0 is stop_gradient'd — it is
        previous-step state, not a function of the current positions.

        The solve is Jacobi-preconditioned: the Hessian of F is
        diag(1/alpha) + T, whose diagonal is dominated by the 1/alpha
        term (alpha spans ~0.5-1.3 A^3 across AMOEBA types), so
        M^-1 = diag(alpha) — Tinker's default 'diagonal' induction
        preconditioner — cuts the residual per iteration materially at
        the cost of one elementwise multiply (measured in
        tests/test_amoeba_induction.py::test_pcg_beats_cg)."""
        F, alpha, pcorr = self._induction_functional(P, nl)
        zeros = jnp.zeros((self.n_atoms, 3), P.dtype)
        # F is quadratic: g0 = gradF(0) = -E_d (the permanent field) is one
        # backward pass, and the constant Hessian application comes from
        # the EXPLICIT operator (_mutual_operator) instead of
        # jax.linearize(gradF) — the linearized hvp dragged tangent chains
        # through the full multipole energy every CG iteration
        g0 = jax.grad(F)(zeros)
        hvp = self._mutual_operator(P, nl)
        if m0 is None:
            m0 = zeros
        else:
            m0 = jax.lax.stop_gradient(m0.astype(P.dtype))
        prec = alpha[:, None]                     # M^-1 = diag(alpha)

        @jax.checkpoint
        def body(carry, _):
            # rematerialized: storing every iteration's hvp residuals for
            # the backward pass OOMs the 17.9k-atom box by ~400 MB
            m, r_, z_, p_ = carry
            Ap = hvp(p_)
            denom = jnp.sum(p_ * Ap)
            rz = jnp.sum(r_ * z_)
            a = jnp.where(jnp.abs(denom) > 1e-30, rz / denom, 0.0)
            m_new = m + a * p_
            r_new = r_ - a * Ap
            z_new = prec * r_new
            b = jnp.where(jnp.abs(rz) > 1e-30,
                          jnp.sum(r_new * z_new) / rz, 0.0)
            return (m_new, r_new, z_new, z_new + b * p_), None

        r0 = -g0 - hvp(m0)
        z0 = prec * r0
        (m, _, _, _), _ = jax.lax.scan(
            body, (m0, r0, z0, z0), None, length=cg_iters
        )
        return m, F(m) + pcorr(m)

    def induction_variational(self, P, nl: NeighborList,
                              cg_iters: int = 12, m0_d=None, m0_p=None):
        """Variational (implicit-gradient) induction: polarization energy
        whose position gradient is the exact converged-limit force WITHOUT
        backpropagating through the CG iterations.

        Solves BOTH Tinker fields — A mu_d = E_d (the d-masked field the
        SCF minimizes against) and A mu_p = E_p (the p-scaled field that
        defines the energy) — with warm-started Jacobi-PCG under
        stop_gradient, then evaluates the fixed-dipole scalar

          Phi = 1/2 mu_d.g0 + mu_d.gp + 1/2 mu_p.g0 + 1/2 mu_p.A(mu_d)

        where g0 = gradF(0) = -E_d, gp = grad pcorr = -1/2 (E_p - E_d)
        and A(.) is the linearized Hessian application — all three carry
        the position dependence.  Algebraically Phi = -1/2 mu_d^T E_p
        (AMOEBA's polarization energy) in value AND in x-derivative:
          dPhi/dx = -1/2[mu_d dE_p/dx + mu_p dE_d/dx - mu_p (dA/dx) mu_d]
        — the textbook converged-SCF polarization force (Tinker epolar1's
        uind/uinp structure).  The old path differentiates through the
        rematerialized CG scan, replaying every Ewald field application
        ~3x in the backward; here the solver costs forward passes only
        and the energy term costs one extra Hessian application.

        Returns (mu_d, mu_p, e_pol) with e_pol in e^2/A (multiply by
        units.COULOMB).
        """
        F, alpha, pcorr = self._induction_functional(P, nl)
        zeros = jnp.zeros((self.n_atoms, 3), P.dtype)
        g0 = jax.grad(F)(zeros)
        # pcorr is linear in m: its (constant) gradient is -1/2 (E_p - E_d)
        gp = jax.grad(pcorr)(zeros)
        b_d = -g0                      # E_d
        b_p = -g0 - 2.0 * gp           # E_p = E_d - 2 grad pcorr
        prec = alpha[:, None]

        # Both Tinker fields solve against the SAME operator A, so they
        # run as one 2-RHS batched PCG ([N,3,2], per-column scalars): the
        # pair scalars are read once per iteration for both columns and
        # the two reciprocal FFTs batch.  (Batching was impossible with
        # the linearized hvp — it kept both columns' full tangent chains
        # live and OOM'd the 17.9k-atom box; the explicit operator's
        # batched gather is ~270 MB.)
        hvp_b = self._mutual_operator_batched(P, nl)
        prec_b = prec[..., None]

        def pcg_batched(B, X0):
            def body(carry, _):
                m, r_, z_, p_ = carry
                Ap = hvp_b(p_)
                denom = jnp.sum(p_ * Ap, axis=(0, 1))        # [R]
                rz = jnp.sum(r_ * z_, axis=(0, 1))
                a = jnp.where(jnp.abs(denom) > 1e-30, rz / denom, 0.0)
                m_new = m + a * p_
                r_new = r_ - a * Ap
                z_new = prec_b * r_new
                b_ = jnp.where(
                    jnp.abs(rz) > 1e-30,
                    jnp.sum(r_new * z_new, axis=(0, 1)) / rz, 0.0,
                )
                return (m_new, r_new, z_new, z_new + b_ * p_), None

            R0 = B - hvp_b(X0)
            Z0 = prec_b * R0
            (m, _, _, _), _ = jax.lax.scan(
                body, (X0, R0, Z0, Z0), None, length=cg_iters
            )
            return m

        def warm(m0):
            return (zeros if m0 is None
                    else jax.lax.stop_gradient(m0.astype(P.dtype)))

        M = jax.lax.stop_gradient(
            pcg_batched(
                jnp.stack([b_d, b_p], axis=-1),
                jnp.stack([warm(m0_d), warm(m0_p)], axis=-1),
            )
        )
        m_d, m_p = M[..., 0], M[..., 1]

        # Quadratic F makes gradF(m_d) = g0 + A(m_d) with A the explicit
        # mutual operator, and m_d.gp = pcorr(m_d) (pcorr is linear), so
        #   Phi = 1/2 m_d.g0 + pcorr(m_d) + 1/2 m_p.(g0 + A(m_d)).
        # Rebuilt inside jax.checkpoint over P: the outer force grad
        # recomputes the functional's pair-geometry residuals instead of
        # keeping them live next to the solver's (the un-remat'd form
        # OOM'd the 17.9k-atom box by ~0.8 GB on a 16 GB chip).
        @jax.checkpoint
        def phi_fn(P_, m_d_, m_p_):
            F_, _, pcorr_ = self._induction_functional(P_, nl)
            g0_ = jax.grad(F_)(jnp.zeros_like(m_d_))
            A_ = self._mutual_operator(P_, nl)
            return (
                0.5 * jnp.sum(m_d_ * g0_)
                + pcorr_(m_d_)
                + 0.5 * jnp.sum(m_p_ * (g0_ + A_(m_d_)))
            )

        return m_d, m_p, phi_fn(P, m_d, m_p)

    def energy_ewald_variational(self, P, nl: NeighborList, m0_d, m0_p,
                                 cg_iters: int = 12):
        """(E, (mu_d, mu_p)) with the variational induction gradient —
        the production QM/MM AMOEBA path (physics/qmmm.py); the carried
        dipole pair warm-starts the next step's solves."""
        m_d, m_p, phi = self.induction_variational(
            P, nl, cg_iters, m0_d=m0_d, m0_p=m0_p
        )
        e = (
            self.permanent_energy(P, nl)
            + units.COULOMB * phi
            + self.vdw_energy(P, nl)
        )
        return e, (jax.lax.stop_gradient(m_d), jax.lax.stop_gradient(m_p))

    def polarization_energy_ewald(self, P, nl: NeighborList,
                                  cg_iters: int = 12, m0=None):
        """Polarization energy with the full-Ewald interaction: the SCF
        minimizes the d-masked functional (F(m*) = -1/2 m.E_d) and the
        energy adds the p-vs-d cross correction so the result is AMOEBA's
        -1/2 m.E_p (the correction is exactly zero for water, nonzero for
        protein 1-2/1-3 pairs spanning polarization groups).  Gradients
        flow through the unrolled CG, so forces pick up the dm/dP term of
        the correction automatically."""
        _, fmin = self.induced_dipoles_ewald(P, nl, cg_iters, m0=m0)
        return units.COULOMB * fmin

    def energy_ewald_induction(self, P, nl: NeighborList,
                               cg_iters: int = 12, m0=None):
        return (
            self.permanent_energy(P, nl)
            + self.polarization_energy_ewald(P, nl, cg_iters, m0=m0)
            + self.vdw_energy(P, nl)
        )

    def energy_ewald_induction_warm(self, P, nl: NeighborList, m0,
                                    cg_iters: int = 12):
        """(E, mu*) for warm-carry callers: same energy as
        `energy_ewald_induction(..., m0=m0)` plus the converged dipoles
        to thread into the next step's warm start."""
        m, fmin = self.induced_dipoles_ewald(P, nl, cg_iters, m0=m0)
        e = (
            self.permanent_energy(P, nl)
            + units.COULOMB * fmin
            + self.vdw_energy(P, nl)
        )
        return e, jax.lax.stop_gradient(m)

    # ------------------------------------------------------------------
    def _vdw_pair(self, r, rm_i, rm_j, ep_i, ep_j):
        r0 = (rm_i**3 + rm_j**3) / jnp.maximum(rm_i**2 + rm_j**2, 1e-12)
        se = jnp.sqrt(ep_i) + jnp.sqrt(ep_j)
        eps = 4.0 * ep_i * ep_j / jnp.maximum(se * se, 1e-12)
        rho = r / jnp.maximum(r0, 1e-12)
        f1 = (1.07 / (rho + 0.07)) ** 7
        f2 = 1.12 / (rho**7 + 0.12) - 2.0
        e = eps * f1 * f2
        rho_c = self.cutoff / jnp.maximum(r0, 1e-12)
        e_cut = eps * (1.07 / (rho_c + 0.07)) ** 7 * (
            1.12 / (rho_c**7 + 0.12) - 2.0
        )
        return e - e_cut

    def _vdw_packed(self, P):
        """[N,8]: reduced sites (3), rmin, eps, pad — one gather for vdW."""
        red = self.vdw_red[:, None].astype(P.dtype)
        sites = P[self.heavy_of] + red * (P - P[self.heavy_of])
        return jnp.concatenate(
            [
                sites,
                self.vdw_rmin[:, None].astype(P.dtype),
                self.vdw_eps[:, None].astype(P.dtype),
            ],
            axis=-1,
        )

    def vdw_energy(self, P, nl: NeighborList):
        vm = self._vdw_packed(P)
        Vj = vm[nl.idx]                            # [N,K,5]
        dx = _minimum_image(Vj[..., 0] - vm[:, None, 0], self.cell[0])
        dy = _minimum_image(Vj[..., 1] - vm[:, None, 1], self.cell[1])
        dz = _minimum_image(Vj[..., 2] - vm[:, None, 2], self.cell[2])
        r2 = dx * dx + dy * dy + dz * dz
        row = jax.lax.broadcasted_iota(jnp.int32, nl.idx.shape, 0)
        live = nl.valid & (nl.idx > row) & (r2 < self.cutoff * self.cutoff)
        r = jnp.sqrt(jnp.where(live, r2, 1.0))
        e = jnp.sum(
            jnp.where(
                live,
                self._vdw_pair(
                    r, vm[:, None, 3], Vj[..., 3], vm[:, None, 4], Vj[..., 4]
                ),
                0.0,
            )
        )
        # scaled-pair corrections (flat, 2 row gathers)
        Vi = vm[self.vx_pairs[:, 0]]
        Vx = vm[self.vx_pairs[:, 1]]
        cx = _minimum_image(Vx[:, 0] - Vi[:, 0], self.cell[0])
        cy = _minimum_image(Vx[:, 1] - Vi[:, 1], self.cell[1])
        cz = _minimum_image(Vx[:, 2] - Vi[:, 2], self.cell[2])
        rx = jnp.sqrt(cx * cx + cy * cy + cz * cz)
        within = rx < self.cutoff
        e_x = jnp.where(
            within,
            self._vdw_pair(rx, Vi[:, 3], Vx[:, 3], Vi[:, 4], Vx[:, 4]),
            0.0,
        )
        return e + jnp.sum((self.vx_scale - 1.0) * e_x)

    # ------------------------------------------------------------------
    def energy(self, P, nl: NeighborList):
        return (
            self.permanent_energy(P, nl)
            + self.polarization_energy(P, nl)
            + self.vdw_energy(P, nl)
        )

    def energy_forces(self, P, nl: NeighborList):
        e, g = jax.value_and_grad(lambda p: self.energy(p, nl))(P)
        return e, -g

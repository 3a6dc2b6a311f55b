"""Cap-hydrogen optimization: batched AMBER energy + in-graph L-BFGS.

The reference optimizes added-hydrogen positions with torch LBFGS over
jit-scripted AMBER terms (src/Fragmentation/hydrogen/energies.py:8-61 for
the terms, 211-242 for the optimizer: lr=0.1, max_iter=10,
tolerance_grad=0.1, tolerance_change=0.01).  Here both live inside the
jitted step: the energy is a fixed-shape batched tensor program over the
type-indexed topology tables, and the optimizer is a fixed-iteration
two-loop-recursion L-BFGS (same step rules as torch: first step scaled by
min(1, 1/|g|_1)*lr, then lr) applied to the cap coordinates only via a
free-coordinate mask.  Fixed iteration count keeps one compiled program;
the reference's tolerances are loose enough that extra iterations only
improve the caps.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ai2bmd_tpu.frag.topology import TypeTopology


@dataclasses.dataclass
class HydrogenTables:
    """Device-side (jnp) stacked topology + per-row lookups."""

    tables: dict            # stacked [T, ...] arrays (jnp)
    type_id: Any            # [R] int32
    free: Any               # [R, S, 1] float mask over cap coordinates
    scee: float
    scnb: float
    fused: Any = None       # CapKernelTables: fused analytic-gradient
    #                         Pallas kernel — DEFAULT-ON on TPU (measured
    #                         r4: 8.91 -> 8.51 ms/step chig); opt out with
    #                         AI2BMD_FUSED_CAPS=0
    row_tables: Any = None  # pre-gathered per-row tables (static type_id
    #                         only; None when type_id is a traced shard)

    @classmethod
    def build(cls, top: TypeTopology, row_prmtop: list[str], is_cap: np.ndarray):
        import os

        tables = {
            k: jnp.asarray(getattr(top, k))
            for k in (
                "bond_ij", "bond_k", "bond_r0",
                "angle_ijk", "angle_k", "angle_t0",
                "dih_ijkl", "dih_k", "dih_n", "dih_phase",
                "nb_ij", "nb_acoef", "nb_bcoef", "nb_qq", "nb_mask",
            )
        }
        type_id = top.type_ids(row_prmtop)
        fused = None
        env = os.environ.get("AI2BMD_FUSED_CAPS")
        if env != "0":
            # default-on on TPU (Mosaic-only kernel); "1" forces the build
            # regardless of backend (interpret-mode tests build the tables
            # directly), "0" opts out
            try:
                import jax as _jax

                on_tpu = _jax.devices()[0].platform == "tpu"
            except RuntimeError:
                on_tpu = False
            if on_tpu or env == "1":
                from ai2bmd_tpu.ops.pallas.caps import CapKernelTables

                fused = CapKernelTables.build(
                    tables, type_id, S=is_cap.shape[1],
                    scee=top.scee, scnb=top.scnb,
                )
        ht = cls(
            tables=tables,
            type_id=jnp.asarray(type_id),
            free=jnp.asarray(is_cap[..., None].astype(np.float32)),
            scee=top.scee,
            scnb=top.scnb,
            fused=fused,
        )
        # type_id is static per system: pre-gather the per-row tables once
        # instead of re-gathering inside every energy evaluation
        ht.row_tables = jax.tree.map(lambda t: t[ht.type_id], tables)
        return ht


def _safe_norm(v, axis=-1, eps=1e-12):
    d2 = jnp.sum(v * v, axis=axis)
    nz = d2 > eps
    return jnp.where(nz, jnp.sqrt(jnp.where(nz, d2, 1.0)), 0.0)


def _safe_unit(v, axis=-1, eps=1e-12):
    d2 = jnp.sum(v * v, axis=axis, keepdims=True)
    nz = d2 > eps
    return v * jnp.where(nz, jax.lax.rsqrt(jnp.where(nz, d2, 1.0)), 0.0)


def amber_row_energy(tab: dict, pos: jnp.ndarray, scee: float, scnb: float):
    """AMBER energy of one dipeptide row (pos [S, 3]) in kcal/mol.

    Terms exactly as the reference's jit kernels (energies.py:8-61):
    0.5*k(r-r0)^2 bonds, 0.5*k(th-th0)^2 angles (atan2 form),
    0.5*k(1+cos(n*phi-psi)) dihedrals, (A/r12-B/r6)/scnb, (qq/r)/scee.
    """
    # bonds
    bi, bj = tab["bond_ij"][:, 0], tab["bond_ij"][:, 1]
    r = _safe_norm(pos[bi] - pos[bj])
    e_bond = 0.5 * jnp.sum(tab["bond_k"] * (r - tab["bond_r0"]) ** 2)

    # angles: theta = atan2(|v0 x v1|, v0.v1)
    ai, aj, ak = (tab["angle_ijk"][:, c] for c in range(3))
    v0 = pos[ai] - pos[aj]
    v1 = pos[ak] - pos[aj]
    y = _safe_norm(jnp.cross(v0, v1))
    x = jnp.sum(v0 * v1, axis=-1)
    ok = (x * x + y * y) > 1e-12
    theta = jnp.arctan2(jnp.where(ok, y, 0.0), jnp.where(ok, x, 1.0))
    e_angle = 0.5 * jnp.sum(tab["angle_k"] * (theta - tab["angle_t0"]) ** 2)

    # proper dihedrals
    di, dj, dk, dl = (tab["dih_ijkl"][:, c] for c in range(4))
    p0, p1, p2, p3 = pos[di], pos[dj], pos[dk], pos[dl]
    v0 = p1 - p2
    v1 = p1 - p0
    v2 = p3 - p2
    n1 = _safe_unit(jnp.cross(v1, v0))
    n2 = _safe_unit(jnp.cross(v0, v2))
    m1 = jnp.cross(n1, _safe_unit(v0))
    x = jnp.sum(n1 * n2, axis=-1)
    y = jnp.sum(m1 * n2, axis=-1)
    ok = (x * x + y * y) > 1e-12
    phi = jnp.arctan2(jnp.where(ok, y, 0.0), jnp.where(ok, x, 1.0))
    e_dih = 0.5 * jnp.sum(
        tab["dih_k"] * (1.0 + jnp.cos(tab["dih_n"] * phi - tab["dih_phase"]))
    )

    # nonbonded (exclusion complement)
    ni, nj = tab["nb_ij"][:, 0], tab["nb_ij"][:, 1]
    mask = tab["nb_mask"]
    d = _safe_norm(pos[ni] - pos[nj])
    d_safe = jnp.where(mask, jnp.maximum(d, 1e-6), 1.0)
    inv6 = d_safe**-6
    e_vdw = jnp.sum(mask * (tab["nb_acoef"] * inv6 * inv6 - tab["nb_bcoef"] * inv6)) / scnb
    e_el = jnp.sum(mask * tab["nb_qq"] / d_safe) / scee

    return e_bond + e_angle + e_dih + e_vdw + e_el


def amber_energy(ht: HydrogenTables, pos: jnp.ndarray) -> jnp.ndarray:
    """Total AMBER energy over all rows; pos [R, S, 3] -> scalar."""
    row_tabs = getattr(ht, "row_tables", None)
    if row_tabs is None:
        row_tabs = jax.tree.map(lambda t: t[ht.type_id], ht.tables)
    e = jax.vmap(lambda tab, p: amber_row_energy(tab, p, ht.scee, ht.scnb))(
        row_tabs, pos
    )
    return jnp.sum(e)


def optimize_caps(
    ht: HydrogenTables,
    pos: jnp.ndarray,
    n_iter: int = 10,
    lr: float = 0.1,
    axis_name: str | None = None,
) -> jnp.ndarray:
    """L-BFGS over cap-H coordinates; fixed n_iter, history = n_iter.

    The optimization is JOINT over all rows (like the reference's one torch
    LBFGS over the whole batch): the two-loop recursion's inner products
    couple every row.  When the rows are sharded over a mesh axis, pass
    `axis_name` — every scalar reduction is then psum'd so each shard walks
    exactly the same iterates as the joint single-device solve.
    """
    if n_iter == 0:
        return pos
    shape = pos.shape
    free = jnp.broadcast_to(ht.free, shape).reshape(-1)

    def gsum(x):
        return jax.lax.psum(x, axis_name) if axis_name is not None else x

    def vdot(a, b):
        return gsum(jnp.vdot(a, b))

    def egrad(x):
        p = x.reshape(shape)
        if ht.fused is not None:
            from ai2bmd_tpu.ops.pallas.caps import amber_grad_rows

            g = amber_grad_rows(ht.fused, p).reshape(-1)
        else:
            g = jax.grad(lambda p_: amber_energy(ht, p_))(p).reshape(-1)
        return g * free

    # statically unrolled (n_iter is small and fixed): the gradient after
    # the FINAL step is never used to move x, so it is not computed —
    # n_iter=1 (the warm-start production default) costs a single
    # energy+grad evaluation instead of two.  Iterates are identical to
    # the previous fori_loop version.
    def two_loop(g, s_hist, y_hist, rho_hist, gamma):
        q = g
        alphas = []
        for s, y, rho in zip(reversed(s_hist), reversed(y_hist),
                             reversed(rho_hist)):
            al = rho * vdot(s, q)
            q = q - al * y
            alphas.append(al)
        alphas = alphas[::-1]
        r = gamma * q
        for s, y, rho, al in zip(s_hist, y_hist, rho_hist, alphas):
            be = rho * vdot(y, r)
            r = r + s * (al - be)
        return -r

    x = pos.reshape(-1)
    g = egrad(x)
    s_hist, y_hist, rho_hist = [], [], []
    gamma = jnp.asarray(1.0, pos.dtype)
    for k in range(n_iter):
        if k == 0:
            d = -g
            t = jnp.minimum(
                1.0, 1.0 / jnp.maximum(gsum(jnp.sum(jnp.abs(g))), 1e-10)
            ) * lr
        else:
            d = two_loop(g, s_hist, y_hist, rho_hist, gamma)
            t = lr
        x_new = x + t * d
        if k == n_iter - 1:
            x = x_new
            break
        g_new = egrad(x_new)
        y = g_new - g
        s = t * d
        ys = vdot(y, s)
        ok = ys > 1e-10
        okf = ok.astype(pos.dtype)
        # curvature-gated history (masked updates keep shapes static)
        s_hist.append(s * okf)
        y_hist.append(y * okf)
        rho_hist.append(jnp.where(ok, 1.0 / jnp.where(ok, ys, 1.0), 0.0))
        gamma = jnp.where(
            ok, ys / jnp.maximum(vdot(y, y), 1e-10), gamma
        )
        x, g = x_new, g_new
    return x.reshape(shape)

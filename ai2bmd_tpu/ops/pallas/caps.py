"""Pallas TPU kernel: fused cap-hydrogen AMBER gradient.

The warm cap optimization costs ~1.0 ms of the 8.9 ms chig step
(ROADMAP perf item: cap-optimizer fusion).  Each L-BFGS iteration is one
energy+gradient evaluation of the 5 AMBER terms (reference
src/Fragmentation/hydrogen/energies.py:8-61) over ~600 terms/row — a
few thousand scalar operations total, i.e. purely fusion/launch bound:
XLA emits separate gather / term-math / scatter-add fusions per term
type and per transpose.  This kernel evaluates ALL terms and their
ANALYTIC gradient for one dipeptide row per grid step, entirely in
VMEM, with term-endpoint gathers and the force scatter expressed as
one-hot matmuls (MXU-shaped, no dynamic indexing).

No custom VJP is needed: every production caller wraps the cap
optimizer in stop_gradient (frag/runtime.py, parallel/sharding.py), so
the kernel only ever runs in the forward direction and returns dE/dpos
directly.

Layout (per row r of R; S = slot count, multiple of 8):
  posT8    [R, 8, S]      rows 0-2 = x/y/z, rows 3-7 zero
  sel_*    [R, S, Xp]     one-hot endpoint selectors, Xp = terms padded
                          to a lane multiple of 128 (static per system)
  coef_*   [R, 8, Xp]     per-term coefficient planes (see build)
  out gT   [R, 8, S]      dE/dpos in the same transposed layout

Gather:  gathered [8, Xp] = posT8 @ sel   (contract S)
Scatter: gT [8, S] += f_term [8, Xp] @ sel^T (contract Xp)

Status: parity-tested against jax.grad of the jnp energy in interpret
mode (tests/test_fused_caps.py); OPT-IN via AI2BMD_FUSED_CAPS=1 until
measured on a real chip (the TPU tunnel was down when this landed).
"""

from __future__ import annotations

import dataclasses


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_lanes(n: int) -> int:
    return max(128, ((n + 127) // 128) * 128)


@dataclasses.dataclass
class CapKernelTables:
    """Static per-system one-hot selectors + coefficient planes (jnp)."""

    S: int
    sizes: dict                     # role -> padded term count
    sel: dict                       # role -> [R, S, Xp] f32 one-hot
    coef: dict                      # kind -> [R, 8, Xp] f32
    interpret: bool = False

    @classmethod
    def build(cls, tables: dict, type_id: np.ndarray, S: int,
              scee: float, scnb: float, interpret: bool = False):
        """tables: the stacked [T, ...] HydrogenTables arrays (host/np).
        type_id [R].  Coefficient planes fold the 1/scee, 1/scnb scaling
        so the kernel needs no scalars."""
        t = {k: np.asarray(v) for k, v in tables.items()}
        tid = np.asarray(type_id)
        R = len(tid)

        NB = t["bond_ij"].shape[1]
        NA = t["angle_ijk"].shape[1]
        ND = t["dih_ijkl"].shape[1]
        NP = t["nb_ij"].shape[1]
        NBp, NAp, NDp, NPp = map(_pad_lanes, (NB, NA, ND, NP))

        def onehot(idx_rows, Xp):
            """idx_rows [R, X] -> [R, S, Xp] one-hot (column j selects
            atom idx_rows[r, j]); padding columns select nothing."""
            R_, X = idx_rows.shape
            out = np.zeros((R_, S, Xp), np.float32)
            r = np.repeat(np.arange(R_), X)
            x = np.tile(np.arange(X), R_)
            out[r, idx_rows.reshape(-1), x] = 1.0
            return out

        sel = {}
        sel["b_i"] = onehot(t["bond_ij"][tid, :, 0], NBp)
        sel["b_j"] = onehot(t["bond_ij"][tid, :, 1], NBp)
        for c, name in enumerate(("a_i", "a_j", "a_k")):
            sel[name] = onehot(t["angle_ijk"][tid, :, c], NAp)
        for c in range(4):
            sel[f"d_{c}"] = onehot(t["dih_ijkl"][tid, :, c], NDp)
        sel["n_i"] = onehot(t["nb_ij"][tid, :, 0], NPp)
        sel["n_j"] = onehot(t["nb_ij"][tid, :, 1], NPp)

        def plane(Xp, *rows):
            out = np.zeros((R, 8, Xp), np.float32)
            for c, v in enumerate(rows):
                out[:, c, : v.shape[1]] = v
            return out

        live_b = (t["bond_k"][tid] != 0.0).astype(np.float32)
        live_a = (t["angle_k"][tid] != 0.0).astype(np.float32)
        live_d = (t["dih_k"][tid] != 0.0).astype(np.float32)
        # Mosaic has no atan2/sin lowering; the kernel computes
        # sin(n*phi - phase) from cos(phi)/sin(phi) by Chebyshev recurrence,
        # which needs integer periodicities and the phase as (cos, sin)
        dn = t["dih_n"]
        assert np.all(dn == np.round(dn)) and np.all(dn <= 6.0), (
            "dihedral periodicities must be integers <= 6"
        )
        coef = {
            "bond": plane(NBp, t["bond_k"][tid], t["bond_r0"][tid], live_b),
            "angle": plane(NAp, t["angle_k"][tid], t["angle_t0"][tid], live_a),
            "dih": plane(
                NDp, t["dih_k"][tid], t["dih_n"][tid],
                np.cos(t["dih_phase"][tid]), np.sin(t["dih_phase"][tid]),
                live_d,
            ),
            "nb": plane(
                NPp,
                t["nb_acoef"][tid] / scnb,
                t["nb_bcoef"][tid] / scnb,
                t["nb_qq"][tid] / scee,
                t["nb_mask"][tid].astype(np.float32),
            ),
        }
        return cls(
            S=S,
            sizes={"b": NBp, "a": NAp, "d": NDp, "n": NPp},
            sel={k: jnp.asarray(v) for k, v in sel.items()},
            coef={k: jnp.asarray(v) for k, v in coef.items()},
            interpret=interpret,
        )


_EPS = 1e-12


def _atan_01(x):
    """arctan for x in [0, 1] (Cephes single-precision polynomial with one
    range reduction at tan(pi/8); max error ~1e-7 rad).  Mosaic lowers no
    inverse-trig primitives, so the kernel carries its own."""
    big = x > 0.4142135623730951
    xr = jnp.where(big, (x - 1.0) / (x + 1.0), x)
    z = xr * xr
    p = (
        ((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1)
        * z
        - 3.33329491539e-1
    ) * z * xr + xr
    return jnp.where(big, p + 0.7853981633974483, p)


def _atan2_upper(y, x):
    """atan2(y, x) for y >= 0: result in [0, pi]."""
    ax = jnp.abs(x)
    mx = jnp.maximum(y, ax)
    mn = jnp.minimum(y, ax)
    t = _atan_01(mn / jnp.maximum(mx, _EPS))
    t = jnp.where(y > ax, 1.5707963267948966 - t, t)
    return jnp.where(x < 0.0, 3.141592653589793 - t, t)


def _kernel(pos_ref, sb_i, sb_j, sa_i, sa_j, sa_k, sd_0, sd_1, sd_2, sd_3,
            sn_i, sn_j, cb, ca, cd, cn, out_ref):
    g = pos_ref[0]                                   # [8, S]

    def take(sel_ref):                               # [8, Xp]
        return jax.lax.dot_general(
            g, sel_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def put(f, sel_ref):                             # [8, S]
        return jax.lax.dot_general(
            f, sel_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dot3(a, b):                                  # [8,X],[8,X] -> [1,X]
        return (a[0:1] * b[0:1] + a[1:2] * b[1:2] + a[2:3] * b[2:3])

    def cross(a, b):                                 # [8,X] x [8,X]
        cx = a[1:2] * b[2:3] - a[2:3] * b[1:2]
        cy = a[2:3] * b[0:1] - a[0:1] * b[2:3]
        cz = a[0:1] * b[1:2] - a[1:2] * b[0:1]
        return jnp.concatenate(
            [cx, cy, cz, jnp.zeros_like(cx), jnp.zeros_like(cx),
             jnp.zeros_like(cx), jnp.zeros_like(cx), jnp.zeros_like(cx)],
            axis=0,
        )

    def bc(s):                                       # [1,X] -> [8,X]
        return jnp.broadcast_to(s, (8, s.shape[1]))

    out = jnp.zeros_like(g)

    # ---- bonds: E = 0.5 k (r - r0)^2 --------------------------------
    pb_i, pb_j = take(sb_i), take(sb_j)
    d = pb_i - pb_j
    r2 = dot3(d, d)
    live = cb[0][2:3]
    r = jnp.sqrt(jnp.maximum(r2, _EPS))
    k, r0 = cb[0][0:1], cb[0][1:2]
    # dE/dp_i = k (r - r0) * d / r
    s = jnp.where(live > 0.0, k * (r - r0) / r, 0.0)
    fb = bc(s) * d
    out = out + put(fb, sb_i) - put(fb, sb_j)

    # ---- angles: E = 0.5 k (theta - t0)^2, theta = atan2(|uxv|, u.v) -
    pa_i, pa_j, pa_k = take(sa_i), take(sa_j), take(sa_k)
    u = pa_i - pa_j
    v = pa_k - pa_j
    w = cross(u, v)
    c2 = dot3(w, w)
    c = jnp.sqrt(jnp.maximum(c2, _EPS))
    dt = dot3(u, v)
    theta = _atan2_upper(c, dt)
    denom = jnp.maximum(dot3(u, u) * dot3(v, v), _EPS)
    live = ca[0][2:3]
    dEdth = jnp.where(live > 0.0, ca[0][0:1] * (theta - ca[0][1:2]), 0.0)
    w_hat = w * bc(1.0 / c)
    # dtheta/du = ((v x w_hat) * dt - c * v) / (|u|^2 |v|^2)
    du = (cross(v, w_hat) * bc(dt) - v * bc(c)) * bc(1.0 / denom)
    dv = (cross(w_hat, u) * bc(dt) - u * bc(c)) * bc(1.0 / denom)
    fi = bc(dEdth) * du
    fk = bc(dEdth) * dv
    out = out + put(fi, sa_i) + put(fk, sa_k) - put(fi + fk, sa_j)

    # ---- dihedrals: E = 0.5 k (1 + cos(n phi - phase)) ---------------
    # phi convention of frag/hydrogen.py: with v0 = p1-p2, v1 = p1-p0,
    # v2 = p3-p2 it computes atan2(m1.n2, n1.n2).  In terms of
    # b1 = p1-p0, b2 = p2-p1, b3 = p3-p2, m = b1xb2, n = b2xb3 the angle
    # is phi = atan2(-y', x') with y' = (m x b2).n, x' = (m.n)|b2|, and
    # the gradients (verified against central differences of the
    # hydrogen.py formula to 1e-10):
    #   A0 = dphi/dp0 = -(|b2|/|m|^2) m
    #   A3 = dphi/dp3 = +(|b2|/|n|^2) n
    #   A1 = -(1+s1) A0 + s2 A3,  A2 = s1 A0 - (1+s2) A3
    # with s1 = (b1.b2)/|b2|^2, s2 = (b3.b2)/|b2|^2.
    p0, p1, p2, p3 = take(sd_0), take(sd_1), take(sd_2), take(sd_3)
    b1 = p1 - p0
    b2 = p2 - p1
    b3 = p3 - p2
    m = cross(b1, b2)
    nn = cross(b2, b3)
    m2 = jnp.maximum(dot3(m, m), _EPS)
    n2 = jnp.maximum(dot3(nn, nn), _EPS)
    b2l = jnp.sqrt(jnp.maximum(dot3(b2, b2), _EPS))
    y_std = dot3(cross(m, b2), nn)
    x_std = dot3(m, nn) * b2l
    kd, nd = cd[0][0:1], cd[0][1:2]
    cps, sps, live = cd[0][2:3], cd[0][3:4], cd[0][4:5]
    # sin(n*phi - phase) without inverse trig: cos(phi) = x/r,
    # sin(phi) = -y/r (phi = atan2(-y, x)); n*phi multiples by Chebyshev
    # recurrence, phase folded via precomputed (cos, sin) planes
    rphi = jnp.sqrt(jnp.maximum(y_std * y_std + x_std * x_std, _EPS))
    cphi = x_std / rphi
    sphi = -y_std / rphi
    ck, sk = cphi, sphi
    cos_n = jnp.ones_like(cphi)
    sin_n = jnp.zeros_like(sphi)
    for kk in range(1, 7):
        hit = nd == float(kk)
        cos_n = jnp.where(hit, ck, cos_n)
        sin_n = jnp.where(hit, sk, sin_n)
        if kk < 6:
            ck, sk = ck * cphi - sk * sphi, sk * cphi + ck * sphi
    sin_nphi_minus_phase = sin_n * cps - cos_n * sps
    dEdphi = jnp.where(
        live > 0.0, -0.5 * kd * nd * sin_nphi_minus_phase, 0.0
    )
    dp0 = m * bc(-b2l / m2)
    dp3 = nn * bc(b2l / n2)
    s1 = dot3(b1, b2) / jnp.maximum(dot3(b2, b2), _EPS)
    s2 = dot3(b3, b2) / jnp.maximum(dot3(b2, b2), _EPS)
    dp1 = dp0 * bc(-1.0 - s1) + dp3 * bc(s2)
    dp2 = dp0 * bc(s1) + dp3 * bc(-1.0 - s2)
    e = bc(dEdphi)
    out = (
        out + put(e * dp0, sd_0) + put(e * dp1, sd_1)
        + put(e * dp2, sd_2) + put(e * dp3, sd_3)
    )

    # ---- nonbonded: E = A/r^12 - B/r^6 + Q/r (pre-scaled), masked ----
    pn_i, pn_j = take(sn_i), take(sn_j)
    dnb = pn_i - pn_j
    r2 = dot3(dnb, dnb)
    A, B, Q, mask = cn[0][0:1], cn[0][1:2], cn[0][2:3], cn[0][3:4]
    # match hydrogen.py's d_safe = max(r, 1e-6)
    r2s = jnp.maximum(r2, 1e-12)
    inv2 = 1.0 / r2s
    inv_r = jnp.sqrt(inv2)
    inv6 = inv2 * inv2 * inv2
    # dE/dp_i = (-12 A/r^14 + 6 B/r^8 - Q/r^3) * d
    snb = jnp.where(
        mask > 0.0,
        (-12.0 * A * inv6 + 6.0 * B) * inv6 * inv2 - Q * inv_r * inv2,
        0.0,
    )
    fn = bc(snb) * dnb
    out = out + put(fn, sn_i) - put(fn, sn_j)

    out_ref[0] = out


def fused_cap_grad(ct: CapKernelTables):
    """Returns grad_fn(posT8 [R, 8, S]) -> dE/dpos [R, 8, S]."""
    roles = ("b_i", "b_j", "a_i", "a_j", "a_k",
             "d_0", "d_1", "d_2", "d_3", "n_i", "n_j")
    kinds = ("bond", "angle", "dih", "nb")
    S = ct.S

    def spec(shape):
        n = len(shape)
        return pl.BlockSpec(
            (1,) + shape, lambda r, n=n: (r,) + (0,) * n,
            memory_space=pltpu.VMEM if not ct.interpret else None,
        )

    def grad_fn(posT8):
        R = posT8.shape[0]
        sel_args = [ct.sel[k] for k in roles]
        coef_args = [ct.coef[k] for k in kinds]
        return pl.pallas_call(
            _kernel,
            grid=(R,),
            in_specs=[spec((8, S))]
            + [spec(a.shape[1:]) for a in sel_args]
            + [spec(a.shape[1:]) for a in coef_args],
            out_specs=spec((8, S)),
            out_shape=jax.ShapeDtypeStruct((R, 8, S), jnp.float32),
            interpret=ct.interpret,
        )(posT8, *sel_args, *coef_args)

    return grad_fn


def amber_grad_rows(ct: CapKernelTables, pos: jnp.ndarray) -> jnp.ndarray:
    """dE/dpos for pos [R, S, 3] via the fused kernel (same value as
    jax.grad of frag.hydrogen.amber_energy)."""
    R, S, _ = pos.shape
    posT8 = jnp.concatenate(
        [jnp.swapaxes(pos, 1, 2), jnp.zeros((R, 5, S), pos.dtype)], axis=1
    )
    gT = fused_cap_grad(ct)(posT8.astype(jnp.float32))
    return jnp.swapaxes(gT[:, :3, :], 1, 2).astype(pos.dtype)

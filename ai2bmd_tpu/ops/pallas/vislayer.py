"""Pallas TPU kernels: one COMPLETE ViS-MP layer per call (fwd + hand VJP).

Supersedes the edge-core-only kernels in vismp.py on the production path.
Per layer, everything between the residual streams runs inside one kernel:

    xn   = LayerNorm(x);  vecn = vec * w_vln          (vecnorm 'none')
    q,k,v = xn @ Wqkv;  vec1,vec2,vec3 = vecn @ Wvp;  vd = sum_c vec1*vec2
    wt, ws = vecn @ Wt, vecn @ Wsrc                    (non-last layers)
    [edge core: attention messages, gated vector aggregation — vismp.py]
    df     = silu(edge @ Wf + bf) * <wt_i, ws_j>_c * adj
    o1,o2,o3 = xagg @ Wo + bo
    x'    = x + vd*o2 + o3
    vec'  = vec + vec3*o1 + vecagg
    edge' = edge + df

vs the round-3 production path (vismp.fused_vis_mp + XLA node side) this
removes, per layer and direction: the zdkv/zs/zf saved-activation stash
([B,A,A,5H] ~80 MB/layer on Chignolin written fwd + read bwd), the df
round trip (edge' is written in-kernel), and every XLA-side projection
residual (vec123 [B,A,S,3H], wt/ws, layernorm stats).  The backward
RECOMPUTES the forward chain in VMEM from the layer inputs (x, vec, edge
are the residual-stream values XLA already materializes — saving them
costs nothing extra).

The residual streams: x [B,A,H], vec [B,S,A,H] (SPHERE-MAJOR across the
whole stack — no per-layer transposes), edge [B,A,A,H].

Position gradients (forces) are exact; WEIGHT gradients are zero by
design — training uses the jnp path (models/visnet.py, fused=False).
MXU matmuls run in the same b3 (3-pass bf16 error-compensated) mode as
vismp.py — measured force deviation ~1e-5 eV/A vs full f32, three orders
under the 1e-3 fidelity bar (benchmarks/kernel_precision.py).

Reference hot loop this replaces: src/ViSNet/model/visnet_block.py:103-142
(the 9 x ViS_MP updates) — same math, TPU-resident execution.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ai2bmd_tpu.ops.pallas.vismp import (
    _dotT,
    _dsilu,
    _mm,
    head_pool_matrix,
)

_LN_EPS = 1e-5


def _rowbc(m, A, H):
    """[A,1] -> [A,H] without a minor-dim-1 broadcast (Mosaic quirk: lane
    dimension 1 arrays are rejected; go through a 3D broadcast+collapse)."""
    return jnp.broadcast_to(m[:, :, None], (A, 1, H)).reshape(A, H)


def _layer_norm_fwd(x, scale, bias, A, H):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - _rowbc(mu, A, H)
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _LN_EPS)
    xhat = xc * _rowbc(rstd, A, H)
    return xhat * scale + bias, xhat, rstd


def _layer_norm_bwd(xhat, rstd, scale, g_y, A, H):
    g_xhat = g_y * scale
    m1 = jnp.mean(g_xhat, axis=-1, keepdims=True)
    m2 = jnp.mean(g_xhat * xhat, axis=-1, keepdims=True)
    return _rowbc(rstd, A, H) * (
        g_xhat - _rowbc(m1, A, H) - xhat * _rowbc(m2, A, H)
    )


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, vec_ref, edge_ref, dsh_ref, dist_ref, adj_ref,
                lns_ref, lnb_ref, vlnw_ref, wqkv_ref, bqkv_ref, wvp_ref,
                wdkv_ref, bdkv_ref, ws_ref, bs_ref, wo_ref, bo_ref,
                wt_ref, wsrc_ref, wf_ref, bf_ref, pool_ref,
                x2_ref, vec2_ref, edge2_ref, xagg_ref,
                s_q, s_k, s_v, s_vecn, s_vec3, s_vdot, s_wt, s_ws,
                s_xagg, s_vecagg,
                *, TI, A, H, nh, S, cutoff, last):
    f32 = jnp.float32
    E = TI * A
    it = pl.program_id(1)
    nit = pl.num_programs(1)
    rows = pl.ds(it * TI, TI)

    def ebc(m2):   # [TI,A] pair scalar -> [E,H]
        return jnp.broadcast_to(m2[:, :, None], (TI, A, H)).reshape(E, H)

    def ibc(m):    # [TI,H] center -> [E,H]
        return jnp.broadcast_to(m[:, None, :], (TI, A, H)).reshape(E, H)

    def jbc(m):    # [A,H] source -> [E,H]
        return jnp.broadcast_to(m[None, :, :], (TI, A, H)).reshape(E, H)

    # ---- node-side projections, once per fragment ----
    @pl.when(it == 0)
    def _node():
        x = x_ref[0]
        xn, _, _ = _layer_norm_fwd(x, lns_ref[...], lnb_ref[...], A, H)
        qkv = _mm(xn, wqkv_ref[...]) + bqkv_ref[...]
        s_q[...] = qkv[:, :H]
        s_k[...] = qkv[:, H:2 * H]
        s_v[...] = qkv[:, 2 * H:]
        vecn = vec_ref[0] * vlnw_ref[...]          # [S,A,H]
        s_vecn[...] = vecn
        v123 = _mm(vecn.reshape(S * A, H), wvp_ref[...]).reshape(S, A, 3 * H)
        s_vdot[...] = jnp.sum(v123[:, :, :H] * v123[:, :, H:2 * H], axis=0)
        s_vec3[...] = v123[:, :, 2 * H:]
        if not last:
            s_wt[...] = _mm(
                vecn.reshape(S * A, H), wt_ref[...]
            ).reshape(S, A, H)
            s_ws[...] = _mm(
                vecn.reshape(S * A, H), wsrc_ref[...]
            ).reshape(S, A, H)

    # ---- edge core for this i-block ----
    edge = edge_ref[0].reshape(E, H)
    dkv = jax.nn.silu(_mm(edge, wdkv_ref[...]) + bdkv_ref[...])
    dk = dkv[:, :H]
    dv = dkv[:, H:]
    q_e = ibc(s_q[rows, :])
    k_e = jbc(s_k[...])
    v_e = jbc(s_v[...])
    pool = pool_ref[...]
    attn = jax.nn.silu(_mm(q_e * k_e * dk, pool))
    attn_full = _mm(attn, pool.T)
    dist = dist_ref[0]
    cut2 = 0.5 * (jnp.cos(dist * (math.pi / cutoff)) + 1.0) * (dist < cutoff)
    adj = adj_ref[0]
    gate = ebc(cut2 * adj)
    v_ij = v_e * dv * (attn_full * gate)
    s = jax.nn.silu(_mm(v_ij, ws_ref[...]) + bs_ref[...])
    adj_e = ebc(adj)
    s1 = s[:, :H] * adj_e
    s2 = s[:, H:] * adj_e

    s_xagg[rows, :] = jnp.sum(v_ij.reshape(TI, A, H), axis=1)
    dsh = dsh_ref[0]                               # [S,TI,A]
    for c in range(S):
        contrib = s1 * jbc(s_vecn[c]) + s2 * ebc(dsh[c])
        s_vecagg[c, rows, :] = jnp.sum(contrib.reshape(TI, A, H), axis=1)

    if last:
        edge2_ref[0] = edge.reshape(TI, A, H).astype(edge2_ref.dtype)
    else:
        zf = _mm(edge, wf_ref[...]) + bf_ref[...]
        f_out = jax.nn.silu(zf)
        S_e = jnp.zeros((E, H), f32)
        for c in range(S):
            S_e = S_e + ibc(s_wt[c, rows, :]) * jbc(s_ws[c])
        df = f_out * S_e * adj_e
        edge2_ref[0] = (edge + df).reshape(TI, A, H).astype(edge2_ref.dtype)

    # ---- node update, once per fragment ----
    @pl.when(it == nit - 1)
    def _update():
        o123 = _mm(s_xagg[...], wo_ref[...]) + bo_ref[...]
        o1 = o123[:, :H]
        o2 = o123[:, H:2 * H]
        o3 = o123[:, 2 * H:]
        x2_ref[0] = (x_ref[0] + s_vdot[...] * o2 + o3).astype(x2_ref.dtype)
        vec2_ref[0] = (
            vec_ref[0] + s_vec3[...] * o1[None, :, :] + s_vecagg[...]
        ).astype(vec2_ref.dtype)
        xagg_ref[0] = s_xagg[...].astype(xagg_ref.dtype)


# ---------------------------------------------------------------------------
# backward kernel (recompute mode)
# ---------------------------------------------------------------------------

def _bwd_kernel(x_ref, vec_ref, edge_ref, dsh_ref, dist_ref, adj_ref,
                lns_ref, lnb_ref, vlnw_ref, wqkv_ref, bqkv_ref, wvp_ref,
                wdkv_ref, bdkv_ref, ws_ref, bs_ref, wo_ref, bo_ref,
                wt_ref, wsrc_ref, wf_ref, bf_ref, pool_ref, xagg_ref,
                gx2_ref, gvec2_ref, gedge2_ref,
                gx_ref, gvec_ref, gedge_ref, gdsh_ref, gdist_ref,
                s_q, s_k, s_v, s_vecn, s_v123, s_vdot, s_wt, s_ws,
                s_o12, s_gxagg, s_gq, s_gk, s_gv, s_gvecn, s_gwt, s_gwsrc,
                *, TI, A, H, nh, S, cutoff, last):
    f32 = jnp.float32
    E = TI * A
    it = pl.program_id(1)
    nit = pl.num_programs(1)
    rows = pl.ds(it * TI, TI)

    def ebc(m2):
        return jnp.broadcast_to(m2[:, :, None], (TI, A, H)).reshape(E, H)

    def ibc(m):
        return jnp.broadcast_to(m[:, None, :], (TI, A, H)).reshape(E, H)

    def jbc(m):
        return jnp.broadcast_to(m[None, :, :], (TI, A, H)).reshape(E, H)

    # ---- node-side recompute + node-update backward, once per fragment ----
    @pl.when(it == 0)
    def _node():
        x = x_ref[0]
        xn, _, _ = _layer_norm_fwd(x, lns_ref[...], lnb_ref[...], A, H)
        qkv = _mm(xn, wqkv_ref[...]) + bqkv_ref[...]
        s_q[...] = qkv[:, :H]
        s_k[...] = qkv[:, H:2 * H]
        s_v[...] = qkv[:, 2 * H:]
        vecn = vec_ref[0] * vlnw_ref[...]
        s_vecn[...] = vecn
        v123 = _mm(vecn.reshape(S * A, H), wvp_ref[...]).reshape(S, A, 3 * H)
        s_v123[...] = v123
        s_vdot[...] = jnp.sum(v123[:, :, :H] * v123[:, :, H:2 * H], axis=0)
        if not last:
            s_wt[...] = _mm(
                vecn.reshape(S * A, H), wt_ref[...]
            ).reshape(S, A, H)
            s_ws[...] = _mm(
                vecn.reshape(S * A, H), wsrc_ref[...]
            ).reshape(S, A, H)

        o123 = _mm(xagg_ref[0], wo_ref[...]) + bo_ref[...]
        o1 = o123[:, :H]
        o2 = o123[:, H:2 * H]
        s_o12[...] = jnp.concatenate([o1, o2], axis=1)

        # node-update backward: x' = x + vd*o2 + o3; vec' = vec + vec3*o1 + va
        g_dx = gx2_ref[0]
        gvec2 = gvec2_ref[0]
        vec3 = v123[:, :, 2 * H:]
        g_o1 = jnp.sum(gvec2 * vec3, axis=0)
        g_o2 = g_dx * s_vdot[...]
        g_o3 = g_dx
        s_gxagg[...] = _dotT(
            jnp.concatenate([g_o1, g_o2, g_o3], axis=1), wo_ref[...]
        )
        s_gk[...] = jnp.zeros((A, H), f32)
        s_gv[...] = jnp.zeros((A, H), f32)
        s_gvecn[...] = jnp.zeros((S, A, H), f32)
        if not last:
            s_gwsrc[...] = jnp.zeros((S, A, H), f32)

    # ---- edge-core forward recompute for this i-block ----
    edge = edge_ref[0].reshape(E, H)
    zdkv = _mm(edge, wdkv_ref[...]) + bdkv_ref[...]
    dkv = jax.nn.silu(zdkv)
    dk = dkv[:, :H]
    dv = dkv[:, H:]
    q_e = ibc(s_q[rows, :])
    k_e = jbc(s_k[...])
    v_e = jbc(s_v[...])
    pool = pool_ref[...]
    p = q_e * k_e * dk
    a = _mm(p, pool)
    attn_full = _mm(jax.nn.silu(a), pool.T)
    dist = dist_ref[0]
    inside = (dist < cutoff).astype(f32)
    cut = 0.5 * (jnp.cos(dist * (math.pi / cutoff)) + 1.0) * inside
    adj = adj_ref[0]
    gate = ebc(cut * adj)
    g3 = attn_full * gate
    v_ij = v_e * dv * g3
    zs = _mm(v_ij, ws_ref[...]) + bs_ref[...]
    s = jax.nn.silu(zs)
    adj_e = ebc(adj)
    s1 = s[:, :H] * adj_e
    s2 = s[:, H:] * adj_e

    # ---- message backward ----
    g_s1 = jnp.zeros((E, H), f32)
    g_s2 = jnp.zeros((E, H), f32)
    for c in range(S):
        gvc = ibc(gvec2_ref[0, c, rows, :])        # g_vecagg rows == g_dvec
        g_s1 = g_s1 + gvc * jbc(s_vecn[c])
        g_s2 = g_s2 + gvc * ebc(dsh_ref[0, c])
        s_gvecn[c] = s_gvecn[c] + (s1 * gvc).reshape(TI, A, H).sum(axis=0)
        gdsh_ref[0, c] = (
            (gvc * s2).reshape(TI, A, H).sum(axis=-1)
        ).astype(gdsh_ref.dtype)

    g_s = jnp.concatenate([g_s1 * adj_e, g_s2 * adj_e], axis=1) * _dsilu(zs)
    g_vij = _dotT(g_s, ws_ref[...]) + ibc(s_gxagg[rows, :])

    s_gv[...] = s_gv[...] + (g_vij * dv * g3).reshape(TI, A, H).sum(axis=0)
    g_dv = g_vij * v_e * g3
    g_g3 = g_vij * v_e * dv

    g_attn_full = g_g3 * gate
    g_cut = (g_g3 * attn_full).reshape(TI, A, H).sum(axis=-1) * adj
    dcut = -0.5 * (math.pi / cutoff) * jnp.sin(dist * (math.pi / cutoff)) * inside
    gdist_ref[0] = (g_cut * dcut).astype(gdist_ref.dtype)

    g_a = _mm(g_attn_full, pool) * _dsilu(a)
    g_p = _mm(g_a, pool.T)
    s_gq[rows, :] = (g_p * k_e * dk).reshape(TI, A, H).sum(axis=1)
    s_gk[...] = s_gk[...] + (g_p * q_e * dk).reshape(TI, A, H).sum(axis=0)
    g_dk = g_p * q_e * k_e

    g_dkv = jnp.concatenate([g_dk, g_dv], axis=1) * _dsilu(zdkv)
    g_edge = _dotT(g_dkv, wdkv_ref[...])

    # ---- edge-update backward (df = silu(zf) * <wt_i, ws_j>_c * adj) ----
    if not last:
        g_df = gedge2_ref[0].reshape(E, H)          # edge' = edge + df
        zf = _mm(edge, wf_ref[...]) + bf_ref[...]
        fo = jax.nn.silu(zf)
        S_e = jnp.zeros((E, H), f32)
        for c in range(S):
            S_e = S_e + ibc(s_wt[c, rows, :]) * jbc(s_ws[c])
        g_dfm = g_df * adj_e
        g_fo = g_dfm * S_e
        g_Sij = g_dfm * fo
        for c in range(S):
            s_gwt[c, rows, :] = (
                (g_Sij * jbc(s_ws[c])).reshape(TI, A, H).sum(axis=1)
            )
            s_gwsrc[c] = s_gwsrc[c] + (
                (g_Sij * ibc(s_wt[c, rows, :])).reshape(TI, A, H).sum(axis=0)
            )
        g_edge = g_edge + _dotT(g_fo * _dsilu(zf), wf_ref[...])
        g_edge = g_edge + g_df                      # residual passthrough
    gedge_ref[0] = g_edge.reshape(TI, A, H).astype(gedge_ref.dtype)

    # ---- projection + norm backward, once per fragment ----
    @pl.when(it == nit - 1)
    def _back_node():
        g_qkv = jnp.concatenate([s_gq[...], s_gk[...], s_gv[...]], axis=1)
        g_xn = _dotT(g_qkv, wqkv_ref[...])
        x = x_ref[0]
        _, xhat, rstd = _layer_norm_fwd(x, lns_ref[...], lnb_ref[...], A, H)
        gx_ref[0] = (
            gx2_ref[0]
            + _layer_norm_bwd(xhat, rstd, lns_ref[...], g_xn, A, H)
        ).astype(gx_ref.dtype)

        o12 = s_o12[...]
        o1 = o12[:, :H]
        o2 = o12[:, H:]
        g_vdot = gx2_ref[0] * o2
        v123 = s_v123[...]
        vec1 = v123[:, :, :H]
        vec2 = v123[:, :, H:2 * H]
        g_v123 = jnp.concatenate(
            [
                g_vdot[None, :, :] * vec2,
                g_vdot[None, :, :] * vec1,
                gvec2_ref[0] * o1[None, :, :],
            ],
            axis=2,
        )                                            # [S,A,3H]
        g_vecn = s_gvecn[...] + _dotT(
            g_v123.reshape(S * A, 3 * H), wvp_ref[...]
        ).reshape(S, A, H)
        if not last:
            g_vecn = g_vecn + _dotT(
                s_gwt[...].reshape(S * A, H), wt_ref[...]
            ).reshape(S, A, H)
            g_vecn = g_vecn + _dotT(
                s_gwsrc[...].reshape(S * A, H), wsrc_ref[...]
            ).reshape(S, A, H)
        gvec_ref[0] = (
            gvec2_ref[0] + g_vecn * vlnw_ref[...]
        ).astype(gvec_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _wspecs(H, nh):
    """BlockSpecs for the per-layer weights (constant across the grid)."""

    def pspec(shape):
        n = len(shape)
        return pl.BlockSpec(shape, lambda b, i, n=n: (0,) * n,
                            memory_space=pltpu.VMEM)

    return [
        pspec((H,)), pspec((H,)), pspec((H,)),        # ln_s, ln_b, vln_w
        pspec((H, 3 * H)), pspec((3 * H,)),           # Wqkv, bqkv
        pspec((H, 3 * H)),                            # Wvp
        pspec((H, 2 * H)), pspec((2 * H,)),           # Wdkv, bdkv
        pspec((H, 2 * H)), pspec((2 * H,)),           # Ws, bs
        pspec((H, 3 * H)), pspec((3 * H,)),           # Wo, bo
        pspec((H, H)), pspec((H, H)),                 # Wt, Wsrc
        pspec((H, H)), pspec((H,)),                   # Wf, bf
        pspec((H, nh)),                               # pool
    ]


def _cparams(interpret: bool):
    """Raise the scoped-VMEM budget: the bwd kernel's working set is
    ~17-18 MB at A=40 (the largest dipeptide bucket), just over the 16 MB
    default compiler budget; v5e cores have far more physical VMEM."""
    if interpret:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _dspecs():
    def full(block):
        n = len(block)
        return pl.BlockSpec((1,) + block, lambda b, i, n=n: (b,) + (0,) * n,
                            memory_space=pltpu.VMEM)

    def itiled(block, axis):
        n = len(block)

        def idx(b, i, axis=axis, n=n):
            out = [0] * n
            out[axis] = i
            return (b,) + tuple(out)

        return pl.BlockSpec((1,) + block, idx, memory_space=pltpu.VMEM)

    return full, itiled


@functools.partial(
    jax.jit,
    static_argnames=("cutoff", "nh", "last", "interpret", "i_tile"),
)
def _fwd_call(x, vec, edge, d_sh_sm, dist, adj_f, weights,
              cutoff: float, nh: int, last: bool,
              interpret: bool = False, i_tile: int = 8):
    B, A, H = x.shape
    S = vec.shape[1]
    TI = min(i_tile, A)
    assert A % TI == 0
    full, itiled = _dspecs()
    kernel = functools.partial(
        _fwd_kernel, TI=TI, A=A, H=H, nh=nh, S=S, cutoff=cutoff, last=last
    )
    scratch = [
        pltpu.VMEM((A, H), jnp.float32),       # q
        pltpu.VMEM((A, H), jnp.float32),       # k
        pltpu.VMEM((A, H), jnp.float32),       # v
        pltpu.VMEM((S, A, H), jnp.float32),    # vecn
        pltpu.VMEM((S, A, H), jnp.float32),    # vec3
        pltpu.VMEM((A, H), jnp.float32),       # vec_dot
        pltpu.VMEM((S, A, H), jnp.float32),    # wt
        pltpu.VMEM((S, A, H), jnp.float32),    # ws
        pltpu.VMEM((A, H), jnp.float32),       # xagg
        pltpu.VMEM((S, A, H), jnp.float32),    # vecagg
    ]
    return pl.pallas_call(
        kernel,
        grid=(B, A // TI),
        in_specs=[
            full((A, H)),                      # x
            full((S, A, H)),                   # vec
            itiled((TI, A, H), 0),             # edge rows
            itiled((S, TI, A), 1),             # d_sh rows (sphere-major)
            itiled((TI, A), 0),                # dist rows
            itiled((TI, A), 0),                # adj rows
        ] + _wspecs(H, nh),
        out_specs=[
            full((A, H)), full((S, A, H)), itiled((TI, A, H), 0),
            full((A, H)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, A, H), x.dtype),
            jax.ShapeDtypeStruct((B, S, A, H), x.dtype),
            jax.ShapeDtypeStruct((B, A, A, H), x.dtype),
            jax.ShapeDtypeStruct((B, A, H), x.dtype),
        ],
        scratch_shapes=scratch,
        compiler_params=_cparams(interpret),
        interpret=interpret,
    )(x, vec, edge, d_sh_sm, dist, adj_f, *weights)


@functools.partial(
    jax.jit,
    static_argnames=("cutoff", "nh", "last", "interpret", "i_tile"),
)
def _bwd_call(x, vec, edge, d_sh_sm, dist, adj_f, weights, xagg,
              gx2, gvec2, gedge2,
              cutoff: float, nh: int, last: bool,
              interpret: bool = False, i_tile: int = 8):
    B, A, H = x.shape
    S = vec.shape[1]
    TI = min(i_tile, A)
    assert A % TI == 0
    full, itiled = _dspecs()
    kernel = functools.partial(
        _bwd_kernel, TI=TI, A=A, H=H, nh=nh, S=S, cutoff=cutoff, last=last
    )
    scratch = [
        pltpu.VMEM((A, H), jnp.float32),         # q
        pltpu.VMEM((A, H), jnp.float32),         # k
        pltpu.VMEM((A, H), jnp.float32),         # v
        pltpu.VMEM((S, A, H), jnp.float32),      # vecn
        pltpu.VMEM((S, A, 3 * H), jnp.float32),  # v123
        pltpu.VMEM((A, H), jnp.float32),         # vec_dot
        pltpu.VMEM((S, A, H), jnp.float32),      # wt
        pltpu.VMEM((S, A, H), jnp.float32),      # ws
        pltpu.VMEM((A, 2 * H), jnp.float32),     # o1|o2
        pltpu.VMEM((A, H), jnp.float32),         # g_xagg
        pltpu.VMEM((A, H), jnp.float32),         # g_q
        pltpu.VMEM((A, H), jnp.float32),         # g_k
        pltpu.VMEM((A, H), jnp.float32),         # g_v
        pltpu.VMEM((S, A, H), jnp.float32),      # g_vecn
        pltpu.VMEM((S, A, H), jnp.float32),      # g_wt
        pltpu.VMEM((S, A, H), jnp.float32),      # g_wsrc
    ]
    return pl.pallas_call(
        kernel,
        grid=(B, A // TI),
        in_specs=[
            full((A, H)),
            full((S, A, H)),
            itiled((TI, A, H), 0),
            itiled((S, TI, A), 1),
            itiled((TI, A), 0),
            itiled((TI, A), 0),
        ] + _wspecs(H, nh) + [
            full((A, H)),                      # xagg
            full((A, H)),                      # gx2
            full((S, A, H)),                   # gvec2
            itiled((TI, A, H), 0),             # gedge2 rows
        ],
        out_specs=[
            full((A, H)), full((S, A, H)), itiled((TI, A, H), 0),
            itiled((S, TI, A), 1), itiled((TI, A), 0),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, A, H), x.dtype),         # gx
            jax.ShapeDtypeStruct((B, S, A, H), x.dtype),      # gvec
            jax.ShapeDtypeStruct((B, A, A, H), x.dtype),      # gedge
            jax.ShapeDtypeStruct((B, S, A, A), x.dtype),      # gdsh
            jax.ShapeDtypeStruct((B, A, A), x.dtype),         # gdist
        ],
        scratch_shapes=scratch,
        compiler_params=_cparams(interpret),
        interpret=interpret,
    )(x, vec, edge, d_sh_sm, dist, adj_f, *weights, xagg, gx2, gvec2, gedge2)


@functools.lru_cache(maxsize=None)
def fused_layer(cutoff: float, nh: int, last: bool,
                interpret: bool = False, i_tile: int = 8):
    """Complete fused ViS-MP layer with a hand-written Pallas VJP.

    Returns f(x, vec, edge, d_sh_sm, dist, adj_f, *weights) ->
    (x', vec', edge') with x [B,A,H], vec [B,S,A,H] (SPHERE-MAJOR),
    edge [B,A,A,H], d_sh_sm [B,S,A,A], dist/adj_f [B,A,A].

    Weight order: see `layer_weights`.  For last=True, Wt/Wsrc/Wf/bf are
    ignored and edge' == edge (the cotangent passes straight through).

    Weight gradients are ZERO by design (MD forces differentiate positions
    only); training uses the jnp path.
    """

    def _primal(x, vec, edge, d_sh_sm, dist, adj_f, *weights):
        x2, vec2, edge2, _ = _fwd_call(
            x, vec, edge, d_sh_sm, dist, adj_f, weights,
            cutoff, nh, last, interpret=interpret, i_tile=i_tile,
        )
        return x2, vec2, edge2

    core = jax.custom_vjp(_primal)

    def fwd(x, vec, edge, d_sh_sm, dist, adj_f, *weights):
        x2, vec2, edge2, xagg = _fwd_call(
            x, vec, edge, d_sh_sm, dist, adj_f, weights,
            cutoff, nh, last, interpret=interpret, i_tile=i_tile,
        )
        return (x2, vec2, edge2), (
            x, vec, edge, d_sh_sm, dist, adj_f, weights, xagg
        )

    def bwd(res, cts):
        x, vec, edge, d_sh_sm, dist, adj_f, weights, xagg = res
        gx2, gvec2, gedge2 = cts
        gx, gvec, gedge, gdsh, gdist = _bwd_call(
            x, vec, edge, d_sh_sm, dist, adj_f, weights, xagg,
            gx2, gvec2, gedge2,
            cutoff, nh, last, interpret=interpret, i_tile=i_tile,
        )
        if last:
            # edge' == edge passthrough: gedge2 flows straight through
            gedge = gedge + gedge2
        gw = tuple(jnp.zeros_like(w) for w in weights)
        return (gx, gvec, gedge, gdsh, gdist, jnp.zeros_like(adj_f)) + gw

    core.defvjp(fwd, bwd)
    return core


def layer_weights(lp: dict, H: int, nh: int, last: bool, dtype=jnp.float32):
    """Assemble the fused-layer weight tuple from a visnet layer param dict."""
    w_qkv = jnp.concatenate(
        [lp["q_proj"]["w"], lp["k_proj"]["w"], lp["v_proj"]["w"]], axis=1
    )
    b_qkv = jnp.concatenate(
        [lp["q_proj"]["b"], lp["k_proj"]["b"], lp["v_proj"]["b"]]
    )
    w_dkv = jnp.concatenate([lp["dk_proj"]["w"], lp["dv_proj"]["w"]], axis=1)
    b_dkv = jnp.concatenate([lp["dk_proj"]["b"], lp["dv_proj"]["b"]])
    if last:
        zH = jnp.zeros((H, H), dtype)
        wt, wsrc, wf, bf = zH, zH, zH, jnp.zeros((H,), dtype)
    else:
        wt = lp["w_trg_proj"]["w"]
        wsrc = lp["w_src_proj"]["w"]
        wf = lp["f_proj"]["w"]
        bf = lp["f_proj"]["b"]
    pool = jnp.asarray(head_pool_matrix(H, nh), dtype)
    return (
        lp["layernorm"]["scale"], lp["layernorm"]["bias"],
        lp["vec_layernorm"]["weight"],
        w_qkv, b_qkv,
        lp["vec_proj"]["w"],
        w_dkv, b_dkv,
        lp["s_proj"]["w"], lp["s_proj"]["b"],
        lp["o_proj"]["w"], lp["o_proj"]["b"],
        wt, wsrc, wf, bf,
        pool,
    )

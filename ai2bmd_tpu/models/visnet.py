"""ViSNet equivariant GNN potential, TPU-native.

Reimplements the reference's ViSNet (vector-scalar interactive message
passing; arXiv:2210.16518) with identical numerics but a dense, fully
batched formulation designed for the TPU MXU:

  * fragments are padded to [B, A] (atoms) with a validity mask; all graph
    structure is a dense [B, A, A] adjacency (distance < cutoff), so there
    is no radius_graph / scatter machinery at all — every aggregation is an
    einsum contraction over the neighbor axis j
  * per-edge equivariant tensors ([B,A,A,(lmax+1)^2-1,H]) are never
    materialized: the vector message and the vector-rejection edge update
    are algebraically contracted to [B,A,A,H]-sized intermediates
  * forces come from jax.grad of the summed energy (exact, like the
    reference's autograd forces)

Numerical parity targets (reference files):
  * block assembly / defaults: src/ViSNet/model/visnet_block.py:24-142
  * ViS_MP attention message passing: visnet_block.py:145-312
  * RBF / sphere / VecLayerNorm / embeddings: src/ViSNet/model/utils.py
  * gated-equivariant output head: src/ViSNet/model/output_modules.py
  * Atomref prior, mean/std handling: priors.py, visnet.py:135-166

Known deliberate deviation: the reference caps neighbors at 32 per atom
(torch_cluster truncation in arbitrary order, visnet_block.py:56-58); we
keep all neighbors within the cutoff (fragments are <= 48 atoms, so the
dense graph is exact rather than arbitrarily truncated).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict  # nested dict pytree of jnp arrays


@dataclasses.dataclass(frozen=True)
class ViSNetConfig:
    lmax: int = 2
    hidden_channels: int = 256
    num_heads: int = 8
    num_layers: int = 9
    num_rbf: int = 32
    cutoff: float = 5.0
    max_z: int = 100
    vecnorm_type: str = "none"        # none | rms | max_min
    activation: str = "silu"
    attn_activation: str = "silu"
    reduce_op: str = "add"
    trainable_rbf: bool = False
    dtype: Any = jnp.float32
    # performance knobs (numerics-preserving unless stated)
    remat: bool = False         # rematerialize MP layers in the backward pass
    #                             (enable for very large fragment batches;
    #                             off is ~25% faster and all bundled
    #                             workloads fit comfortably in HBM)
    edge_dtype: Any = None      # e.g. jnp.bfloat16: store/compute the O(A^2)
    #                             edge tensors in half precision (geometry,
    #                             node features, reductions stay f32);
    #                             ~2x HBM traffic cut, forces shift ~1e-3
    exact_rejection: bool = False
    # exact_rejection=True evaluates the vector-rejection edge update with
    # the full |d|^2-dependent correction term.  For unit spherical-harmonic
    # features |d_sh|^2 == 2 identically (l=1 and l=2 parts are each
    # unit-norm), so the correction a_ij*b_ij*(|d|^2-2) vanishes to float
    # rounding (~1e-6 relative); the default skips those two O(B*A^2*H)
    # contractions per layer.
    fused: bool = False
    # fused=True runs each layer's O(A^2) edge core (attention messages,
    # gated vector aggregation, vector-rejection edge update) as fused
    # Pallas TPU kernels with a hand-written VJP (ops/pallas/vismp.py):
    # all edge intermediates stay in VMEM instead of streaming through HBM
    # between XLA fusions.  Position gradients (forces) are exact; WEIGHT
    # gradients are zero by design — training must use fused=False.
    # Requires exact_rejection=False and A % 8 == 0 (falls back otherwise).
    fused_interpret: bool = False   # run the kernels in interpreter mode
    #                                 (CPU correctness tests only)
    fused_layer: bool = False
    # fused_layer=True runs each COMPLETE ViS-MP layer (node projections,
    # edge core, edge update, node update, residual adds) as one Pallas
    # kernel pair with a recompute-mode hand VJP (ops/pallas/vislayer.py):
    # no saved-activation stash, no XLA-side projection residuals, the
    # vector stream stays sphere-major across the stack.  Measured ~5-10%
    # slower than the edge-core kernels on chip (r4), so it stays an
    # opt-in experiment (AI2BMD_FUSED_LAYER=1); takes precedence over
    # `fused` when its conditions hold (silu, vecnorm none, f32,
    # A % 8 == 0), falls back otherwise.  Weight gradients zero by
    # design, like `fused`.
    fused_layer_interpret: bool = False

    @property
    def n_sphere(self) -> int:
        return (self.lmax + 1) ** 2 - 1


def resolve_config(cfg: ViSNetConfig) -> ViSNetConfig:
    """Enable the fused Pallas paths automatically on TPU backends.

    The fused kernels are Mosaic-only; CPU runs (tests, multichip dryruns)
    keep the pure-jnp path.  On TPU the production default is the per-layer
    edge-core kernels (ops/pallas/vismp.py, cfg.fused); the full-layer
    kernels (ops/pallas/vislayer.py) are an opt-in experiment enabled with
    AI2BMD_FUSED_LAYER=1 (measured ~5-10% slower on chip, r4).
    No-op if the caller already set cfg.fused / cfg.fused_layer.
    """
    import os

    import jax

    if cfg.fused or cfg.fused_interpret or cfg.fused_layer or cfg.fused_layer_interpret:
        return cfg
    if os.environ.get("AI2BMD_FUSED") == "0":
        # pure-jnp oracle mode (fidelity measurements): no Pallas kernels
        return cfg
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except RuntimeError:
        on_tpu = False
    # The full-layer kernels measured ~5-10% SLOWER than the per-layer
    # edge-core kernels on chip (r4): the per-layer path is already near
    # the combined MXU+VPU roofline, and the recompute-mode backward adds
    # MXU passes that outweigh the stash traffic it avoids (which the
    # pipeline hides).  Kept as an opt-in experiment.
    full_layer = on_tpu and os.environ.get("AI2BMD_FUSED_LAYER") == "1"
    return dataclasses.replace(cfg, fused=on_tpu, fused_layer=full_layer)


def _act(name: str):
    return {
        "silu": jax.nn.silu,
        "swish": jax.nn.silu,
        "ssp": lambda x: jax.nn.softplus(x) - math.log(2.0),
        "tanh": jnp.tanh,
        "sigmoid": jax.nn.sigmoid,
    }[name]


# ---------------------------------------------------------------------------
# parameter init (matches torch defaults: xavier_uniform weights, zero bias)
# ---------------------------------------------------------------------------

def _linear_init(key, n_in, n_out, bias=True, dtype=jnp.float32):
    bound = math.sqrt(6.0 / (n_in + n_out))
    w = jax.random.uniform(key, (n_in, n_out), dtype, -bound, bound)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((n_out,), dtype)
    return p


def _linear(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def _embedding_init(key, n, dim, dtype=jnp.float32):
    return jax.random.normal(key, (n, dim), dtype)


def _rbf_init(cfg: ViSNetConfig):
    start = math.exp(-cfg.cutoff)
    means = jnp.linspace(start, 1.0, cfg.num_rbf, dtype=cfg.dtype)
    betas = jnp.full(
        (cfg.num_rbf,), (2.0 / cfg.num_rbf * (1.0 - start)) ** -2, dtype=cfg.dtype
    )
    return {"means": means, "betas": betas}


def init_params(key, cfg: ViSNetConfig) -> Params:
    H, R = cfg.hidden_channels, cfg.num_rbf
    keys = iter(jax.random.split(key, 16 + 12 * cfg.num_layers))
    p: Params = {
        "embedding": _embedding_init(next(keys), cfg.max_z, H, cfg.dtype),
        "rbf": _rbf_init(cfg),
        "neighbor_embedding": {
            "embedding": _embedding_init(next(keys), cfg.max_z, H, cfg.dtype),
            "distance_proj": _linear_init(next(keys), R, H, dtype=cfg.dtype),
            "combine": _linear_init(next(keys), 2 * H, H, dtype=cfg.dtype),
        },
        "edge_embedding": {"edge_proj": _linear_init(next(keys), R, H, dtype=cfg.dtype)},
        "layers": [],
        "out_norm": {"scale": jnp.ones((H,), cfg.dtype), "bias": jnp.zeros((H,), cfg.dtype)},
        "vec_out_norm": {"weight": jnp.ones((H,), cfg.dtype)},
        "output": {
            "block0": _geb_init(next(keys), H, H // 2, cfg),
            "block1": _geb_init(next(keys), H // 2, 1, cfg),
        },
        "atomref": jnp.zeros((cfg.max_z, 1), cfg.dtype),
        "mean": jnp.zeros((), cfg.dtype),
        "std": jnp.ones((), cfg.dtype),
    }
    for layer in range(cfg.num_layers):
        last = layer == cfg.num_layers - 1
        lp = {
            "layernorm": {"scale": jnp.ones((H,), cfg.dtype), "bias": jnp.zeros((H,), cfg.dtype)},
            "vec_layernorm": {"weight": jnp.ones((H,), cfg.dtype)},
            "vec_proj": _linear_init(next(keys), H, 3 * H, bias=False, dtype=cfg.dtype),
            "q_proj": _linear_init(next(keys), H, H, dtype=cfg.dtype),
            "k_proj": _linear_init(next(keys), H, H, dtype=cfg.dtype),
            "v_proj": _linear_init(next(keys), H, H, dtype=cfg.dtype),
            "dk_proj": _linear_init(next(keys), H, H, dtype=cfg.dtype),
            "dv_proj": _linear_init(next(keys), H, H, dtype=cfg.dtype),
            "s_proj": _linear_init(next(keys), H, 2 * H, dtype=cfg.dtype),
            "o_proj": _linear_init(next(keys), H, 3 * H, dtype=cfg.dtype),
        }
        if not last:
            lp["f_proj"] = _linear_init(next(keys), H, H, dtype=cfg.dtype)
            lp["w_src_proj"] = _linear_init(next(keys), H, H, bias=False, dtype=cfg.dtype)
            lp["w_trg_proj"] = _linear_init(next(keys), H, H, bias=False, dtype=cfg.dtype)
        p["layers"].append(lp)
    return p


def _geb_init(key, h_in, h_out, cfg):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "vec1_proj": _linear_init(k1, h_in, h_in, bias=False, dtype=cfg.dtype),
        "vec2_proj": _linear_init(k2, h_in, h_out, bias=False, dtype=cfg.dtype),
        "update0": _linear_init(k3, 2 * h_in, h_in, dtype=cfg.dtype),
        "update1": _linear_init(k4, h_in, 2 * h_out, dtype=cfg.dtype),
    }


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def _safe_inv_norm(vec, axis=-1, keepdims=True, eps=1e-12):
    """1/||vec|| with zero (not NaN) value and gradient at vec == 0."""
    d2 = jnp.sum(vec * vec, axis=axis, keepdims=keepdims)
    nonzero = d2 > eps
    inv = jnp.where(nonzero, jax.lax.rsqrt(jnp.where(nonzero, d2, 1.0)), 0.0)
    return inv, nonzero


def _safe_norm(vec, axis=-1, keepdims=False, eps=1e-12):
    d2 = jnp.sum(vec * vec, axis=axis, keepdims=keepdims)
    nonzero = d2 > eps
    return jnp.where(nonzero, jnp.sqrt(jnp.where(nonzero, d2, 1.0)), 0.0)


def cosine_cutoff(dist, cutoff):
    return 0.5 * (jnp.cos(dist * (math.pi / cutoff)) + 1.0) * (dist < cutoff)


def expnorm_rbf(p, dist, cfg: ViSNetConfig):
    alpha = 5.0 / cfg.cutoff
    d = dist[..., None]
    return cosine_cutoff(d, cfg.cutoff) * jnp.exp(
        -p["betas"] * (jnp.exp(-alpha * d) - p["means"]) ** 2
    )


def spherical_harmonics(unit_vec, lmax):
    """Real SH features of a unit vector: l=1 (x,y,z) and l=2 block.

    Matches reference Sphere._spherical_harmonics (utils.py:130-162).
    unit_vec: [..., 3] -> [..., (lmax+1)^2 - 1]
    """
    x, y, z = unit_vec[..., 0], unit_vec[..., 1], unit_vec[..., 2]
    comps = [x, y, z]
    if lmax >= 2:
        s3 = math.sqrt(3.0)
        comps += [
            s3 * x * z,
            s3 * x * y,
            y * y - 0.5 * (x * x + z * z),
            s3 * y * z,
            (s3 / 2.0) * (z * z - x * x),
        ]
    return jnp.stack(comps, axis=-1)


def layer_norm(p, x, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def vec_layer_norm(p, vec, norm_type: str, lmax: int):
    """VecLayerNorm (reference utils.py:165-249); vec: [..., S, H]."""
    if norm_type == "none":
        return vec * p["weight"]

    def _norm_block(v):
        # v: [..., s, H]
        dist = _safe_norm(v, axis=-2, keepdims=True)  # [..., 1, H]
        if norm_type == "rms":
            rms = jnp.sqrt(jnp.mean(dist**2, axis=-1, keepdims=True))
            inv = jnp.where(rms > 1e-12, 1.0 / jnp.maximum(rms, 1e-12), 0.0)
            return v * inv
        # max_min
        dist_c = jnp.clip(dist, 1e-12, None)
        direct = v / dist_c
        mx = jnp.max(dist, axis=-1, keepdims=True)
        mn = jnp.min(dist, axis=-1, keepdims=True)
        delta = jnp.where(mx - mn == 0, 1.0, mx - mn)
        scaled = jax.nn.relu((dist - mn) / delta)
        return scaled * direct

    if lmax >= 2:
        v1 = _norm_block(vec[..., :3, :])
        v2 = _norm_block(vec[..., 3:8, :])
        vec = jnp.concatenate([v1, v2], axis=-2)
    else:
        vec = _norm_block(vec)
    return vec * p["weight"]


# ---------------------------------------------------------------------------
# geometry: dense masked graph
# ---------------------------------------------------------------------------

def dense_graph(pos, mask, cfg: ViSNetConfig):
    """All-pairs graph within one padded fragment.

    Returns:
      adj      [B, A, A]  edges incl. self loops (both endpoints valid, r<cutoff)
      adj_ns   [B, A, A]  edges excl. self loops
      dist     [B, A, A]  pair distances (0 on self loops / invalid)
      d_sh     [B, A, A, n_sphere] spherical features of the unit edge vector
    """
    B, A, _ = pos.shape
    vec = pos[:, None, :, :] - pos[:, :, None, :]      # j - i (source - center)
    inv, nonzero = _safe_inv_norm(vec, axis=-1, keepdims=True)
    dist = _safe_norm(vec, axis=-1, keepdims=False)
    unit = vec * inv
    eye = jnp.eye(A, dtype=bool)
    pair_valid = mask[:, :, None] & mask[:, None, :]
    within = dist < cfg.cutoff
    adj = pair_valid & (within | eye)
    adj_ns = adj & ~eye & nonzero.squeeze(-1)
    d_sh = spherical_harmonics(unit, cfg.lmax)
    return adj, adj_ns, dist, d_sh


# ---------------------------------------------------------------------------
# ViS-MP layer
# ---------------------------------------------------------------------------

def vis_mp_layer(lp, x, vec, adj, dist, edge_attr, d_sh, cfg: ViSNetConfig, last: bool):
    """One ViS_MP update (reference visnet_block.py:237-312).

    x [B,A,H]; vec [B,A,S,H]; edge_attr [B,A,A,H]; adj [B,A,A] (with self
    loops); dist [B,A,A]; d_sh [B,A,A,S].
    Axis convention: index 1 = center i (aggregation target), 2 = source j.
    """
    act = _act(cfg.activation)
    attn_act = _act(cfg.attn_activation)
    H, nh = cfg.hidden_channels, cfg.num_heads
    dh = H // nh
    B, A = x.shape[:2]
    adj_f = adj.astype(x.dtype)

    x = layer_norm(lp["layernorm"], x)
    vec = vec_layer_norm(lp["vec_layernorm"], vec, cfg.vecnorm_type, cfg.lmax)

    # fused projections: q/k/v share the input, dk/dv share the edge input
    w_qkv = jnp.concatenate(
        [lp["q_proj"]["w"], lp["k_proj"]["w"], lp["v_proj"]["w"]], axis=1
    )
    b_qkv = jnp.concatenate(
        [lp["q_proj"]["b"], lp["k_proj"]["b"], lp["v_proj"]["b"]]
    )
    q, k, v = jnp.split(x @ w_qkv + b_qkv, 3, axis=-1)
    w_dkv = jnp.concatenate([lp["dk_proj"]["w"], lp["dv_proj"]["w"]], axis=1)
    b_dkv = jnp.concatenate([lp["dk_proj"]["b"], lp["dv_proj"]["b"]])

    vec123 = _linear(lp["vec_proj"], vec)              # [B,A,S,3H]
    vec1, vec2, vec3 = jnp.split(vec123, 3, axis=-1)
    vec_dot = jnp.sum(vec1 * vec2, axis=-2)            # [B,A,H]

    # the kernels hardwire silu (the production activation).  A % 8 == 0:
    # Mosaic requires the center-atom tile (the blocked second-to-minor
    # dim of q/x_agg) to be a multiple of 8, so sub-8 tiles for finer
    # size buckets do not lower — widths must be multiples of 8
    # (frag/runtime.py BUCKET_WIDTHS).
    use_fused = (
        cfg.fused and not cfg.exact_rejection and A % 8 == 0
        and cfg.activation in ("silu", "swish")
        and cfg.attn_activation in ("silu", "swish")
    )
    if use_fused:
        from ai2bmd_tpu.ops.pallas import vismp as PK

        core = PK.fused_vis_mp(
            cfg.cutoff, nh, last, interpret=cfg.fused_interpret
        )
        if last:
            x_agg, vec_agg = core(
                q, k, v, vec, edge_attr, d_sh, dist, adj_f,
                w_dkv, b_dkv, lp["s_proj"]["w"], lp["s_proj"]["b"],
            )
            df = None
        else:
            wt = _linear(lp["w_trg_proj"], vec)        # [B,A,S,H]
            ws = _linear(lp["w_src_proj"], vec)
            x_agg, vec_agg, df = core(
                q, k, v, vec, wt, ws, edge_attr, d_sh, dist, adj_f,
                w_dkv, b_dkv, lp["s_proj"]["w"], lp["s_proj"]["b"],
                lp["f_proj"]["w"], lp["f_proj"]["b"],
            )
        o1, o2, o3 = jnp.split(_linear(lp["o_proj"], x_agg), 3, axis=-1)
        dx = vec_dot * o2 + o3
        dvec = vec3 * o1[:, :, None, :] + vec_agg
        return dx, dvec, df

    dk, dv = jnp.split(act(edge_attr @ w_dkv + b_dkv), 2, axis=-1)

    # --- attention message (center i attends over sources j) ---
    # Per-head logits, broadcast back to channels via ONE block-diagonal
    # [H,H] matmul: (p @ head_sum)[...,c] = sum_{c' in head(c)} p[...,c'].
    # Every edge tensor stays [B,A,A,H]; the [B,A,A,nh,dh] layout the
    # reference's reshape implies would lane-pad the minor dims (dh=32,
    # nh=8) to 128 on TPU — 4-16x wasted HBM traffic on the largest
    # tensors of the whole model.  attn_act is elementwise and the
    # broadcast value is constant within a head, so activation-after-
    # broadcast is exact.
    head_sum = jnp.asarray(
        np.kron(np.eye(nh, dtype=np.float32), np.ones((dh, dh), np.float32)),
        x.dtype,
    )
    p = q[:, :, None, :] * k[:, None, :, :] * dk       # [B,A,A,H]
    attn = attn_act(p @ head_sum) * cosine_cutoff(dist, cfg.cutoff)[..., None]
    attn = attn * adj_f[..., None]

    v_ij = v[:, None, :, :] * dv * attn                # [B,A,A,H]

    s = act(_linear(lp["s_proj"], v_ij))               # [B,A,A,2H]
    s1, s2 = jnp.split(s, 2, axis=-1)
    # mask: bias of s_proj makes s nonzero on non-edges
    s1 = s1 * adj_f[..., None]
    s2 = s2 * adj_f[..., None]

    x_agg = jnp.sum(v_ij, axis=2)                      # [B,A,H]
    # vec message, contracted without materializing [B,A,A,S,H]:
    #   vec_out[i] = sum_j vec[j]*s1[i,j] + sum_j s2[i,j]*d_sh[i,j]
    vec_agg = jnp.einsum("bjch,bijh->bich", vec, s1) + jnp.einsum(
        "bijh,bijc->bich", s2, d_sh
    )

    # --- node update ---
    o1, o2, o3 = jnp.split(_linear(lp["o_proj"], x_agg), 3, axis=-1)
    dx = vec_dot * o2 + o3
    dvec = vec3 * o1[:, :, None, :] + vec_agg

    if last:
        return dx, dvec, None

    # --- edge update (vector rejection, contracted) ---
    # w1 = reject(Wt vec_i, d), w2 = reject(Ws vec_j, -d); both rejections are
    # along d, so  w1.w2 = S_ij + a_ij b_ij (|d|^2 - 2)  with
    # S = <Wt vec_i, Ws vec_j>_c, a = <Wt vec_i, d>, b = <Ws vec_j, d>.
    # |d_sh|^2 == 2 identically for real edges (and a=b=0 on self loops),
    # so the correction vanishes; see ViSNetConfig.exact_rejection.
    wt = _linear(lp["w_trg_proj"], vec)                # [B,A,S,H]
    ws = _linear(lp["w_src_proj"], vec)
    w_dot = jnp.einsum("bich,bjch->bijh", wt, ws)
    if cfg.exact_rejection:
        a_ij = jnp.einsum("bich,bijc->bijh", wt, d_sh)
        b_ij = jnp.einsum("bjch,bijc->bijh", ws, d_sh)
        n2 = jnp.sum(d_sh * d_sh, axis=-1)[..., None]  # [B,A,A,1]
        w_dot = w_dot + a_ij * b_ij * (n2 - 2.0)
    df = act(_linear(lp["f_proj"], edge_attr)) * w_dot
    df = df * adj_f[..., None]
    return dx, dvec, df


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

def representation(params, z, pos, mask, cfg: ViSNetConfig):
    """ViSNetBlock forward (visnet_block.py:103-142): embeddings + MP stack."""
    act = _act(cfg.activation)
    B, A = z.shape
    adj, adj_ns, dist, d_sh = dense_graph(pos, mask, cfg)
    adj_f = adj.astype(cfg.dtype)
    adj_ns_f = adj_ns.astype(cfg.dtype)

    x = params["embedding"][z] * mask[..., None]
    edge_rbf = expnorm_rbf(params["rbf"], dist, cfg) * adj_f[..., None]

    # neighbor embedding (self loops removed; utils.py:296-317)
    ne = params["neighbor_embedding"]
    C = cosine_cutoff(dist, cfg.cutoff) * adj_ns_f
    W = _linear(ne["distance_proj"], edge_rbf) * C[..., None]
    xn_src = ne["embedding"][z] * mask[..., None]
    x_nbr = jnp.einsum("bjh,bijh->bih", xn_src, W)
    x = _linear(ne["combine"], jnp.concatenate([x, x_nbr], axis=-1))
    x = x * mask[..., None]

    # edge embedding over all edges incl. self loops (utils.py:331-341)
    ee = params["edge_embedding"]
    edge_attr = (x[:, :, None, :] + x[:, None, :, :]) * _linear(ee["edge_proj"], edge_rbf)
    edge_attr = edge_attr * adj_f[..., None]

    use_full_layer = (
        (cfg.fused_layer or cfg.fused_layer_interpret)
        and not cfg.exact_rejection
        and A % 8 == 0
        and cfg.vecnorm_type == "none"
        and cfg.edge_dtype is None
        and cfg.activation in ("silu", "swish")
        and cfg.attn_activation in ("silu", "swish")
    )
    if use_full_layer:
        from ai2bmd_tpu.ops.pallas import vislayer as FL

        H = cfg.hidden_channels
        vec_sm = jnp.zeros((B, cfg.n_sphere, A, H), cfg.dtype)
        dsh_sm = jnp.transpose(d_sh, (0, 3, 1, 2))
        for li, lp in enumerate(params["layers"]):
            last = li == cfg.num_layers - 1
            op = FL.fused_layer(
                cfg.cutoff, cfg.num_heads, last,
                interpret=cfg.fused_layer_interpret,
            )
            w = FL.layer_weights(lp, H, cfg.num_heads, last, cfg.dtype)
            x, vec_sm, edge_attr = op(
                x, vec_sm, edge_attr, dsh_sm, dist, adj_f, *w
            )
        x = layer_norm(params["out_norm"], x)
        vec = vec_layer_norm(
            params["vec_out_norm"], jnp.transpose(vec_sm, (0, 2, 1, 3)),
            cfg.vecnorm_type, cfg.lmax,
        )
        return x, vec

    vec = jnp.zeros((B, A, cfg.n_sphere, cfg.hidden_channels), cfg.dtype)

    for li, lp in enumerate(params["layers"]):
        last = li == cfg.num_layers - 1

        def _block(carry, lp=lp, last=last):
            x, vec, edge_attr = carry
            if cfg.edge_dtype is not None:
                # mixed precision: layer compute in edge_dtype, residual
                # stream stays f32 (standard transformer recipe)
                ed = cfg.edge_dtype
                lp_c = jax.tree.map(lambda a: a.astype(ed), lp)
                dx, dvec, df = vis_mp_layer(
                    lp_c, x.astype(ed), vec.astype(ed), adj, dist.astype(ed),
                    edge_attr.astype(ed), d_sh.astype(ed), cfg, last,
                )
                dx = dx.astype(x.dtype)
                dvec = dvec.astype(vec.dtype)
                df = None if df is None else df.astype(edge_attr.dtype)
            else:
                dx, dvec, df = vis_mp_layer(
                    lp, x, vec, adj, dist, edge_attr, d_sh, cfg, last
                )
            x = x + dx
            vec = vec + dvec
            if df is not None:
                edge_attr = edge_attr + df
            return x, vec, edge_attr

        if cfg.remat:
            _block = jax.checkpoint(_block)
        x, vec, edge_attr = _block((x, vec, edge_attr))

    x = layer_norm(params["out_norm"], x)
    vec = vec_layer_norm(params["vec_out_norm"], vec, cfg.vecnorm_type, cfg.lmax)
    return x, vec


def gated_equivariant_block(p, x, v, scalar_activation, cfg):
    """output_modules.py:9-62."""
    act = _act(cfg.activation)
    vec1 = _safe_norm(_linear(p["vec1_proj"], v), axis=-2)   # [B,A,h_out?]
    vec2 = _linear(p["vec2_proj"], v)
    hidden = act(_linear(p["update0"], jnp.concatenate([x, vec1], axis=-1)))
    out = _linear(p["update1"], hidden)
    x, gate = jnp.split(out, 2, axis=-1)
    v = gate[:, :, None, :] * vec2
    if scalar_activation:
        x = act(x)
    return x, v


def atomwise_energy(params, z, pos, mask, cfg: ViSNetConfig):
    """Per-atom scalar contributions (pre-reduce), masked."""
    x, v = representation(params, z, pos, mask, cfg)
    x, v = gated_equivariant_block(params["output"]["block0"], x, v, True, cfg)
    x, v = gated_equivariant_block(params["output"]["block1"], x, v, False, cfg)
    x = x + jnp.sum(v) * 0.0          # grad-keeper parity (output_modules.py:140)
    x = x * params["std"]
    x = x + params["atomref"][z]
    return x[..., 0] * mask           # [B, A]


def energy(params, z, pos, mask, cfg: ViSNetConfig):
    """Per-fragment energies [B] (reference visnet.py:135-150)."""
    peratom = atomwise_energy(params, z, pos, mask, cfg)
    e = jnp.sum(peratom, axis=-1)
    return e + params["mean"]


def energy_and_forces(params, z, pos, mask, cfg: ViSNetConfig):
    """E [B], F [B,A,3] with F = -dE/dpos (visnet.py:151-166)."""

    def esum(pos_):
        e = energy(params, z, pos_, mask, cfg)
        return jnp.sum(e), e

    grads, e = jax.grad(esum, has_aux=True)(pos)
    return e, -grads * mask[..., None]

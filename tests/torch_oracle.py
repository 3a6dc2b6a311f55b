"""Plain-torch (pyg-free) oracle of the reference ViSNet math.

A functional transcription of the reference model semantics
(/root/reference/src/ViSNet/model/visnet_block.py:103-312, utils.py:119-341,
output_modules.py:9-140, priors.py:87, visnet.py:135-166) used ONLY as a
test oracle: tests/test_reference_parity.py loads the same synthetic
checkpoint into this oracle and into ai2bmd_tpu.models.visnet and asserts
that energies and forces agree.  torch_geometric's MessagePassing machinery
is replaced by explicit gathers and ``index_add_``; everything else follows
the reference formulas term by term (including the literal vector-rejection
edge update, which independently validates the algebraic contraction the
JAX path uses).

The graph is the ideal one: all ordered pairs within the cutoff plus self
loops.  The reference additionally truncates at 32 neighbors per atom in
arbitrary torch_cluster order (visnet_block.py:56-58); the JAX build
deliberately keeps all neighbors, so the oracle does too.
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F


def _act(name: str):
    return {
        "silu": F.silu,
        "swish": F.silu,
        "ssp": lambda x: F.softplus(x) - math.log(2.0),
        "tanh": torch.tanh,
        "sigmoid": torch.sigmoid,
    }[name]


def _lin(sd, key, x, bias=True):
    y = x @ sd[f"{key}.weight"].t()
    return y + sd[f"{key}.bias"] if bias else y


def _cosine_cutoff(d, cutoff):
    return 0.5 * (torch.cos(d * (math.pi / cutoff)) + 1.0) * (d < cutoff).to(d.dtype)


def _expnorm_rbf(sd, dist, cutoff):
    # utils.py:22-57
    alpha = 5.0 / cutoff
    d = dist.unsqueeze(-1)
    means = sd["representation_model.distance_expansion.means"]
    betas = sd["representation_model.distance_expansion.betas"]
    return _cosine_cutoff(d, cutoff) * torch.exp(
        -betas * (torch.exp(-alpha * d) - means) ** 2
    )


def _sphere(unit):
    # utils.py:130-162 (lmax=2 real spherical harmonics, 8 components)
    x, y, z = unit[..., 0], unit[..., 1], unit[..., 2]
    s3 = math.sqrt(3.0)
    return torch.stack(
        [x, y, z, s3 * x * z, s3 * x * y, y * y - 0.5 * (x * x + z * z),
         s3 * y * z, (s3 / 2.0) * (z * z - x * x)],
        dim=-1,
    )


def _vec_layer_norm(weight, vec, norm_type):
    # utils.py:165-249; vec [N, 8, H] (or [N, 3, H] for lmax=1)
    def norm_block(v):
        dist = torch.norm(v, dim=1, keepdim=True)
        if bool((dist == 0).all()):
            return torch.zeros_like(v)
        dist = dist.clamp(min=1e-12)
        if norm_type == "rms":
            rms = torch.sqrt(torch.mean(dist.squeeze(1) ** 2, dim=-1))
            return v / F.relu(rms).unsqueeze(-1).unsqueeze(-1)
        direct = v / dist
        max_val, _ = torch.max(dist, dim=-1)
        min_val, _ = torch.min(dist, dim=-1)
        delta = (max_val - min_val).view(-1)
        delta = torch.where(delta == 0, torch.ones_like(delta), delta)
        scaled = (dist - min_val.view(-1, 1, 1)) / delta.view(-1, 1, 1)
        return F.relu(scaled) * direct

    if norm_type == "none":
        return vec * weight
    if vec.shape[1] == 8:
        out = torch.cat([norm_block(vec[:, :3]), norm_block(vec[:, 3:])], dim=1)
    else:
        out = norm_block(vec)
    return out * weight


def _layer_norm(sd, key, x):
    return F.layer_norm(x, x.shape[-1:], sd[f"{key}.weight"], sd[f"{key}.bias"])


def _rejection(vec, d):
    # visnet_block.py:206-209: remove the component of each channel's vector
    # along the (spherical-harmonic) edge direction
    proj = (vec * d.unsqueeze(2)).sum(dim=1, keepdim=True)
    return vec - proj * d.unsqueeze(2)


def _vis_mp(sd, base, hp, x, vec, src, dst, r_ij, f_ij, d_ij, last):
    # visnet_block.py:237-312
    H = hp["embedding_dimension"]
    nh = hp["num_heads"]
    act = _act(hp["activation"])
    attn_act = _act(hp["attn_activation"])
    N = x.shape[0]

    x = _layer_norm(sd, f"{base}.layernorm", x)
    vec = _vec_layer_norm(
        sd[f"{base}.vec_layernorm.weight"], vec, hp["vecnorm_type"] or "none"
    )

    q = _lin(sd, f"{base}.q_proj", x).reshape(N, nh, -1)
    k = _lin(sd, f"{base}.k_proj", x).reshape(N, nh, -1)
    v = _lin(sd, f"{base}.v_proj", x).reshape(N, nh, -1)
    dk = act(_lin(sd, f"{base}.dk_proj", f_ij)).reshape(len(src), nh, -1)
    dv = act(_lin(sd, f"{base}.dv_proj", f_ij)).reshape(len(src), nh, -1)

    vec1, vec2, vec3 = torch.split(
        _lin(sd, f"{base}.vec_proj", vec, bias=False), H, dim=-1
    )
    vec_dot = (vec1 * vec2).sum(dim=1)

    # message over edges j(src) -> i(dst)
    attn = (q[dst] * k[src] * dk).sum(dim=-1)
    attn = attn_act(attn) * _cosine_cutoff(r_ij, hp["cutoff"]).unsqueeze(1)
    v_j = (v[src] * dv * attn.unsqueeze(2)).reshape(len(src), H)
    s1, s2 = torch.split(act(_lin(sd, f"{base}.s_proj", v_j)), H, dim=1)
    vec_msg = vec[src] * s1.unsqueeze(1) + s2.unsqueeze(1) * d_ij.unsqueeze(2)

    x_agg = torch.zeros_like(x).index_add_(0, dst, v_j)
    vec_agg = torch.zeros_like(vec).index_add_(0, dst, vec_msg)

    o1, o2, o3 = torch.split(_lin(sd, f"{base}.o_proj", x_agg), H, dim=1)
    dx = vec_dot * o2 + o3
    dvec = vec3 * o1.unsqueeze(1) + vec_agg

    if last:
        return dx, dvec, None

    w1 = _rejection(_lin(sd, f"{base}.w_trg_proj", vec[dst], bias=False), d_ij)
    w2 = _rejection(_lin(sd, f"{base}.w_src_proj", vec[src], bias=False), -d_ij)
    w_dot = (w1 * w2).sum(dim=1)
    df = act(_lin(sd, f"{base}.f_proj", f_ij)) * w_dot
    return dx, dvec, df


def oracle_energy_forces(
    state_dict: dict,
    hparams: dict,
    z: torch.Tensor,
    pos: torch.Tensor,
    dtype=torch.float64,
    forces: bool = True,
):
    """Energy (scalar) and forces [N,3] of one molecule, reference math.

    state_dict may carry the Lightning "model." prefix; floating tensors are
    cast to `dtype`.
    """
    sd = {}
    for key, val in state_dict.items():
        if key.startswith("model."):
            key = key[len("model."):]
        sd[key] = val.to(dtype) if torch.is_tensor(val) and val.is_floating_point() else val
    hp = hparams
    cutoff = hp["cutoff"]
    rm = "representation_model"
    act = _act(hp["activation"])
    N = z.shape[0]

    pos = pos.detach().to(dtype).clone().requires_grad_(forces)

    # graph: all ordered pairs within cutoff, plus self loops
    with torch.no_grad():
        dmat = torch.cdist(pos, pos)
        off_diag = ~torch.eye(N, dtype=torch.bool)
        s, d = torch.nonzero((dmat < cutoff) & off_diag, as_tuple=True)
    loops = torch.arange(N)
    src = torch.cat([s, loops])
    dst = torch.cat([d, loops])
    real = torch.cat([torch.ones(len(s), dtype=torch.bool),
                      torch.zeros(N, dtype=torch.bool)])

    edge_vec = pos[src] - pos[dst]
    r_ij = torch.where(
        real, torch.norm(torch.where(real.unsqueeze(1), edge_vec, torch.ones_like(edge_vec)), dim=-1),
        torch.zeros(len(src), dtype=dtype),
    )
    unit = torch.where(real.unsqueeze(1), edge_vec / r_ij.clamp(min=1e-30).unsqueeze(1),
                       torch.zeros_like(edge_vec))
    d_ij = _sphere(unit)
    f_rbf = _expnorm_rbf(sd, r_ij, cutoff)

    # embeddings (visnet_block.py:109-122)
    x = sd[f"{rm}.embedding.weight"][z]
    # neighbor embedding, self loops removed (utils.py:296-317)
    C = _cosine_cutoff(r_ij[real], cutoff)
    W = _lin(sd, f"{rm}.neighbor_embedding.distance_proj", f_rbf[real]) * C.unsqueeze(1)
    xe = sd[f"{rm}.neighbor_embedding.embedding.weight"][z]
    x_nbr = torch.zeros_like(x).index_add_(0, dst[real], xe[src[real]] * W)
    x = _lin(sd, f"{rm}.neighbor_embedding.combine", torch.cat([x, x_nbr], dim=1))

    vec = torch.zeros(N, (hp["lmax"] + 1) ** 2 - 1, hp["embedding_dimension"], dtype=dtype)
    # edge embedding over all edges incl. self loops (utils.py:331-341)
    f_ij = (x[dst] + x[src]) * _lin(sd, f"{rm}.edge_embedding.edge_proj", f_rbf)

    for i in range(hp["num_layers"]):
        last = i == hp["num_layers"] - 1
        dx, dvec, df = _vis_mp(
            sd, f"{rm}.vis_mp_layers.{i}", hp, x, vec, src, dst, r_ij, f_ij, d_ij, last
        )
        x = x + dx
        vec = vec + dvec
        if df is not None:
            f_ij = f_ij + df

    x = _layer_norm(sd, f"{rm}.out_norm", x)
    vec = _vec_layer_norm(
        sd[f"{rm}.vec_out_norm.weight"], vec, hp["vecnorm_type"] or "none"
    )

    # EquivariantScalar head (output_modules.py:9-140)
    for bi, scalar_act in ((0, True), (1, False)):
        base = f"output_model.output_network.{bi}"
        vec1 = torch.norm(_lin(sd, f"{base}.vec1_proj", vec, bias=False), dim=-2)
        vec2 = _lin(sd, f"{base}.vec2_proj", vec, bias=False)
        hidden = act(_lin(sd, f"{base}.update_net.0", torch.cat([x, vec1], dim=-1)))
        out = _lin(sd, f"{base}.update_net.2", hidden)
        x, gate = torch.split(out, out.shape[-1] // 2, dim=-1)
        vec = gate.unsqueeze(1) * vec2
        if scalar_act:
            x = act(x)

    x = x + vec.sum() * 0
    x = x * sd["std"]
    if "prior_model.atomref.weight" in sd:
        x = x + sd["prior_model.atomref.weight"][z]
    energy = x.sum() + sd["mean"]

    if not forces:
        return energy.detach(), None
    (grad,) = torch.autograd.grad(energy, pos)
    return energy.detach(), -grad

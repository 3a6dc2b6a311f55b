"""Checkpoint conversion: reference PyTorch-Lightning .ckpt -> jax params.

The reference loads `visnet-uni-{md5}.ckpt` Lightning checkpoints whose
state_dict keys are prefixed with "model." (reference:
src/ViSNet/model/visnet.py:73-93).  This module maps that state_dict onto
the ai2bmd_tpu.models.visnet parameter pytree.  torch is only needed to
deserialize the file; the mapping itself is pure numpy.

Key layout of the reference model (representation_model = ViSNetBlock,
output_model = EquivariantScalar, prior_model = Atomref):

    representation_model.embedding.weight                 [max_z, H]
    representation_model.distance_expansion.{means,betas}
    representation_model.neighbor_embedding.{embedding.weight,
        distance_proj.{weight,bias}, combine.{weight,bias}}
    representation_model.edge_embedding.edge_proj.{weight,bias}
    representation_model.vis_mp_layers.{i}.{layernorm.{weight,bias},
        vec_layernorm.weight, vec_proj.weight,
        q_proj|k_proj|v_proj|dk_proj|dv_proj|s_proj|o_proj.{weight,bias},
        f_proj.{weight,bias}, w_src_proj.weight, w_trg_proj.weight}
    representation_model.out_norm.{weight,bias}
    representation_model.vec_out_norm.weight
    output_model.output_network.{0,1}.{vec1_proj.weight, vec2_proj.weight,
        update_net.0.{weight,bias}, update_net.2.{weight,bias}}
    prior_model.atomref.weight                            [max_z, 1]
    mean, std                                             scalars

torch Linear stores weight as [out, in]; we store [in, out], so every
weight matrix is transposed on the way in.
"""

from __future__ import annotations

import numpy as np

from ai2bmd_tpu.models.visnet import ViSNetConfig, init_params


def load_torch_state_dict(path: str) -> tuple[dict, dict]:
    """Returns (state_dict with 'model.' stripped, hyper_parameters)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = {
        (k[len("model."):] if k.startswith("model.") else k): v.numpy()
        for k, v in ckpt["state_dict"].items()
    }
    return state, dict(ckpt.get("hyper_parameters", {}))


def config_from_hparams(hp: dict) -> ViSNetConfig:
    """Reference hyperparameter names: visnet.py:14-30."""
    return ViSNetConfig(
        lmax=hp.get("lmax", 2),
        hidden_channels=hp.get("embedding_dimension", 256),
        num_heads=hp.get("num_heads", 8),
        num_layers=hp.get("num_layers", 9),
        num_rbf=hp.get("num_rbf", 32),
        cutoff=hp.get("cutoff", 5.0),
        max_z=hp.get("max_z", 100),
        vecnorm_type=hp.get("vecnorm_type") or "none",
        activation=hp.get("activation", "silu"),
        attn_activation=hp.get("attn_activation", "silu"),
        reduce_op=hp.get("reduce_op", "add"),
    )


def _lin(state, key, bias=True):
    p = {"w": np.ascontiguousarray(state[f"{key}.weight"].T)}
    if bias:
        p["b"] = state[f"{key}.bias"]
    return p


def params_from_state_dict(state: dict, cfg: ViSNetConfig) -> dict:
    """Map a reference state_dict onto our parameter pytree."""
    rm = "representation_model"
    p = {
        "embedding": state[f"{rm}.embedding.weight"],
        "rbf": {
            "means": state[f"{rm}.distance_expansion.means"],
            "betas": state[f"{rm}.distance_expansion.betas"],
        },
        "neighbor_embedding": {
            "embedding": state[f"{rm}.neighbor_embedding.embedding.weight"],
            "distance_proj": _lin(state, f"{rm}.neighbor_embedding.distance_proj"),
            "combine": _lin(state, f"{rm}.neighbor_embedding.combine"),
        },
        "edge_embedding": {"edge_proj": _lin(state, f"{rm}.edge_embedding.edge_proj")},
        "layers": [],
        "out_norm": {
            "scale": state[f"{rm}.out_norm.weight"],
            "bias": state[f"{rm}.out_norm.bias"],
        },
        "vec_out_norm": {"weight": state[f"{rm}.vec_out_norm.weight"]},
        "output": {},
        "mean": np.asarray(state["mean"], dtype=np.float32),
        "std": np.asarray(state["std"], dtype=np.float32),
    }
    for i in range(cfg.num_layers):
        base = f"{rm}.vis_mp_layers.{i}"
        lp = {
            "layernorm": {
                "scale": state[f"{base}.layernorm.weight"],
                "bias": state[f"{base}.layernorm.bias"],
            },
            "vec_layernorm": {"weight": state[f"{base}.vec_layernorm.weight"]},
            "vec_proj": _lin(state, f"{base}.vec_proj", bias=False),
            "q_proj": _lin(state, f"{base}.q_proj"),
            "k_proj": _lin(state, f"{base}.k_proj"),
            "v_proj": _lin(state, f"{base}.v_proj"),
            "dk_proj": _lin(state, f"{base}.dk_proj"),
            "dv_proj": _lin(state, f"{base}.dv_proj"),
            "s_proj": _lin(state, f"{base}.s_proj"),
            "o_proj": _lin(state, f"{base}.o_proj"),
        }
        if f"{base}.f_proj.weight" in state:  # absent on the last layer
            lp["f_proj"] = _lin(state, f"{base}.f_proj")
            lp["w_src_proj"] = _lin(state, f"{base}.w_src_proj", bias=False)
            lp["w_trg_proj"] = _lin(state, f"{base}.w_trg_proj", bias=False)
        p["layers"].append(lp)

    for bi in (0, 1):
        base = f"output_model.output_network.{bi}"
        p["output"][f"block{bi}"] = {
            "vec1_proj": _lin(state, f"{base}.vec1_proj", bias=False),
            "vec2_proj": _lin(state, f"{base}.vec2_proj", bias=False),
            "update0": _lin(state, f"{base}.update_net.0"),
            "update1": _lin(state, f"{base}.update_net.2"),
        }

    if "prior_model.atomref.weight" in state:
        p["atomref"] = state["prior_model.atomref.weight"]
    else:
        p["atomref"] = np.zeros((cfg.max_z, 1), dtype=np.float32)

    import jax.numpy as jnp

    return {
        k: v for k, v in jax_tree_cast(p, jnp.float32).items()
    }


def jax_tree_cast(tree, dtype):
    import jax

    def cast(x):
        a = np.asarray(x)
        if np.issubdtype(a.dtype, np.floating):
            a = a.astype(dtype)
        import jax.numpy as jnp

        return jnp.asarray(a)

    return jax.tree.map(cast, tree)


def load_checkpoint(path: str) -> tuple[dict, ViSNetConfig]:
    """One-call load: torch ckpt path -> (jax params, config)."""
    state, hp = load_torch_state_dict(path)
    cfg = config_from_hparams(hp)
    return params_from_state_dict(state, cfg), cfg


def save_converted(path: str, params: dict, cfg: ViSNetConfig):
    """Snapshot converted weights as npz (pin the conversion, SURVEY.md 7)."""
    import jax

    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        flat[key] = np.asarray(leaf)
    flat["__config__"] = np.array(
        [cfg.lmax, cfg.hidden_channels, cfg.num_heads, cfg.num_layers,
         cfg.num_rbf, cfg.max_z], dtype=np.int64
    )
    flat["__cutoff__"] = np.array([cfg.cutoff])
    flat["__vecnorm__"] = np.array([cfg.vecnorm_type])
    np.savez_compressed(path, **flat)


def load_converted(path: str) -> tuple[dict, ViSNetConfig]:
    raw = np.load(path, allow_pickle=False)
    ints = raw["__config__"]
    cfg = ViSNetConfig(
        lmax=int(ints[0]), hidden_channels=int(ints[1]), num_heads=int(ints[2]),
        num_layers=int(ints[3]), num_rbf=int(ints[4]), max_z=int(ints[5]),
        cutoff=float(raw["__cutoff__"][0]), vecnorm_type=str(raw["__vecnorm__"][0]),
    )
    import jax

    template = init_params(jax.random.PRNGKey(0), cfg)
    flat_tpl, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for kp, _ in flat_tpl:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        leaves.append(raw[key])
    params = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves
    )
    return jax_tree_cast(params, np.float32), cfg

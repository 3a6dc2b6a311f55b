"""Checkpoint converter tests using a synthetic Lightning-style .ckpt
with the reference's exact key naming (visnet.py:84-87 key layout)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ai2bmd_tpu.models import visnet as V  # noqa: E402
from ai2bmd_tpu.models import checkpoint as C  # noqa: E402

CFG = V.ViSNetConfig(hidden_channels=16, num_heads=2, num_layers=2, num_rbf=4, max_z=20)


def _synthetic_state_dict(cfg, seed=0, scale=0.2):
    g = torch.Generator().manual_seed(seed)
    H, R = cfg.hidden_channels, cfg.num_rbf

    def t(*shape):
        # small scale: N(0,1) weights overflow the multiplicative attention
        # (9x256 needs <=0.1 to stay finite through the residual stream)
        return torch.randn(*shape, generator=g) * scale

    rm = "model.representation_model"
    sd = {
        f"{rm}.embedding.weight": t(cfg.max_z, H),
        f"{rm}.distance_expansion.means": t(R),
        f"{rm}.distance_expansion.betas": t(R).abs(),
        f"{rm}.neighbor_embedding.embedding.weight": t(cfg.max_z, H),
        f"{rm}.neighbor_embedding.distance_proj.weight": t(H, R),
        f"{rm}.neighbor_embedding.distance_proj.bias": t(H),
        f"{rm}.neighbor_embedding.combine.weight": t(H, 2 * H),
        f"{rm}.neighbor_embedding.combine.bias": t(H),
        f"{rm}.edge_embedding.edge_proj.weight": t(H, R),
        f"{rm}.edge_embedding.edge_proj.bias": t(H),
        f"{rm}.out_norm.weight": t(H),
        f"{rm}.out_norm.bias": t(H),
        f"{rm}.vec_out_norm.weight": t(H),
        "model.mean": torch.tensor(0.25),
        "model.std": torch.tensor(1.5),
        "model.prior_model.atomref.weight": t(cfg.max_z, 1),
        "model.prior_model.initial_atomref": t(cfg.max_z, 1),
    }
    for i in range(cfg.num_layers):
        b = f"{rm}.vis_mp_layers.{i}"
        sd[f"{b}.layernorm.weight"] = t(H)
        sd[f"{b}.layernorm.bias"] = t(H)
        sd[f"{b}.vec_layernorm.weight"] = t(H)
        sd[f"{b}.vec_proj.weight"] = t(3 * H, H)
        for name, (o, ii) in {
            "q_proj": (H, H), "k_proj": (H, H), "v_proj": (H, H),
            "dk_proj": (H, H), "dv_proj": (H, H),
            "s_proj": (2 * H, H), "o_proj": (3 * H, H),
        }.items():
            sd[f"{b}.{name}.weight"] = t(o, ii)
            sd[f"{b}.{name}.bias"] = t(o)
        if i < cfg.num_layers - 1:
            sd[f"{b}.f_proj.weight"] = t(H, H)
            sd[f"{b}.f_proj.bias"] = t(H)
            sd[f"{b}.w_src_proj.weight"] = t(H, H)
            sd[f"{b}.w_trg_proj.weight"] = t(H, H)
    om = "model.output_model.output_network"
    for bi, (hi, ho) in enumerate([(H, H // 2), (H // 2, 1)]):
        sd[f"{om}.{bi}.vec1_proj.weight"] = t(hi, hi)
        sd[f"{om}.{bi}.vec2_proj.weight"] = t(ho, hi)
        sd[f"{om}.{bi}.update_net.0.weight"] = t(hi, 2 * hi)
        sd[f"{om}.{bi}.update_net.0.bias"] = t(hi)
        sd[f"{om}.{bi}.update_net.2.weight"] = t(2 * ho, hi)
        sd[f"{om}.{bi}.update_net.2.bias"] = t(2 * ho)
    return sd


def _hparams(cfg):
    return {
        "lmax": cfg.lmax, "embedding_dimension": cfg.hidden_channels,
        "num_heads": cfg.num_heads, "num_layers": cfg.num_layers,
        "num_rbf": cfg.num_rbf, "cutoff": cfg.cutoff, "max_z": cfg.max_z,
        "vecnorm_type": "none", "activation": "silu",
        "attn_activation": "silu", "reduce_op": "add",
        "model": "ViSNetBlock", "output_model": "Scalar",
        "prior_model": "Atomref", "derivative": True, "rbf_type": "expnorm",
        "trainable_rbf": False, "trainable_vecnorm": False,
    }


def test_convert_and_run(tmp_path):
    sd = _synthetic_state_dict(CFG)
    ckpt_path = tmp_path / "visnet-uni-test.ckpt"
    torch.save({"state_dict": sd, "hyper_parameters": _hparams(CFG)}, ckpt_path)

    params, cfg = C.load_checkpoint(str(ckpt_path))
    assert cfg.hidden_channels == CFG.hidden_channels
    assert float(params["mean"]) == pytest.approx(0.25)
    assert float(params["std"]) == pytest.approx(1.5)
    # weight transposition: jax [in, out] vs torch [out, in]
    np.testing.assert_allclose(
        np.asarray(params["layers"][0]["q_proj"]["w"]),
        sd["model.representation_model.vis_mp_layers.0.q_proj.weight"].numpy().T,
    )

    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.integers(1, 9, (1, 6)), jnp.int32)
    pos = jnp.asarray(rng.random((1, 6, 3)) * 3, jnp.float32)
    mask = jnp.ones((1, 6), bool)
    e, f = jax.jit(lambda *a: V.energy_and_forces(*a, cfg))(params, z, pos, mask)
    assert np.all(np.isfinite(e)) and np.all(np.isfinite(f))

    # converted-weight snapshot roundtrip
    npz = tmp_path / "converted.npz"
    C.save_converted(str(npz), params, cfg)
    params2, cfg2 = C.load_converted(str(npz))
    assert cfg2 == cfg
    e2, _ = jax.jit(lambda *a: V.energy_and_forces(*a, cfg2))(params2, z, pos, mask)
    np.testing.assert_allclose(e, e2, rtol=0, atol=1e-6)


def test_missing_prior_defaults_to_zero(tmp_path):
    sd = _synthetic_state_dict(CFG)
    for k in list(sd):
        if "prior_model" in k:
            del sd[k]
    ckpt_path = tmp_path / "noprior.ckpt"
    torch.save({"state_dict": sd, "hyper_parameters": _hparams(CFG)}, ckpt_path)
    params, cfg = C.load_checkpoint(str(ckpt_path))
    assert np.all(np.asarray(params["atomref"]) == 0)

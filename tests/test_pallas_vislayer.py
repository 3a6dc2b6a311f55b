"""Parity of the full fused ViS-MP layer kernel (ops/pallas/vislayer.py)
against the jnp reference layer (models/visnet.py vis_mp_layer + residual
adds), forward and position-relevant gradients, in interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai2bmd_tpu.models import visnet as V
from ai2bmd_tpu.ops.pallas import vislayer as PL

A, H, NH, S = 16, 128, 4, 8
CUTOFF = 5.0
CFG = V.ViSNetConfig(hidden_channels=H, num_heads=NH, num_layers=2)


def _inputs(rng, B=2):
    pos = jnp.asarray(rng.normal(size=(B, A, 3)) * 2.0, jnp.float32)
    mask = np.ones((B, A), bool)
    mask[1, A - 3:] = False
    mask = jnp.asarray(mask)
    adj, adj_ns, dist, d_sh = V.dense_graph(pos, mask, CFG)
    x = jnp.asarray(rng.normal(size=(B, A, H)) * 0.5, jnp.float32)
    vec = jnp.asarray(rng.normal(size=(B, A, S, H)) * 0.3, jnp.float32)
    edge = jnp.asarray(rng.normal(size=(B, A, A, H)) * 0.2, jnp.float32)
    edge = edge * adj.astype(jnp.float32)[..., None]
    return x, vec, edge, adj, dist, d_sh


def _ref_layer(lp, x, vec, edge, adj, dist, d_sh, last):
    dx, dvec, df = V.vis_mp_layer(lp, x, vec, adj, dist, edge, d_sh, CFG, last)
    x2 = x + dx
    vec2 = vec + dvec
    edge2 = edge if df is None else edge + df
    return x2, vec2, edge2


def _fused(lp, x, vec, edge, adj, dist, d_sh, last):
    op = PL.fused_layer(CUTOFF, NH, last, interpret=True)
    weights = PL.layer_weights(lp, H, NH, last)
    vec_sm = jnp.transpose(vec, (0, 2, 1, 3))
    dsh_sm = jnp.transpose(d_sh, (0, 3, 1, 2))
    x2, vec2_sm, edge2 = op(
        x, vec_sm, edge, dsh_sm, dist, adj.astype(x.dtype), *weights
    )
    return x2, jnp.transpose(vec2_sm, (0, 2, 1, 3)), edge2


@pytest.mark.parametrize("last", [False, True])
def test_fused_layer_forward_parity(rng, last):
    params = V.init_params(jax.random.PRNGKey(0), CFG)
    lp = params["layers"][0 if not last else 1]
    x, vec, edge, adj, dist, d_sh = _inputs(rng)
    r = _ref_layer(lp, x, vec, edge, adj, dist, d_sh, last)
    f = _fused(lp, x, vec, edge, adj, dist, d_sh, last)
    for name, a, b in zip(("x", "vec", "edge"), r, f):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5,
            err_msg=f"{name} (last={last})",
        )


@pytest.mark.parametrize("last", [False, True])
def test_fused_layer_grad_parity(rng, last):
    params = V.init_params(jax.random.PRNGKey(1), CFG)
    lp = params["layers"][0 if not last else 1]
    x, vec, edge, adj, dist, d_sh = _inputs(rng)
    wx = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    wv = jnp.asarray(rng.normal(size=vec.shape), jnp.float32)
    we = jnp.asarray(rng.normal(size=edge.shape), jnp.float32)

    def loss(fn, x, vec, edge, dist, d_sh):
        x2, vec2, edge2 = fn(lp, x, vec, edge, adj, dist, d_sh, last)
        return (
            jnp.sum(x2 * wx) + jnp.sum(vec2 * wv) + jnp.sum(edge2 * we)
        )

    args = (x, vec, edge, dist, d_sh)
    g_ref = jax.grad(lambda *a: loss(_ref_layer, *a), argnums=(0, 1, 2, 3, 4))(*args)
    g_fus = jax.grad(lambda *a: loss(_fused, *a), argnums=(0, 1, 2, 3, 4))(*args)
    names = ("g_x", "g_vec", "g_edge", "g_dist", "g_dsh")
    for name, a, b in zip(names, g_ref, g_fus):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5,
            err_msg=f"{name} (last={last})",
        )


def test_full_model_parity_fused_layer(rng):
    """energy_and_forces through the full-layer kernels == jnp path."""
    cfg_ref = V.ViSNetConfig(hidden_channels=H, num_heads=NH, num_layers=3)
    cfg_fl = V.ViSNetConfig(
        hidden_channels=H, num_heads=NH, num_layers=3,
        fused_layer_interpret=True,
    )
    params = V.init_params(jax.random.PRNGKey(2), cfg_ref)
    B = 2
    pos = jnp.asarray(rng.normal(size=(B, A, 3)) * 2.0, jnp.float32)
    z = jnp.asarray(rng.integers(1, 9, size=(B, A)), jnp.int32)
    mask = np.ones((B, A), bool)
    mask[1, A - 5:] = False
    mask = jnp.asarray(mask)
    e_r, f_r = V.energy_and_forces(params, z, pos, mask, cfg_ref)
    e_f, f_f = V.energy_and_forces(params, z, pos, mask, cfg_fl)
    np.testing.assert_allclose(np.asarray(e_r), np.asarray(e_f), atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(f_r), np.asarray(f_f), atol=1e-4, rtol=1e-4)

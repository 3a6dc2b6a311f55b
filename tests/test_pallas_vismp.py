"""Fused ViS-MP edge-block pallas kernel: parity vs the jnp reference.

Runs in interpreter mode on CPU (bit-level parity); on a real TPU the same
checks run compiled (tests/conftest pins CPU, so that path is exercised by
bench/profiling scripts instead)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai2bmd_tpu.ops.pallas.vismp import (
    fused_edge_block,
    head_pool_matrix,
    reference_edge_block,
)


def _system(rng, B=3, A=16, H=64, S=8):
    f = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.3, jnp.float32)
    pos = jnp.asarray(rng.random((B, A, 3)) * 6, jnp.float32)
    vecp = pos[:, None, :, :] - pos[:, :, None, :]
    dist = jnp.sqrt((vecp**2).sum(-1) + 1e-12)
    return dict(
        q=f(B, A, H), k=f(B, A, H), v=f(B, A, H),
        vec=f(B, A, S, H), edge_attr=f(B, A, A, H), d_sh=f(B, A, A, S),
        dist=dist, adj=dist < 5.0,
        w_dkv=f(H, 2 * H) * 0.2, b_dkv=f(2 * H) * 0.1,
        w_s=f(H, 2 * H) * 0.2, b_s=f(2 * H) * 0.1,
    )


@pytest.mark.parametrize("i_tile", [8, 16])
def test_fused_matches_reference(rng, i_tile):
    a = _system(rng)
    args = (a["q"], a["k"], a["v"], a["vec"], a["edge_attr"], a["d_sh"],
            a["dist"], a["adj"], a["w_dkv"], a["b_dkv"], a["w_s"], a["b_s"])
    x_ref, v_ref = reference_edge_block(*args, 5.0, 4)
    x, v = fused_edge_block(*args, 5.0, 4, interpret=True, i_tile=i_tile)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-5)


def test_masked_edges_contribute_nothing(rng):
    """Fully masked adjacency must produce zero aggregations."""
    a = _system(rng)
    adj0 = jnp.zeros_like(a["adj"])
    x, v = fused_edge_block(
        a["q"], a["k"], a["v"], a["vec"], a["edge_attr"], a["d_sh"],
        a["dist"], adj0, a["w_dkv"], a["b_dkv"], a["w_s"], a["b_s"],
        5.0, 4, interpret=True,
    )
    assert float(jnp.abs(x).max()) < 1e-6
    assert float(jnp.abs(v).max()) < 1e-6


def test_head_pool_matrix():
    m = head_pool_matrix(64, 4)
    assert m.shape == (64, 4)
    assert np.all(m.sum(axis=1) == 1.0)
    # pooling then expanding reproduces per-head broadcast
    x = np.random.default_rng(0).random((5, 64)).astype(np.float32)
    pooled = x @ m
    assert np.allclose(pooled[:, 0], x[:, :16].sum(1))
    expanded = pooled @ m.T
    assert np.allclose(expanded[:, 3], pooled[:, 0])


def test_fused_with_update_matches_reference(rng):
    from ai2bmd_tpu.ops.pallas.vismp import (
        fused_edge_block_with_update,
        reference_edge_update,
    )

    a = _system(rng)
    f = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.3, jnp.float32)
    B, A, S, H = a["vec"].shape
    wt, wsrc = f(B, A, S, H), f(B, A, S, H)
    w_f, b_f = f(H, H) * 0.2, f(H) * 0.1
    args = (a["q"], a["k"], a["v"], a["vec"], a["edge_attr"], a["d_sh"],
            a["dist"], a["adj"], a["w_dkv"], a["b_dkv"], a["w_s"], a["b_s"])
    x_ref, v_ref = reference_edge_block(*args, 5.0, 4)
    df_ref = reference_edge_update(a["edge_attr"], a["adj"], wt, wsrc, w_f, b_f)
    x, v, df = fused_edge_block_with_update(
        *args, wt, wsrc, w_f, b_f, 5.0, 4, interpret=True
    )
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(df), np.asarray(df_ref), atol=1e-5)


def test_fused_model_vjp_matches_jnp(rng):
    """Full-model parity of the fused Pallas path (interpret mode): energy
    AND forces (the hand-written VJP) vs the pure-jnp path."""
    import jax

    from ai2bmd_tpu.models import visnet as V

    cfg0 = V.ViSNetConfig(
        hidden_channels=32, num_heads=4, num_layers=3, num_rbf=8, max_z=20
    )
    cfg1 = V.ViSNetConfig(
        hidden_channels=32, num_heads=4, num_layers=3, num_rbf=8, max_z=20,
        fused=True, fused_interpret=True,
    )
    params = V.init_params(jax.random.PRNGKey(0), cfg0)
    B, A = 2, 16
    z = jnp.asarray(rng.integers(1, 9, (B, A)), jnp.int32)
    pos = jnp.asarray(rng.random((B, A, 3)) * 5, jnp.float32)
    mask = jnp.asarray(rng.random((B, A)) < 0.9)

    e0, f0 = jax.jit(lambda *a: V.energy_and_forces(*a, cfg0))(params, z, pos, mask)
    e1, f1 = jax.jit(lambda *a: V.energy_and_forces(*a, cfg1))(params, z, pos, mask)
    np.testing.assert_allclose(np.asarray(e0), np.asarray(e1), atol=5e-6)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), atol=5e-6)

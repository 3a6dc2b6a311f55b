"""ViSNet model tests: symmetry, gradients, padding/batch invariance.

The reference ships no model tests; these encode the physical contracts an
equivariant potential must satisfy (SURVEY.md section 4 test plan).
All runs are jitted (eager mode compiles every op separately) on CPU with
true float32 (TPU bf16 matmul contamination is exactly what these tests
must exclude).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai2bmd_tpu.models import visnet as V

CFG = V.ViSNetConfig(hidden_channels=32, num_heads=4, num_layers=3, num_rbf=8)


@jax.jit
def _energy(p, z, pos, mask):
    return V.energy(p, z, pos, mask, CFG)


@jax.jit
def _ef(p, z, pos, mask):
    return V.energy_and_forces(p, z, pos, mask, CFG)


def _random_system(rng, B=2, A=12, pad=3):
    z = rng.integers(1, 9, size=(B, A)).astype(np.int32)
    pos = (rng.random((B, A, 3)) * 4.0).astype(np.float32)
    mask = np.ones((B, A), dtype=bool)
    if pad:
        mask[:, A - pad:] = False
        z[:, A - pad:] = 0
        pos[:, A - pad:] = 50.0  # park padding far away
    return jnp.asarray(z), jnp.asarray(pos), jnp.asarray(mask)


@pytest.fixture(scope="module")
def params():
    return V.init_params(jax.random.PRNGKey(0), CFG)


def test_energy_shape_and_finiteness(params, rng):
    z, pos, mask = _random_system(rng)
    e = _energy(params, z, pos, mask)
    assert e.shape == (2,)
    assert np.all(np.isfinite(e))


def test_translation_invariance(params, rng):
    z, pos, mask = _random_system(rng)
    e0 = _energy(params, z, pos, mask)
    e1 = _energy(params, z, pos + jnp.array([1.7, -2.3, 0.9]), mask)
    np.testing.assert_allclose(e0, e1, rtol=0, atol=5e-5)


def test_rotation_invariance_energy_equivariance_forces(params, rng):
    z, pos, mask = _random_system(rng)
    q, _ = np.linalg.qr(rng.random((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    R = jnp.asarray(q.astype(np.float32))
    e0, f0 = _ef(params, z, pos, mask)
    e1, f1 = _ef(params, z, pos @ R.T, mask)
    np.testing.assert_allclose(e0, e1, rtol=0, atol=5e-4)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0 @ R.T), atol=2e-3)


def test_exact_rotation_invariance(params, rng):
    """90-degree axis rotations are exact in fp32: tight tolerance."""
    z, pos, mask = _random_system(rng)
    R = jnp.asarray(
        np.array([[0, 1, 0], [-1, 0, 0], [0, 0, 1]], np.float32)
    )
    e0, f0 = _ef(params, z, pos, mask)
    e1, f1 = _ef(params, z, pos @ R.T, mask)
    np.testing.assert_allclose(e0, e1, rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0 @ R.T), atol=5e-4)


def test_permutation_invariance(params, rng):
    z, pos, mask = _random_system(rng, B=2, A=12, pad=3)
    perm = np.concatenate([rng.permutation(9), np.arange(9, 12)])
    e0 = _energy(params, z, pos, mask)
    e1 = _energy(params, z[:, perm], pos[:, perm], mask[:, perm])
    np.testing.assert_allclose(e0, e1, rtol=0, atol=5e-5)


def test_padding_invariance(params, rng):
    """Energy must be independent of how much padding is appended."""
    z, pos, mask = _random_system(rng, B=2, A=12, pad=3)
    e0 = _energy(params, z, pos, mask)
    zp = jnp.pad(z, ((0, 0), (0, 4)))
    posp = jnp.pad(pos, ((0, 0), (0, 4), (0, 0)), constant_values=99.0)
    maskp = jnp.pad(mask, ((0, 0), (0, 4)))
    e1 = jax.jit(lambda *a: V.energy(*a, CFG))(params, zp, posp, maskp)
    np.testing.assert_allclose(e0, e1, rtol=0, atol=5e-5)


def test_batch_independence(params, rng):
    """Fragments in a batch must not talk to each other."""
    z, pos, mask = _random_system(rng, B=2, A=12, pad=3)
    e_bat = _energy(params, z, pos, mask)
    one = jax.jit(lambda p, z1, p1, m1: V.energy(p, z1, p1, m1, CFG))
    e_sep = np.concatenate(
        [one(params, z[i:i + 1], pos[i:i + 1], mask[i:i + 1]) for i in range(2)]
    )
    np.testing.assert_allclose(e_bat, e_sep, rtol=0, atol=5e-5)


def test_forces_match_finite_differences(params, rng):
    z, pos, mask = _random_system(rng, B=1, A=6, pad=0)
    e0, f = _ef(params, z, pos, mask)
    h = 1e-2
    for (a, c) in [(0, 0), (2, 1), (5, 2)]:
        dp = jnp.zeros_like(pos).at[0, a, c].set(h)
        ep = _energy(params, z, pos + dp, mask)[0]
        em = _energy(params, z, pos - dp, mask)[0]
        fd = -(ep - em) / (2 * h)
        assert abs(fd - f[0, a, c]) < 2e-2 * max(1.0, abs(fd)), (a, c, fd, f[0, a, c])


def test_forces_zero_on_padding(params, rng):
    z, pos, mask = _random_system(rng)
    _, f = _ef(params, z, pos, mask)
    assert np.all(np.asarray(f)[~np.asarray(mask)] == 0)


def test_isolated_atom_no_nan(params):
    """Single real atom + padding: only self loop; gradients stay finite."""
    z = jnp.zeros((1, 12), dtype=jnp.int32).at[0, 0].set(6)
    pos = jnp.full((1, 12, 3), 50.0).at[0, 0].set(jnp.zeros(3))
    mask = jnp.zeros((1, 12), dtype=bool).at[0, 0].set(True)
    e, f = _ef(params, z, pos, mask)
    assert np.all(np.isfinite(e)) and np.all(np.isfinite(f))


def test_vecnorm_variants(rng):
    for norm in ("rms", "max_min"):
        cfg = V.ViSNetConfig(
            hidden_channels=16, num_heads=2, num_layers=2, num_rbf=4, vecnorm_type=norm
        )
        p = V.init_params(jax.random.PRNGKey(1), cfg)
        z, pos, mask = _random_system(rng, B=1, A=6, pad=0)
        e, f = jax.jit(lambda *a: V.energy_and_forces(*a, cfg))(p, z, pos, mask)
        assert np.all(np.isfinite(e)) and np.all(np.isfinite(f))


@pytest.mark.slow
def test_default_config_smoke(rng):
    cfg = V.ViSNetConfig()
    p = V.init_params(jax.random.PRNGKey(2), cfg)
    z, pos, mask = _random_system(rng, B=2, A=16, pad=4)
    e, f = jax.jit(lambda *a: V.energy_and_forces(*a, cfg))(p, z, pos, mask)
    assert e.shape == (2,) and f.shape == (2, 16, 3)
    assert np.all(np.isfinite(e)) and np.all(np.isfinite(f))

"""Numerical parity against the reference model math (VERDICT round-1 #3).

The same synthetic checkpoint (reference key layout, test_checkpoint.py) is
loaded into (a) the plain-torch oracle transcription of the reference math
(tests/torch_oracle.py, float64) and (b) ai2bmd_tpu.models.visnet through
the production converter models/checkpoint.py (float32).  Energies and
forces must agree on real capped-dipeptide geometries extracted from the
bundled Chignolin structure — this fails if the JAX port's math drifts from
the reference's (visnet_block.py / utils.py / output_modules.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ai2bmd_tpu.models import checkpoint as C  # noqa: E402
from ai2bmd_tpu.models import visnet as V  # noqa: E402

from test_checkpoint import _hparams, _synthetic_state_dict  # noqa: E402
from torch_oracle import oracle_energy_forces  # noqa: E402


def _make_pair(cfg, tmp_path, seed=0, scale=0.2):
    """Same weights in both frameworks: (jax params, torch sd, hparams)."""
    import dataclasses

    sd = _synthetic_state_dict(cfg, seed=seed, scale=scale)
    hp = _hparams(cfg)
    hp["vecnorm_type"] = cfg.vecnorm_type
    ckpt = tmp_path / "parity.ckpt"
    torch.save({"state_dict": sd, "hyper_parameters": hp}, ckpt)
    params, loaded_cfg = C.load_checkpoint(str(ckpt))
    # exact_rejection is a local evaluation strategy, not a checkpoint field
    assert dataclasses.replace(cfg, exact_rejection=False) == loaded_cfg
    return params, sd, hp


@pytest.fixture(scope="module")
def dipeptide_geometries(chig_protein):
    """Real optimized dipeptide rows from Chignolin: list of (z, pos)."""
    from ai2bmd_tpu.frag import hydrogen as H
    from ai2bmd_tpu.frag.indexer import build_fragment_index
    from ai2bmd_tpu.frag.runtime import FragmentRuntime, build_row_positions

    fi = build_fragment_index(chig_protein.atoms)
    rt = FragmentRuntime.build(fi)
    P = jnp.asarray(chig_protein.positions, jnp.float32)
    pos = H.optimize_caps(rt.ht, build_row_positions(rt, P), n_iter=10)
    pos = np.asarray(pos)
    valid = np.asarray(rt.valid)
    z = np.asarray(rt.row_z)
    out = []
    for r in (0, 4, 9):  # first, middle, last dipeptide
        m = valid[r]
        out.append((z[r][m], pos[r][m]))
    return out


def _compare(cfg, params, sd, hp, z_np, pos_np, e_tol, f_tol):
    e_ref, f_ref = oracle_energy_forces(
        sd, hp, torch.from_numpy(z_np.astype(np.int64)), torch.from_numpy(pos_np)
    )
    A = len(z_np)
    z = jnp.asarray(z_np[None], jnp.int32)
    pos = jnp.asarray(pos_np[None], jnp.float32)
    mask = jnp.ones((1, A), bool)
    e, f = jax.jit(lambda *a: V.energy_and_forces(*a, cfg))(params, z, pos, mask)
    e_err = abs(float(e[0]) - float(e_ref))
    f_err = float(np.max(np.abs(np.asarray(f[0]) - f_ref.numpy())))
    assert e_err <= e_tol, f"energy drift {e_err:.2e} > {e_tol}"
    assert f_err <= f_tol, f"force drift {f_err:.2e} > {f_tol}"
    return e_err, f_err


@pytest.mark.parametrize("vecnorm", ["none", "rms", "max_min"])
def test_parity_small(vecnorm, dipeptide_geometries, tmp_path):
    cfg = V.ViSNetConfig(
        hidden_channels=32, num_heads=4, num_layers=3, num_rbf=8,
        max_z=20, vecnorm_type=vecnorm,
    )
    params, sd, hp = _make_pair(cfg, tmp_path)
    for z_np, pos_np in dipeptide_geometries:
        _compare(cfg, params, sd, hp, z_np, pos_np, e_tol=1e-5, f_tol=1e-4)


def test_parity_exact_rejection_variant(dipeptide_geometries, tmp_path):
    """cfg.exact_rejection=True (literal |d|^2 correction) matches the oracle
    too — validates that both forms are the reference's edge update."""
    cfg = V.ViSNetConfig(
        hidden_channels=32, num_heads=4, num_layers=3, num_rbf=8, max_z=20,
        exact_rejection=True,
    )
    params, sd, hp = _make_pair(cfg, tmp_path)
    z_np, pos_np = dipeptide_geometries[0]
    _compare(cfg, params, sd, hp, z_np, pos_np, e_tol=1e-5, f_tol=1e-4)


def test_parity_self_loop_only_graph(tmp_path):
    """Atoms beyond the cutoff see only their self loops (utils.py:269-273
    zero-distance handling; VecLayerNorm all-zero early-out, utils.py:200-216).
    Energy-only: the oracle's literal torch.norm has a NaN gradient at the
    all-zero vector feature this graph produces."""
    cfg = V.ViSNetConfig(
        hidden_channels=32, num_heads=4, num_layers=3, num_rbf=8, max_z=20,
        vecnorm_type="max_min",
    )
    params, sd, hp = _make_pair(cfg, tmp_path)
    z_np = np.array([6, 8], np.int32)
    pos_np = np.array([[0.0, 0.0, 0.0], [8.0, 0.0, 0.0]], np.float32)
    e_ref, _ = oracle_energy_forces(
        sd, hp, torch.from_numpy(z_np.astype(np.int64)),
        torch.from_numpy(pos_np), forces=False,
    )
    z = jnp.asarray(z_np[None], jnp.int32)
    pos = jnp.asarray(pos_np[None], jnp.float32)
    mask = jnp.ones((1, 2), bool)
    e = jax.jit(lambda *a: V.energy(*a, cfg))(params, z, pos, mask)
    assert abs(float(e[0]) - float(e_ref)) <= 1e-5


@pytest.mark.slow
def test_parity_production_config(dipeptide_geometries, tmp_path):
    """Full 9x256 production configuration at the VERDICT fidelity bar."""
    cfg = V.ViSNetConfig(max_z=100)
    params, sd, hp = _make_pair(cfg, tmp_path, scale=0.1)
    z_np, pos_np = dipeptide_geometries[1]
    e_err, f_err = _compare(
        cfg, params, sd, hp, z_np, pos_np, e_tol=1e-4, f_tol=1e-3
    )

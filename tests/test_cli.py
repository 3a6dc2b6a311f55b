"""CLI surface tests (reference src/AIMD/arguments.py flag parity)."""

import pytest
import subprocess
import sys

import conftest
from ai2bmd_tpu.cli import build_parser


def test_reference_flags_accepted():
    """Every reference CLI invocation shape must parse."""
    p = build_parser()
    args = p.parse_args([
        "--prot-file", "x.pdb", "--sim-steps", "100", "--temp-k", "300",
        "--timestep", "1", "--preeq-steps", "200", "--max-cyc", "100",
        "--constraints", "--solvent", "--write-solvent",
        "--preprocess-method", "FF19SB", "--mm-method", "tinker-GPU",
        "--mode", "fragment", "--fragment-longrange-calc", "pme",
        "--seed", "1", "--restart", "--build-frames",
        "--record-per-steps", "50", "--device-strategy", "small-molecule",
        "--work-strategy", "combined", "--chunk-size", "512", "-vv",
    ])
    assert args.mode == "fragment"
    assert args.fragment_longrange_calc == "pme"
    assert args.verbose == 2


def test_tpu_flags():
    p = build_parser()
    args = p.parse_args([
        "--prot-file", "x.pdb", "--mesh-dp", "2", "--mesh-mp", "4",
        "--replicas", "8", "--matmul-precision", "bfloat16",
        "--model-preset", "tiny",
    ])
    assert args.mesh_dp == 2 and args.mesh_mp == 4


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    conftest.require_examples()
    proc = subprocess.run(
        [
            sys.executable, "-m", "ai2bmd_tpu",
            "--prot-file", conftest.example_pdb("chig"),
            "--log-dir", str(tmp_path),
            "--sim-steps", "4", "--preeq-steps", "0",
            "--record-per-steps", "2", "--no-solvent",
            "--model-preset", "tiny", "--opt-iters", "2",
        ],
        capture_output=True, text=True, timeout=900,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert (tmp_path / "chig-traj.xyz").exists()
    assert "Simulation finished!" in proc.stdout


@pytest.mark.slow
def test_cli_ensemble_mode(tmp_path):
    conftest.require_examples()
    import os as _os

    proc = subprocess.run(
        [
            sys.executable, "-m", "ai2bmd_tpu",
            "--prot-file", conftest.example_pdb("chig"),
            "--log-dir", str(tmp_path),
            "--sim-steps", "4", "--record-per-steps", "2",
            "--replicas", "4", "--mesh-dp", "2", "--mesh-mp", "4",
            "--model-preset", "tiny", "--opt-iters", "2", "--no-solvent",
        ],
        capture_output=True, text=True, timeout=900,
        env={
            **_os.environ,
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        },
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "Epot mean" in proc.stdout
    import numpy as np

    final = np.load(tmp_path / "4x-ensemble-final.npz")
    assert final["positions"].shape == (4, 175, 3)
    assert np.all(np.isfinite(final["positions"]))


@pytest.mark.slow
def test_cli_solvated_ensemble_dcds_and_restart(tmp_path):
    """8-replica solvated ensemble writes 8 readable per-replica DCDs and
    an ensemble restart that --restart resumes (VERDICT round 2, item 7)."""
    import os as _os

    import numpy as np

    from ai2bmd_tpu.io.build import build_polyalanine
    from ai2bmd_tpu.io.pdb import write_pdb
    from ai2bmd_tpu.io.trajectory import read_dcd
    from ai2bmd_tpu.preprocess import solvate

    box = solvate(build_polyalanine(2), padding=4.0, seed=0)
    pdb = str(tmp_path / "ala2box.pdb")
    write_pdb(pdb, box)
    env = {
        **_os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
    }
    base = [
        sys.executable, "-m", "ai2bmd_tpu",
        "--prot-file", pdb, "--log-dir", str(tmp_path),
        "--record-per-steps", "2", "--replicas", "8",
        "--mesh-dp", "8", "--mesh-mp", "1",
        "--model-preset", "tiny", "--no-preprocess", "-v",
    ]
    proc = subprocess.run(
        base + ["--sim-steps", "4"],
        capture_output=True, text=True, timeout=1200, env=env,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    for i in range(8):
        frames = read_dcd(str(tmp_path / f"ala2box-r{i:03d}-traj.dcd"))
        assert frames.shape == (2, len(box), 3)
        assert np.all(np.isfinite(frames))
    # replicas diverged
    f0 = read_dcd(str(tmp_path / "ala2box-r000-traj.dcd"))
    f1 = read_dcd(str(tmp_path / "ala2box-r001-traj.dcd"))
    assert np.abs(f0[-1] - f1[-1]).max() > 1e-5
    ckpt = tmp_path / "ala2box-8x-ensemble-restart.npz"
    assert ckpt.exists()

    proc = subprocess.run(
        base + ["--sim-steps", "8", "--restart"],
        capture_output=True, text=True, timeout=1200, env=env,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "resumed ensemble" in proc.stderr + proc.stdout
    cont = read_dcd(str(tmp_path / "ala2box-r000-traj-restart.dcd"))
    assert cont.shape == (2, len(box), 3)
    # continuation starts from the checkpointed state, not from scratch
    assert np.abs(cont[0] - f0[0]).max() > 1e-5


@pytest.mark.slow
def test_cli_single_trajectory_mp_sharded(tmp_path):
    """--replicas 1 --mesh-mp 8: ONE trajectory with the fragment axis
    sharded over the mesh (the reference's device_strategy
    fragment-scattering role)."""
    import os as _os

    import numpy as np

    from ai2bmd_tpu.io.trajectory import read_dcd

    proc = subprocess.run(
        [
            sys.executable, "-m", "ai2bmd_tpu",
            "--prot-file", conftest.example_pdb("chig"),
            "--log-dir", str(tmp_path),
            "--sim-steps", "4", "--record-per-steps", "2",
            "--replicas", "1", "--mesh-dp", "1", "--mesh-mp", "8",
            "--model-preset", "tiny", "--no-solvent",
        ],
        capture_output=True, text=True, timeout=1200,
        env={
            **_os.environ,
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        },
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    frames = read_dcd(str(tmp_path / "chig-r000-traj.dcd"))
    assert frames.shape == (2, 175, 3)
    assert np.all(np.isfinite(frames))

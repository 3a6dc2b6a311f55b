"""CLI surface tests (reference src/AIMD/arguments.py flag parity)."""

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

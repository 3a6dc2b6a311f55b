"""Native (C++) runtime tests: async trajectory writer."""

import numpy as np
import pytest

from ai2bmd_tpu.io.trajectory import read_dcd
from ai2bmd_tpu.runtime import AsyncTrajectoryWriter, native_available


@pytest.mark.skipif(not native_available(), reason="no native toolchain")
def test_async_writer_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    numbers = np.array([6, 1, 1, 8, 7] * 4, np.int32)
    n = len(numbers)
    dcd = str(tmp_path / "t.dcd")
    xyz = str(tmp_path / "t.xyz")
    w = AsyncTrajectoryWriter(dcd, xyz, numbers, timestep_fs=2.0, save_interval=5)
    frames = [rng.random((n, 3)).astype(np.float32) * 10 for _ in range(7)]
    for i, f in enumerate(frames):
        w.write(f, energy=-1.5 * i, step=5 * i)
    w.close()

    back = read_dcd(dcd)
    assert back.shape == (7, n, 3)
    for a, b in zip(back, frames):
        np.testing.assert_allclose(a, b, atol=1e-5)

    text = open(xyz).read().splitlines()
    assert text[0].strip() == str(n)
    assert "energy_eV=-1.500000" in text[n + 3]
    assert text.count(str(n)) >= 7


@pytest.mark.skipif(not native_available(), reason="no native toolchain")
def test_async_writer_nonblocking(tmp_path):
    """Submits must return immediately even for many frames; close drains."""
    numbers = np.full(3000, 8, np.int32)
    w = AsyncTrajectoryWriter(str(tmp_path / "big.dcd"), None, numbers)
    frame = np.zeros((3000, 3), np.float32)
    import time

    t0 = time.perf_counter()
    for i in range(50):
        w.write(frame, step=i)
    submit_time = time.perf_counter() - t0
    assert submit_time < 1.0
    w.close()
    assert read_dcd(str(tmp_path / "big.dcd")).shape[0] == 50


@pytest.mark.skipif(not native_available(), reason="no native toolchain")
def test_write_after_close_raises(tmp_path):
    numbers = np.array([6, 6], np.int32)
    w = AsyncTrajectoryWriter(str(tmp_path / "x.dcd"), None, numbers)
    w.write(np.zeros((2, 3), np.float32))
    w.close()
    with pytest.raises(RuntimeError):
        w.write(np.zeros((2, 3), np.float32))

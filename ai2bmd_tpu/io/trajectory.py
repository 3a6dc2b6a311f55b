"""Trajectory output + restart checkpoints.

Replaces the reference's ASE .traj writer + MDAnalysis-based DCD converter
(src/utils/traj2dcd.py) with self-contained writers:

  * extended-XYZ text trajectory (universally readable)
  * CHARMM/NAMD-style binary DCD (VMD/MDAnalysis compatible) — so the
    reference's separate traj2dcd post-processing step is unnecessary
  * npz restart checkpoints carrying positions AND velocities + step
    (the reference restarts from the last .traj frame the same way,
    src/AIMD/simulator.py:88-96)
"""

from __future__ import annotations

import os
import struct

import numpy as np

from ai2bmd_tpu.io.pdb import SYMBOLS


class XYZTrajectory:
    def __init__(self, path: str, numbers: np.ndarray, append: bool = False):
        self.path = path
        self.symbols = [SYMBOLS[z] for z in numbers]
        self._f = open(path, "a" if append else "w")

    def write(self, positions: np.ndarray, energy: float | None = None, step: int = 0):
        n = len(self.symbols)
        comment = f"step={step}"
        if energy is not None:
            comment += f" energy_eV={energy:.6f}"
        self._f.write(f"{n}\n{comment}\n")
        for s, p in zip(self.symbols, positions):
            self._f.write(f"{s} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        self._f.flush()

    def close(self):
        self._f.close()


class DCDTrajectory:
    """Minimal CHARMM-format DCD writer (float32, no unit cell record)."""

    def __init__(self, path: str, n_atoms: int, timestep_fs: float = 1.0,
                 save_interval: int = 1):
        self.path = path
        self.n_atoms = n_atoms
        self.n_frames = 0
        self._f = open(path, "wb")
        # AKMA time unit = 48.88821 fs
        delta = timestep_fs * save_interval / 48.88821
        icntrl = [0] * 20
        icntrl[0] = 0                      # nframes (patched on close)
        icntrl[1] = 0                      # first step
        icntrl[2] = save_interval
        icntrl[3] = 0                      # total steps (patched)
        icntrl[9] = struct.unpack("i", struct.pack("f", delta))[0]
        icntrl[19] = 24                    # CHARMM version
        hdr = b"CORD" + struct.pack("20i", *icntrl)
        self._record(hdr)
        title = b"Created by ai2bmd-tpu".ljust(80)
        self._record(struct.pack("i", 1) + title)
        self._record(struct.pack("i", n_atoms))

    def _record(self, payload: bytes):
        marker = struct.pack("i", len(payload))
        self._f.write(marker + payload + marker)

    def write(self, positions: np.ndarray, **_kw):
        pos = np.asarray(positions, dtype=np.float32)
        for axis in range(3):
            self._record(pos[:, axis].tobytes())
        self.n_frames += 1
        self._f.flush()

    def close(self):
        # patch frame counts in the header
        self._f.seek(4 + 4)        # record marker + "CORD"
        self._f.write(struct.pack("i", self.n_frames))
        self._f.seek(4 + 4 + 3 * 4)
        self._f.write(struct.pack("i", self.n_frames))
        self._f.close()


def read_dcd(path: str) -> np.ndarray:
    """Read back a DCD written by DCDTrajectory -> [frames, atoms, 3]."""
    with open(path, "rb") as f:
        raw = f.read()
    off = 0

    def rec():
        nonlocal off
        (n,) = struct.unpack_from("i", raw, off)
        off += 4
        payload = raw[off:off + n]
        off += n + 4
        return payload

    hdr = rec()
    assert hdr[:4] == b"CORD"
    nframes = struct.unpack_from("i", hdr, 4)[0]
    rec()  # title
    n_atoms = struct.unpack("i", rec())[0]
    frames = []
    for _ in range(nframes):
        xyz = [np.frombuffer(rec(), dtype=np.float32) for _ in range(3)]
        frames.append(np.stack(xyz, axis=1))
    return np.array(frames).reshape(nframes, n_atoms, 3)


def save_restart(path: str, positions, velocities, step: int, rng_key=None):
    np.savez(
        path,
        positions=np.asarray(positions),
        velocities=np.asarray(velocities),
        step=np.asarray(step),
        rng_key=np.asarray(rng_key) if rng_key is not None else np.zeros(2, np.uint32),
    )


def load_restart(path: str):
    raw = np.load(path)
    return raw["positions"], raw["velocities"], int(raw["step"]), raw["rng_key"]


def latest_restart(log_dir: str, prot_name: str) -> str | None:
    path = os.path.join(log_dir, f"{prot_name}-restart.npz")
    return path if os.path.exists(path) else None

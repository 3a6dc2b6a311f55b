"""Native (C++) runtime bindings.

Builds the shared library on first use (g++, cached next to the sources)
and exposes ctypes wrappers.  Falls back cleanly when no toolchain is
available — callers check `native_available()`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libai2bmd_runtime.so")
_SOURCES = [os.path.join(_DIR, "traj_writer.cpp")]
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", _LIB_PATH,
           *_SOURCES, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        fresh = not os.path.exists(_LIB_PATH) or any(
            os.path.getmtime(s) > os.path.getmtime(_LIB_PATH) for s in _SOURCES
        )
        if fresh and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.traj_open.restype = ctypes.c_void_p
        lib.traj_open.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_double,
            ctypes.c_int, ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
        ]
        lib.traj_write.restype = ctypes.c_int
        lib.traj_write.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_double,
            ctypes.c_long,
        ]
        lib.traj_pending.restype = ctypes.c_long
        lib.traj_pending.argtypes = [ctypes.c_void_p]
        lib.traj_close.restype = None
        lib.traj_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


class AsyncTrajectoryWriter:
    """Background-thread trajectory writer (DCD and/or XYZ).

    Submitting a frame copies it into the native ring buffer and returns
    immediately; the worker thread owns all file IO.  This subsumes the
    reference's WorkQueue deferred-write trick (utils.py:95-105)."""

    def __init__(self, dcd_path: str | None, xyz_path: str | None,
                 numbers, timestep_fs: float = 1.0, save_interval: int = 1,
                 cell=None):
        import numpy as np

        from ai2bmd_tpu.io.pdb import SYMBOLS

        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable (no g++?)")
        self._lib = lib
        self.n_atoms = len(numbers)
        symbols = " ".join(SYMBOLS[z] for z in numbers)
        if cell is not None:
            cell_arr = np.ascontiguousarray(cell, dtype=np.float64)
            cell_ptr = cell_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        else:
            cell_ptr = None
        self._h = lib.traj_open(
            (dcd_path or "").encode(), (xyz_path or "").encode(),
            self.n_atoms, float(timestep_fs), int(save_interval),
            symbols.encode(), cell_ptr,
        )
        if not self._h:
            raise OSError(f"could not open trajectory outputs {dcd_path}/{xyz_path}")
        self._np = np

    def write(self, positions, energy: float = 0.0, step: int = 0):
        if not self._h:
            raise RuntimeError("write on closed trajectory")
        arr = self._np.ascontiguousarray(positions, dtype=self._np.float32)
        ptr = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        rc = self._lib.traj_write(self._h, ptr, float(energy), int(step))
        if rc != 0:
            raise RuntimeError("write on closed trajectory")

    def pending(self) -> int:
        return int(self._lib.traj_pending(self._h))

    def close(self):
        if self._h:
            self._lib.traj_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

"""Device-mesh helpers.

The reference's DeviceStrategy (src/Calculators/device_strategy.py:143-265)
hand-assigns GPUs to calculator roles and partitions fragments into
per-device chunks dispatched over thread pools.  On TPU the same two axes
of parallelism become mesh axes:

  * dp — replica ensembles (the BASELINE 64-replica Chignolin config):
    independent MD trajectories, batched leading axis, no communication
  * mp — model/fragment parallelism inside one replica: dipeptide rows and
    ACE-NME units are block-sharded; the stitched forces are psum'd over
    the axis (ICI), replacing the host-memory concat (bonded.py:80-89)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_dp: int = 1, n_mp: int | None = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_mp is None:
        n_mp = len(devices) // n_dp
    if n_dp * n_mp != len(devices):
        raise ValueError(
            f"mesh {n_dp}x{n_mp} does not match {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(n_dp, n_mp)
    return Mesh(arr, axis_names=("dp", "mp"))

"""Reference DeviceStrategy compatibility layer.

The reference statically assigns GPUs to calculator roles and partitions
fragments into per-device chunks (src/Calculators/device_strategy.py:
143-265).  On TPU those decisions collapse into choosing a mesh: this
module maps the reference's strategy names onto (dp, mp) mesh shapes so
existing configurations keep meaning something sensible.

  excess-compute  -> favor replica throughput: dp = n_devices, mp = 1
                     (the reference reserved a device for solvent work;
                     here solvent terms live inside the same program)
  small-molecule  -> single-trajectory latency: dp = 1, mp = n_devices
  large-molecule  -> balanced: mp as large as the fragment count supports,
                     remaining devices into dp

The work partitioner (set_work_partitions/get_work_partitions,
device_strategy.py:84-139) has no equivalent: fragment rows are one padded
tensor and XLA schedules the work.
"""

from __future__ import annotations

import jax

from ai2bmd_tpu.parallel.mesh import make_mesh


def mesh_for_strategy(strategy: str, n_fragments: int | None = None,
                      devices=None):
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if strategy == "excess-compute":
        return make_mesh(n, 1, devices)
    if strategy == "small-molecule":
        return make_mesh(1, n, devices)
    if strategy == "large-molecule":
        mp = n
        if n_fragments:
            while mp > 1 and n_fragments < mp:
                mp //= 2
        return make_mesh(n // mp, mp, devices)
    raise ValueError(f"unknown device strategy {strategy!r}")

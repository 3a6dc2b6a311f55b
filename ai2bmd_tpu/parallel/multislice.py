"""Multi-slice (DCN) ensemble placement.

A TPU pod slice is a block of chips joined by ICI; multiple slices are
joined only by the data-center network (DCN), which is orders of magnitude
slower.  The reference has no analog (single host, GPUs over PCIe —
SURVEY.md section 2 "parallelism inventory"), but its flagship scale-out
config — many independent replica trajectories (BASELINE config 5) — is
exactly the workload DCN placement is made for: replicas never communicate
during stepping, so the replica (dp) axis can safely span slices while the
fragment (mp) axis, whose per-step psum/all_gather must ride ICI, stays
strictly inside one slice.

`make_hybrid_mesh` builds a ("dp", "mp") mesh with that guarantee:

  * On real multi-slice TPU (devices expose a `slice_index`), it uses
    `mesh_utils.create_hybrid_device_mesh` so the dp axis crosses slice
    boundaries on its outermost stride and mp is slice-local.  Requesting
    an mp axis larger than one slice is an error, not a silent fallback.
  * On single-slice or CPU platforms it emulates `n_slices` fake slices by
    contiguous grouping (virtual-device testing; the placement invariant
    is still asserted, see `assert_mp_slice_local`).

The resulting mesh drops into `ReplicaEnsemble` / `EnsembleSimulation`
unchanged: the only DCN traffic of an ensemble run is the initial state
broadcast and the trajectory gather at readback.
"""

from __future__ import annotations

import collections

import jax
import numpy as np
from jax.sharding import Mesh


def device_slice_index(dev) -> int | None:
    """The slice a device belongs to, or None when the platform has no
    slice concept (CPU, single-slice TPU without megascale)."""
    idx = getattr(dev, "slice_index", None)
    return int(idx) if idx is not None else None


def detect_slices(devices=None) -> dict[int, list]:
    """Group devices by slice. Single-slice/CPU -> {0: all devices}."""
    devices = list(devices if devices is not None else jax.devices())
    groups: dict[int, list] = collections.defaultdict(list)
    for d in devices:
        idx = device_slice_index(d)
        groups[0 if idx is None else idx].append(d)
    return dict(sorted(groups.items()))


def make_hybrid_mesh(
    n_dp: int,
    n_mp: int,
    devices=None,
    n_slices: int | None = None,
) -> Mesh:
    """A ("dp", "mp") mesh whose mp axis never crosses a slice boundary.

    n_dp is the TOTAL replica-axis size (across all slices); it must be a
    multiple of the slice count.  `n_slices` forces emulated slicing on
    platforms without a slice concept (testing); on real multi-slice
    hardware it must match the detected count.
    """
    devices = list(devices if devices is not None else jax.devices())
    groups = detect_slices(devices)
    real_multislice = len(groups) > 1
    if real_multislice:
        if n_slices is not None and n_slices != len(groups):
            raise ValueError(
                f"requested {n_slices} slices but hardware has {len(groups)}"
            )
        n_slices = len(groups)
    else:
        n_slices = n_slices or 1
        per = len(devices) // n_slices
        if per * n_slices != len(devices):
            raise ValueError(
                f"{len(devices)} devices do not split into {n_slices} slices"
            )
        groups = {
            s: devices[s * per : (s + 1) * per] for s in range(n_slices)
        }

    sizes = {len(g) for g in groups.values()}
    if len(sizes) != 1:
        raise ValueError(f"unequal slice sizes {sorted(sizes)}")
    per_slice = sizes.pop()

    if n_dp % n_slices:
        raise ValueError(
            f"dp={n_dp} does not divide over {n_slices} slices"
        )
    dp_per_slice = n_dp // n_slices
    if n_mp > per_slice:
        raise ValueError(
            f"mp={n_mp} exceeds the {per_slice}-device slice: the fragment "
            "psum/all_gather would cross DCN. Shard replicas (dp) across "
            "slices instead."
        )
    if dp_per_slice * n_mp != per_slice:
        raise ValueError(
            f"per-slice mesh {dp_per_slice}x{n_mp} != {per_slice} devices"
        )

    if real_multislice:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (dp_per_slice, n_mp), (n_slices, 1), devices
        )  # [n_slices*dp_per_slice, n_mp], slice-major on axis 0
    else:
        arr = np.empty((n_dp, n_mp), dtype=object)
        for s in range(n_slices):
            block = np.asarray(groups[s]).reshape(dp_per_slice, n_mp)
            arr[s * dp_per_slice : (s + 1) * dp_per_slice] = block
    mesh = Mesh(arr, axis_names=("dp", "mp"))
    assert_mp_slice_local(mesh, emulated_slices=None if real_multislice else groups)
    return mesh


def assert_mp_slice_local(mesh: Mesh, emulated_slices=None) -> None:
    """Invariant check: every mp row of the mesh lives inside one slice.

    With `emulated_slices` (a {slice: [devices]} map) the check uses the
    fake grouping; otherwise it reads the hardware slice_index.
    """
    if emulated_slices is not None:
        of = {id(d): s for s, ds in emulated_slices.items() for d in ds}
        slice_of = lambda d: of[id(d)]
    else:
        slice_of = device_slice_index
    arr = mesh.devices
    for row in range(arr.shape[0]):
        slices = {slice_of(d) for d in arr[row]}
        if len(slices) > 1:
            raise AssertionError(
                f"mp row {row} spans slices {sorted(map(str, slices))}: "
                "intra-replica collectives would ride DCN"
            )

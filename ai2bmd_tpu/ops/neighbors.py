"""Static-shape neighbor lists under PBC.

Replaces torch_cluster's radius_graph (reference
src/ViSNet/model/utils.py:252-276, src/Calculators/pme.py:164) with
fixed-shape [N, K] Verlet lists built inside jit:

  * rebuild: tiled dense distance pass (tile x N — one [T, N] block in VMEM
    at a time, MXU-shaped) packing the K nearest-within-cutoff neighbors per
    atom via top-k; exact for K large enough, overflow is reported
  * the list is symmetric/full (each pair appears in both rows), so force
    accumulation needs no scatter — each atom sums its own row
  * skin radius allows reuse across steps; rebuild on a fixed interval
    inside the scan (data-independent control flow)

For the bundled workloads (<=18k atoms) the tiled dense rebuild is a
~0.3 GFLOP pass — microseconds on the MXU; a pallas cell-list kernel is the
planned upgrade for >100k atoms.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NeighborList:
    idx: Any        # [N, K] int32 neighbor indices (N = self padding)
    valid: Any      # [N, K] bool
    ref_pos: Any    # positions at build time (for displacement checks)
    overflow: Any   # bool: some atom had > K neighbors (list is incomplete)


def _pbc_diff(vec, cell):
    if cell is None:
        return vec
    # floor(x+0.5) instead of round: tie-to-even lowering is ~20x slower
    # on TPU and the half-integer tie case has measure zero here
    return vec - cell * jnp.floor(vec / cell + 0.5)


def build_neighbor_list(
    P: jnp.ndarray,
    cutoff: float,
    k_max: int,
    cell: jnp.ndarray | None = None,
    tile: int = 512,
) -> NeighborList:
    """Exact [N, K] within-cutoff list via a tiled dense pass."""
    n = P.shape[0]
    k_max = min(k_max, n)
    tile = min(tile, n)
    n_pad = ((n + tile - 1) // tile) * tile
    P_pad = jnp.pad(P, ((0, n_pad - n), (0, 0)), constant_values=1e6)

    def one_tile(start):
        block = jax.lax.dynamic_slice(P_pad, (start, 0), (tile, 3))
        vec = _pbc_diff(P[None, :, :] - block[:, None, :], cell)
        d2 = jnp.sum(vec * vec, axis=-1)                     # [tile, N]
        row_ids = start + jax.lax.broadcasted_iota(jnp.int32, (tile, n), 0)
        within = (d2 < cutoff * cutoff) & (
            jax.lax.broadcasted_iota(jnp.int32, (tile, n), 1) != row_ids
        )
        # pack: top-k by -d2 among within (score pushes non-neighbors last)
        score = jnp.where(within, -d2, -jnp.inf)
        _, idx = jax.lax.top_k(score, k_max)                  # [tile, k]
        valid = jnp.take_along_axis(within, idx, axis=1)
        count = jnp.sum(within, axis=1)
        return idx.astype(jnp.int32), valid, count

    starts = jnp.arange(0, n_pad, tile)
    idxs, valids, counts = jax.lax.map(one_tile, starts)
    idx = idxs.reshape(n_pad, k_max)[:n]
    valid = valids.reshape(n_pad, k_max)[:n]
    counts = counts.reshape(n_pad)[:n]
    idx = jnp.where(valid, idx, n)
    return NeighborList(
        idx=idx, valid=valid, ref_pos=P, overflow=jnp.any(counts > k_max)
    )


def needs_rebuild(nl: NeighborList, P: jnp.ndarray, skin: float, cell=None):
    disp = _pbc_diff(P - nl.ref_pos, cell)
    return jnp.max(jnp.sum(disp * disp, axis=-1)) > (0.5 * skin) ** 2

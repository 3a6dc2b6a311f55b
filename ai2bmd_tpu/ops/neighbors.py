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
~0.3 GFLOP pass — microseconds on the MXU.  Beyond ~24k atoms the O(N^2)
pass stops being negligible; `build_neighbor_list_cells` (below) is the
O(N) periodic cell-decomposition rebuild with the identical output
contract, auto-selected by the QM/MM and AMOEBA engines via `cell_grid`.
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


# ---------------------------------------------------------------------------
# Cell-list build: O(N) rebuild for large periodic boxes
# ---------------------------------------------------------------------------

def cell_grid(cell_np, cutoff: float, n_atoms: int, max_occ: int | None = None):
    """Static cell-grid geometry for `build_neighbor_list_cells`.

    Returns (nc [3] ints, max_occ) or None when the box is too small for a
    3x3x3 neighborhood (fewer than 3 cells on some axis) — callers fall
    back to the tiled dense build there.  max_occ defaults to ~2x the mean
    occupancy at uniform density, rounded up to a lane-friendly multiple
    of 8 (overflow is detected and reported at build time, like k_max).
    """
    import numpy as np

    cell_np = np.asarray(cell_np, np.float64)
    nc = np.floor(cell_np / cutoff).astype(int)
    if np.any(nc < 3):
        return None
    if max_occ is None:
        mean_occ = n_atoms / float(np.prod(nc))
        max_occ = max(16, int(np.ceil(2.0 * mean_occ / 8.0)) * 8)
    return tuple(int(x) for x in nc), int(max_occ)


def build_neighbor_list_cells(
    P: jnp.ndarray,
    cutoff: float,
    k_max: int,
    cell: jnp.ndarray,
    nc: tuple,
    max_occ: int,
) -> NeighborList:
    """Exact [N, K] within-cutoff list via a periodic cell decomposition.

    The tiled dense build above is O(N^2) per rebuild — fine to ~20k atoms
    (SURVEY workloads), a wall at 100k+.  This build bins atoms into cells
    of side >= cutoff and evaluates one dense [M, 27M] distance block per
    CELL (all its atoms against its 3x3x3 neighborhood), GROMACS
    cluster-pair style: O(N * 27 * M) work, and every array stays in
    TPU-friendly SoA planes ([C, M] with the occupancy slot on the lane
    dim — no [*, 3]-minor-dim tensors, rule 1 of the pair-kernel layout
    notes).  `nc`/`max_occ` come from `cell_grid` (host-static).

    Output contract matches `build_neighbor_list` exactly: same pair set,
    nearest-first slot order, idx == N on dead slots, overflow flagged
    (either an over-full cell or an over-full K row).
    """
    n = P.shape[0]
    k_max = min(k_max, n)
    ncx, ncy, ncz = nc
    C = ncx * ncy * ncz
    M = max_occ
    nc_f = jnp.asarray(nc, P.dtype)
    nc_i = jnp.asarray(nc, jnp.int32)

    # wrap into the box, bin
    frac = P / cell
    frac = frac - jnp.floor(frac)
    cid3 = jnp.minimum((frac * nc_f).astype(jnp.int32), nc_i - 1)  # [N,3]
    cid = (cid3[:, 0] * ncy + cid3[:, 1]) * ncz + cid3[:, 2]

    # occupancy table: rank-within-cell via sorted order
    order = jnp.argsort(cid)
    scid = cid[order]
    first = jnp.searchsorted(scid, scid, side="left")
    rank_sorted = jnp.arange(n) - first
    occ_overflow = jnp.any(rank_sorted >= M)
    slot_sorted = jnp.minimum(rank_sorted, M - 1)
    flat = scid * M + slot_sorted
    occ_idx = jnp.full((C * M,), n, jnp.int32).at[flat].set(
        order.astype(jnp.int32)
    ).reshape(C, M)
    # SoA position planes in occupancy layout; empty slots parked far away
    Ppad = jnp.concatenate([P, jnp.full((1, 3), 1e6, P.dtype)])
    occ_x = Ppad[occ_idx.reshape(-1), 0].reshape(C, M)
    occ_y = Ppad[occ_idx.reshape(-1), 1].reshape(C, M)
    occ_z = Ppad[occ_idx.reshape(-1), 2].reshape(C, M)

    # static 3x3x3 neighborhood cell ids for every cell
    import numpy as np

    ids = np.arange(C)
    cz = ids % ncz
    cy = (ids // ncz) % ncy
    cx = ids // (ncy * ncz)
    offs = np.array(
        [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
         for dz in (-1, 0, 1)]
    )
    nbx = (cx[:, None] + offs[None, :, 0]) % ncx
    nby = (cy[:, None] + offs[None, :, 1]) % ncy
    nbz = (cz[:, None] + offs[None, :, 2]) % ncz
    nbr_cells = jnp.asarray(
        (nbx * ncy + nby) * ncz + nbz, jnp.int32
    )                                                   # [C, 27]

    cut2 = cutoff * cutoff

    def one_cell(c):
        nb = nbr_cells[c]                               # [27]
        cj = occ_idx[nb].reshape(-1)                    # [27M]
        xj = occ_x[nb].reshape(-1)
        yj = occ_y[nb].reshape(-1)
        zj = occ_z[nb].reshape(-1)
        xi, yi, zi = occ_x[c], occ_y[c], occ_z[c]       # [M]
        ci = occ_idx[c]
        dx = _pbc_diff(xj[None, :] - xi[:, None], cell[0])
        dy = _pbc_diff(yj[None, :] - yi[:, None], cell[1])
        dz = _pbc_diff(zj[None, :] - zi[:, None], cell[2])
        d2 = dx * dx + dy * dy + dz * dz                # [M, 27M]
        within = (d2 < cut2) & (cj[None, :] != ci[:, None]) & (
            cj[None, :] < n
        )
        score = jnp.where(within, -d2, -jnp.inf)
        _, kidx = jax.lax.top_k(score, k_max)           # [M, k]
        valid = jnp.take_along_axis(within, kidx, axis=1)
        idx = jnp.where(valid, cj[kidx], n)
        return idx.astype(jnp.int32), valid, jnp.sum(within, axis=1)

    idx_c, valid_c, count_c = jax.lax.map(one_cell, jnp.arange(C))

    # back to atom order: atom i lives at (cid[i], rank[i])
    rank = jnp.zeros((n,), jnp.int32).at[order].set(
        slot_sorted.astype(jnp.int32)
    )
    row = cid * M + rank
    idx = idx_c.reshape(C * M, k_max)[row]
    valid = valid_c.reshape(C * M, k_max)[row]
    counts = count_c.reshape(C * M)[row]
    return NeighborList(
        idx=idx, valid=valid, ref_pos=P,
        overflow=occ_overflow | jnp.any(counts > k_max),
    )

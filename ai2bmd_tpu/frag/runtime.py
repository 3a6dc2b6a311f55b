"""Device-side per-step fragment pipeline.

Everything here runs inside jit on padded static shapes.  Per MD step:

  protein positions [N,3]
    -> gather into dipeptide rows [R,S,3] + cap-H placement along the
       acceptor->replaced-atom direction (reference:
       src/Fragmentation/distancefrag.py:34-54)
    -> L-BFGS cap optimization over AMBER terms (frag.hydrogen)
    -> ACE-NME views gathered from the optimized rows (distancefrag.py:286-307)
    -> one batched ViSNet call per fragment family (dipeptides, ACE-NMEs)
    -> energy combine E = sum(E_dip) - sum(E_ace) and force stitching via
       a single segment_sum (reference combiner.py:12-41 scatter-add)

The reference's per-device chunking, thread pools and work partitioner
(device_strategy.py:84-127, bonded.py:51-83) disappear: the fragment batch
is one tensor; multi-chip scaling shards the row axis (ai2bmd_tpu.parallel).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ai2bmd_tpu.frag import hydrogen as H
from ai2bmd_tpu.frag.indexer import ACENME_Z, FragmentIndex
from ai2bmd_tpu.frag.topology import build_type_topology
from ai2bmd_tpu.models import visnet as V

# Dipeptide size-bucket widths (the row slot count S is always appended).
# Multiples of 8 only: Mosaic requires the fused edge kernels' center-atom
# tile (blocked second-to-minor dim) to be a multiple of 8, so finer
# widths (20/28/36, ~1.15x fewer edge cells) cannot lower on TPU — a
# sub-8 i_tile was tried in r4 and rejected by the Pallas TPU lowering.
# Shared with the mp-sharded layout (parallel/sharding.py
# bucket_shard_order).
BUCKET_WIDTHS = (24, 32)


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class _Static:
    n_atoms: int
    n_rows: int
    slots: int
    n_ace: int
    opt_iters: int


@dataclasses.dataclass
class FragmentRuntime:
    """Static device-side arrays derived from a FragmentIndex."""

    static: _Static
    gather_idx: Any          # [R,S] int32
    cap_dir_idx: Any         # [R,S] int32
    cap_radius: Any          # [R,S,1] f32
    is_cap: Any              # [R,S] bool
    valid: Any               # [R,S] bool
    row_z: Any               # [R,S] int32
    row_has_atoms: Any       # [R] bool
    pad_pos: Any             # [R,S,3] parking positions for padding slots
    ace_rows: Any            # [C,12] int32
    ace_slots: Any           # [C,12] int32
    ace_z: Any               # [C,12] int32
    ace_valid: Any           # [C] bool (False for row-padding)
    dip_dst: Any             # [R,S] int32 stitch target (n_atoms = dump)
    ace_dst: Any             # [C,12] int32
    ht: H.HydrogenTables
    # ACE-NME batch at width 16 (separate from the dipeptide width)
    ace_z16: Any = None      # [C, 16]
    ace_mask16: Any = None   # [C, 16]
    ace_dst16: Any = None    # [C, 16]
    ace_park: Any = None     # [C, 16, 3] parking coords for padding slots
    # dipeptide rows bucketed by atom count: list of
    # (width, row_idx [r], z [r,width], valid [r,width], dst [r,width],
    #  has_atoms [r]) — dense edge tensors scale with width^2, and the
    # median dipeptide (26 atoms) wastes ~2.4x in a uniform 40-slot batch;
    # per-size ViSNet calls (BUCKET_WIDTHS + S, all MXU-tileable) cut the
    # edge area 1.4-1.9x on the bundled proteins.  `valid` is a per-row
    # prefix mask, so truncating a row to its bucket width drops only
    # parked padding.
    dip_buckets: Any = None

    @classmethod
    def build(
        cls, fi: FragmentIndex, opt_iters: int = 10, row_multiple: int = 1
    ) -> "FragmentRuntime":
        """row_multiple pads both the dipeptide-row and ACE-NME axes so they
        divide evenly across a mesh axis (ai2bmd_tpu.parallel)."""
        fi = _pad_rows(fi, row_multiple)
        R, S = fi.n_rows, fi.slots
        top = build_type_topology(sorted({t for t in fi.row_prmtop if t}))
        ht = H.HydrogenTables.build(
            top, [t if t else top.names[0] for t in fi.row_prmtop], fi.is_cap
        )
        # empty rows must not optimize anything
        ht.free = ht.free * (fi.row_natom > 0)[:, None, None]
        # park padding slots far away and far apart
        r_idx, s_idx = np.meshgrid(np.arange(R), np.arange(S), indexing="ij")
        pad_pos = np.stack(
            [1e4 + 200.0 * r_idx, 1e4 + 200.0 * s_idx, np.zeros_like(r_idx, dtype=float)],
            axis=-1,
        ).astype(np.float32)

        real = fi.valid & ~fi.is_cap
        dip_dst = np.where(real, fi.gather_idx, fi.n_atoms).astype(np.int32)
        ace_valid = np.arange(len(fi.ace_rows)) < fi.n_acenmes
        ace_dst = np.where(
            (~fi.ace_is_cap) & ace_valid[:, None], fi.ace_origin, fi.n_atoms
        ).astype(np.int32)

        # ACE-NME batch at its own (smaller) slot width for tiling: the
        # 12-atom units pad to S_ACE=16 instead of the dipeptide width —
        # edge tensors scale with slots^2, so keeping the two fragment
        # families at separate widths cuts HBM traffic ~2.5x vs one batch
        C = len(fi.ace_rows)
        from ai2bmd_tpu.frag.indexer import ACENME_LEN

        S_ACE = 16
        ace_z16 = np.zeros((C, S_ACE), np.int32)
        ace_z16[:, :ACENME_LEN] = np.where(ace_valid[:, None], ACENME_Z[None, :], 0)
        ace_mask16 = np.zeros((C, S_ACE), bool)
        ace_mask16[:, :ACENME_LEN] = ace_valid[:, None]
        ace_dst16 = np.full((C, S_ACE), fi.n_atoms, np.int32)
        ace_dst16[:, :ACENME_LEN] = ace_dst
        c_idx, s_idx = np.meshgrid(np.arange(C), np.arange(S_ACE), indexing="ij")
        ace_park = np.stack(
            [3e4 + 200.0 * c_idx, 3e4 + 200.0 * s_idx, np.zeros_like(c_idx, float)],
            axis=-1,
        ).astype(np.float32)

        # size buckets for the dipeptide ViSNet batch (empty rows excluded)
        widths = [w for w in BUCKET_WIDTHS if w < S]
        widths.append(S)
        buckets = []
        natom = fi.row_natom
        lo = 0
        for w in widths:
            sel = np.where((natom > lo) & (natom <= w))[0]
            lo = w
            if len(sel) == 0:
                continue
            buckets.append((
                int(w),
                jnp.asarray(sel.astype(np.int32)),
                jnp.asarray(fi.row_z[sel, :w]),
                jnp.asarray(fi.valid[sel, :w]),
                jnp.asarray(dip_dst[sel, :w]),
                jnp.asarray((natom[sel] > 0)),
            ))

        return cls(
            static=_Static(fi.n_atoms, R, S, len(fi.ace_rows), opt_iters),
            gather_idx=jnp.asarray(fi.gather_idx),
            cap_dir_idx=jnp.asarray(fi.cap_dir_idx),
            cap_radius=jnp.asarray(fi.cap_radius[..., None]),
            is_cap=jnp.asarray(fi.is_cap),
            valid=jnp.asarray(fi.valid),
            row_z=jnp.asarray(fi.row_z),
            row_has_atoms=jnp.asarray(fi.row_natom > 0),
            pad_pos=jnp.asarray(pad_pos),
            ace_rows=jnp.asarray(fi.ace_rows),
            ace_slots=jnp.asarray(fi.ace_slots),
            ace_z=jnp.asarray(np.tile(ACENME_Z, (len(fi.ace_rows), 1))),
            ace_valid=jnp.asarray(ace_valid),
            dip_dst=jnp.asarray(dip_dst),
            ace_dst=jnp.asarray(ace_dst),
            ht=ht,
            ace_z16=jnp.asarray(ace_z16),
            ace_mask16=jnp.asarray(ace_mask16),
            ace_dst16=jnp.asarray(ace_dst16),
            ace_park=jnp.asarray(ace_park),
            dip_buckets=buckets,
        )


def _pad_rows(fi: FragmentIndex, multiple: int) -> FragmentIndex:
    """Pad the row and ACE-NME axes to a multiple (empty rows / dummy aces)
    so they shard evenly across a mesh axis.  n_dipeptides / n_acenmes keep
    their true values; padded aces index row 0 and are masked out via
    ace_valid (= index < n_acenmes)."""
    if multiple <= 1:
        return fi
    R = fi.n_rows
    Rp = ((R + multiple - 1) // multiple) * multiple
    C = len(fi.ace_rows)
    Cp = ((C + multiple - 1) // multiple) * multiple
    if Rp == R and Cp == C:
        return fi

    def pad2(a, n, fill=0):
        if n == a.shape[0]:
            return a
        widths = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, widths, constant_values=fill)

    return dataclasses.replace(
        fi,
        n_rows=Rp,
        row_type=fi.row_type + [""] * (Rp - R),
        row_prmtop=fi.row_prmtop + [""] * (Rp - R),
        row_natom=pad2(fi.row_natom, Rp),
        row_z=pad2(fi.row_z, Rp),
        valid=pad2(fi.valid, Rp),
        is_cap=pad2(fi.is_cap, Rp),
        gather_idx=pad2(fi.gather_idx, Rp),
        cap_dir_idx=pad2(fi.cap_dir_idx, Rp),
        cap_radius=pad2(fi.cap_radius, Rp),
        ace_rows=pad2(fi.ace_rows, Cp),
        ace_slots=pad2(fi.ace_slots, Cp),
    )


def build_row_positions(rt: FragmentRuntime, P: jnp.ndarray) -> jnp.ndarray:
    """Protein positions [N,3] -> dipeptide rows [R,S,3] with placed caps."""
    base = P[rt.gather_idx]                       # acceptor (or the atom itself)
    direction = P[rt.cap_dir_idx] - base
    unit = H._safe_unit(direction)
    capped = base + unit * rt.cap_radius
    pos = jnp.where(rt.is_cap[..., None], capped, base)
    return jnp.where(rt.valid[..., None], pos, rt.pad_pos)


def fragment_energy_forces(
    params: dict,
    rt: FragmentRuntime,
    P: jnp.ndarray,
    cfg: V.ViSNetConfig,
):
    """Bonded (ML) fragment energy/forces.

    Returns (E_bonded scalar [eV], F [N,3] [eV/A]).  Force stitching matches
    the reference exactly: cap-H forces are discarded, dipeptide forces add,
    ACE-NME forces subtract, scatter-added onto protein atoms
    (combiner.py:23-41); gradients are NOT propagated through cap placement
    or cap optimization (the reference's autograd graph also stops at the
    fragment positions).
    """
    N = rt.static.n_atoms
    pos = build_row_positions(rt, P)
    pos = jax.lax.stop_gradient(
        H.optimize_caps(rt.ht, pos, n_iter=rt.static.opt_iters)
    )

    return _fragment_terms(params, rt, pos, cfg)


def _fragment_terms(params, rt: FragmentRuntime, pos, cfg):
    """ViSNet over both fragment families + stitching, given optimized rows.

    The dipeptide batch runs one ViSNet call per size bucket (24/32/40
    slots): rows are prefix-valid, so slicing a row to its bucket width is
    exact, and the dense [r, w, w] edge tensors shrink quadratically."""
    N = rt.static.n_atoms
    energy = jnp.zeros((), pos.dtype)
    srcs, dsts = [], []
    for w, idx, z_b, valid_b, dst_b, has_b in rt.dip_buckets:
        e_b, f_b = V.energy_and_forces(params, z_b, pos[idx, :w], valid_b, cfg)
        energy = energy + jnp.sum(e_b * has_b)
        srcs.append(f_b.reshape(-1, 3))
        dsts.append(dst_b.reshape(-1))

    # ACE-NME views (first/last 6 template slots of consecutive dipeptides)
    ace_pos = jnp.where(
        rt.ace_mask16[..., None],
        jnp.pad(pos[rt.ace_rows, rt.ace_slots], ((0, 0), (0, 4), (0, 0))),
        rt.ace_park,
    )
    e_a, f_a = V.energy_and_forces(params, rt.ace_z16, ace_pos, rt.ace_mask16, cfg)

    energy = energy - jnp.sum(e_a * rt.ace_valid)

    flat_src = jnp.concatenate(srcs + [-f_a.reshape(-1, 3)])
    flat_dst = jnp.concatenate(dsts + [rt.ace_dst16.reshape(-1)])
    forces = jax.ops.segment_sum(flat_src, flat_dst, num_segments=N + 1)[:N]
    return energy, forces


def fragment_energy_forces_warm(
    params: dict,
    rt: FragmentRuntime,
    P: jnp.ndarray,
    cfg: V.ViSNetConfig,
    cap_delta: jnp.ndarray,
    warm_iters: int = 1,
):
    """Warm-started variant: cap hydrogens start from the previous step's
    optimized offsets (relative to the geometric placement), so a few
    L-BFGS iterations reach the same quality as a cold 10-iteration solve
    (positions move <0.05 A per 1 fs step).  Returns (E, F, new_delta)."""
    free = rt.is_cap[..., None]
    pos_geo = build_row_positions(rt, P)
    pos0 = pos_geo + jnp.where(free, cap_delta, 0.0)
    pos = jax.lax.stop_gradient(H.optimize_caps(rt.ht, pos0, n_iter=warm_iters))
    new_delta = jnp.where(free, pos - pos_geo, 0.0)
    energy, forces = _fragment_terms(params, rt, pos, cfg)
    return energy, forces, new_delta


def initial_cap_delta(rt: FragmentRuntime, P: jnp.ndarray, n_iter: int = 10):
    """Cold-start offsets for the warm path (full optimization once)."""
    pos_geo = build_row_positions(rt, P)
    pos = H.optimize_caps(rt.ht, pos_geo, n_iter=n_iter)
    return jnp.where(rt.is_cap[..., None], pos - pos_geo, 0.0)


# ---------------------------------------------------------------------------
# replica-batched evaluation (ensemble MD: BASELINE config 5)
# ---------------------------------------------------------------------------

def batched_fragment_terms(params, rt: FragmentRuntime, pos, cfg):
    """ViSNet + stitching over Rl replicas' optimized rows IN ONE CALL.

    pos [Rl, B, S, 3] -> (E [Rl], F [Rl, N, 3]).  Instead of vmapping the
    potential over replicas (which multiplies every O(A^2) edge tensor by
    Rl with no reuse — the round-1 anti-scaling), the replica and row axes
    fold into one batch: the MXU sees a [Rl*B] fragment batch, identical
    math per replica, one kernel launch per layer."""
    N = rt.static.n_atoms
    Rl, B, S, _ = pos.shape

    def bflat(a):
        return jnp.broadcast_to(a, (Rl,) + a.shape).reshape((Rl * a.shape[0],) + a.shape[1:])

    energy = jnp.zeros((Rl,), pos.dtype)
    srcs, dsts = [], []
    for w, idx, z_b, valid_b, dst_b, has_b in rt.dip_buckets:
        r = idx.shape[0]
        e_b, f_b = V.energy_and_forces(
            params, bflat(z_b), pos[:, idx, :w].reshape(Rl * r, w, 3),
            bflat(valid_b), cfg,
        )
        energy = energy + jnp.sum(e_b.reshape(Rl, r) * has_b, axis=1)
        srcs.append(f_b.reshape(Rl, -1, 3))
        dsts.append(jnp.broadcast_to(dst_b.reshape(-1), (r * w,)))

    ace_pos = pos[:, rt.ace_rows, rt.ace_slots]          # [Rl, C, 12, 3]
    ace_pos = jnp.where(
        rt.ace_mask16[..., None],
        jnp.pad(ace_pos, ((0, 0), (0, 0), (0, 4), (0, 0))),
        rt.ace_park,
    )
    C, S_A = rt.ace_z16.shape
    e_a, f_a = V.energy_and_forces(
        params, bflat(rt.ace_z16), ace_pos.reshape(Rl * C, S_A, 3),
        bflat(rt.ace_mask16), cfg,
    )
    e_a = e_a.reshape(Rl, C)
    f_a = f_a.reshape(Rl, C, S_A, 3)

    energy = energy - jnp.sum(e_a * rt.ace_valid, axis=1)
    flat_src = jnp.concatenate(srcs + [-f_a.reshape(Rl, -1, 3)], axis=1)
    flat_dst = jnp.concatenate(dsts + [rt.ace_dst16.reshape(-1)])
    forces = jax.vmap(
        lambda s: jax.ops.segment_sum(s, flat_dst, num_segments=N + 1)[:N]
    )(flat_src)
    return energy, forces


def ensemble_fragment_energy_forces_warm(
    params,
    rt: FragmentRuntime,
    Ps: jnp.ndarray,
    cfg,
    cap_delta: jnp.ndarray,
    warm_iters: int = 1,
    replica_chunk: int = 8,
):
    """Warm-started fragment potential over Rl replicas.

    Ps [Rl, N, 3]; cap_delta [Rl, B, S, 3].  Cap optimization runs
    PER REPLICA (vmapped joint L-BFGS — numerically identical to the
    single-replica path; replicas stay independent).  The ViSNet
    evaluation is replica-batched and processed in `replica_chunk`-sized
    chunks under lax.map: each chunk's force grad is internal to the
    chunk, so peak memory is one chunk's layer residuals — flat in Rl —
    while the MXU still sees chunk*B-row batches."""
    free = rt.is_cap[..., None]
    pos_geo = jax.vmap(lambda P: build_row_positions(rt, P))(Ps)
    pos0 = pos_geo + jnp.where(free, cap_delta, 0.0)
    pos = jax.lax.stop_gradient(
        jax.vmap(lambda p: H.optimize_caps(rt.ht, p, n_iter=warm_iters))(pos0)
    )
    new_delta = jnp.where(free, pos - pos_geo, 0.0)

    Rl = Ps.shape[0]
    c = replica_chunk if replica_chunk > 0 else Rl
    c = min(c, Rl)
    if Rl % c:
        c = Rl
    chunks = pos.reshape(Rl // c, c, *pos.shape[1:])
    e, f = jax.lax.map(
        lambda p: batched_fragment_terms(params, rt, p, cfg), chunks
    )
    N = rt.static.n_atoms
    return e.reshape(Rl), f.reshape(Rl, N, 3), new_delta


def initial_cap_delta_batched(rt: FragmentRuntime, Ps, n_iter: int = 10):
    return jax.vmap(lambda P: initial_cap_delta(rt, P, n_iter))(Ps)

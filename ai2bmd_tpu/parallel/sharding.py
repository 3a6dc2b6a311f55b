"""Multi-chip MD: replica ensembles x fragment sharding via shard_map.

One jitted SPMD program per MD step over a ("dp", "mp") mesh:

  dp — replica axis: every state array carries a leading replica axis
       block-sharded over dp; replicas never communicate.
  mp — fragment axis within a replica: dipeptide rows + ACE-NME units are
       block-sharded.  Per step each shard (1) places and L-BFGS-optimizes
       its own rows' cap hydrogens (warm-started from the previous step,
       like the single-chip production path), (2) all-gathers the optimized
       row positions (a few 10s of KB, rides ICI) so ACE-NME units — which
       straddle two consecutive dipeptides — can be sliced locally,
       (3) runs ViSNet on its row/ACE shards — one call per SIZE BUCKET
       (24/32/40 slots), same as the single-chip path: rows are laid out
       so every device's contiguous block holds an equal slice of every
       bucket (see bucket_shard_order) — and (4) partial-stitches forces
       and psums them over mp.

This replaces the reference's whole parallelism stack: fragment-sharding
over GPUs with thread pools + host concat (bonded.py:51-89,
device_strategy.py:84-127), subprocess model replicas behind pickle RPC
(visnet_calculator.py:78-118), and per-step host<->device traffic — with
XLA collectives inside one program (SURVEY.md section 2 "TPU-native
mapping").
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ai2bmd_tpu.frag import hydrogen as H
from ai2bmd_tpu.frag.indexer import FragmentIndex
from ai2bmd_tpu.frag.runtime import FragmentRuntime
from ai2bmd_tpu.md import langevin as L
from ai2bmd_tpu.models import visnet as V
from ai2bmd_tpu.physics.nonbonded import NonbondedParams, nonbonded_energy
from ai2bmd_tpu.system import Protein


def bucket_shard_order(
    fi: FragmentIndex, n_mp: int, widths=None
) -> tuple[FragmentIndex, list[tuple[int, int, int]]]:
    """Reorder + pad dipeptide rows for bucketed mp-sharding.

    Returns (permuted fi, layout) where layout is a static list of
    (bucket_width, local_offset, local_rows): after block-sharding the row
    axis over n_mp devices, every device's contiguous row block contains
    local_rows rows of each size bucket at the same local offsets, so the
    per-device ViSNet calls are one per bucket with identical static
    shapes on every device — the same size-bucketed batches the
    single-chip path runs (frag/runtime.py dip_buckets), which a uniform
    block-sharding cannot provide (bucket membership is interleaved along
    the chain).  Buckets are padded to a multiple of n_mp with empty rows
    (natom 0, masked everywhere).
    """
    if widths is None:
        from ai2bmd_tpu.frag.runtime import BUCKET_WIDTHS
        widths = BUCKET_WIDTHS
    S = fi.slots
    ws = [w for w in widths if w < S] + [S]
    natom = np.asarray(fi.row_natom)
    R = fi.n_rows

    bucket_rows: list[np.ndarray] = []
    lo = -1  # empty rows (natom 0, merged-away CYX) land in bucket 0
    for w in ws:
        sel = np.where((natom > lo) & (natom <= w))[0]
        lo = w
        bucket_rows.append(sel)

    pads = [(-len(sel)) % n_mp for sel in bucket_rows]
    fi_ext = _append_empty_rows(fi, sum(pads))
    next_new = R
    padded: list[np.ndarray] = []
    for sel, pad in zip(bucket_rows, pads):
        extra = np.arange(next_new, next_new + pad)
        next_new += pad
        padded.append(np.concatenate([sel, extra]).astype(np.int64))

    r_loc = [len(p) // n_mp for p in padded]
    perm = np.concatenate(
        [
            padded[b][d * r_loc[b] : (d + 1) * r_loc[b]]
            for d in range(n_mp)
            for b in range(len(ws))
        ]
    )
    inv = np.empty(fi_ext.n_rows, np.int64)
    inv[perm] = np.arange(len(perm))

    layout = []
    off = 0
    for w, r in zip(ws, r_loc):
        if r:
            layout.append((int(w), int(off), int(r)))
        off += r

    fi_p = dataclasses.replace(
        fi_ext,
        row_type=[fi_ext.row_type[i] for i in perm],
        row_prmtop=[fi_ext.row_prmtop[i] for i in perm],
        row_natom=fi_ext.row_natom[perm],
        row_z=fi_ext.row_z[perm],
        valid=fi_ext.valid[perm],
        is_cap=fi_ext.is_cap[perm],
        gather_idx=fi_ext.gather_idx[perm],
        cap_dir_idx=fi_ext.cap_dir_idx[perm],
        cap_radius=fi_ext.cap_radius[perm],
        dip_row=inv[fi_ext.dip_row].astype(fi_ext.dip_row.dtype),
        ace_rows=inv[fi_ext.ace_rows].astype(fi_ext.ace_rows.dtype),
    )
    return fi_p, layout


def _append_empty_rows(fi: FragmentIndex, n: int) -> FragmentIndex:
    if n == 0:
        return fi
    R = fi.n_rows

    def pad2(a, fill=0):
        widths = [(0, n)] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, widths, constant_values=fill)

    return dataclasses.replace(
        fi,
        n_rows=R + n,
        row_type=fi.row_type + [""] * n,
        row_prmtop=fi.row_prmtop + [""] * n,
        row_natom=pad2(fi.row_natom),
        row_z=pad2(fi.row_z),
        valid=pad2(fi.valid),
        is_cap=pad2(fi.is_cap),
        gather_idx=pad2(fi.gather_idx),
        cap_dir_idx=pad2(fi.cap_dir_idx),
        cap_radius=pad2(fi.cap_radius),
    )


@dataclasses.dataclass
class ShardedPotential:
    """The fragment D&C potential of one protein, block-sharded along the
    fragment-row axis of a mesh's "mp" axis, with the single-chip
    optimizations (size-bucketed ViSNet batches, warm-started cap
    optimization, 16-slot ACE-NME batch) applied per shard.

    `local_fn(Prep, row, ace, cap_delta, warm_iters)` is the per-device
    function (must run under the mesh, e.g. inside a shard_map body) and
    returns psum'd (E, F, new_cap_delta); `row_sh`/`ace_sh` are the
    device_put fragment shards.  `energy_forces(P)` evaluates one
    replica's (E, F) on the mesh directly from a cold cap start — it is
    numerically identical to the single-device
    `FragmentPotential.energy_forces` path and exists so tests can assert
    that equivalence (VERDICT round 1, item 5).
    """

    mesh: Mesh
    local_fn: Any
    row_sh: dict
    ace_sh: dict
    row_spec: dict
    ace_spec: dict
    rt: FragmentRuntime
    opt_iters: int
    delta_spec: Any

    @classmethod
    def build(
        cls,
        prot: Protein,
        fi: FragmentIndex,
        params: dict,
        cfg: V.ViSNetConfig,
        mesh: Mesh,
        opt_iters: int = 10,
    ) -> "ShardedPotential":
        cfg = V.resolve_config(cfg)
        n_mp = mesh.shape["mp"]
        fi, layout = bucket_shard_order(fi, n_mp)
        # row axis is already a multiple of n_mp; row_multiple only pads
        # the ACE-NME axis so it block-shards evenly
        rt = FragmentRuntime.build(fi, opt_iters=opt_iters, row_multiple=n_mp)
        nb = NonbondedParams.build(prot, fi.exclusion_mask())
        n_atoms = len(prot)

        # arrays sharded along the fragment-row axis
        row_sh = dict(
            gather_idx=rt.gather_idx,
            cap_dir_idx=rt.cap_dir_idx,
            cap_radius=rt.cap_radius,
            is_cap=rt.is_cap,
            valid=rt.valid,
            row_z=rt.row_z,
            row_has_atoms=rt.row_has_atoms,
            pad_pos=rt.pad_pos,
            dip_dst=rt.dip_dst,
            type_id=rt.ht.type_id,
            free=rt.ht.free,
        )
        ace_sh = dict(
            ace_rows=rt.ace_rows,
            ace_slots=rt.ace_slots,
            ace_z16=rt.ace_z16,
            ace_mask16=rt.ace_mask16,
            ace_dst16=rt.ace_dst16,
            ace_park=rt.ace_park,
            ace_valid=rt.ace_valid,
        )
        ht_tables = rt.ht.tables
        scee, scnb = rt.ht.scee, rt.ht.scnb

        def local_potential(Prep, row, ace, cap_delta, warm_iters):
            """Per-replica potential evaluated on this device's shards.
            Must be called under the mesh axes; returns psum'd
            (E, F, new_cap_delta)."""
            base = Prep[row["gather_idx"]]
            unit = H._safe_unit(Prep[row["cap_dir_idx"]] - base)
            pos_geo = jnp.where(
                row["is_cap"][..., None], base + unit * row["cap_radius"], base
            )
            pos_geo = jnp.where(row["valid"][..., None], pos_geo, row["pad_pos"])
            free = row["is_cap"][..., None]
            pos0 = pos_geo + jnp.where(free, cap_delta, 0.0)

            ht_local = H.HydrogenTables(
                tables=ht_tables, type_id=row["type_id"], free=row["free"],
                scee=scee, scnb=scnb,
            )
            pos = jax.lax.stop_gradient(
                H.optimize_caps(ht_local, pos0, n_iter=warm_iters, axis_name="mp")
            )
            new_delta = jnp.where(free, pos - pos_geo, 0.0)

            pos_all = jax.lax.all_gather(pos, "mp", axis=0, tiled=True)

            # one ViSNet call per size bucket on this device's row block
            e_local = jnp.zeros((), pos.dtype)
            srcs, dsts = [], []
            for w, off, r in layout:
                e_b, f_b = V.energy_and_forces(
                    params,
                    row["row_z"][off : off + r, :w],
                    pos[off : off + r, :w],
                    row["valid"][off : off + r, :w],
                    cfg,
                )
                e_local = e_local + jnp.sum(
                    e_b * row["row_has_atoms"][off : off + r]
                )
                srcs.append(f_b.reshape(-1, 3))
                dsts.append(row["dip_dst"][off : off + r, :w].reshape(-1))

            # ACE-NME batch at width 16 with parked padding slots
            ace_pos = jnp.where(
                ace["ace_mask16"][..., None],
                jnp.pad(
                    pos_all[ace["ace_rows"], ace["ace_slots"]],
                    ((0, 0), (0, 4), (0, 0)),
                ),
                ace["ace_park"],
            )
            e_a, f_a = V.energy_and_forces(
                params, ace["ace_z16"], ace_pos, ace["ace_mask16"], cfg
            )
            e_local = e_local - jnp.sum(e_a * ace["ace_valid"])
            srcs.append(-f_a.reshape(-1, 3))
            dsts.append(ace["ace_dst16"].reshape(-1))

            f_partial = jax.ops.segment_sum(
                jnp.concatenate(srcs), jnp.concatenate(dsts),
                num_segments=n_atoms + 1,
            )[:n_atoms]

            e_b = jax.lax.psum(e_local, "mp")
            f_b = jax.lax.psum(f_partial, "mp")

            # long-range terms: cheap for protein sizes, evaluated replicated
            e_nb, g_nb = jax.value_and_grad(lambda p: nonbonded_energy(nb, p))(Prep)
            return e_b + e_nb, f_b - g_nb, new_delta

        row_spec = {k: P("mp", *(None,) * (np.ndim(v) - 1)) for k, v in row_sh.items()}
        ace_spec = {k: P("mp", *(None,) * (np.ndim(v) - 1)) for k, v in ace_sh.items()}
        row_sh = jax.device_put(
            row_sh, {k: NamedSharding(mesh, s) for k, s in row_spec.items()}
        )
        ace_sh = jax.device_put(
            ace_sh, {k: NamedSharding(mesh, s) for k, s in ace_spec.items()}
        )
        return cls(
            mesh=mesh, local_fn=local_potential,
            row_sh=row_sh, ace_sh=ace_sh,
            row_spec=row_spec, ace_spec=ace_spec,
            rt=rt, opt_iters=opt_iters,
            delta_spec=P("mp", None, None),
        )

    def energy_forces(self, Pos):
        """One replica's (E, F) evaluated on the sharded mesh; Pos [N,3]
        replicated.  Cold cap start (opt_iters full iterations) —
        numerically equal to the single-device cold path."""
        R, S = self.rt.static.n_rows, self.rt.static.slots

        def fn(Pos, row, ace, delta):
            e, f, _ = self.local_fn(Pos, row, ace, delta, self.opt_iters)
            return e, f

        sharded = jax.shard_map(
            fn,
            mesh=self.mesh,
            in_specs=(P(), self.row_spec, self.ace_spec, self.delta_spec),
            out_specs=(P(), P()),
            check_vma=False,
        )
        zero = jnp.zeros((R, S, 3), jnp.float32)
        return jax.jit(sharded)(Pos, self.row_sh, self.ace_sh, zero)

    def initial_cap_delta(self, Pos):
        """Cold-start cap offsets (replicated input, sharded output)."""

        def fn(Pos, row, ace, delta):
            _, _, nd = self.local_fn(Pos, row, ace, delta, self.opt_iters)
            return nd

        sharded = jax.shard_map(
            fn,
            mesh=self.mesh,
            in_specs=(P(), self.row_spec, self.ace_spec, self.delta_spec),
            out_specs=self.delta_spec,
            check_vma=False,
        )
        R, S = self.rt.static.n_rows, self.rt.static.slots
        zero = jnp.zeros((R, S, 3), jnp.float32)
        return jax.jit(sharded)(Pos, self.row_sh, self.ace_sh, zero)


@dataclasses.dataclass
class ReplicaEnsemble:
    """n_replicas independent Langevin trajectories with a REPLICA-BATCHED
    force evaluation (BASELINE config 5: 64 chig replicas per chip).

    The round-1 approach — vmapping the full potential over replicas —
    anti-scaled: every O(A^2) edge tensor multiplied by R, OOM without
    remat, ~178 ms/replica-step at R=8.  Here the replica and fragment-row
    axes fold into one ViSNet batch (frag.runtime.batched_fragment_terms),
    evaluated in fixed-size replica chunks under lax.map so peak HBM is one
    chunk's layer residuals regardless of R, while per-replica RNG/cap
    streams stay bitwise those of a lone replica.  Replicas shard over the
    mesh's dp axis; each device batches its local block.
    """

    mesh: Mesh | None
    n_replicas: int
    step_fn: Any
    masses: Any

    @classmethod
    def build(
        cls,
        prot: Protein,
        fi: FragmentIndex,
        params: dict,
        cfg: V.ViSNetConfig,
        n_replicas: int,
        mesh: Mesh | None = None,      # dp-sharded when given; 1 chip else
        timestep_fs: float = 1.0,
        temp_K: float = 300.0,
        friction_per_fs: float = 0.001,
        steps_per_call: int = 1,
        warm_iters: int = 1,
        replica_chunk: int = 8,
    ) -> "ReplicaEnsemble":
        from ai2bmd_tpu.frag.runtime import (
            ensemble_fragment_energy_forces_warm,
        )

        cfg = V.resolve_config(cfg)
        rt = FragmentRuntime.build(fi)
        nb = NonbondedParams.build(prot, fi.exclusion_mask())
        masses = jnp.asarray(prot.masses, jnp.float32)
        coeffs = L.LangevinCoeffs.build(masses, timestep_fs, temp_K, friction_per_fs)

        def batched_potential(Ps, deltas):
            e_b, f_b, nd = ensemble_fragment_energy_forces_warm(
                params, rt, Ps, cfg, deltas,
                warm_iters=warm_iters, replica_chunk=replica_chunk,
            )
            e_nb, g_nb = jax.vmap(
                jax.value_and_grad(lambda p: nonbonded_energy(nb, p))
            )(Ps)
            return e_b + e_nb, f_b - g_nb, nd

        def device_fn(state):
            def body(s, _):
                return L.langevin_step_batched(
                    batched_potential, coeffs, masses, s
                ), None

            return jax.lax.scan(body, state, None, length=steps_per_call)[0]

        if mesh is not None:
            n_dp = mesh.shape["dp"]
            if n_replicas % n_dp:
                raise ValueError(
                    f"{n_replicas} replicas do not shard over dp={n_dp}"
                )
            spec = L.MDState(
                positions=P("dp", None, None), velocities=P("dp", None, None),
                forces=P("dp", None, None), energy=P("dp"), key=P("dp", None),
                step=P("dp"), aux=P("dp", None, None, None),
            )
            sharded = jax.shard_map(
                device_fn, mesh=mesh, in_specs=(spec,), out_specs=spec,
                check_vma=False,
            )
            step_fn = jax.jit(sharded)
        else:
            step_fn = jax.jit(device_fn)

        obj = cls(mesh=mesh, n_replicas=n_replicas, step_fn=step_fn,
                  masses=masses)
        obj._rt, obj._cfg, obj._params = rt, cfg, params
        obj._warm_iters = warm_iters
        obj._batched_potential = batched_potential
        return obj

    def initial_state(self, positions: np.ndarray, temp_K: float = 300.0,
                      seed: int = 0, opt_iters: int = 10):
        from ai2bmd_tpu.frag.runtime import initial_cap_delta_batched

        n = self.n_replicas
        keys = jax.random.split(jax.random.PRNGKey(seed), 2 * n)
        init_keys, run_keys = keys[:n], keys[n:]
        vel = jax.vmap(
            lambda k: L.maxwell_boltzmann_velocities(k, self.masses, temp_K)
        )(init_keys)
        pos = jnp.broadcast_to(
            jnp.asarray(positions, jnp.float32), (n,) + positions.shape
        )
        deltas = jax.jit(
            lambda P: initial_cap_delta_batched(self._rt, P, opt_iters)
        )(pos)
        # real first forces: seeding zeros would give every replica a
        # zero-force first Langevin half-kick (one-step transient)
        energy0, forces0, deltas = jax.jit(self._batched_potential)(
            pos, deltas
        )
        state = L.MDState(
            positions=pos,
            velocities=vel,
            forces=forces0,
            energy=energy0,
            key=run_keys,
            step=jnp.zeros((n,), jnp.int32),
            aux=deltas,
        )
        if self.mesh is None:
            return state
        spec = L.MDState(
            positions=P("dp", None, None), velocities=P("dp", None, None),
            forces=P("dp", None, None), energy=P("dp"), key=P("dp", None),
            step=P("dp"), aux=P("dp", None, None, None),
        )
        return jax.device_put(
            state,
            jax.tree.map(
                lambda s: NamedSharding(self.mesh, s), spec,
                is_leaf=lambda x: isinstance(x, P),
            ),
        )

    def run(self, state, n_calls: int):
        for _ in range(n_calls):
            state = self.step_fn(state)
        return state


@dataclasses.dataclass
class EnsembleSimulation:
    """n_replicas independent Langevin trajectories of one protein,
    force-evaluated with mp-sharded fragments (bucketed ViSNet batches +
    warm-started caps, like the single-chip production path)."""

    mesh: Mesh
    n_replicas: int
    step_fn: Any          # jitted: state-pytree -> state-pytree
    masses: Any
    _sharded_args: Any
    _sp: ShardedPotential = None

    @classmethod
    def build(
        cls,
        prot: Protein,
        fi: FragmentIndex,
        params: dict,
        cfg: V.ViSNetConfig,
        mesh: Mesh,
        n_replicas: int,
        timestep_fs: float = 1.0,
        temp_K: float = 300.0,
        friction_per_fs: float = 0.001,
        steps_per_call: int = 1,
        opt_iters: int = 10,
        warm_iters: int = 1,
    ) -> "EnsembleSimulation":
        n_dp = mesh.shape["dp"]
        if n_replicas % n_dp:
            raise ValueError(f"{n_replicas} replicas do not shard over dp={n_dp}")
        sp = ShardedPotential.build(prot, fi, params, cfg, mesh, opt_iters=opt_iters)
        local_potential = sp.local_fn
        row_sh, ace_sh = sp.row_sh, sp.ace_sh
        row_spec, ace_spec = sp.row_spec, sp.ace_spec
        masses = jnp.asarray(prot.masses, jnp.float32)
        coeffs = L.LangevinCoeffs.build(masses, timestep_fs, temp_K, friction_per_fs)

        def device_fn(state, row, ace):
            """Executes per device: local replica block x local fragment
            shard; state.aux carries the per-replica warm cap deltas."""

            def one_replica(s):
                def body(s, _):
                    s = L.langevin_step(
                        lambda Prep, delta: local_potential(
                            Prep, row, ace, delta, warm_iters
                        ),
                        coeffs, masses, s,
                    )
                    return s, None

                s, _ = jax.lax.scan(body, s, None, length=steps_per_call)
                return s

            return jax.vmap(one_replica)(state)

        state_spec = L.MDState(
            positions=P("dp", None, None),
            velocities=P("dp", None, None),
            forces=P("dp", None, None),
            energy=P("dp"),
            key=P("dp", None),
            step=P("dp"),
            aux=P("dp", "mp", None, None),
        )
        sharded = jax.shard_map(
            device_fn,
            mesh=mesh,
            in_specs=(state_spec, row_spec, ace_spec),
            out_specs=state_spec,
            check_vma=False,
        )

        step_fn = jax.jit(lambda st: sharded(st, row_sh, ace_sh))
        return cls(
            mesh=mesh, n_replicas=n_replicas, step_fn=step_fn,
            masses=masses, _sharded_args=(row_sh, ace_sh), _sp=sp,
        )

    # ------------------------------------------------------------------
    def initial_state(self, positions: np.ndarray, temp_K: float = 300.0, seed: int = 0):
        n = self.n_replicas
        sp = self._sp
        keys = jax.random.split(jax.random.PRNGKey(seed), 2 * n)
        init_keys, run_keys = keys[:n], keys[n:]
        vel = jax.vmap(
            lambda k: L.maxwell_boltzmann_velocities(k, self.masses, temp_K)
        )(init_keys)
        pos = jnp.broadcast_to(
            jnp.asarray(positions, jnp.float32), (n,) + positions.shape
        )
        # cold-start cap deltas + real first forces (every replica starts
        # from the same positions, so one evaluation serves all)
        delta0 = sp.initial_cap_delta(pos[0])
        e0, f0 = sp.energy_forces(pos[0])
        state = L.MDState(
            positions=pos,
            velocities=vel,
            forces=jnp.broadcast_to(f0, pos.shape),
            energy=jnp.broadcast_to(e0, (n,)),
            key=run_keys,
            step=jnp.zeros((n,), jnp.int32),
            aux=jnp.broadcast_to(delta0, (n,) + delta0.shape),
        )
        spec = L.MDState(
            positions=P("dp", None, None), velocities=P("dp", None, None),
            forces=P("dp", None, None), energy=P("dp"), key=P("dp", None),
            step=P("dp"), aux=P("dp", "mp", None, None),
        )
        return jax.device_put(
            state,
            jax.tree.map(
                lambda s: NamedSharding(self.mesh, s), spec,
                is_leaf=lambda x: isinstance(x, P),
            ),
        )

    def run(self, state, n_calls: int):
        for _ in range(n_calls):
            state = self.step_fn(state)
        return state


@dataclasses.dataclass
class SolvatedReplicaEnsemble:
    """n_replicas independent SOLVATED QM/MM Langevin trajectories with
    the replica axis block-sharded over a "dp" mesh axis (VERDICT round 2,
    item 7: the reference runs its sampling workloads on the solvated box,
    reference src/AIMD/simulator.py:119-137).

    One solvated step (17.9k-atom dense MM + fragment ViSNet) already
    fills a chip, so replicas scale ACROSS devices: each device runs its
    local replica block sequentially under lax.map (a vmap would multiply
    the dense [tile, N] pair slabs by the local replica count and OOM).
    Requires the dense QM/MM pair backend — its aux carries no neighbor
    list, so every replica shares one static program with no per-replica
    rebuild cond.
    """

    mesh: Mesh | None
    n_replicas: int
    step_fn: Any
    masses: Any
    cell: Any
    numbers: Any
    qm_idx: Any                 # protein atom indices (QM region)
    _qmmm: Any = None
    _coeffs: Any = None

    @classmethod
    def build(
        cls,
        atoms,                  # PDBAtoms of the solvated box
        params: dict,
        cfg: V.ViSNetConfig,
        n_replicas: int,
        mesh: Mesh | None = None,     # dp axis only; None = one device
        timestep_fs: float = 1.0,
        temp_K: float = 300.0,
        friction_per_fs: float = 0.001,
        steps_per_call: int = 1,
        warm_iters: int = 1,
        mm_backend: str = "ff19sb",
    ) -> "SolvatedReplicaEnsemble":
        from ai2bmd_tpu.physics.qmmm import QMMMPotential
        from ai2bmd_tpu.potentials import FragmentPotential

        cfg = V.resolve_config(cfg)
        full = Protein.from_atoms(atoms)
        qm_idx = full.protein_indices()
        if len(qm_idx) == len(full):
            raise ValueError(
                "input box has no solvent; use ReplicaEnsemble for vacuum "
                "fragment-mode ensembles"
            )
        prot = full.select(qm_idx)
        pot = FragmentPotential.build(prot, params, cfg, longrange="mm")
        qm_aux0 = pot.init_cap_delta(jnp.asarray(prot.positions, jnp.float32))
        qmmm = QMMMPotential.build(
            atoms,
            qm_stateful=lambda Pq, qa: pot.stateful_energy_forces(
                Pq, qa, warm_iters=warm_iters
            ),
            qm_init_aux=qm_aux0,
            mm_backend=mm_backend,
            pair_backend="dense",
        )
        masses = jnp.asarray(full.masses, jnp.float32)
        coeffs = L.LangevinCoeffs.build(
            masses, timestep_fs, temp_K, friction_per_fs
        )

        def device_fn(state):
            def one_replica(s):
                def body(s, _):
                    return L.langevin_step(qmmm, coeffs, masses, s), None

                return jax.lax.scan(body, s, None, length=steps_per_call)[0]

            return jax.lax.map(one_replica, state)

        if mesh is not None:
            n_dp = mesh.shape["dp"]
            if n_replicas % n_dp:
                raise ValueError(
                    f"{n_replicas} replicas do not shard over dp={n_dp}"
                )
            spec = cls._state_spec()
            sharded = jax.shard_map(
                device_fn, mesh=mesh, in_specs=(spec,), out_specs=spec,
                check_vma=False,
            )
            step_fn = jax.jit(sharded)
        else:
            step_fn = jax.jit(device_fn)

        return cls(
            mesh=mesh, n_replicas=n_replicas, step_fn=step_fn,
            masses=masses, cell=full.cell, numbers=full.numbers,
            qm_idx=qm_idx, _qmmm=qmmm, _coeffs=coeffs,
        )

    @staticmethod
    def _state_spec():
        # aux = ((), qm cap-delta array, ((), ()) mm carry) — mirrors the
        # dense-backend QMMMPotential aux pytree
        return L.MDState(
            positions=P("dp", None, None), velocities=P("dp", None, None),
            forces=P("dp", None, None), energy=P("dp"), key=P("dp", None),
            step=P("dp"), aux=((), P("dp", None, None, None), ((), ())),
        )

    def initial_state(self, positions: np.ndarray, temp_K: float = 300.0,
                      seed: int = 0):
        n = self.n_replicas
        keys = jax.random.split(jax.random.PRNGKey(seed), 2 * n)
        init_keys, run_keys = keys[:n], keys[n:]
        vel = jax.vmap(
            lambda k: L.maxwell_boltzmann_velocities(k, self.masses, temp_K)
        )(init_keys)
        pos = jnp.broadcast_to(
            jnp.asarray(positions, jnp.float32), (n,) + positions.shape
        )
        aux1 = self._qmmm.init_aux(pos[0])
        # real first forces (identical start => evaluate once, broadcast)
        e0, f0, aux1 = jax.jit(lambda p, a: self._qmmm(p, a))(pos[0], aux1)
        state = L.MDState(
            positions=pos,
            velocities=vel,
            forces=jnp.broadcast_to(f0, (n,) + f0.shape),
            energy=jnp.broadcast_to(e0, (n,)),
            key=run_keys,
            step=jnp.zeros((n,), jnp.int32),
            aux=jax.tree.map(
                lambda a: jnp.broadcast_to(a, (n,) + a.shape), aux1
            ),
        )
        if self.mesh is None:
            return state
        return jax.device_put(
            state,
            jax.tree.map(
                lambda s: NamedSharding(self.mesh, s), self._state_spec(),
                is_leaf=lambda x: isinstance(x, P),
            ),
        )

    def run(self, state, n_calls: int):
        for _ in range(n_calls):
            state = self.step_fn(state)
        return state

"""Multi-chip MD: replica ensembles x fragment sharding via shard_map.

One jitted SPMD program per MD step over a ("dp", "mp") mesh:

  dp — replica axis: every state array carries a leading replica axis
       block-sharded over dp; replicas never communicate.
  mp — fragment axis within a replica: dipeptide rows + ACE-NME units are
       block-sharded.  Per step each shard (1) places and L-BFGS-optimizes
       its own rows' cap hydrogens, (2) all-gathers the optimized row
       positions (a few 10s of KB, rides ICI) so ACE-NME units — which
       straddle two consecutive dipeptides — can be sliced locally,
       (3) runs ViSNet on its row/ACE shards, (4) partial-stitches forces
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


@dataclasses.dataclass
class ShardedPotential:
    """The fragment D&C potential of one protein, block-sharded along the
    fragment-row axis of a mesh's "mp" axis.

    `local_fn(Prep, row, ace)` is the per-device function (must run under
    the mesh, e.g. inside a shard_map body); `row_sh`/`ace_sh` are the
    device_put fragment shards.  `energy_forces(P)` evaluates one replica's
    (E, F) on the mesh directly — it is numerically identical to the
    single-device `FragmentPotential.energy_forces` path and exists so
    tests can assert that equivalence (VERDICT round 1, item 5).
    """

    mesh: Mesh
    local_fn: Any
    row_sh: dict
    ace_sh: dict
    row_spec: dict
    ace_spec: dict

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
            ace_z=rt.ace_z,
            ace_valid=rt.ace_valid,
            ace_dst=rt.ace_dst,
        )
        ht_tables = rt.ht.tables
        scee, scnb = rt.ht.scee, rt.ht.scnb

        def local_potential(Prep, row, ace):
            """Per-replica potential evaluated on this device's shards.
            Must be called under the mesh axes; returns psum'd (E, F)."""
            base = Prep[row["gather_idx"]]
            unit = H._safe_unit(Prep[row["cap_dir_idx"]] - base)
            pos = jnp.where(row["is_cap"][..., None], base + unit * row["cap_radius"], base)
            pos = jnp.where(row["valid"][..., None], pos, row["pad_pos"])

            ht_local = H.HydrogenTables(
                tables=ht_tables, type_id=row["type_id"], free=row["free"],
                scee=scee, scnb=scnb,
            )
            pos = jax.lax.stop_gradient(
                H.optimize_caps(ht_local, pos, n_iter=opt_iters, axis_name="mp")
            )

            pos_all = jax.lax.all_gather(pos, "mp", axis=0, tiled=True)

            e_d, f_d = V.energy_and_forces(params, row["row_z"], pos, row["valid"], cfg)
            ace_pos = pos_all[ace["ace_rows"], ace["ace_slots"]]
            ace_mask = jnp.broadcast_to(ace["ace_valid"][:, None], ace["ace_z"].shape)
            e_a, f_a = V.energy_and_forces(params, ace["ace_z"], ace_pos, ace_mask, cfg)

            e_local = jnp.sum(e_d * row["row_has_atoms"]) - jnp.sum(e_a * ace["ace_valid"])
            flat_src = jnp.concatenate([f_d.reshape(-1, 3), -f_a.reshape(-1, 3)])
            flat_dst = jnp.concatenate([row["dip_dst"].reshape(-1), ace["ace_dst"].reshape(-1)])
            f_partial = jax.ops.segment_sum(flat_src, flat_dst, num_segments=n_atoms + 1)[:n_atoms]

            e_b = jax.lax.psum(e_local, "mp")
            f_b = jax.lax.psum(f_partial, "mp")

            # long-range terms: cheap for protein sizes, evaluated replicated
            e_nb, g_nb = jax.value_and_grad(lambda p: nonbonded_energy(nb, p))(Prep)
            return e_b + e_nb, f_b - g_nb

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
        )

    def energy_forces(self, Pos):
        """One replica's (E, F) evaluated on the sharded mesh; Pos [N,3]
        replicated.  Numerically equal to the single-device path."""
        sharded = jax.shard_map(
            self.local_fn,
            mesh=self.mesh,
            in_specs=(P(), self.row_spec, self.ace_spec),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(sharded)(Pos, self.row_sh, self.ace_sh)


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
        state = L.MDState(
            positions=pos,
            velocities=vel,
            forces=jnp.zeros_like(pos),
            energy=jnp.zeros((n,), jnp.float32),
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
    force-evaluated with mp-sharded fragments."""

    mesh: Mesh
    n_replicas: int
    step_fn: Any          # jitted: state-pytree -> state-pytree
    masses: Any
    _sharded_args: Any

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
            """Executes per device: local replica block x local fragment shard."""

            def one_replica(s):
                def body(s, _):
                    s = L.langevin_step(
                        L.lift_potential(lambda Prep: local_potential(Prep, row, ace)),
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
            aux=(),
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
            masses=masses, _sharded_args=(row_sh, ace_sh),
        )

    # ------------------------------------------------------------------
    def initial_state(self, positions: np.ndarray, temp_K: float = 300.0, seed: int = 0):
        n = self.n_replicas
        keys = jax.random.split(jax.random.PRNGKey(seed), 2 * n)
        init_keys, run_keys = keys[:n], keys[n:]
        vel = jax.vmap(
            lambda k: L.maxwell_boltzmann_velocities(k, self.masses, temp_K)
        )(init_keys)
        pos = jnp.broadcast_to(
            jnp.asarray(positions, jnp.float32), (n,) + positions.shape
        )
        state = L.MDState(
            positions=pos,
            velocities=vel,
            forces=jnp.zeros_like(pos),
            energy=jnp.zeros((n,), jnp.float32),
            key=run_keys,
            step=jnp.zeros((n,), jnp.int32),
        )
        spec = L.MDState(
            positions=P("dp", None, None), velocities=P("dp", None, None),
            forces=P("dp", None, None), energy=P("dp"), key=P("dp", None),
            step=P("dp"), aux=(),
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

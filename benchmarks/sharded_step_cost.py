"""mp-sharded vs single-device fragment step cost (VERDICT round 2, item 4).

Measures one Langevin MD step of the fragment potential
  (a) single-device (FragmentPotential, warm caps, size buckets), and
  (b) mp-sharded over all available devices (ShardedPotential via
      EnsembleSimulation with 1 replica — bucketed per-shard ViSNet
      batches + warm caps),
at equal physics, and prints one JSON line with the ratio.

On real multi-chip hardware (b) should be at most ~1.2x (a) per step and
win on throughput for big proteins; on the virtual 8-CPU mesh the devices
are time-sliced onto one core, so the expected ratio there is ~1x total
work plus collective overhead — the number to watch is that sharding does
not blow up (e.g. 10x from a lost optimization).

Usage (CPU mesh):
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/sharded_step_cost.py --steps 5
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prot", default="chig")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--mp", type=int, default=0, help="0 = all devices")
    ap.add_argument("--preset", default="prod", choices=["prod", "tiny"])
    args = ap.parse_args()

    import jax

    from ai2bmd_tpu.utils.platforms import pin_jax_platforms

    pin_jax_platforms()
    import jax.numpy as jnp
    import numpy as np

    from ai2bmd_tpu.frag.indexer import build_fragment_index
    from ai2bmd_tpu.io.pdb import read_pdb
    from ai2bmd_tpu.io.reorder import normalize_atom_order
    from ai2bmd_tpu.md import langevin as L
    from ai2bmd_tpu.models import visnet as V
    from ai2bmd_tpu.parallel import EnsembleSimulation, make_mesh
    from ai2bmd_tpu.potentials import FragmentPotential
    from ai2bmd_tpu.system import Protein

    pdb = f"/root/reference/examples/{args.prot}.pdb"
    atoms = normalize_atom_order(read_pdb(pdb))
    prot = Protein.from_atoms(atoms)
    fi = build_fragment_index(atoms)
    if args.preset == "tiny":
        cfg = V.ViSNetConfig(
            hidden_channels=32, num_heads=4, num_layers=2, num_rbf=8
        )
    else:
        cfg = V.ViSNetConfig()
    params = V.init_params(jax.random.PRNGKey(0), V.resolve_config(cfg))
    masses = jnp.asarray(prot.masses, jnp.float32)
    P0 = jnp.asarray(prot.positions, jnp.float32)

    def timed_steps(step_fn, state, steps):
        state = step_fn(state)                      # compile
        jax.block_until_ready(state.positions)
        best = float("inf")
        for _ in range(3):
            s = state
            t0 = time.perf_counter()
            for _ in range(steps):
                s = step_fn(s)
            jax.block_until_ready(s.positions)
            best = min(best, (time.perf_counter() - t0) / steps)
        return best

    # ---- single device -----------------------------------------------
    pot = FragmentPotential.build(prot, params, cfg, longrange="mm")
    coeffs = L.LangevinCoeffs.build(masses, 1.0, 300.0, 0.001)
    warm = lambda P, aux: pot.stateful_energy_forces(P, aux, warm_iters=1)
    step1 = jax.jit(lambda s: L.langevin_step(warm, coeffs, masses, s))
    aux0 = pot.init_cap_delta(P0)
    key = jax.random.PRNGKey(0)
    vel = L.maxwell_boltzmann_velocities(key, masses, 300.0)
    e0, f0, aux0 = jax.jit(warm)(P0, aux0)
    st = L.MDState(P0, vel, f0, e0, key, jnp.asarray(0), aux=aux0)
    t_single = timed_steps(step1, st, args.steps)

    # ---- mp-sharded ----------------------------------------------------
    n_mp = args.mp or len(jax.devices())
    mesh = make_mesh(1, n_mp)
    ens = EnsembleSimulation.build(
        prot, fi, params, cfg, mesh, n_replicas=1, steps_per_call=1,
    )
    st_sh = ens.initial_state(prot.positions)
    t_shard = timed_steps(ens.step_fn, st_sh, args.steps)

    print(json.dumps({
        "metric": f"{args.prot} fragment MD ms/step, mp={n_mp} sharded vs single device",
        "platform": jax.devices()[0].platform,
        "ms_single": round(1e3 * t_single, 3),
        "ms_sharded": round(1e3 * t_shard, 3),
        "ratio_sharded_over_single": round(t_shard / t_single, 3),
    }))


if __name__ == "__main__":
    main()

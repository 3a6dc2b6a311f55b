"""Benchmark: Chignolin fragment-mode MD throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline: the reference publishes no throughput numbers (BASELINE.md).  The
denominator is a documented engineering estimate of the reference's
no-solvent fragment path on one A100: per step it runs ViSNet float32
inference over ~19 fragment graphs in per-device chunks, a host-side torch
LBFGS cap optimization (<=10 closure evaluations with device syncs), >=4
host<->device transfers, and python/ASE orchestration — estimated at
25 ms/step => 3.5 ns/day at 1 fs.  vs_baseline = ours_ns_day / 3.5.

The production numerics mode is float32 (matmul precision 'highest'): the
bf16 path is ~1.35x faster but shifts forces by a few 1e-3 eV/A, above the
1e-3 fidelity bar; its throughput is reported as a secondary key.
"""

import json
import os
import sys
import time

BASELINE_NS_DAY = 3.5
STEPS_PER_CALL = 25
N_CALLS = 8


def _measure(sim_chunk, state, zeros, steps, calls):
    import jax

    state = sim_chunk(state, zeros[0], zeros[1], steps)   # warmup/compile
    jax.block_until_ready(state.positions)
    t0 = time.perf_counter()
    for _ in range(calls):
        state = sim_chunk(state, zeros[0], zeros[1], steps)
    jax.block_until_ready(state.positions)
    dt = time.perf_counter() - t0
    return state, dt / (calls * steps)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _chig_protein
    from ai2bmd_tpu.md.simulation import SimulationConfig, Simulator
    from ai2bmd_tpu.models import visnet as V
    from ai2bmd_tpu.potentials import FragmentPotential

    prot = _chig_protein()
    cfg = V.ViSNetConfig()  # production config: 9 layers x 256
    params = V.init_params(jax.random.PRNGKey(0), cfg)

    sim_cfg = SimulationConfig(
        timestep_fs=1.0, temp_K=300.0, record_per_steps=STEPS_PER_CALL,
        preeq_steps=0, runaway_factor=1e9, write_xyz=False, write_dcd=False,
    )

    results = {}
    for label, precision in (("f32", "float32"), ("bf16", "bfloat16")):
        with jax.default_matmul_precision(precision):
            pot = FragmentPotential.build(prot, params, cfg, longrange="mm")
            sim = Simulator(
                pot.energy_forces, prot.masses, prot.numbers, sim_cfg,
                log_dir="/tmp/ai2bmd_bench", prot_name="chig",
            )
            state = sim.initial_state(prot.positions)
            zeros = (state.positions, jnp.asarray(0.0))
            state, per_step = _measure(
                sim._chunk, state, zeros, STEPS_PER_CALL, N_CALLS
            )
            assert np.all(np.isfinite(np.asarray(state.positions)))
            results[label] = per_step

    ns_day = 86.4 * sim_cfg.timestep_fs / results["f32"] / 1e3
    print(
        json.dumps(
            {
                "metric": "ns/day Chignolin 175-atom fragment-mode MD "
                          "(ViSNet 9x256 f32, 1 fs, single v5e chip)",
                "value": round(ns_day, 3),
                "unit": "ns/day",
                "vs_baseline": round(ns_day / BASELINE_NS_DAY, 3),
                "ms_per_step_f32": round(1e3 * results["f32"], 3),
                "ms_per_step_bf16": round(1e3 * results["bf16"], 3),
                "ns_day_bf16": round(86.4 / results["bf16"] / 1e3, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

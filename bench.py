"""Benchmark: Chignolin fragment-mode MD throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no throughput numbers (BASELINE.md); the
denominator is a documented engineering estimate of the reference's
no-solvent fragment path on one A100: per step it runs ViSNet inference
over ~19 fragment graphs in float32 with >=4 host<->device round trips,
an LBFGS cap optimization, and python/ASE orchestration — estimated at
~25 ms/step => ~3.5 ns/day at 1 fs.  vs_baseline = ours_ns_day / 3.5.
"""

import json
import os
import sys
import time

BASELINE_NS_DAY = 3.5
STEPS_PER_CALL = 50
N_CALLS = 6


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    # force-fidelity-grade matmuls (TPU defaults to bf16 otherwise)
    jax.config.update("jax_default_matmul_precision", "float32")

    from ai2bmd_tpu.md.simulation import SimulationConfig, Simulator
    from ai2bmd_tpu.models import visnet as V
    from ai2bmd_tpu.potentials import FragmentPotential

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _chig_protein

    prot = _chig_protein()
    cfg = V.ViSNetConfig()  # production config: 9 layers x 256
    params = V.init_params(jax.random.PRNGKey(0), cfg)
    pot = FragmentPotential.build(prot, params, cfg, longrange="mm")

    sim_cfg = SimulationConfig(
        timestep_fs=1.0, temp_K=300.0, record_per_steps=STEPS_PER_CALL,
        preeq_steps=0, runaway_factor=1e9, write_xyz=False, write_dcd=False,
    )
    sim = Simulator(
        pot.energy_forces, prot.masses, prot.numbers, sim_cfg,
        log_dir="/tmp/ai2bmd_bench", prot_name="chig",
    )
    state = sim.initial_state(prot.positions)

    # warmup/compile
    state = sim._chunk(state, state.positions, jnp.asarray(0.0), STEPS_PER_CALL)
    jax.block_until_ready(state.positions)

    t0 = time.perf_counter()
    for _ in range(N_CALLS):
        state = sim._chunk(state, state.positions, jnp.asarray(0.0), STEPS_PER_CALL)
    jax.block_until_ready(state.positions)
    dt = time.perf_counter() - t0

    n_steps = N_CALLS * STEPS_PER_CALL
    ms_per_step = 1e3 * dt / n_steps
    ns_day = 86.4 * sim_cfg.timestep_fs * n_steps / dt / 1e3

    assert np.all(np.isfinite(np.asarray(state.positions)))
    print(
        json.dumps(
            {
                "metric": "ns/day Chignolin 175-atom fragment-mode MD (ViSNet 9x256, 1 fs, single chip)",
                "value": round(ns_day, 3),
                "unit": "ns/day",
                "vs_baseline": round(ns_day / BASELINE_NS_DAY, 3),
                "ms_per_step": round(ms_per_step, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

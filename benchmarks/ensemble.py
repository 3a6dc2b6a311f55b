"""BASELINE config 5: 64-replica Chignolin ensemble on one chip.

Measures ms per replica-step of the replica-batched ensemble
(parallel.ReplicaEnsemble) at the production model size.  Round-1 status
for comparison: vmapped replicas measured ~178 ms/replica-step at R=8 and
OOM'd without remat (ROADMAP round 1).

Usage: python benchmarks/ensemble.py [--replicas 64] [--steps 10]
                                     [--chunk 8] [--precision float32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=64)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--precision", type=str, default="float32")
    ap.add_argument("--timed-calls", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ai2bmd_tpu.utils.platforms import pin_jax_platforms

    pin_jax_platforms()
    if args.precision != "default":
        jax.config.update("jax_default_matmul_precision", args.precision)

    from __graft_entry__ import _chig_protein
    from ai2bmd_tpu.frag.indexer import build_fragment_index
    from ai2bmd_tpu.models import visnet as V
    from ai2bmd_tpu.parallel import ReplicaEnsemble

    prot = _chig_protein()
    fi = build_fragment_index(prot.atoms)
    cfg = V.ViSNetConfig()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params_h = V.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params_h, jax.devices()[0])

    ens = ReplicaEnsemble.build(
        prot, fi, params, cfg, n_replicas=args.replicas,
        steps_per_call=args.steps, replica_chunk=args.chunk,
    )
    state = ens.initial_state(prot.positions, seed=0)

    # Timing is HOST-FETCH based: np.asarray(positions) inside the timed
    # region forces a device->host copy of the result, which cannot
    # complete before the dispatched computation does — robust even where
    # block_until_ready returns early (the r4 best-of-2 block_until_ready
    # loop measured a physically impossible 0.01 ms for 640 replica-steps
    # on the tunneled device; a dispatch was timed, not the work).
    t0 = time.perf_counter()
    state = ens.run(state, 1)
    p_prev = np.asarray(state.positions)
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(args.timed_calls):
        t0 = time.perf_counter()
        state = ens.run(state, 1)
        p_now = np.asarray(state.positions)
        times.append(time.perf_counter() - t0)
        # the step must actually advance the trajectory
        assert float(np.abs(p_now - p_prev).max()) > 0.0
        p_prev = p_now
    best = min(times)
    med = sorted(times)[len(times) // 2]
    per_step = best / args.steps
    per_replica_step = per_step / args.replicas
    assert bool(np.all(np.isfinite(p_prev)))

    # sanity floor: R batched replicas cannot beat perfect batching of the
    # measured single-replica cost (SWEEP r4: ~8.5 ms/step chig); flag
    # anything implausibly below it instead of committing a broken number
    single_ms = 8.5
    plausible = 1e3 * per_step > 0.05 * single_ms
    print(json.dumps({
        "config": f"chig x{args.replicas} replica ensemble (1 chip)",
        "matmul_precision": args.precision,
        "replica_chunk": args.chunk,
        "timed_calls": args.timed_calls,
        "ms_per_step": round(1e3 * per_step, 2),
        "ms_per_step_median": round(1e3 * med / args.steps, 2),
        "ms_per_replica_step": round(1e3 * per_replica_step, 3),
        "aggregate_ns_day": round(
            args.replicas * 86.4 / per_step / 1e3, 2
        ),
        "compile_s": round(compile_s, 1),
        "plausible": bool(plausible),
    }))


if __name__ == "__main__":
    main()

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

    t0 = time.perf_counter()
    state = ens.run(state, 1)
    jax.block_until_ready(state.positions)
    compile_s = time.perf_counter() - t0

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        state = ens.run(state, 1)
        jax.block_until_ready(state.positions)
        best = min(best, time.perf_counter() - t0)
    per_step = best / args.steps
    per_replica_step = per_step / args.replicas
    assert bool(np.all(np.isfinite(np.asarray(state.positions))))
    print(json.dumps({
        "config": f"chig x{args.replicas} replica ensemble (1 chip)",
        "matmul_precision": args.precision,
        "replica_chunk": args.chunk,
        "ms_per_step": round(1e3 * per_step, 2),
        "ms_per_replica_step": round(1e3 * per_replica_step, 3),
        "aggregate_ns_day": round(
            args.replicas * 86.4 / per_step / 1e3, 2
        ),
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()

"""On-chip microbenchmark of the ViSNet hot path at Chignolin shapes.

Times energy+forces over the dipeptide batch [10,40] and the ACE-NME batch
[9,16] separately, amortized inside one lax.scan dispatch (the TPU tunnel
has high per-call latency; see bench.py).  Usage:

    python benchmarks/vis_micro.py [--remat] [--edge-dtype bf16] [--iters N]
"""

import argparse
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_scan(fn, x0, iters):
    import jax
    import jax.numpy as jnp

    def body(c, _):
        out = fn(c)
        return out, ()

    @jax.jit
    def run(x):
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y

    run(x0)[0].block_until_ready() if isinstance(run(x0), tuple) else jax.block_until_ready(run(x0))
    best = min(
        (lambda t0=time.perf_counter(): (jax.block_until_ready(run(x0)), time.perf_counter() - t0)[1])()
        for _ in range(3)
    )
    return best / iters * 1e3  # ms per call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--edge-dtype", default=None, choices=[None, "bf16"])
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _chig_protein
    from ai2bmd_tpu.frag.indexer import build_fragment_index
    from ai2bmd_tpu.frag import hydrogen as H
    from ai2bmd_tpu.frag.runtime import FragmentRuntime, build_row_positions
    from ai2bmd_tpu.models import visnet as V
    from ai2bmd_tpu.utils.platforms import pin_jax_platforms

    pin_jax_platforms()
    jax.config.update("jax_default_matmul_precision", "highest")

    prot = _chig_protein()
    fi = build_fragment_index(prot.atoms)
    rt = FragmentRuntime.build(fi)
    cfg = V.ViSNetConfig(
        remat=args.remat,
        fused=args.fused,
        edge_dtype=jnp.bfloat16 if args.edge_dtype == "bf16" else None,
    )
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params_h = V.init_params(jax.random.PRNGKey(0), cfg)
    dev = jax.devices()[0]
    params = jax.device_put(params_h, dev)

    P = jnp.asarray(prot.positions, jnp.float32)
    pos = H.optimize_caps(rt.ht, build_row_positions(rt, P), n_iter=10)
    pos = jax.device_put(pos, dev)

    z_d, m_d = jax.device_put((rt.row_z, rt.valid), dev)
    ace_pos = jnp.where(
        rt.ace_mask16[..., None],
        jnp.pad(pos[rt.ace_rows, rt.ace_slots], ((0, 0), (0, 4), (0, 0))),
        rt.ace_park,
    )
    z_a, m_a = jax.device_put((rt.ace_z16, rt.ace_mask16), dev)
    ace_pos = jax.device_put(ace_pos, dev)

    def dip_step(p):
        e, f = V.energy_and_forces(params, z_d, p, m_d, cfg)
        return p + 0.0 * f  # keep the value live without changing shapes

    def ace_step(p):
        e, f = V.energy_and_forces(params, z_a, p, m_a, cfg)
        return p + 0.0 * f

    def dip_fwd(p):
        e = V.energy(params, z_d, p, m_d, cfg)
        return p + 0.0 * jnp.sum(e)

    def caps_step(P_):
        rows = build_row_positions(rt, P_)
        out = H.optimize_caps(rt.ht, rows, n_iter=10)
        return P_ + 0.0 * jnp.sum(out)

    print(f"dip E+F  [10,40] : {timed_scan(dip_step, pos, args.iters):7.3f} ms")
    print(f"dip E fwd[10,40] : {timed_scan(dip_fwd, pos, args.iters):7.3f} ms")
    print(f"ace E+F  [9,16]  : {timed_scan(ace_step, ace_pos, args.iters):7.3f} ms")
    print(f"caps 10 iters    : {timed_scan(caps_step, P, args.iters):7.3f} ms")


if __name__ == "__main__":
    main()

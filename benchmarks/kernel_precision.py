"""Measure in-kernel matmul precision: speed + force deviation.

Run once per mode (env var is read at import):

    python benchmarks/kernel_precision.py --save /tmp/f_ref.npy
    AI2BMD_KERNEL_MM_PRECISION=default python benchmarks/kernel_precision.py \
        --compare /tmp/f_ref.npy

Valid modes: b3 (production default), highest, default (single-pass bf16).

Times ViSNet E+F on the chig dipeptide batch (the production hot loop) and
reports max |dF| vs the reference forces when --compare is given.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--save", type=str, default=None)
    ap.add_argument("--compare", type=str, default=None)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _chig_protein
    from ai2bmd_tpu.models import visnet as V
    from ai2bmd_tpu.potentials import FragmentPotential

    from ai2bmd_tpu.utils.platforms import pin_jax_platforms

    pin_jax_platforms()
    jax.config.update("jax_default_matmul_precision", "float32")
    prot = _chig_protein()
    cfg = V.ViSNetConfig()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params_h = V.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params_h, jax.devices()[0])
    pot = FragmentPotential.build(prot, params, cfg, longrange="mm")
    rt, rcfg = pot.rt, pot.cfg
    P = jnp.asarray(prot.positions, jnp.float32)

    from ai2bmd_tpu.frag.runtime import build_row_positions
    from ai2bmd_tpu.frag import hydrogen as FH

    pos = jax.jit(
        lambda p: FH.optimize_caps(rt.ht, build_row_positions(rt, p), n_iter=10)
    )(P)

    def vis_ef(c):
        e, f = V.energy_and_forces(params, rt.row_z, c, rt.valid, rcfg)
        return c + 0.0 * f

    def body(c, _):
        return vis_ef(c), ()

    @jax.jit
    def run(x):
        return jax.lax.scan(body, x, None, length=args.iters)[0]

    jax.block_until_ready(run(pos))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(pos))
        best = min(best, time.perf_counter() - t0)
    ms = best / args.iters * 1e3

    e, f = jax.jit(
        lambda c: V.energy_and_forces(params, rt.row_z, c, rt.valid, rcfg)
    )(pos)
    f = np.asarray(f)
    from ai2bmd_tpu.ops.pallas import vismp as PK

    out = {
        "mode": PK._MODE or "f32-full",
        "ms_dipeptide_EF": round(ms, 3),
        "energy": float(jnp.sum(e)),
    }
    if args.save:
        np.save(args.save, f)
    if args.compare:
        ref = np.load(args.compare)
        out["max_abs_dF_eV_A"] = float(np.max(np.abs(f - ref)))
        out["rms_dF"] = float(np.sqrt(np.mean((f - ref) ** 2)))
    print(json.dumps(out))


if __name__ == "__main__":
    main()

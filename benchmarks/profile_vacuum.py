"""On-chip profile of the vacuum fragment-mode step (bench.py's workload).

Captures an xplane trace of `--steps` full Langevin steps on a bundled
protein (production stack: warm-1 caps, fused edge kernels, b3 MXU
precision) and prints the per-op device-time table, aggregated by op
category, via xplane_ops.py.  Use this to attribute the step time between
the Pallas edge kernels, XLA-side node matmuls, and everything else
before picking a perf lever.

Usage: python benchmarks/profile_vacuum.py [--config chig] [--steps 20]
       [--xla-precision float32]
"""

import argparse
import collections
import glob
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default="chig")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--xla-precision", type=str, default="float32")
    args = ap.parse_args()

    from ai2bmd_tpu.utils.platforms import pin_jax_platforms

    pin_jax_platforms()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", args.xla_precision)

    from ai2bmd_tpu.data import example_pdb
    from ai2bmd_tpu.io.pdb import read_pdb
    from ai2bmd_tpu.io.reorder import normalize_atom_order
    from ai2bmd_tpu.md import langevin as L
    from ai2bmd_tpu.models import visnet as V
    from ai2bmd_tpu.potentials import FragmentPotential
    from ai2bmd_tpu.system import Protein

    atoms = normalize_atom_order(read_pdb(example_pdb(args.config)))
    prot = Protein.from_atoms(atoms)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params_h = V.init_params(jax.random.PRNGKey(0), V.ViSNetConfig())
    params = jax.device_put(params_h, jax.devices()[0])

    pot = FragmentPotential.build(prot, params, V.ViSNetConfig(), longrange="mm")
    warm = lambda P, aux: pot.stateful_energy_forces(P, aux, 1)
    coeffs = L.LangevinCoeffs.build(prot.masses, 1.0, 300.0, 0.001)
    P = jnp.asarray(prot.positions, jnp.float32)
    aux = pot.init_cap_delta(P)
    e0, f0, aux = jax.jit(warm)(P, aux)
    key = jax.random.PRNGKey(0)
    state = L.MDState(
        P, L.maxwell_boltzmann_velocities(key, prot.masses, 300.0),
        f0, e0, key, jnp.asarray(0), aux=aux,
    )
    step = jax.jit(lambda s: L.langevin_step(warm, coeffs, prot.masses, s))
    state = step(state)
    jax.block_until_ready(state.positions)

    tracedir = "/tmp/jaxtrace_vac"
    shutil.rmtree(tracedir, ignore_errors=True)
    with jax.profiler.trace(tracedir):
        for _ in range(args.steps):
            state = step(state)
        jax.block_until_ready(state.positions)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from xplane_ops import fields, parse_plane

    f = glob.glob(f"{tracedir}/plugins/profile/*/*.xplane.pb")[0]
    buf = open(f, "rb").read()
    for fn, wt, v in fields(buf):
        if fn != 1 or wt != 2:
            continue
        name, lines_raw, meta = parse_plane(v)
        if "TPU" not in name:
            continue
        for line in lines_raw:
            lname = ""
            events = []
            for fn2, wt2, v2 in fields(line):
                if fn2 == 2 and wt2 == 2:
                    lname = v2.decode()
                elif fn2 == 4 and wt2 == 2:
                    events.append(v2)
            if lname != "XLA Ops":
                continue
            tot = collections.Counter()
            cnt = collections.Counter()
            for ev in events:
                mid = dur = 0
                for fn3, _, v3 in fields(ev):
                    if fn3 == 1:
                        mid = v3
                    elif fn3 == 3:
                        dur = v3
                op = meta.get(mid, str(mid))
                m = re.match(r"%([a-zA-Z_\-0-9]+?)(\.\d+)? =", op)
                cat = m.group(1) if m else op[:60]
                tot[cat] += dur
                cnt[cat] += 1
            print(f"XLA Ops ({args.config}, xla={args.xla_precision}, "
                  f"ms/step over {args.steps}):")
            for op, ps in tot.most_common(args.top):
                print(f"    {ps/1e9/args.steps:8.4f} ms x{cnt[op]//args.steps:5d}  {op}")
            print("total", round(sum(tot.values()) / 1e9 / args.steps, 3),
                  "ms/step")


if __name__ == "__main__":
    main()

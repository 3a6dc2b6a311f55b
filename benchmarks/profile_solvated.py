"""On-chip profile of the solvated QM/MM step (the flagship workload).

Captures an xplane trace of `--steps` full Langevin steps on the
17,882-atom chig-preeq box (same stabilized configuration as
run_all.py's chig-solvated) and prints the serialized device-op
category table via xplane_ops.py.

Usage: python benchmarks/profile_solvated.py [--steps 10] [--config chig-solvated]
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
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--config", type=str, default="chig-solvated")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    from ai2bmd_tpu.utils.platforms import pin_jax_platforms

    pin_jax_platforms()
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_default_matmul_precision", "float32")

    from benchmarks.run_all import PROTEINS  # noqa: F401
    from ai2bmd_tpu.io.pdb import read_pdb
    from ai2bmd_tpu.io.reorder import normalize_atom_order
    from ai2bmd_tpu.md import langevin as L
    from ai2bmd_tpu.models import visnet as V
    from ai2bmd_tpu.potentials import FragmentPotential
    from ai2bmd_tpu.physics.qmmm import QMMMPotential
    from ai2bmd_tpu.system import Protein

    from ai2bmd_tpu.data import example_pdb

    path = example_pdb("chig-preeq")
    atoms = normalize_atom_order(read_pdb(path))
    full = Protein.from_atoms(atoms)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params_h = V.init_params(jax.random.PRNGKey(0), V.ViSNetConfig())
    params = dict(jax.device_put(params_h, jax.devices()[0]))
    params["std"] = params["std"] * 1e-30
    params["atomref"] = params["atomref"] * 1e-30

    qm_idx = full.protein_indices()
    prot = full.select(qm_idx)
    pot = FragmentPotential.build(prot, params, V.ViSNetConfig(), longrange="mm")
    qm_aux0 = pot.init_cap_delta(jnp.asarray(prot.positions, jnp.float32))
    mm_backend = "amoeba" if args.config.endswith("amoeba") else "ff19sb"
    qmmm = QMMMPotential.build(
        atoms,
        qm_stateful=lambda Pq, qa: pot.stateful_energy_forces(Pq, qa, 1),
        qm_init_aux=qm_aux0,
        mm_backend=mm_backend,
    )

    def potential(P, aux):
        # same stabilized shape as run_all.bench_one: the zeroed QM head
        # removes protein-internal forces, so re-add the protein MM term
        e, f, aux = qmmm(P, aux)
        Pp = P[qmmm.sel]
        if qmmm.dense or qmmm.cp is not None:
            e1, f1, _ = qmmm.mm_prot_ef(Pp, (), ())
        else:
            from ai2bmd_tpu.ops import neighbors as NL

            n_prot = qmmm.sel.shape[0]
            nlp = NL.build_neighbor_list(
                Pp, qmmm.cutoff, min(qmmm.k_neighbors, n_prot),
                qmmm.cell, tile=min(512, n_prot),
            )
            e1, f1, _ = qmmm.mm_prot_ef(Pp, nlp, qmmm.mm_init_carry[1])
        return e + e1, f.at[qmmm.sel].add(f1), aux

    coeffs = L.LangevinCoeffs.build(full.masses, 1.0, 300.0, 0.001)
    P = jnp.asarray(full.positions, jnp.float32)
    aux = qmmm.init_aux(P)
    e0, f0, aux = jax.jit(potential)(P, aux)
    key = jax.random.PRNGKey(0)
    state = L.MDState(
        P, L.maxwell_boltzmann_velocities(key, full.masses, 300.0),
        f0, e0, key, jnp.asarray(0), aux=aux,
    )

    step = jax.jit(lambda s: L.langevin_step(potential, coeffs, full.masses, s))
    state = step(state)
    jax.block_until_ready(state.positions)

    shutil.rmtree("/tmp/jaxtrace_solv", ignore_errors=True)
    with jax.profiler.trace("/tmp/jaxtrace_solv"):
        for _ in range(args.steps):
            state = step(state)
        jax.block_until_ready(state.positions)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from xplane_ops import fields, parse_plane

    f = glob.glob("/tmp/jaxtrace_solv/plugins/profile/*/*.xplane.pb")[0]
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
                cat = m.group(1) if m else op[:40]
                tot[cat] += dur
                cnt[cat] += 1
            print(f"XLA Ops ({args.config}, ms/step over {args.steps}):")
            for op, ps in tot.most_common(args.top):
                print(f"    {ps/1e9/args.steps:8.4f} ms x{cnt[op]//args.steps:5d}  {op}")
            print("total", round(sum(tot.values()) / 1e9 / args.steps, 3), "ms/step")


if __name__ == "__main__":
    main()

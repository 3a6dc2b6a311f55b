"""Diagnose the cap-optimization landscape: is the 1 A spread between
cold-30 / cold-50 / warm-1 cap solutions oscillation (non-convergence) or
a flat valley (soft mode, e.g. free rotation of an added hydrogen about
its bond axis)?

For each protocol prints the AMBER cap energy (kcal/mol), the max
cap-gradient norm (kcal/mol/A), and the identity of the worst-deviating
cap slot.  Run on any backend (jnp kernels only).

Usage: python benchmarks/cap_probe.py [--config chig] [--iters 10,30,50,100,300]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai2bmd_tpu.data import example_pdb  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default="chig")
    ap.add_argument("--iters", type=str, default="1,10,30,50,100,300")
    args = ap.parse_args()

    from ai2bmd_tpu.utils.platforms import pin_jax_platforms

    pin_jax_platforms()
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ai2bmd_tpu.frag import hydrogen as FH
    from ai2bmd_tpu.frag.indexer import build_fragment_index
    from ai2bmd_tpu.frag.runtime import FragmentRuntime, build_row_positions
    from ai2bmd_tpu.io.pdb import read_pdb
    from ai2bmd_tpu.io.reorder import normalize_atom_order
    from ai2bmd_tpu.system import Protein

    atoms = normalize_atom_order(read_pdb(example_pdb(args.config)))
    prot = Protein.from_atoms(atoms)
    fi = build_fragment_index(prot.atoms)
    rt = FragmentRuntime.build(fi)
    ht = dataclasses.replace(rt.ht, fused=None)

    P = jnp.asarray(prot.positions, jnp.float32)
    pos_geo = build_row_positions(rt, P)
    free = np.asarray(rt.is_cap)

    egrad = jax.jit(
        lambda p: (
            FH.amber_energy(ht, p),
            jax.grad(lambda q: FH.amber_energy(ht, q))(p),
        )
    )

    sols = {}
    for n in [int(s) for s in args.iters.split(",")]:
        pos = jax.jit(lambda pg, n=n: FH.optimize_caps(ht, pg, n_iter=n))(pos_geo)
        e, g = egrad(pos)
        gcap = np.linalg.norm(np.asarray(g)[free], axis=-1)
        sols[n] = (np.asarray(pos), float(e), float(gcap.max()),
                   float(np.sqrt((gcap**2).mean())))
        print(json.dumps({
            "iters": n, "E_kcal": round(float(e), 4),
            "max_g_cap": round(float(gcap.max()), 4),
            "rms_g_cap": round(float(np.sqrt((gcap**2).mean())), 4),
        }), flush=True)

    ns = sorted(sols)
    ref = sols[ns[-1]][0]
    for n in ns[:-1]:
        d = np.linalg.norm(sols[n][0] - ref, axis=-1)
        dc = d[free]
        worst = np.unravel_index(np.argmax(d * free), d.shape)
        r, s = int(worst[0]), int(worst[1])
        print(json.dumps({
            "vs": f"{n}_vs_{ns[-1]}",
            "max_dcap_A": round(float(dc.max()), 4),
            "med_dcap_A": round(float(np.median(dc[dc > 0])), 4),
            "worst_row": r, "worst_slot": s,
            "worst_row_type": fi.row_prmtop[r],
            "dE_kcal": round(sols[n][1] - sols[ns[-1]][1], 5),
        }), flush=True)


if __name__ == "__main__":
    main()

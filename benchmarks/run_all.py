"""Benchmark sweep over the BASELINE.json configurations.

Measures single-chip MD throughput (production 9x256 ViSNet, f32,
warm-started caps) for:
  1. Chignolin (175 atoms) fragment-mode
  2. Trp-cage (281)
  3. WW domain (571)
  4. ABD (746) — fragment-batching stress
  5. solvated Chignolin QM/MM (17,882 atoms)

Usage:  python benchmarks/run_all.py [--steps 100] [--configs chig,ww,...]
Prints one JSON line per configuration.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai2bmd_tpu.data import example_pdb  # noqa: E402

PROTEINS = {
    "chig": example_pdb("chig"),
    "trpcage": example_pdb("trpcage"),
    "ww": example_pdb("ww"),
    "abd": example_pdb("abd"),
    "chig-solvated": example_pdb("chig-preeq"),
    # polarizable AMOEBA MM backend (Ewald-CG induction, warm dipole
    # carry) on the same box — VERDICT round 2 item 6 measurement
    "chig-solvated-amoeba": example_pdb("chig-preeq"),
}


def bench_one(name: str, path: str, steps: int, precision: str = "float32",
              preset: str = "prod", warm_iters: int | None = None):
    """Runs at the requested matmul precision (default float32, the fidelity
    mode bench.py reports; pass --precision default for TPU bf16 passes).
    Every output line carries its precision so results stay comparable."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ai2bmd_tpu.io.pdb import read_pdb
    from ai2bmd_tpu.io.reorder import normalize_atom_order
    from ai2bmd_tpu.md import langevin as L
    from ai2bmd_tpu.models import visnet as V
    from ai2bmd_tpu.potentials import FragmentPotential
    from ai2bmd_tpu.system import Protein

    from ai2bmd_tpu.utils.platforms import pin_jax_platforms

    pin_jax_platforms()
    if precision != "default":
        jax.config.update("jax_default_matmul_precision", precision)

    if warm_iters is None:
        warm_iters = 1  # production default (bench.py, ROADMAP warm-1)

    atoms = normalize_atom_order(read_pdb(path))
    full = Protein.from_atoms(atoms)
    if preset == "tiny":
        # CPU path-validation only — never a reportable number
        cfg = V.ViSNetConfig(
            hidden_channels=32, num_heads=4, num_layers=2, num_rbf=8
        )
    else:
        cfg = V.ViSNetConfig()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params_h = V.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params_h, jax.devices()[0])

    qm_idx = full.protein_indices()
    solvated = len(qm_idx) < len(full)

    if solvated:
        from ai2bmd_tpu.physics.qmmm import QMMMPotential

        # No trained checkpoint ships with the reference snapshot, and
        # RANDOM-weight ViSNet forces are unphysical: in the solvated box
        # they blow the trajectory up within ~100 steps, which then forces
        # a neighbor rebuild every step and the measurement times rebuild
        # thrash instead of the production step.  Zero the output head:
        # the compute graph (and its cost) is weight-independent, but the
        # QM forces become 0 so water physics stays real and the rebuild
        # cadence is the production one.  Reported as qm_forces=zeroed.
        # (scale, not zero: a literal 0 constant could invite folding;
        # 1e-30 keeps the full graph live while forces are negligible)
        params = dict(params)
        params["std"] = params["std"] * 1e-30
        params["atomref"] = params["atomref"] * 1e-30
        prot = full.select(qm_idx)
        pot = FragmentPotential.build(prot, params, cfg, longrange="mm")
        qm_aux0 = pot.init_cap_delta(jnp.asarray(prot.positions, jnp.float32))
        mm_backend = "amoeba" if name.endswith("amoeba") else "ff19sb"
        qmmm = QMMMPotential.build(
            atoms,
            qm_stateful=lambda Pq, qa: pot.stateful_energy_forces(
                Pq, qa, warm_iters
            ),
            qm_init_aux=qm_aux0,
            mm_backend=mm_backend,
        )
        if mm_backend == "ff19sb" and not (qmmm.dense or qmmm.cp is not None):
            raise RuntimeError(
                "benchmark stabilizer assumes a listless pair path"
            )

        # With the QM head zeroed the protein has NO internal forces
        # (MM1 cancels MM2's protein-internal part), so its charged
        # hydrogens collapse onto water oxygens.  Re-add the protein's
        # internal MM term on top: physics becomes classical MD of the
        # full box (stable), and the measured cost strictly UPPER-bounds
        # the production step (every production term runs, plus one extra
        # small protein MM eval).
        def potential(P, aux):
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

        init_aux = qmmm.init_aux(jnp.asarray(full.positions, jnp.float32))
        masses, P0 = full.masses, full.positions
    else:
        # Vacuum fragment mode gets the same random-weight stabilizer as
        # the solvated configs: full-strength random ViSNet forces blew the
        # trpcage trajectory up mid-sweep (SWEEP_r04 finite=false), and a
        # non-finite trajectory measures denormal/NaN propagation, not the
        # production step.  Cost is weight-independent; reported as
        # qm_forces=zeroed.
        params = dict(params)
        params["std"] = params["std"] * 1e-30
        params["atomref"] = params["atomref"] * 1e-30
        pot = FragmentPotential.build(full, params, cfg, longrange="mm")
        potential = lambda P, aux: pot.stateful_energy_forces(
            P, aux, warm_iters
        )
        init_aux = pot.init_cap_delta(jnp.asarray(full.positions, jnp.float32))
        masses, P0 = full.masses, full.positions

    coeffs = L.LangevinCoeffs.build(masses, 1.0, 300.0, 0.001)

    @jax.jit
    def chunk(state):
        def body(s, _):
            return L.langevin_step(potential, coeffs, masses, s), None

        return jax.lax.scan(body, state, None, length=steps)[0]

    P = jnp.asarray(P0, jnp.float32)
    key = jax.random.PRNGKey(0)
    vel = L.maxwell_boltzmann_velocities(key, masses, 300.0)
    e0, f0, aux = jax.jit(lambda p, a: potential(p, a))(P, init_aux)
    state = L.MDState(P, vel, f0, e0, key, jnp.asarray(0), aux=aux)

    t_c = time.perf_counter()
    state = chunk(state)
    jax.block_until_ready(state.positions)
    compile_s = time.perf_counter() - t_c
    best = float("inf")
    for _ in range(2):
        t = time.perf_counter()
        state = chunk(state)
        jax.block_until_ready(state.positions)
        best = min(best, time.perf_counter() - t)
    per_step = best / steps
    out = {
        "config": name,
        "matmul_precision": precision,
        "n_atoms": len(full),
        "ms_per_step": round(1e3 * per_step, 3),
        "ns_day": round(86.4 / per_step / 1e3, 3),
        "compile_s": round(compile_s, 1),
        "warm_iters": warm_iters,
        "finite": bool(np.all(np.isfinite(np.asarray(state.positions)))),
    }
    out["qm_forces"] = (
        "zeroed output head (random weights destabilize the trajectory; "
        "QM compute cost is weight-independent)"
    )
    if preset != "prod":
        out["preset"] = preset + " (path validation, not a benchmark)"
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--configs", type=str, default="chig,trpcage,ww,abd")
    ap.add_argument(
        "--precision", type=str, default="float32",
        help="matmul precision: float32 (fidelity, default) or 'default' "
             "(platform default; bf16 passes on TPU)",
    )
    ap.add_argument(
        "--preset", type=str, default="prod", choices=["prod", "tiny"],
        help="tiny = CPU path-validation model, never a reportable number",
    )
    ap.add_argument(
        "--warm-iters", type=int, default=None,
        help="cap L-BFGS iterations per step (default 1, the production "
             "warm-start config; rounds <=3 measured 4)",
    )
    args = ap.parse_args()
    for name in args.configs.split(","):
        print(
            json.dumps(
                bench_one(
                    name, PROTEINS[name], args.steps, args.precision,
                    args.preset, args.warm_iters,
                )
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

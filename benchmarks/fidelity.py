"""End-to-end force fidelity of the PRODUCTION speed stack, on chip.

Measures max|dF| and rms(dF) of the full stitched protein force — the
quantity that actually drives the dynamics — between:

  production: warm-1 cap L-BFGS (carried aux after a short MD segment),
              fused cap-gradient kernel, full-layer Pallas ViS-MP kernels
              at b3 (3-pass bf16) MXU precision, XLA matmuls f32/'highest'
  oracle:     cold 30-iteration cap optimization, pure-jnp ViSNet
              (AI2BMD_FUSED=0), XLA matmuls 'highest'

Protocol: run `--md-steps` production Langevin steps from the input
structure (random weights, output head scaled so the trajectory stays
physical — cost and *relative* cap/kernel numerics are representative),
then evaluate both force stacks at the final positions.

The fidelity bar is 1e-3 eV/A max-norm (BASELINE.md); the cap-protocol
difference is the dominant term, and warm-1 caps are closer to a
converged cap solve than the reference's cold-10 torch LBFGS protocol
(ROADMAP).  One JSON line per protein.

Usage: python benchmarks/fidelity.py [--configs chig,trpcage,ww,abd]
       [--md-steps 50]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai2bmd_tpu.data import example_pdb  # noqa: E402


def fidelity_one(name: str, path: str, md_steps: int):
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ai2bmd_tpu.frag.runtime import (
        build_row_positions,
        fragment_energy_forces_warm,
        _fragment_terms,
    )
    from ai2bmd_tpu.frag import hydrogen as FH
    from ai2bmd_tpu.io.pdb import read_pdb
    from ai2bmd_tpu.io.reorder import normalize_atom_order
    from ai2bmd_tpu.md import langevin as L
    from ai2bmd_tpu.models import visnet as V
    from ai2bmd_tpu.potentials import FragmentPotential
    from ai2bmd_tpu.system import Protein

    atoms = normalize_atom_order(read_pdb(path))
    prot = Protein.from_atoms(atoms)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params_h = V.init_params(jax.random.PRNGKey(0), V.ViSNetConfig())
    params = jax.device_put(params_h, jax.devices()[0])
    # stabilize the short MD segment (random weights); the PRODUCTION
    # force comparison below runs at full weight scale — only the
    # trajectory that picks the evaluation point is damped
    params_md = dict(params)
    params_md["std"] = params_md["std"] * 1e-2
    params_md["atomref"] = params_md["atomref"] * 1e-2

    # --- short production-stack MD segment to a representative state ---
    pot = FragmentPotential.build(prot, params_md, V.ViSNetConfig(), longrange="mm")
    warm = lambda P, aux: pot.stateful_energy_forces(P, aux, 1)
    coeffs = L.LangevinCoeffs.build(prot.masses, 1.0, 300.0, 0.001)
    P0 = jnp.asarray(prot.positions, jnp.float32)
    aux = pot.init_cap_delta(P0)
    e0, f0, aux = jax.jit(warm)(P0, aux)
    key = jax.random.PRNGKey(0)
    state = L.MDState(
        P0, L.maxwell_boltzmann_velocities(key, prot.masses, 300.0),
        f0, e0, key, jnp.asarray(0), aux=aux,
    )

    @jax.jit
    def seg(s):
        def body(s, _):
            return L.langevin_step(warm, coeffs, prot.masses, s), None

        return jax.lax.scan(body, s, None, length=md_steps)[0]

    state = seg(state)
    P = state.positions
    warm_delta = state.aux
    assert np.all(np.isfinite(np.asarray(P)))

    # --- production force at P (full weight scale, warm-carried caps) ---
    cfg_prod = V.resolve_config(V.ViSNetConfig())
    rt = pot.rt
    e_p, f_p, _ = jax.jit(
        lambda P, d: fragment_energy_forces_warm(params, rt, P, cfg_prod, d, 1)
    )(P, warm_delta)

    # --- oracle force at P: cold-30 caps, pure jnp, 'highest' ---
    os.environ["AI2BMD_FUSED"] = "0"
    try:
        cfg_oracle = V.resolve_config(V.ViSNetConfig())
        assert not (cfg_oracle.fused or cfg_oracle.fused_layer)
        ht_oracle = dataclasses.replace(rt.ht, fused=None)
        rt_oracle = dataclasses.replace(rt, ht=ht_oracle)

        def oracle(P):
            pos = build_row_positions(rt_oracle, P)
            pos = jax.lax.stop_gradient(
                FH.optimize_caps(rt_oracle.ht, pos, n_iter=30)
            )
            return _fragment_terms(params, rt_oracle, pos, cfg_oracle)

        with jax.default_matmul_precision("highest"):
            e_o, f_o = jax.jit(oracle)(P)
    finally:
        del os.environ["AI2BMD_FUSED"]

    dF = np.asarray(f_p) - np.asarray(f_o)
    norm = np.linalg.norm(dF, axis=1)
    return {
        "config": name,
        "n_atoms": len(prot),
        "md_steps": md_steps,
        "max_dF_eV_A": round(float(norm.max()), 6),
        "rms_dF_eV_A": round(float(np.sqrt((norm ** 2).mean())), 6),
        "max_F_eV_A": round(
            float(np.linalg.norm(np.asarray(f_o), axis=1).max()), 3
        ),
        "bar_1e-3_ok": bool(norm.max() < 1e-3),
        "stack": "warm1+fused_caps+fused_layer(b3) vs cold30+jnp+highest",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=str, default="chig,trpcage,ww,abd")
    ap.add_argument("--md-steps", type=int, default=50)
    ap.add_argument(
        "--xla-precision", type=str, default="float32",
        help="XLA matmul precision of the PRODUCTION stack under test "
             "(the oracle always runs at 'highest'); e.g. 'high' measures "
             "the 3-pass-bf16 XLA mode against the full-f32 oracle",
    )
    args = ap.parse_args()
    from ai2bmd_tpu.utils.platforms import pin_jax_platforms

    pin_jax_platforms()
    import jax

    jax.config.update("jax_default_matmul_precision", args.xla_precision)
    for name in args.configs.split(","):
        d = fidelity_one(name, example_pdb(name), args.md_steps)
        d["xla_precision"] = args.xla_precision
        print(json.dumps(d), flush=True)


if __name__ == "__main__":
    main()

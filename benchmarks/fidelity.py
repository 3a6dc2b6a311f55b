"""End-to-end force fidelity of the PRODUCTION speed stack, on chip.

Measures max|dF| and rms(dF) of the full stitched protein force — the
quantity that actually drives the dynamics — between the production stack
and a converged oracle, and DECOMPOSES the difference per ingredient.

  production: warm-1 cap L-BFGS (carried aux after a short MD segment),
              fused cap-gradient kernel (ops/pallas/caps.py), fused
              edge-core ViS-MP Pallas kernels at b3 (3-pass bf16) MXU
              precision (ops/pallas/vismp.py — the production default;
              resolve_config), XLA matmuls f32/'highest'
  oracle:     cold 30-iteration cap optimization, pure-jnp ViSNet
              (AI2BMD_FUSED=0), XLA matmuls 'highest'

Protocol: run `--md-steps` production Langevin steps from the input
structure (random weights, output head scaled so the trajectory stays
physical — cost and *relative* cap/kernel numerics are representative),
then evaluate force stacks at the final positions.

With --decompose, each ingredient is isolated AT THE SAME POINT:

  prod_vs_oracle      the headline total (matches the plain mode)
  caps_warm1          warm-1 carried caps, everything else oracle
  caps_warm{2,3}      ditto at more warm iterations (default-picking data)
  caps_cold10_ref     the REFERENCE's own protocol — cold 10-iter L-BFGS
                      from geometric placement every step (reference
                      src/Fragmentation/hydrogen/energies.py:211-242,
                      lr=0.1 max_iter=10) — vs the converged oracle.
                      The reference's shipped forces differ from the
                      converged-cap oracle by exactly this much; it is
                      the honest comparator for the cap-protocol terms.
  prod_vs_ref10       production vs the reference protocol (the parity
                      number: how far our dynamics are from what the
                      reference program would compute)
  capgrad_fused       cold-30 caps solved with the FUSED cap-gradient
                      kernel instead of jnp autodiff, rest oracle
  kernels_b3          fused edge-core ViSNet kernels at b3, caps oracle
  oracle_conv         cold-50 vs cold-30 caps (is the oracle converged?)

plus max cap-position deviations (Å) for each cap protocol vs cold-30.

One JSON line per protein.

Usage: python benchmarks/fidelity.py [--configs chig,trpcage,ww,abd]
       [--md-steps 50] [--decompose]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai2bmd_tpu.data import example_pdb  # noqa: E402


def _dstats(f, f_ref):
    import numpy as np

    d = np.linalg.norm(np.asarray(f) - np.asarray(f_ref), axis=1)
    return {
        "max": round(float(d.max()), 6),
        "rms": round(float(np.sqrt((d**2).mean())), 6),
    }


def fidelity_one(name: str, path: str, md_steps: int, decompose: bool):
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ai2bmd_tpu.frag.runtime import (
        build_row_positions,
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

    cfg_prod = V.resolve_config(V.ViSNetConfig())
    rt = pot.rt
    free = rt.is_cap[..., None]
    stack = "warm1+fused_caps+{} vs cold30+jnp+highest".format(
        "fused_layer" if cfg_prod.fused_layer
        else ("fused_edge_core(b3)" if cfg_prod.fused else "jnp")
    )

    # cap solvers ---------------------------------------------------------
    ht_jnp = dataclasses.replace(rt.ht, fused=None)

    def caps_cold(P, n_iter, fused):
        ht = rt.ht if fused else ht_jnp
        return FH.optimize_caps(ht, build_row_positions(rt, P), n_iter=n_iter)

    def caps_warm(P, delta, n_iter):
        # exactly the production warm path (frag/runtime.py
        # fragment_energy_forces_warm): carried offset + n_iter L-BFGS
        # with the production (fused when built) cap gradients
        pos0 = build_row_positions(rt, P) + jnp.where(free, delta, 0.0)
        return FH.optimize_caps(rt.ht, pos0, n_iter=n_iter)

    # ViSNet force stacks over given (already optimized) rows -------------
    os.environ["AI2BMD_FUSED"] = "0"
    try:
        cfg_oracle = V.resolve_config(V.ViSNetConfig())
        assert not (cfg_oracle.fused or cfg_oracle.fused_layer)
    finally:
        del os.environ["AI2BMD_FUSED"]
    rt_oracle = dataclasses.replace(rt, ht=ht_jnp)

    @jax.jit
    def terms_jnp(pos):
        with jax.default_matmul_precision("highest"):
            return _fragment_terms(
                params, rt_oracle, jax.lax.stop_gradient(pos), cfg_oracle
            )

    @jax.jit
    def terms_prod(pos):
        return _fragment_terms(
            params, rt, jax.lax.stop_gradient(pos), cfg_prod
        )

    # evaluation ----------------------------------------------------------
    pos_c30 = jax.jit(lambda P: caps_cold(P, 30, False))(P)
    pos_w1 = jax.jit(lambda P, d: caps_warm(P, d, 1))(P, warm_delta)
    _, f_oracle = terms_jnp(pos_c30)
    _, f_prod = terms_prod(pos_w1)

    out = {
        "config": name,
        "n_atoms": len(prot),
        "md_steps": md_steps,
        "stack": stack,
    }
    total = _dstats(f_prod, f_oracle)
    out["max_dF_eV_A"] = total["max"]
    out["rms_dF_eV_A"] = total["rms"]
    out["max_F_eV_A"] = round(
        float(np.linalg.norm(np.asarray(f_oracle), axis=1).max()), 3
    )
    out["bar_1e-3_ok"] = bool(total["max"] < 1e-3)

    if decompose:
        pos_c10 = jax.jit(lambda P: caps_cold(P, 10, False))(P)
        pos_c50 = jax.jit(lambda P: caps_cold(P, 50, False))(P)
        pos_c30f = jax.jit(lambda P: caps_cold(P, 30, True))(P)
        pos_w2 = jax.jit(lambda P, d: caps_warm(P, d, 2))(P, warm_delta)
        pos_w3 = jax.jit(lambda P, d: caps_warm(P, d, 3))(P, warm_delta)

        _, f_w1 = terms_jnp(pos_w1)
        _, f_w2 = terms_jnp(pos_w2)
        _, f_w3 = terms_jnp(pos_w3)
        _, f_c10 = terms_jnp(pos_c10)
        _, f_c50 = terms_jnp(pos_c50)
        _, f_c30f = terms_jnp(pos_c30f)
        _, f_kern = terms_prod(pos_c30)

        out["terms"] = {
            "prod_vs_oracle": total,
            "caps_warm1": _dstats(f_w1, f_oracle),
            "caps_warm2": _dstats(f_w2, f_oracle),
            "caps_warm3": _dstats(f_w3, f_oracle),
            "caps_cold10_ref": _dstats(f_c10, f_oracle),
            "prod_vs_ref10": _dstats(f_prod, f_c10),
            "capgrad_fused": _dstats(f_c30f, f_oracle),
            "kernels_b3": _dstats(f_kern, f_oracle),
            "oracle_conv_c50": _dstats(f_c50, f_oracle),
        }

        capm = np.asarray(rt.is_cap)

        def cap_err(pos):
            d = np.linalg.norm(
                np.asarray(pos) - np.asarray(pos_c30), axis=-1
            )
            return round(float(d[capm].max()), 6)

        out["cap_pos_err_A"] = {
            "warm1": cap_err(pos_w1),
            "warm2": cap_err(pos_w2),
            "warm3": cap_err(pos_w3),
            "cold10": cap_err(pos_c10),
            "cold50": cap_err(pos_c50),
            "cold30_fusedgrad": cap_err(pos_c30f),
        }

        # convergence quality of each cap protocol: residual AMBER
        # gradient on the cap coordinates (kcal/mol/A).  Unlike distance-
        # from-cold-30 — which the near-degenerate cap basins make
        # protocol-ambiguous at the ~1 A level — this is well-defined per
        # solution and directly comparable to the reference's cold-10
        # torch L-BFGS protocol (energies.py:211-242).
        cap_grad = jax.jit(
            lambda pos: jax.grad(lambda p: FH.amber_energy(ht_jnp, p))(pos)
        )

        def gstat(pos):
            g = np.linalg.norm(np.asarray(cap_grad(pos)), axis=-1)[capm]
            return {
                "max": round(float(g.max()), 4),
                "rms": round(float(np.sqrt((g**2).mean())), 4),
            }

        out["cap_grad_kcal_A"] = {
            "warm1": gstat(pos_w1),
            "warm2": gstat(pos_w2),
            "warm3": gstat(pos_w3),
            "cold10": gstat(pos_c10),
            "cold30": gstat(pos_c30),
            "cold50": gstat(pos_c50),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=str, default="chig,trpcage,ww,abd")
    ap.add_argument("--md-steps", type=int, default=50)
    ap.add_argument("--decompose", action="store_true")
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
        d = fidelity_one(name, example_pdb(name), args.md_steps, args.decompose)
        d["xla_precision"] = args.xla_precision
        d["label"] = f"fidelity_{name}"
        print(json.dumps(d), flush=True)


if __name__ == "__main__":
    main()

"""On-chip step-time breakdown for the chignolin production step.

Times, each amortized inside one lax.scan dispatch:
  A. full Langevin step (warm caps, fused ViSNet, nonbonded)
  B. fragment potential only (warm caps)
  C. ViSNet E+F on the dipeptide batch only
  D. ViSNet E+F on the ACE-NME batch only
  E. ViSNet forward (energy only) on the dipeptide batch
  F. cap optimization only (warm, 4 iters)
  G. nonbonded only

Usage: python benchmarks/step_breakdown.py [--iters 100]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, x0, iters):
    import jax

    def body(c, _):
        return fn(c), ()

    @jax.jit
    def run(x):
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y

    jax.block_until_ready(run(x0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _chig_protein
    from ai2bmd_tpu.md import langevin as L
    from ai2bmd_tpu.models import visnet as V
    from ai2bmd_tpu.physics.nonbonded import NonbondedParams, nonbonded_energy_forces
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
    aux0 = pot.init_cap_delta(P)

    out = {}

    # A. full step
    coeffs = L.LangevinCoeffs.build(prot.masses, 1.0, 300.0, 0.001)
    warm = lambda p, a: pot.stateful_energy_forces(p, a, warm_iters=1)
    e0, f0, auxw = jax.jit(warm)(P, aux0)
    st0 = L.MDState(P, L.maxwell_boltzmann_velocities(jax.random.PRNGKey(0), prot.masses, 300.0),
                    f0, e0, jax.random.PRNGKey(0), jnp.asarray(0), aux=auxw)
    out["full_step"] = timed(
        lambda s: L.langevin_step(warm, coeffs, prot.masses, s), st0, args.iters
    )

    # B. fragment potential only (warm): carry (P-perturbation, aux)
    def pot_only(c):
        p, a = c
        e, f, a2 = warm(p, a)
        return (p + 0.0 * f, a2)

    out["fragment_potential"] = timed(pot_only, (P, auxw), args.iters)

    # C/D/E: raw ViSNet batches at production shapes
    def mk_batch(z, valid):
        B, A = z.shape
        key = jax.random.PRNGKey(1)
        pos = jax.random.normal(key, (B, A, 3)) * 2.0 + jnp.cumsum(
            jnp.ones((B, A, 3)), axis=1
        )
        return jnp.asarray(z), pos.astype(jnp.float32), jnp.asarray(valid)

    # dipeptide cost = sum over the production size buckets
    out["rows_shape"] = [
        [int(idx.shape[0]), int(w)] for w, idx, *_ in rt.dip_buckets
    ]
    dip_total = 0.0
    for w, idx, z_b, valid_b, _dst, _has in rt.dip_buckets:
        zd, posd, vd = mk_batch(np.asarray(z_b), np.asarray(valid_b))

        def vis_ef(c, zd=zd, vd=vd):
            e, f = V.energy_and_forces(params, zd, c, vd, rcfg)
            return c + 0.0 * f

        dip_total += timed(vis_ef, posd, args.iters)
    out["visnet_dipeptide_EF"] = dip_total

    za, posa, va_ = mk_batch(rt.ace_z16, rt.ace_mask16)
    out["ace_shape"] = list(za.shape)

    def vis_ace(c):
        e, f = V.energy_and_forces(params, za, c, va_, rcfg)
        return c + 0.0 * f

    out["visnet_acenme_EF"] = timed(vis_ace, posa, args.iters)

    w0, idx0, z0, valid0, _d0, _h0 = rt.dip_buckets[-1]
    zd0, posd0, vd0 = mk_batch(np.asarray(z0), np.asarray(valid0))

    def vis_fwd(c):
        e = V.energy(params, zd0, c, vd0, rcfg)
        return c + 0.0 * e[:, None, None]

    out["visnet_dipeptide_E_only_largest_bucket"] = timed(vis_fwd, posd0, args.iters)

    # F. warm cap opt alone
    from ai2bmd_tpu.frag import hydrogen as FH
    from ai2bmd_tpu.frag.runtime import build_row_positions

    def caps_only(c):
        p, delta = c
        free = rt.is_cap[..., None]
        pos_geo = build_row_positions(rt, p)
        pos0 = pos_geo + jnp.where(free, delta, 0.0)
        pos = FH.optimize_caps(rt.ht, pos0, n_iter=2)
        new_delta = jnp.where(free, pos - pos_geo, 0.0)
        return (p + 0.0 * jnp.sum(pos), new_delta)

    out["warm_caps"] = timed(caps_only, (P, auxw), args.iters)

    # G. nonbonded
    nb = pot.nb

    def nb_only(p):
        e, f = nonbonded_energy_forces(nb, p)
        return p + 0.0 * f

    out["nonbonded"] = timed(nb_only, P, args.iters)

    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()

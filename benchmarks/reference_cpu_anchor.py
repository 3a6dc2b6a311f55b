"""Measured reference-vs-ours anchor on identical (CPU) hardware.

The reference publishes no throughput numbers and its checkpoints/pyg
stack are stripped from the snapshot, so bench.py's vs_baseline divides
by a DOCUMENTED ESTIMATE of the reference on an A100 (25 ms/step).  This
benchmark replaces the architecture part of that estimate with a
measurement: both execution models run on THE SAME CPU of this machine,

  (a) reference execution model: one ViSNet float32 energy+forces call
      PER FRAGMENT GRAPH, Python loop over the ~19 chignolin fragments,
      exactly the reference's per-chunk inference structure
      (/root/reference/src/AIMD/bonded.py:51-83 runs fragment chunks
      through the model one forward per chunk; chunk size 1-2 on typical
      GPU counts).  The model math is tests/torch_oracle.py — the
      declared functional transcription of the reference model used by
      the parity tests — in float32, torch CPU.
  (b) this framework's execution model: ONE batched, size-bucketed JAX
      call over all fragments (frag/runtime.fragment_energy_forces),
      jitted, on the same CPU.

The printed ratio is a measured architecture factor (batching + fusion
vs per-graph Python dispatch) that is independent of any GPU estimate.
The full vs_baseline story = this measured factor x the documented
hardware factor (A100 vs one CPU for torch; one v5e chip for us), and
bench.py documents both parts.

Usage:
    JAX_PLATFORMS=cpu python benchmarks/reference_cpu_anchor.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
))


def main():
    import jax

    from ai2bmd_tpu.utils.platforms import pin_jax_platforms

    pin_jax_platforms()
    import jax.numpy as jnp
    import numpy as np
    import torch

    from ai2bmd_tpu.frag.indexer import build_fragment_index
    from ai2bmd_tpu.frag.runtime import FragmentRuntime, fragment_energy_forces
    from ai2bmd_tpu.io.pdb import read_pdb
    from ai2bmd_tpu.io.reorder import normalize_atom_order
    from ai2bmd_tpu.models import visnet as V
    from ai2bmd_tpu.models.checkpoint import load_checkpoint
    from test_checkpoint import _hparams, _synthetic_state_dict

    torch.set_num_threads(os.cpu_count() or 1)
    from torch_oracle import oracle_energy_forces

    cfg = V.resolve_config(V.ViSNetConfig())      # production 9x256
    sd = _synthetic_state_dict(cfg, seed=0, scale=0.05)
    hp = _hparams(cfg)

    atoms = normalize_atom_order(read_pdb("/root/reference/examples/chig.pdb"))
    fi = build_fragment_index(atoms)
    rt = FragmentRuntime.build(fi)
    pos_all = jnp.asarray(atoms.positions, jnp.float32)

    # ---- (a) reference execution model: per-fragment torch forward ----
    # fragment graphs: valid atoms of every dipeptide row + ACE-NME unit
    frags = []
    base = np.asarray(atoms.positions)
    gi = np.asarray(fi.gather_idx)
    for r in range(fi.n_rows):
        valid = np.asarray(fi.valid[r]).astype(bool)
        if not valid.any():
            continue
        z = np.asarray(fi.row_z[r])[valid]
        p = base[gi[r][valid]]
        frags.append((torch.tensor(z, dtype=torch.long),
                      torch.tensor(p, dtype=torch.float32)))
    # ACE-NME subtraction units run through the model too (combiner.py)
    from ai2bmd_tpu.frag.runtime import build_row_positions

    row_pos = np.asarray(build_row_positions(rt, pos_all))
    ace_rows = np.asarray(rt.ace_rows)        # [C,12] -> row index
    ace_slots = np.asarray(rt.ace_slots)      # [C,12] -> slot index
    ace_valid = np.asarray(rt.ace_valid).astype(bool)
    z12 = np.asarray(rt.ace_z16)[:, :12]
    for u in range(len(ace_rows)):
        if not ace_valid[u]:
            continue
        p = row_pos[ace_rows[u], ace_slots[u]]
        frags.append((torch.tensor(z12[u], dtype=torch.long),
                      torch.tensor(p, dtype=torch.float32)))

    def ref_step():
        es = []
        for z, p in frags:
            e, f = oracle_energy_forces(sd, hp, z, p, dtype=torch.float32)
            es.append(float(e))
        return es

    ref_step()                                        # warm caches
    t_ref = min(_timed(ref_step) for _ in range(3))

    # ---- (b) our execution model: one bucketed batched JAX call -------
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ckpt = os.path.join(d, "anchor.ckpt")
        hp2 = dict(hp)
        hp2["vecnorm_type"] = cfg.vecnorm_type
        torch.save({"state_dict": sd, "hyper_parameters": hp2}, ckpt)
        params, _ = load_checkpoint(ckpt)

    @jax.jit
    def ours(P):
        return fragment_energy_forces(params, rt, P, cfg)

    e, f = ours(pos_all)
    jax.block_until_ready(f)
    t_ours = min(
        _timed(lambda: jax.block_until_ready(ours(pos_all)[1]))
        for _ in range(5)
    )

    print(json.dumps({
        "metric": "chig fragment-set ViSNet E+F, same CPU: reference "
                  "per-fragment torch loop vs our batched JAX call",
        "n_fragment_graphs": len(frags),
        "torch_threads": torch.get_num_threads(),
        "ms_reference_model": round(1e3 * t_ref, 1),
        "ms_ours": round(1e3 * t_ours, 1),
        "measured_architecture_factor": round(t_ref / t_ours, 2),
    }))


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()

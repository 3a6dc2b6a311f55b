"""Command-line entry point.

Mirrors the reference's flag surface (src/AIMD/arguments.py:19-226 and
src/main.py) on the TPU engine.  Differences are deliberate:

  * --mm-method tinker/tinker-GPU is replaced by the in-framework MM
    engine (accepted and mapped for compatibility)
  * --device-strategy / --work-strategy / --chunk-size are superseded by
    mesh sharding (--mesh-dp/--mesh-mp) and are accepted as no-ops with a
    notice, so existing reference invocations keep working
  * checkpoints are torch .ckpt or converted .npz via --ckpt-path
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="ai2bmd-tpu", description="TPU-native ab initio biomolecular dynamics"
    )
    p.add_argument("--base-dir", type=str, default=os.getcwd(),
                   help="directory for running the simulation")
    p.add_argument("--log-dir", type=str, default=None,
                   help="directory for results (default: <base>/Logs-<prot>)")
    p.add_argument("--ckpt-path", type=str, default=None,
                   help="ViSNet checkpoint (.ckpt or converted .npz); "
                        "random init when absent")
    p.add_argument("--ckpt-type", type=str, default=None,
                   help="checkpoint md5 id (reference compatibility; joined "
                        "with --ckpt-path as visnet-uni-<id>.ckpt)")
    p.add_argument("--prot-file", type=str, required=True)
    p.add_argument("--temp-k", type=int, default=300)
    p.add_argument("--timestep", type=float, default=1.0)
    p.add_argument("--sim-steps", type=int, default=1000)
    p.add_argument("--preeq-steps", type=int, default=2000)
    p.add_argument("--max-cyc", type=int, default=100,
                   help="max minimization cycles in preprocessing")
    p.add_argument("--constraints", action=argparse.BooleanOptionalAction,
                   default=False, help="constrain hydrogen bonds")
    p.add_argument("--solvent", action=argparse.BooleanOptionalAction, default=None,
                   help="explicit-solvent QM/MM (default: auto-detect)")
    p.add_argument("--write-solvent", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--preprocess-method", type=str, default="FF19SB",
                   choices=["FF19SB", "AMOEBA"],
                   help="preprocessing pipeline: FF19SB runs minimize/heat/"
                        "NVT (reference sander protocol), AMOEBA runs a "
                        "full-AMOEBA minimization (reference pdbxyz8+"
                        "minimize9 protocol)")
    p.add_argument("--preprocess", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="solvate+equilibrate raw inputs (default: when the "
                        "input has no water and --solvent is requested)")
    p.add_argument("--mm-method", type=str, default="mm-engine",
                   choices=["mm-engine", "amoeba", "tinker", "tinker-GPU"],
                   help="'amoeba' runs the in-framework polarizable AMOEBA "
                        "engine (permanent multipoles + mutual induction + "
                        "buffered 14-7) for both QM/MM solvent evaluations — "
                        "the reference's Tinker9 physics; 'tinker' options "
                        "map to the fixed-charge MM engine")
    p.add_argument("--polarizable-mm", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="AMOEBA-class mutual induced-dipole polarization in "
                        "the solvent MM (fixed-iteration SOR induction)")
    p.add_argument("--rigid-water", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="constrain waters with analytic SETTLE (rigid TIP3P "
                        "geometry); enables stable 2 fs solvent stepping")
    p.add_argument("--mode", type=str, default="fragment",
                   choices=["fragment", "visnet"])
    p.add_argument("--fragment-longrange-calc", type=str, default="mm",
                   choices=["mm", "pme"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--restart", action=argparse.BooleanOptionalAction, default=False)
    p.add_argument("--build-frames", action=argparse.BooleanOptionalAction,
                   default=False)
    p.add_argument("--record-per-steps", type=int, default=100)
    p.add_argument("--device-strategy", type=str, default=None,
                   help="(reference compatibility; superseded by --mesh-*)")
    p.add_argument("--work-strategy", type=str, default=None,
                   help="(reference compatibility; no-op)")
    p.add_argument("--chunk-size", type=int, default=None,
                   help="(reference compatibility; no-op)")
    p.add_argument("--mesh-dp", type=int, default=1,
                   help="replica-ensemble mesh axis size")
    p.add_argument("--mesh-mp", type=int, default=1,
                   help="fragment-sharding mesh axis size")
    p.add_argument("--replicas", type=int, default=1,
                   help="number of ensemble replicas (>1 runs the sharded "
                        "ensemble engine)")
    p.add_argument("--matmul-precision", type=str, default="float32",
                   choices=["float32", "bfloat16", "tensorfloat32"],
                   help="TPU matmul precision (float32 for force fidelity)")
    p.add_argument("--opt-iters", type=int, default=10,
                   help="cap-hydrogen L-BFGS iterations per step")
    p.add_argument("--model-preset", type=str, default="production",
                   choices=["production", "tiny"],
                   help="tiny = 2x32 debug model (smoke tests without a "
                        "checkpoint)")
    p.add_argument("-v", "--verbose", action="count", default=0)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    logging.basicConfig(
        level=[logging.WARNING, logging.INFO, logging.DEBUG][min(args.verbose, 2)],
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    log = logging.getLogger("ai2bmd-tpu")

    import jax

    from ai2bmd_tpu.utils.platforms import pin_jax_platforms

    pin_jax_platforms()
    jax.config.update("jax_default_matmul_precision", args.matmul_precision)

    for flag in ("device_strategy", "work_strategy", "chunk_size"):
        if getattr(args, flag) is not None:
            log.info(
                "--%s is superseded by mesh sharding on TPU; ignored",
                flag.replace("_", "-"),
            )

    prot_name = os.path.basename(args.prot_file).rsplit(".", 1)[0]
    log_dir = args.log_dir or os.path.join(args.base_dir, f"Logs-{prot_name}")
    os.makedirs(log_dir, exist_ok=True)

    # tee all output into a timestamped logfile (reference main.py:27-28)
    from ai2bmd_tpu.utils.logging_utils import tee_output

    tee_output(log_dir, prot_name)
    # opt-in hang debugging: kill -USR2 <pid> dumps all thread stacks
    from ai2bmd_tpu.utils.signals import register_print_stack_on_sigusr2

    register_print_stack_on_sigusr2(out_dir=log_dir)

    ckpt = args.ckpt_path
    if ckpt and args.ckpt_type:
        ckpt = os.path.join(ckpt, f"visnet-uni-{args.ckpt_type}.ckpt")

    prot_file = args.prot_file
    needs_preprocess = args.preprocess
    if needs_preprocess is None:
        from ai2bmd_tpu.io.pdb import read_pdb
        from ai2bmd_tpu.system import Protein

        probe = Protein.from_atoms(__import__("ai2bmd_tpu.io.reorder", fromlist=["normalize_atom_order"]).normalize_atom_order(read_pdb(prot_file)))
        has_solvent = len(probe.protein_indices()) < len(probe)
        needs_preprocess = bool(args.solvent) and not has_solvent
    if needs_preprocess:
        from ai2bmd_tpu.preprocess import Preprocessor

        pre = Preprocessor(
            log_dir=log_dir, max_cyc=args.max_cyc, seed=args.seed,
            method=args.preprocess_method,
        )
        prot_file = pre.run(prot_file)

    from ai2bmd_tpu.md.simulation import SimulationConfig
    from ai2bmd_tpu.simulators import ProteinSimulation

    sim_cfg = SimulationConfig(
        timestep_fs=args.timestep,
        temp_K=float(args.temp_k),
        record_per_steps=args.record_per_steps,
        seed=args.seed,
        preeq_steps=args.preeq_steps,
        hydrogen_constraints=args.constraints,
    )

    model_cfg = None
    if args.model_preset == "tiny":
        from ai2bmd_tpu.models.visnet import ViSNetConfig

        model_cfg = ViSNetConfig(
            hidden_channels=32, num_heads=4, num_layers=2, num_rbf=8
        )

    if args.replicas > 1 or args.mesh_mp > 1:
        # --mesh-mp N with --replicas 1 runs ONE trajectory with the
        # fragment axis sharded over N chips (the reference's
        # device_strategy fragment-scattering role, src/Calculators/
        # device_strategy.py:84-127) via the same engine
        return _run_ensemble(args, prot_file, log_dir, model_cfg, log)

    sim = ProteinSimulation.from_pdb(
        prot_file,
        log_dir=log_dir,
        mode=args.mode,
        longrange=args.fragment_longrange_calc,
        solvent=args.solvent,
        write_solvent=args.write_solvent,
        ckpt_path=ckpt,
        model_cfg=model_cfg,
        sim_cfg=sim_cfg,
        opt_iters=args.opt_iters,
        polarizable_mm=args.polarizable_mm,
        rigid_water=args.rigid_water,
        mm_backend="amoeba" if args.mm_method == "amoeba" else "ff19sb",
    )
    try:
        sim.simulate(args.sim_steps, restart=args.restart)
    except Exception as exc:  # reference exits -1 on runaway/solver errors
        log.error("%s", exc)
        return 255

    if args.build_frames and not args.restart:
        _build_frames(log_dir, prot_name)
    return 0


def _build_frames(log_dir: str, prot_name: str):
    """Split the xyz trajectory into per-frame files (reference
    build_frames_from_traj, simulator.py:205-223) under <log>/frames and
    copy the joined trajectory into <log>/results."""
    import shutil

    traj = os.path.join(log_dir, f"{prot_name}-traj.xyz")
    if not os.path.exists(traj):
        return
    frames_dir = os.path.join(log_dir, "frames")
    results_dir = os.path.join(log_dir, "results")
    os.makedirs(frames_dir, exist_ok=True)
    os.makedirs(results_dir, exist_ok=True)
    with open(traj) as f:
        lines = f.read().splitlines(keepends=False)
    i = frame = 0
    while i < len(lines):
        n = int(lines[i].strip())
        block = lines[i:i + 2 + n]
        step = block[1].split("step=")[1].split()[0] if "step=" in block[1] else frame
        with open(os.path.join(frames_dir, f"structure{int(step):0>5}.xyz"), "w") as f:
            f.write("\n".join(block) + "\n")
        i += 2 + n
        frame += 1
    shutil.copy(traj, results_dir)


def _run_ensemble(args, prot_file, log_dir, model_cfg, log) -> int:
    """Replica-ensemble MD over a (dp, mp) mesh (BASELINE config 5).

    Each replica is an independent Langevin trajectory — fragment mode for
    vacuum inputs, subtractive QM/MM for solvated boxes (reference
    sampling artifact model: src/AIMD/simulator.py:119-137).  Every
    replica records its own DCD trajectory and the full ensemble state is
    checkpointed each recording interval (--restart resumes it)."""
    import jax
    import numpy as np

    from ai2bmd_tpu.frag.indexer import build_fragment_index
    from ai2bmd_tpu.io.pdb import read_pdb
    from ai2bmd_tpu.io.reorder import normalize_atom_order
    from ai2bmd_tpu.io.trajectory import DCDTrajectory
    from ai2bmd_tpu.parallel import (
        EnsembleSimulation,
        ReplicaEnsemble,
        SolvatedReplicaEnsemble,
        make_mesh,
    )
    from ai2bmd_tpu.simulators import load_model
    from ai2bmd_tpu.system import Protein

    prot_name = os.path.basename(prot_file).rsplit(".", 1)[0]
    atoms = normalize_atom_order(read_pdb(prot_file))
    full = Protein.from_atoms(atoms)
    qm_idx = full.protein_indices()
    solvated = len(qm_idx) < len(full)
    params, cfg = load_model(
        args.ckpt_path, model_cfg, seed=args.seed
    )

    n_dev = len(jax.devices())
    n_dp = min(args.mesh_dp, n_dev)
    n_mp = args.mesh_mp if args.mesh_dp * args.mesh_mp == n_dev else n_dev // n_dp
    log.info("ensemble mesh: dp=%d mp=%d, %d replicas", n_dp, n_mp, args.replicas)

    if solvated:
        # solvated QM/MM replicas shard over dp only (one solvated step
        # already fills a chip; mp fragment sharding buys nothing there)
        if args.mm_method == "amoeba":
            log.warning(
                "solvated ensembles run the ff19sb dense backend (the "
                "AMOEBA backend's neighbor-list aux is per-trajectory); "
                "use --replicas 1 for AMOEBA QM/MM"
            )
        mesh = make_mesh(n_dp, 1) if n_dp > 1 else None
        ens = SolvatedReplicaEnsemble.build(
            atoms, params, cfg,
            n_replicas=args.replicas,
            mesh=mesh,
            timestep_fs=args.timestep,
            temp_K=float(args.temp_k),
            steps_per_call=args.record_per_steps,
        )
    elif n_mp == 1:
        # replica-batched engine: replicas fold into the fragment batch
        # (flat memory via replica chunking, best MXU fill); dp shards
        # replica blocks when more than one device is used
        fi = build_fragment_index(atoms)
        mesh = make_mesh(n_dp, 1) if n_dp > 1 else None
        ens = ReplicaEnsemble.build(
            full, fi, params, cfg,
            n_replicas=args.replicas,
            mesh=mesh,
            timestep_fs=args.timestep,
            temp_K=float(args.temp_k),
            steps_per_call=args.record_per_steps,
            warm_iters=1,
        )
    else:
        fi = build_fragment_index(atoms)
        mesh = make_mesh(n_dp, n_mp)
        ens = EnsembleSimulation.build(
            full, fi, params, cfg, mesh,
            n_replicas=args.replicas,
            timestep_fs=args.timestep,
            temp_K=float(args.temp_k),
            steps_per_call=args.record_per_steps,
            opt_iters=args.opt_iters,
        )

    ckpt = f"{log_dir}/{prot_name}-{args.replicas}x-ensemble-restart.npz"
    state = ens.initial_state(full.positions, temp_K=float(args.temp_k),
                              seed=args.seed)
    start_step = 0
    suffix = ""
    if args.restart and os.path.exists(ckpt):
        state, start_step = _load_ensemble_restart(ckpt, state, log)
        # continuation trajectories get a -restart suffix (same artifact
        # model as the single-trajectory restart path)
        suffix = "-restart"

    trajs = [
        DCDTrajectory(
            f"{log_dir}/{prot_name}-r{i:03d}-traj{suffix}.dcd",
            len(full),
            timestep_fs=args.timestep,
            save_interval=args.record_per_steps,
            cell=full.cell,
        )
        for i in range(args.replicas)
    ]
    n_calls = max(1, (args.sim_steps - start_step) // args.record_per_steps)
    for _ in range(n_calls):
        state = ens.run(state, 1)
        pos = np.asarray(state.positions)
        e = np.asarray(state.energy)
        for traj, p in zip(trajs, pos):
            traj.write(p, cell=full.cell)
        _save_ensemble_restart(ckpt, state)
        print(
            f"Step {int(np.asarray(state.step)[0])}: "
            f"Epot mean = {e.mean():.3f}eV (min {e.min():.3f}, max {e.max():.3f})",
            flush=True,
        )
    for traj in trajs:
        traj.close()
    out = f"{log_dir}/{args.replicas}x-ensemble-final.npz"
    np.savez(out, positions=np.asarray(state.positions),
             velocities=np.asarray(state.velocities))
    print(f"wrote {out} + {len(trajs)} per-replica DCDs")
    return 0


def _save_ensemble_restart(path: str, state):
    """Checkpoint the full batched MDState (incl. per-replica PRNG keys
    and potential carry) so an interrupted ensemble resumes
    bit-continuously, like the single-trajectory restart."""
    import numpy as np
    import jax

    leaves, treedef = jax.tree.flatten(state)
    np.savez(
        path + ".tmp.npz",
        __n_leaves__=len(leaves),
        **{f"leaf{i}": np.asarray(v) for i, v in enumerate(leaves)},
    )
    os.replace(path + ".tmp.npz", path)


def _load_ensemble_restart(path: str, template_state, log):
    import numpy as np
    import jax
    import jax.numpy as jnp

    with np.load(path) as z:
        n = int(z["__n_leaves__"])
        leaves = [z[f"leaf{i}"] for i in range(n)]
    t_leaves, treedef = jax.tree.flatten(template_state)
    if len(t_leaves) != n:
        raise ValueError(
            f"ensemble restart {path} has {n} state leaves, expected "
            f"{len(t_leaves)} (different engine or replica count?)"
        )
    for i, (v, t) in enumerate(zip(leaves, t_leaves)):
        if tuple(v.shape) != tuple(t.shape):
            raise ValueError(
                f"ensemble restart {path} leaf {i} has shape {v.shape}, "
                f"expected {t.shape} (different replica count or protein?)"
            )
    state = jax.tree.unflatten(
        treedef,
        [
            jax.device_put(jnp.asarray(v, t.dtype), t.sharding)
            for v, t in zip(leaves, t_leaves)
        ],
    )
    start = int(np.asarray(state.step)[0])
    log.info("resumed ensemble from %s at step %d", path, start)
    return state, start


if __name__ == "__main__":
    sys.exit(main())

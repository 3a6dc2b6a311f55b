#!/bin/bash
# Round-3 on-chip measurement collection (run when the TPU tunnel is up).
# Each command is independently timed out; results land in
# benchmarks/SWEEP_r03.json + /tmp/bench_r03*.json for inspection.
cd /root/repo
set -x
timeout 2400 python bench.py | tee /tmp/bench_r03.json
{
  timeout 3600 python benchmarks/run_all.py --configs chig,trpcage,ww,abd --steps 200
  timeout 3600 python benchmarks/run_all.py --configs chig-solvated --steps 100
  timeout 3600 python benchmarks/run_all.py --configs chig-solvated-amoeba --steps 20
} | tee benchmarks/SWEEP_r03.json
# opt-in fused cap kernel: measure before enabling by default
AI2BMD_FUSED_CAPS=1 timeout 2400 python bench.py | tee /tmp/bench_r03_fusedcaps.json

#!/bin/bash
# Round-4 on-chip measurement collection.  Run with the TPU tunnel up.
# Produces benchmarks/SWEEP_r04.json (one JSON line per measurement).
# Production config: fused caps default-on, warm-1 cap L-BFGS, f32
# (XLA 'highest' + Pallas 3-pass-bf16) numerics.
cd /root/repo
OUT=benchmarks/SWEEP_r04.json
: > "$OUT"
run() {  # run <timeout_s> <label> <cmd...>
  local t="$1" label="$2"; shift 2
  echo "=== $label ===" >&2
  local line
  line=$(timeout "$t" "$@" 2>>/tmp/collect_r04.err | tail -1)
  if [ -n "$line" ]; then
    python - "$label" "$line" >> "$OUT" <<'EOF'
import json, sys
label, line = sys.argv[1], sys.argv[2]
try:
    d = json.loads(line)
except Exception:
    d = {"raw": line}
d["label"] = label
print(json.dumps(d))
EOF
  else
    echo "{\"label\": \"$label\", \"error\": \"no output\"}" >> "$OUT"
  fi
}

run 1800 step_breakdown  python benchmarks/step_breakdown.py --iters 100
run 1500 bench           python bench.py
run 1500 bench_nofusedcaps env AI2BMD_FUSED_CAPS=0 python bench.py
run 3600 sweep_chig      python benchmarks/run_all.py --configs chig --steps 200
run 3600 sweep_trpcage   python benchmarks/run_all.py --configs trpcage --steps 200
run 3600 sweep_ww        python benchmarks/run_all.py --configs ww --steps 200
run 3600 sweep_abd       python benchmarks/run_all.py --configs abd --steps 200
run 5400 sweep_solvated  python benchmarks/run_all.py --configs chig-solvated --steps 100
run 5400 sweep_amoeba    python benchmarks/run_all.py --configs chig-solvated-amoeba --steps 20
run 3600 ensemble64      python benchmarks/ensemble.py --replicas 64 --steps 20
run 3600 fidelity_chig   python benchmarks/fidelity.py --configs chig --md-steps 50
run 3600 fidelity_trpcage python benchmarks/fidelity.py --configs trpcage --md-steps 50
run 3600 fidelity_ww     python benchmarks/fidelity.py --configs ww --md-steps 50
run 3600 fidelity_abd    python benchmarks/fidelity.py --configs abd --md-steps 50
echo "DONE" >&2
cat "$OUT"

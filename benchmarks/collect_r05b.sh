#!/bin/bash
# Round-5 collection, part 2 (run AFTER collect_r05.sh finishes):
#   - ensemble64: the rewritten host-fetch-timed replica benchmark
#     (VERDICT r4 item 4 / BASELINE config 5)
#   - e2e CLI: solvated QM/MM through `python -m ai2bmd_tpu`, DCD on
#     (VERDICT r4 item 5)
#   - sweep_amoeba: AMOEBA QM/MM step with the explicit mutual operator
#     + batched 2-RHS PCG (VERDICT r4 item 3)
# Chip-serial: one job at a time.
cd /root/repo
OUT=benchmarks/SWEEP_r05.json
run() {
  local t="$1" label="$2"; shift 2
  echo "=== $label ===" >&2
  local line
  line=$(timeout "$t" "$@" 2>>/tmp/collect_r05b.err | tail -1)
  if [ -n "$line" ]; then
    python - "$label" "$line" >> "$OUT" <<'PYEOF'
import json, sys
label, line = sys.argv[1], sys.argv[2]
try:
    d = json.loads(line)
except Exception:
    d = {"raw": line}
d["label"] = label
print(json.dumps(d))
PYEOF
  else
    echo "{\"label\": \"$label\", \"error\": \"no output\"}" >> "$OUT"
  fi
}
run 1800 ensemble64    python benchmarks/ensemble.py --replicas 64 --steps 10
run 3600 e2e_cli       python benchmarks/e2e_cli.py --sim-steps 1000
run 5400 sweep_amoeba  python benchmarks/run_all.py --configs chig-solvated-amoeba --steps 30
echo "DONE" >&2

#!/bin/bash
# Round-5 collection, part 4: AMOEBA first (the round's required number),
# then the fixed e2e CLI, then the remaining fidelity rows if time allows.
cd /root/repo
OUT=benchmarks/SWEEP_r05.json
run() {
  local t="$1" label="$2"; shift 2
  echo "=== $label $(date -u +%H:%M:%S) ===" >&2
  local line
  line=$(timeout "$t" "$@" 2>>/tmp/collect_r05d.err | tail -1)
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
run 3000 sweep_amoeba     python benchmarks/run_all.py --configs chig-solvated-amoeba --steps 30
run 1500 e2e_cli          python benchmarks/e2e_cli.py --sim-steps 1000
run 2400 fidelity_trpcage python benchmarks/fidelity.py --configs trpcage --md-steps 50 --decompose
run 2400 fidelity_ww      python benchmarks/fidelity.py --configs ww --md-steps 50 --decompose
run 2400 fidelity_abd     python benchmarks/fidelity.py --configs abd --md-steps 50 --decompose
echo "ALLDONE $(date -u +%H:%M:%S)" >&2

#!/bin/bash
# Round-4 collection, part 3: fidelity + ensemble, then the AMOEBA run
# last (it faulted the device on the first attempt and wedged the tunnel).
cd /root/repo
OUT=benchmarks/SWEEP_r04.json
run() {
  local t="$1" label="$2"; shift 2
  echo "=== $label ===" >&2
  local line
  line=$(timeout "$t" "$@" 2>>/tmp/collect_r04c.err | tail -1)
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
run 3600 fidelity_chig    python benchmarks/fidelity.py --configs chig --md-steps 50
run 3600 fidelity_trpcage python benchmarks/fidelity.py --configs trpcage --md-steps 50
run 3600 fidelity_ww      python benchmarks/fidelity.py --configs ww --md-steps 50
run 3600 fidelity_abd     python benchmarks/fidelity.py --configs abd --md-steps 50
run 3600 ensemble64       python benchmarks/ensemble.py --replicas 64 --steps 20
run 5400 sweep_amoeba     python benchmarks/run_all.py --configs chig-solvated-amoeba --steps 5
echo "DONE" >&2

#!/bin/bash
# Round-5 collection, part 1: the per-ingredient fidelity decomposition
# (VERDICT r4 item 1) and the vacuum-step roofline profile (item 2).
# Chip-serial: run AFTER any other device job finishes.
cd /root/repo
OUT=benchmarks/SWEEP_r05.json
run() {
  local t="$1" label="$2"; shift 2
  echo "=== $label ===" >&2
  local line
  line=$(timeout "$t" "$@" 2>>/tmp/collect_r05.err | tail -1)
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
run 3600 fidelity_chig    python benchmarks/fidelity.py --configs chig --md-steps 50 --decompose
run 3600 fidelity_trpcage python benchmarks/fidelity.py --configs trpcage --md-steps 50 --decompose
run 3600 fidelity_ww      python benchmarks/fidelity.py --configs ww --md-steps 50 --decompose
run 3600 fidelity_abd     python benchmarks/fidelity.py --configs abd --md-steps 50 --decompose
echo "=== profile_vacuum ===" >&2
timeout 3600 python benchmarks/profile_vacuum.py --config chig --steps 20 \
  > benchmarks/PROFILE_r05_vacuum.txt 2>>/tmp/collect_r05.err
echo "DONE" >&2

#!/bin/bash
# Round-5 collection, part 3 (this session): regenerate the evidence rows
# lost when an earlier session's SWEEP_r05.json was clobbered, plus the
# post-r5-AMOEBA-work measurement. Chip-serial; AMOEBA last so a device
# fault cannot block the other rows.
cd /root/repo
OUT=benchmarks/SWEEP_r05.json
run() {
  local t="$1" label="$2"; shift 2
  echo "=== $label $(date -u +%H:%M:%S) ===" >&2
  local line
  line=$(timeout "$t" "$@" 2>>/tmp/collect_r05c.err | tail -1)
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
run 1200 e2e_cli         python benchmarks/e2e_cli.py --sim-steps 1000
run 2400 fidelity_chig    python benchmarks/fidelity.py --configs chig --md-steps 50 --decompose
run 2400 fidelity_trpcage python benchmarks/fidelity.py --configs trpcage --md-steps 50 --decompose
run 2400 fidelity_ww      python benchmarks/fidelity.py --configs ww --md-steps 50 --decompose
run 2400 fidelity_abd     python benchmarks/fidelity.py --configs abd --md-steps 50 --decompose
run 3600 sweep_amoeba    python benchmarks/run_all.py --configs chig-solvated-amoeba --steps 30
echo "ALLDONE $(date -u +%H:%M:%S)" >&2

#!/bin/bash
# Code-KG pipeline scaling collection: interleaved pinned legs at
# local[4] / local[16] (same memfix protocol as collect_r05.sh), two
# rounds, then pair-efficiency aggregation into
# BENCH/scale_code_r05.json.  Run from /root/repo on a quiet box.
set -u
cd /root/repo
LEGS=BENCH/scale_code_legs_r05.jsonl
LOG=/tmp/collect_code_scale.log
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_SCALE_REPLICAS=${SPARK_GRAFT_SCALE_REPLICAS:-8}

echo "=== code-scale collection start $(date -u +%H:%M:%S) ===" >> "$LOG"
for round in 0 1 2; do
  for cpus in 4 16; do
    echo "--- leg round=$round cpus=$cpus start $(date -u +%H:%M:%S)" >> "$LOG"
    taskset -c 0-$((cpus - 1)) python3 bench.py --scale-leg-code "$cpus" \
      > /tmp/code_leg_out.json 2>> "$LOG"
    rc=$?
    if [ $rc -eq 0 ]; then
      tail -n 1 /tmp/code_leg_out.json >> "$LEGS"
    else
      echo "LEG FAILED rc=$rc round=$round cpus=$cpus" >> "$LOG"
    fi
    echo "--- leg round=$round cpus=$cpus done $(date -u +%H:%M:%S)" >> "$LOG"
  done
done

python3 - <<'EOF' >> "$LOG" 2>&1
import json, statistics

legs = [json.loads(l) for l in open("BENCH/scale_code_legs_r05.jsonl")
        if l.strip()]
lo = [l for l in legs if l["cpus"] == 4]
hi = [l for l in legs if l["cpus"] == 16]
pairs = []
for a, b in zip(lo, hi):
    for key, tag in (("code_pipeline_sec", "pipeline"),
                     ("extract_sec", "extract")):
        eff = (a[key] / b[key]) / (16 / 4)
        pairs.append({"stage": tag, "lo_sec": a[key], "hi_sec": b[key],
                      "efficiency": round(eff, 3),
                      "lo_steal": a["pipe_steal_pct" if tag == "pipeline"
                                    else "ext_steal_pct"],
                      "hi_steal": b["pipe_steal_pct" if tag == "pipeline"
                                    else "ext_steal_pct"],
                      "busy_parity": round(
                          (b["pipe_busy_core_s"] if tag == "pipeline"
                           else b["ext_busy_core_s"])
                          / max(1e-9,
                                a["pipe_busy_core_s"] if tag == "pipeline"
                                else a["ext_busy_core_s"]), 2)})
pipe = [p["efficiency"] for p in pairs if p["stage"] == "pipeline"]
out = {"job": "kg_code_pipeline (curate->extract->link->triples)",
       "levels": [4, 16], "replicas_env": "SPARK_GRAFT_SCALE_REPLICAS",
       "pairs": pairs,
       "pipeline_median_efficiency":
           round(statistics.median(pipe), 3) if pipe else None}
with open("BENCH/scale_code_r05.json", "w") as f:
    json.dump(out, f, indent=1)
print("aggregated:", out["pipeline_median_efficiency"])
EOF

echo "=== code-scale done $(date -u +%H:%M:%S) ===" >> "$LOG"

#!/bin/bash
# Round-5 clean-window perf collection: interleaved x256 scaling legs
# (memfix protocol, 3 rounds of lo/hi pairs) followed by the headline
# bench at sf0.1/local[32].  Run from /root/repo.  One JSON line per
# leg appends to $LEGS; progress notes go to $LOG.
set -u
cd /root/repo
LEGS=BENCH/scale_legs_r05_x256.jsonl
LOG=/tmp/collect_r05.log
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_SCALE_REPLICAS=256

echo "=== r05 collection start $(date -u +%H:%M:%S) ===" >> "$LOG"
for round in 0 1 2; do
  for cpus in 4 16; do
    echo "--- leg round=$round cpus=$cpus start $(date -u +%H:%M:%S)" >> "$LOG"
    taskset -c 0-$((cpus - 1)) python3 bench.py --scale-leg "$cpus" \
      > /tmp/leg_out.json 2>> "$LOG"
    rc=$?
    if [ $rc -eq 0 ]; then
      tail -n 1 /tmp/leg_out.json >> "$LEGS"
    else
      echo "LEG FAILED rc=$rc round=$round cpus=$cpus" >> "$LOG"
    fi
    echo "--- leg round=$round cpus=$cpus done $(date -u +%H:%M:%S)" >> "$LOG"
  done
done

# Aggregate from a scratch cwd so scale_report's generated
# BENCH/BASELINE.md does not clobber the curated one in the repo.
mkdir -p /tmp/scaleagg && cd /tmp/scaleagg
SPARK_GRAFT_SCALE_LEGS_FILE=/root/repo/$LEGS \
  python3 /root/repo/bench.py --scale > /root/repo/BENCH/scale_r05_x256.json \
  2>> "$LOG"
cd /root/repo

echo "=== headline bench start $(date -u +%H:%M:%S) ===" >> "$LOG"
python3 bench.py > /tmp/bench_r05_candidate.json 2>> "$LOG"
echo "=== all done $(date -u +%H:%M:%S) ===" >> "$LOG"

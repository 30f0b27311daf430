#!/bin/bash
# Calm-window hunter for the C=2 multi-JVM cluster pairing (the binding
# north_rule two-cluster-size evidence, bench_cluster_scaling.py).
# Probes kernel + DRAM caps AND the single-proc tokenizer rate; fires
# the cluster run only when all three clear their bars (the documented
# both-probes protocol, BENCH/BASELINE.md). Touches /tmp/scaling_running
# while the run is in flight so interactive work can yield the box.
set -u
BAR_KERNEL=${BAR_KERNEL:-0.76}
BAR_DRAM=${BAR_DRAM:-0.76}
BAR_P1=${BAR_P1:-2050}
MAX_TRIES=${MAX_TRIES:-40}
SLEEP_S=${SLEEP_S:-180}
LOG=${LOG:-/tmp/hunt_cluster.log}
cd /root/repo
for i in $(seq 1 "$MAX_TRIES"); do
  caps=$(python bench_contention.py 2>/dev/null | python -c "
import json, sys
d = json.load(sys.stdin)
print(d['efficiency_cap_8_to_32'], d['dram']['efficiency_cap_8_to_32'],
      d['levels']['1']['per_proc_docs_per_s'])")
  k=$(echo "$caps" | cut -d' ' -f1)
  dr=$(echo "$caps" | cut -d' ' -f2)
  p1=$(echo "$caps" | cut -d' ' -f3)
  echo "$(date +%H:%M:%S) probe $i: kernel=$k dram=$dr p1=$p1" | tee -a "$LOG"
  ok=$(python -c "print(1 if float('$k') >= $BAR_KERNEL and float('$dr') >= $BAR_DRAM and float('$p1') >= $BAR_P1 else 0)")
  if [ "$ok" = "1" ]; then
    echo "$(date +%H:%M:%S) CALM — running C=2 cluster pairing" | tee -a "$LOG"
    touch /tmp/scaling_running
    python bench_cluster_scaling.py >> "$LOG" 2>&1
    rc=$?
    rm -f /tmp/scaling_running
    post=$(python bench_contention.py 2>/dev/null | python -c "
import json, sys
d = json.load(sys.stdin)
print(d['efficiency_cap_8_to_32'], d['dram']['efficiency_cap_8_to_32'],
      d['levels']['1']['per_proc_docs_per_s'])")
    echo "$(date +%H:%M:%S) post-run probe: $post (rc=$rc)" | tee -a "$LOG"
    echo DONE_SCALING | tee -a "$LOG"
    exit 0
  fi
  sleep "$SLEEP_S"
done
echo "NO_CALM_WINDOW after $MAX_TRIES probes" | tee -a "$LOG"

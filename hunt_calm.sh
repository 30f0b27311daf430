#!/bin/bash
# Calm-window hunter: probe the box (kernel + DRAM caps, same-minute,
# per the gotcha in BENCH/BASELINE.md); when BOTH caps clear the bar,
# immediately run the 8->32 bench_scaling protocol (results append to
# BENCH/BASELINE.md). One shot: exits after the first scaling run or
# after MAX_TRIES probes.
set -u
BAR_KERNEL=${BAR_KERNEL:-0.76}
BAR_DRAM=${BAR_DRAM:-0.76}
MAX_TRIES=${MAX_TRIES:-10}
SLEEP_S=${SLEEP_S:-150}
cd /root/repo
for i in $(seq 1 "$MAX_TRIES"); do
  caps=$(python bench_contention.py 2>/dev/null | python -c "
import json, sys
d = json.load(sys.stdin)
print(d['efficiency_cap_8_to_32'], d['dram']['efficiency_cap_8_to_32'])")
  k=$(echo "$caps" | cut -d' ' -f1)
  dr=$(echo "$caps" | cut -d' ' -f2)
  echo "$(date +%H:%M:%S) probe $i: kernel=$k dram=$dr" | tee -a /tmp/hunt.log
  ok=$(python -c "print(1 if float('$k') >= $BAR_KERNEL and float('$dr') >= $BAR_DRAM else 0)")
  if [ "$ok" = "1" ]; then
    echo "$(date +%H:%M:%S) CALM — running 8->32 scaling" | tee -a /tmp/hunt.log
    YASE_SCALE_LEVELS=8,32 python bench_scaling.py 2>/dev/null | tail -5 | tee -a /tmp/hunt.log
    post=$(python bench_contention.py 2>/dev/null | python -c "
import json, sys
d = json.load(sys.stdin)
print(d['efficiency_cap_8_to_32'], d['dram']['efficiency_cap_8_to_32'])")
    echo "$(date +%H:%M:%S) post-run probe: $post" | tee -a /tmp/hunt.log
    echo DONE_SCALING | tee -a /tmp/hunt.log
    exit 0
  fi
  sleep "$SLEEP_S"
done
echo "NO_CALM_WINDOW after $MAX_TRIES probes" | tee -a /tmp/hunt.log

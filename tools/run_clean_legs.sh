#!/bin/bash
# Sequentially measure clean legs for the 2->8 pair at 2M docs.
# Stops each cpu level after the first leg whose ext_busy_frac < 0.10.
cd /root/repo
log=BENCH/leg_runs.jsonl
clean_leg () {
  local cpus=$1 docs=$2 tries=$3
  for i in $(seq 1 $tries); do
    python tools/scaling.py --leg $cpus $docs > /tmp/leg_${cpus}_last.json 2>/tmp/leg_${cpus}_err.log
    frac=$(python3 -c "import json;print(json.load(open('/tmp/leg_${cpus}_last.json'))['ext_busy_frac'])" 2>/dev/null || echo 1)
    echo "leg cpus=$cpus try=$i ext_busy_frac=$frac"
    ok=$(python3 -c "print(1 if float('$frac')<0.10 else 0)")
    if [ "$ok" = "1" ]; then return 0; fi
    sleep 60
  done
  return 1
}
clean_leg 8 2000000 4
clean_leg 2 2000000 3
echo DONE_ALL_LEGS

#!/bin/bash
# Reproducibility record (round-3 item, due since): two consecutive
# bench.py runs on a QUIET host (pool-loop ms/iter swings up to 1.6x
# under load, docs/scaling.md session C).  Waits up to 60 min for
# 1-min loadavg < 1.0 before starting.
cd "$(dirname "$0")/../.."
for i in $(seq 1 60); do
  load=$(cut -d' ' -f1 /proc/loadavg)
  if awk "BEGIN{exit !($load < 1.0)}"; then break; fi
  echo "host busy (loadavg $load); waiting"; sleep 60
done
echo "== bench run 1 (loadavg $(cut -d' ' -f1 /proc/loadavg)) =="
timeout 4800 python -u bench.py | tee .round5/bench_run1.json
echo "== bench run 2 (loadavg $(cut -d' ' -f1 /proc/loadavg)) =="
timeout 4800 python -u bench.py | tee .round5/bench_run2.json

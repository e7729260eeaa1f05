#!/bin/bash
# Round-5 TPU measurement watcher: runs each stage script in
# scripts/tpu_stages/ exactly once to completion, health-gating the
# flaky axon tunnel before every attempt (outages can last hours —
# CLAUDE.md).  Stage NN_name.sh is marked done by .round5/done_NN_name;
# logs land in .round5/NN_name.log.  Append new stage scripts at any
# time; the watcher picks them up on its next wake.
cd "$(dirname "$0")/.."
mkdir -p .round5
while true; do
  pending=0
  for stage in scripts/tpu_stages/*.sh; do
    [ -e "$stage" ] || continue
    name=$(basename "$stage" .sh)
    [ -e ".round5/done_$name" ] && continue
    pending=1
    if ! timeout 120 python -c "
import jax, jax.numpy as jnp
assert float(jnp.sum(jnp.arange(8.0))) == 28.0" >/dev/null 2>&1; then
      echo "$(date -u +%FT%TZ) tunnel down; sleeping" >> .round5/watch.log
      break   # re-gate after sleep; don't hammer a dead tunnel
    fi
    echo "$(date -u +%FT%TZ) running $name" >> .round5/watch.log
    if timeout 2400 bash "$stage" >> ".round5/$name.log" 2>&1; then
      touch ".round5/done_$name"
      echo "$(date -u +%FT%TZ) $name DONE" >> .round5/watch.log
    else
      echo "$(date -u +%FT%TZ) $name FAILED (will retry)" >> .round5/watch.log
      break   # likely a mid-stage tunnel drop; re-gate after sleep
    fi
  done
  [ "$pending" = 0 ] && { echo "$(date -u +%FT%TZ) all stages done" >> .round5/watch.log; exit 0; }
  sleep 240
done

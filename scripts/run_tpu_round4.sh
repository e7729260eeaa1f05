#!/bin/bash
# Round-4 TPU measurement batch — run when the axon tunnel is healthy.
# 1. trivial-op health gate (CLAUDE.md: the tunnel recovers by itself;
#    verify with a trivial op before assuming the chip is gone)
# 2. LOS cull timing on the MESSENGER-like orbit (VERDICT #6 hardware number)
# 3. two consecutive bench.py runs (VERDICT #3 reproducibility record)
set -u
cd "$(dirname "$0")/.."

echo "== health gate =="
timeout 90 python -u -c "
import jax, jax.numpy as jnp
print('TPU OK:', float(jnp.sum(jnp.arange(8.0))), jax.devices())
" || { echo 'TUNNEL STILL DOWN'; exit 1; }

echo "== LOS cull (orbit geometry) =="
timeout 1200 python -u scripts/bench_los.py --orbit --culled 4096,8192 \
    --spectra 1024 --packets 1048576

echo "== bench.py run 1 =="
timeout 3000 python -u bench.py
echo "== bench.py run 2 =="
timeout 3000 python -u bench.py

echo "== source-map smear cull (optional stage) =="
timeout 1200 python -u scripts/bench_smear.py || true

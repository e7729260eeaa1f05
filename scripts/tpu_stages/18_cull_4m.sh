#!/bin/bash
# Production-scale cull: 4M packets (the e2e scale), dispatch amortized
cd "$(dirname "$0")/../.."
timeout 2400 python -u scripts/bench_los.py --orbit --culled 4096,8192 \
    --walk-groups 8 --spectra 1024 --packets 4194304

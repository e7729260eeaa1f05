#!/bin/bash
# Dispatch-free cull ladder: lax.scan of 5 kernel calls per dispatch
# separates the true kernel rates from the ~25 ms axon round trip
cd "$(dirname "$0")/../.."
timeout 2400 python -u scripts/bench_los.py --orbit --culled 4096 \
    --walk-groups 1,8 --walk-all --inner-reps 5 \
    --spectra 1024 --packets 1048576

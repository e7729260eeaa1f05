#!/bin/bash
# Spectrum-chunk sweep at the best block/group: fewer chunks = fewer
# total tile walks (survivor union grows sublinearly)
cd "$(dirname "$0")/../.."
timeout 1800 python -u scripts/bench_los.py --orbit --culled 4096 \
    --walk-groups 8 --chunk 64 --spectra 1024 --packets 1048576
timeout 1800 python -u scripts/bench_los.py --orbit --culled 4096 \
    --walk-groups 8 --chunk 128 --spectra 1024 --packets 1048576

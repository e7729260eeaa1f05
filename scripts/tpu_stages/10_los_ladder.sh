#!/bin/bash
# LOS cull ladder: blocks x walk groups + walk-all roofline (VERDICT #1)
cd "$(dirname "$0")/../.."
timeout 3600 python -u scripts/bench_los.py --orbit --culled 4096,8192 \
    --walk-groups 1,4,8 --walk-all --spectra 1024 --packets 1048576

#!/bin/bash
# Fixed-cost decomposition of the cull call (sort / scatter / bounds / pred)
cd "$(dirname "$0")/../.."
timeout 1800 python -u scripts/bench_cull_parts.py --block 4096

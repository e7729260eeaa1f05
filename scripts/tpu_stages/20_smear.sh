#!/bin/bash
# Source-map smear cull TPU timing, blocks ladder (VERDICT #6)
cd "$(dirname "$0")/../.."
timeout 3600 python -u scripts/bench_smear.py --blocks 2048,4096,8192

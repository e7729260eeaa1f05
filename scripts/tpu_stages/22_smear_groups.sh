#!/bin/bash
# Smear walk-group ladder at the tuned block (matmul impl)
cd "$(dirname "$0")/../.."
timeout 2400 python -u scripts/bench_smear.py --blocks 2048 --walk-groups 1,4,8 --dense-grid ""

#!/bin/bash
# Re-run the smear ladder after the Precision.HIGHEST fix: drift must be
# gone; record the HIGHEST-precision matmul cost vs scatter
cd "$(dirname "$0")/../.."
timeout 2400 python -u scripts/bench_smear.py --blocks 2048,4096

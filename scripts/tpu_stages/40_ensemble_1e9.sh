#!/bin/bash
# North-star scale config (BASELINE.md) demonstrated on ONE chip:
# a 1e9-packet multi-species (Na/Ca/Mg x 8 TAA) parameter-sweep ensemble
# through one compiled program — 24 members x 524288 packets x 80 seed
# chunks = 1.007e9 packets, 120 steps each.
python scripts/demo_ensemble_sweep.py --tpu --species Na,Ca,Mg --members 8 \
  --packets 524288 --chunks 80 --nsteps 121

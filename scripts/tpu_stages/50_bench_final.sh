#!/bin/bash
# Final round-5 validation bench at the repo's closing state (after the
# MXU-LOS no-go record): one full bench.py run, JSON preserved under
# docs/records/.  The watcher health-gates the tunnel before running.
set -e
python bench.py > .round5/bench_final.json
cp .round5/bench_final.json docs/records/bench_r5_run7_final.json
cat docs/records/bench_r5_run7_final.json

#!/bin/bash
# Reproducibility record (round-3 item, due since): two consecutive
# bench.py runs on a quiet host; results also land in .round5/ for the
# scaling docs.  The pool stage self-extends reps until converged.
cd "$(dirname "$0")/../.."
echo "== bench run 1 =="
timeout 4800 python -u bench.py | tee .round5/bench_run1.json
echo "== bench run 2 =="
timeout 4800 python -u bench.py | tee .round5/bench_run2.json

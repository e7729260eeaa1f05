#!/bin/bash
# Instrumented e2e with the bounded-slice pull guard (round-5 tail):
# second consecutive run (reproducibility) of the host-path work (per-leaf
# pulls, zero-copy frames, pruned fitted restore).  Quiet-host gated.
for i in $(seq 1 60); do
  load=$(cut -d' ' -f1 /proc/loadavg)
  ok=$(python -c "print(1 if $load < 1.0 else 0)")
  [ "$ok" = 1 ] && break
  echo "loadavg $load; waiting for quiet host ($i)"
  sleep 30
done
[ "$ok" = 1 ] || { echo "host never went quiet"; exit 1; }
NEXOCLOM_TRACE_STAGES=1 python - <<'EOF'
from nexoclom_tpu.utilities.tracing import setup_logging
setup_logging()
from nexoclom_tpu.utilities.jaxcache import enable_compilation_cache
enable_compilation_cache()
import os
print('loadavg at start:', os.getloadavg())
import bench
total, detail = bench.bench_e2e()
print('loadavg at end:', os.getloadavg())
print('E2E_STAGED', total, detail, flush=True)
EOF

#!/bin/bash
# Quiet-host re-run of the instrumented e2e (runs 60/61 were polluted:
# 60 by cold compiles of the new stacked-pull programs, 61 by a
# concurrent pytest suite — the known host-load swing, CLAUDE.md).
# Gate: wait up to 30 min for 1-min loadavg < 1.0, else fail so the
# watcher retries later.
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

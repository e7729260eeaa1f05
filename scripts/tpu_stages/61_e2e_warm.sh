#!/bin/bash
# Instrumented flagship e2e (round-5 wall-time attack): the exact
# bench.bench_e2e workload (4M-packet adaptive Input.run -> LOS -> LSQ
# -> fitted) with NEXOCLOM_TRACE_STAGES so Output logs its per-stage
# wall decomposition (tables / sample / kernel / assemble / save).
# Directs which host-side stage to attack; record lands in
# .round5/61_e2e_warm.log via the watcher.
NEXOCLOM_TRACE_STAGES=1 python - <<'EOF'
from nexoclom_tpu.utilities.tracing import setup_logging
setup_logging()
from nexoclom_tpu.utilities.jaxcache import enable_compilation_cache
enable_compilation_cache()
import bench
total, detail = bench.bench_e2e()
print('E2E_STAGED', total, detail, flush=True)
EOF

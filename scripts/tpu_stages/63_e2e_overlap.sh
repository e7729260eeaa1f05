#!/bin/bash
# A/B of NEXOCLOM_OVERLAP_PULL on the instrumented e2e run stage: pulls
# the X0 frame on a helper thread while the pool kernel runs.  Runs the
# Input.run part only (the LOS/fit stages don't touch the flag), quiet-
# host gated like stage 62.
for i in $(seq 1 60); do
  load=$(cut -d' ' -f1 /proc/loadavg)
  ok=$(python -c "print(1 if $load < 1.0 else 0)")
  [ "$ok" = 1 ] && break
  echo "loadavg $load; waiting for quiet host ($i)"
  sleep 30
done
[ "$ok" = 1 ] || { echo "host never went quiet"; exit 1; }
NEXOCLOM_TRACE_STAGES=1 NEXOCLOM_OVERLAP_PULL=1 python - <<'EOF'
import math, os, tempfile, time
from nexoclom_tpu.utilities.tracing import setup_logging
setup_logging()
from nexoclom_tpu.utilities.jaxcache import enable_compilation_cache
enable_compilation_cache()
print('loadavg at start:', os.getloadavg())
import bench
from nexoclom_tpu.utilities.config import NexoclomConfig, set_config
savepath = tempfile.mkdtemp(prefix='nxt_overlap_')
set_config(NexoclomConfig(savepath=savepath, precision='float32'))
inp = bench._ca_inputs()
inp.options.endtime = 10800.0
inp.options.step_size = 0.0
inp.options.resolution = 1e-4
t0 = time.perf_counter()
inp.run(1 << 22, seed=5)
print('OVERLAP_RUN_S', round(time.perf_counter() - t0, 1),
      inp.last_run_stages, flush=True)
print('loadavg at end:', os.getloadavg())
EOF

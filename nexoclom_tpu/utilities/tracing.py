"""Observability: structured logging, step-rate counters, device profiling.

The reference's only observability is ``print()`` every 100 steps
(``Output.py:354-355,426-427``) and per-iteration wall-clock prints.  This
module provides the rebuild's first-class replacements (SURVEY.md section 5):

* a package logger (``nexoclom_tpu``) with a one-call structured setup;
* :class:`StepRateTimer` — wall-clock timers reporting packet-steps/sec, the
  framework's headline metric;
* :func:`trace` — a context manager around ``jax.profiler`` emitting a
  TensorBoard-compatible device trace for kernel-level analysis.

On the experimental axon platform ``block_until_ready`` can return before
device work completes, so :class:`StepRateTimer` barriers by pulling a scalar
checksum to the host.
"""
from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger('nexoclom_tpu')


def setup_logging(level=logging.INFO, logfile: str | None = None):
    """Configure the package logger (idempotent)."""
    logger.setLevel(level)
    if not logger.handlers:
        handler = (logging.FileHandler(logfile) if logfile
                   else logging.StreamHandler())
        handler.setFormatter(logging.Formatter(
            '%(asctime)s %(name)s %(levelname)s %(message)s'))
        logger.addHandler(handler)
    return logger


def device_barrier(value) -> float:
    """A transfer-based barrier that cannot lie: reduces ``value`` (an array
    or pytree leaf sum) to a host float."""
    import jax.numpy as jnp
    return float(jnp.asarray(value).sum())


def scan_kernel_seconds(kernel_fn, arg, length: int = 5,
                        reps: int = 3) -> float:
    """Best-of-``reps`` per-call seconds of ``kernel_fn(arg)``, measured
    as a ``lax.scan`` of ``length`` calls inside ONE dispatch.

    On the axon tunnel every dispatch carries a ~25-50 ms host round
    trip (docs/scaling.md round-5 ladder), so per-call wall times
    understate a kernel's device rate; scanning R calls in one dispatch
    amortises it.  The scan carry perturbs ``arg`` by ``min(carry, 0)``
    — an exact runtime zero that XLA cannot prove is zero — so the body
    re-executes every trip instead of being hoisted/CSE'd.
    ``kernel_fn`` must return an array (or tuple whose first element is
    an array) reduced into the carry.  Shared by ``bench.py`` and
    ``scripts/bench_los.py`` so the bench record and the ladder scripts
    measure with the same methodology.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run():
        def body(c, _):
            out = kernel_fn(arg + jnp.minimum(c, 0.0))
            if isinstance(out, tuple):
                out = out[0]
            return c + jnp.sum(out), None
        s, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32),
                            None, length=length)
        return s

    float(run())                            # compile + barrier
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run())                        # scalar pull = true barrier
        best = min(best, time.perf_counter() - t0)
    return best / length


class StepRateTimer:
    """Measure packet-steps/sec over timed regions.

    Usage::

        timer = StepRateTimer()
        with timer.region(packet_steps=n * nsteps) as r:
            final = driver(...)
            r.barrier(final.frac)
        print(timer.summary())
    """

    def __init__(self):
        self.regions: list[tuple[float, float]] = []   # (packet_steps, sec)

    @contextlib.contextmanager
    def region(self, packet_steps: float):
        record = _Region()
        start = time.perf_counter()
        yield record
        if not record.barriered:
            logger.warning('StepRateTimer region ended without a barrier; '
                           'timing may exclude device work')
        elapsed = time.perf_counter() - start
        self.regions.append((float(packet_steps), elapsed))
        logger.info('engine region: %.3e packet-steps in %.3fs -> %.3e/s',
                    packet_steps, elapsed, packet_steps / elapsed)

    @property
    def total_packet_steps(self):
        return sum(ps for ps, _ in self.regions)

    @property
    def total_seconds(self):
        return sum(sec for _, sec in self.regions)

    def rate(self) -> float:
        return (self.total_packet_steps / self.total_seconds
                if self.total_seconds else 0.0)

    def summary(self) -> str:
        return (f'{self.total_packet_steps:.3e} packet-steps in '
                f'{self.total_seconds:.2f}s = {self.rate():.3e} '
                'packet-steps/s')


class _Region:
    def __init__(self):
        self.barriered = False

    def barrier(self, value):
        device_barrier(value)
        self.barriered = True


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device profile viewable in TensorBoard/XProf."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info('device trace written to %s', logdir)

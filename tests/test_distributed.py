"""Multi-host (multi-process) smoke test: a mesh spanning 2 OS processes
(2 virtual CPU devices each, gloo collectives) runs the real constant-step
engine with a fused histogram, the ADAPTIVE driver (per-iteration
cross-process collective in the while_loop cond), the multi-process
PRODUCTION POOL LOOP (per-process local pools, host-side allgather join,
bit-exact vs the monolithic driver), and the LOS cone reduction — each
matching a single-process run exactly.

The heavy lifting lives in ``nexoclom_tpu/parallel/distributed.py`` so the
same self-test is runnable standalone:
``python -m nexoclom_tpu.parallel.distributed --selftest``.
"""
import pytest

from nexoclom_tpu.parallel.distributed import run_selftest

pytestmark = pytest.mark.parallel


def test_two_process_global_mesh():
    ok, outs = run_selftest(num_processes=2, timeout=240.0)
    assert ok, 'distributed self-test failed:\n' + '\n---\n'.join(outs)
    for out in outs:
        assert 'SELFTEST-OK' in out
        assert 'pool-loop' in out and 'bit-exact' in out

"""Histogram-kernel geometry sweep (real TPU): the fused-image pipeline's
dominant cost is the in-scan 2-D histogram (fused 2.8e8 ps/s vs bare step
6.9e8 — VERDICT round 3 #5).  This times `ops.histograms` variants at the
fused production geometry (1M packets, 200x200 bins):

  matmul f32 at several block sizes   the incumbent (block 16384)
  matmul bf16 operands, f32 accum     MXU at 4x f32 rate; one-hots stay
                                      exact 0/1, weights round to bf16
  scatter                             the serial baseline

Each variant runs ITERS times inside one jitted fori_loop with a data
dependency (single-op timings drown in the ~27 ms dispatch round trip).
Run on a quiet host.
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from nexoclom_tpu.utilities.jaxcache import enable_compilation_cache

N = 1 << 20
NX = NY = 200
ITERS = 30
REPS = 3


def timed(name, fn, x, z, w):
    @jax.jit
    def run(x, z, w):
        def body(i, acc):
            return acc + fn(x + i * 0.0, z, w)
        return jax.lax.fori_loop(0, ITERS, body,
                                 jnp.zeros((NX, NY), w.dtype))

    out = run(x, z, w)
    float(jnp.sum(out))
    best = float('inf')
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = run(x, z, w)
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    per = best / ITERS
    print(f'{name:24s} {per * 1e3:8.3f} ms/hist   '
          f'{per / N * 1e9:6.3f} ns/elt')
    return out


def main():
    enable_compilation_cache()
    from nexoclom_tpu.ops.histograms import (_histogram2d_matmul,
                                             histogram2d)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (N,), minval=-4.0, maxval=4.0)
    z = jax.random.uniform(jax.random.fold_in(key, 1), (N,),
                           minval=-4.0, maxval=4.0)
    w = jax.random.uniform(jax.random.fold_in(key, 2), (N,))
    for leaf in (x, z, w):
        jax.block_until_ready(leaf)

    ref = None
    for blk in (8192, 16384, 32768, 65536):
        out = timed(f'matmul f32 blk={blk}',
                    lambda xv, zv, wv, b=blk: histogram2d(
                        xv, zv, wv, -4.0, 4.0, NX, -4.0, 4.0, NY,
                        impl='matmul') if b == 16384 else
                    _hist_block(xv, zv, wv, b), x, z, w)
        if blk == 16384:
            ref = np.asarray(out, np.float64)
    out16 = timed('matmul bf16 blk=16384',
                  lambda xv, zv, wv: histogram2d(
                      xv, zv, wv, -4.0, 4.0, NX, -4.0, 4.0, NY,
                      impl='matmul_bf16'), x, z, w)
    rel = np.abs(np.asarray(out16, np.float64) - ref).max() / ref.max()
    print(f'bf16 vs f32 max rel diff: {rel:.2e} '
          f'(weights rounding; one-hots exact)')
    for blk in (16384, 65536):
        timed(f'matmul bf16 blk={blk}',
              lambda xv, zv, wv, b=blk: _hist_block(xv, zv, wv, b,
                                                    jnp.bfloat16),
              x, z, w)
    timed('scatter', lambda xv, zv, wv: histogram2d(
        xv, zv, wv, -4.0, 4.0, NX, -4.0, 4.0, NY, impl='scatter'),
        x, z, w)


def _hist_block(xv, zv, wv, block, mxu_dtype=None):
    from nexoclom_tpu.ops.histograms import (_bin_index,
                                             _histogram2d_matmul)
    ix, okx = _bin_index(xv, -4.0, 4.0, NX)
    iz, okz = _bin_index(zv, -4.0, 4.0, NY)
    w = jnp.where(okx & okz, wv, 0.0)
    return _histogram2d_matmul(ix, iz, w, NX, NY, block=block,
                               mxu_dtype=mxu_dtype)


if __name__ == '__main__':
    main()

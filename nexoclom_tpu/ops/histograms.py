"""On-device histograms: scatter-add and exact one-hot-matmul forms.

Replaces host-side ``np.histogram``/``np.histogram2d`` post-processing
(``nexoclom/math/histogram.py``, ``ModelImage.py:264-269``) with jit-friendly
accumulation so observables build on device, inside the step loop if desired,
and reduce over a sharded packet axis with an XLA collective instead of a
host gather.

Two implementations (identical results up to f32 summation order):

* ``impl='scatter'`` — ``.at[].add``.  XLA lowers scatter-add to a serial
  per-update loop on this TPU: measured ~8.5 ns/update *independent of bin
  count, index order, and privatized copies* (v5e, 2026-08).
* ``impl='matmul'`` — blocked one-hot contraction
  ``H = X^T (w * Z)`` with X, Z the one-hot bin matrices.  Exact (0/1 times
  f32 weights, f32 MXU accumulation); cost scales with nx*nz but beats the
  serial scatter up to ~512x512: measured 1.5 ns/elt at 64^2, 1.9 at 200^2,
  3.6 at 400^2 vs scatter's flat 8.3 (bound by one-hot construction on the
  VPU, not by MXU flops or HBM — bf16 one-hots measured no faster).

``histogram2d(impl='auto')`` picks matmul below ``_MATMUL_MAX_BINS`` on
accelerators and scatter otherwise; CPU always scatters.

Bin conventions match ``np.histogram`` with explicit ranges: ``nbins`` equal
bins over [lo, hi); samples outside the range are dropped; the last edge is
inclusive (np.histogram puts x == hi in the last bin — replicated here).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# measured crossover on v5e: matmul 3.6 ns at 400^2=160k bins, ~9.3 ns at
# 800^2=640k vs scatter's 8.3 — switch a little above 512^2
_MATMUL_MAX_BINS = 300000
_MATMUL_BLOCK = 16384


def _bin_index(values, lo, hi, nbins):
    width = (hi - lo) / nbins
    idx = jnp.floor((values - lo) / width).astype(jnp.int32)
    # np.histogram includes the right edge in the last bin
    idx = jnp.where(values == hi, nbins - 1, idx)
    in_range = (values >= lo) & (values <= hi)
    return jnp.clip(idx, 0, nbins - 1), in_range


def histogram1d(values, weights, lo, hi, nbins: int):
    """Weighted 1-D histogram; returns (nbins,) array."""
    idx, ok = _bin_index(values, lo, hi, nbins)
    w = jnp.where(ok, weights, 0.0)
    return jnp.zeros(nbins, dtype=w.dtype).at[idx].add(w)


def histogram2d(xvals, yvals, weights, xlo, xhi, nx: int, ylo, yhi, ny: int,
                impl: str = 'scatter'):
    """Weighted 2-D histogram; returns (nx, ny) array.

    ``impl``: 'scatter', 'matmul', 'matmul_bf16', or 'auto' (matmul on
    accelerators when nx*ny is under the measured crossover, scatter
    otherwise).  'matmul_bf16' feeds the MXU bf16 operands (the one-hot
    entries stay exact 0/1; the weights round to bf16, ~4e-3 relative per
    sample — unbiased rounding noise far below MC statistics) with f32
    accumulation; opt-in for throughput experiments."""
    if impl == 'auto':
        impl = ('matmul' if (nx * ny <= _MATMUL_MAX_BINS and
                             jax.default_backend() != 'cpu') else 'scatter')
    ix, okx = _bin_index(xvals, xlo, xhi, nx)
    iy, oky = _bin_index(yvals, ylo, yhi, ny)
    w = jnp.where(okx & oky, weights, 0.0)
    if impl == 'matmul':
        return _histogram2d_matmul(ix, iy, w, nx, ny)
    if impl == 'matmul_bf16':
        return _histogram2d_matmul(ix, iy, w, nx, ny,
                                   mxu_dtype=jnp.bfloat16)
    if impl in ('pallas', 'pallas_interpret'):
        return _histogram2d_pallas(ix, iy, w, nx, ny,
                                   interpret=impl == 'pallas_interpret')
    flat = ix * ny + iy
    hist = jnp.zeros(nx * ny, dtype=w.dtype).at[flat].add(w)
    return hist.reshape(nx, ny)


def _histogram2d_matmul(ix, iy, w, nx: int, ny: int,
                        block: int = _MATMUL_BLOCK, mxu_dtype=None):
    """Exact blocked one-hot contraction: for each packet block,
    H += X^T (w * Y) with X (block, nx) and Y (block, ny) one-hot rows.
    Every product is exact (one-hot entries are 0/1); sums accumulate in the
    weight dtype on the MXU.  ``mxu_dtype`` (e.g. bf16) casts the matmul
    OPERANDS while keeping f32 accumulation (preferred_element_type)."""
    n = ix.shape[0]
    if n < block:
        block = max(64, n)
    pad = (-n) % block
    if pad:
        ix = jnp.concatenate([ix, jnp.zeros(pad, ix.dtype)])
        iy = jnp.concatenate([iy, jnp.zeros(pad, iy.dtype)])
        w = jnp.concatenate([w, jnp.zeros(pad, w.dtype)])
    nblocks = (n + pad) // block
    ax = jnp.arange(nx, dtype=ix.dtype)
    ay = jnp.arange(ny, dtype=iy.dtype)

    op_dtype = w.dtype if mxu_dtype is None else mxu_dtype

    def body(i, acc):
        s = i * block
        ixb = jax.lax.dynamic_slice_in_dim(ix, s, block)
        iyb = jax.lax.dynamic_slice_in_dim(iy, s, block)
        wb = jax.lax.dynamic_slice_in_dim(w, s, block)
        x1 = (ixb[:, None] == ax[None, :]).astype(op_dtype)
        y1 = ((iyb[:, None] == ay[None, :]).astype(wb.dtype)
              * wb[:, None]).astype(op_dtype)
        return acc + jax.lax.dot_general(
            x1, y1, (((0,), (0,)), ((), ())),
            preferred_element_type=w.dtype)

    init = jnp.zeros((nx, ny), dtype=w.dtype)
    if nblocks == 1:
        return body(0, init)
    return jax.lax.fori_loop(0, nblocks, body, init)


_PALLAS_BLOCK = 1024


def _histogram2d_pallas(ix, iy, w, nx: int, ny: int,
                        block: int = _PALLAS_BLOCK, interpret: bool = False):
    """One-hot-contraction histogram as a pallas TPU kernel.

    MEASURED NO-GO on axon/v5e (2026-08-18, docs/scaling.md "round-4
    histogram attack"): 4.1 ns/element vs the XLA 'matmul' form's 1.36
    at the fused production geometry (1M packets, 200x200 bins),
    bit-identical results.  The hypothesis this kernel tested — that
    the XLA form is bound by materialising one-hot operands to HBM, so
    building the tiles in VMEM (512 KB each at block=1024) and feeding
    the MXU directly would win — is false: the XLA form is flat at
    ~1.36 ns/elt across block geometry AND operand dtype
    (scripts/bench_hist_geometry.py), and the in-kernel one-hot build
    costs more than whatever XLA pays.  Kept as an opt-in
    (``impl='pallas'``) for other platforms; ``'pallas_interpret'``
    runs it on CPU for correctness tests.

    Numerics: one-hot entries are exact 0/1 in bf16; the weights round
    to bf16 in the product operand — the same rounding the opt-in
    'matmul_bf16' form applies — and accumulation is f32 on the MXU.
    """
    from jax.experimental import pallas as pl

    n = ix.shape[0]
    pad = (-n) % block
    if pad:
        # ix = -1 matches no bin: padded rows are exactly zero
        ix = jnp.concatenate([ix, jnp.full(pad, -1, ix.dtype)])
        iy = jnp.concatenate([iy, jnp.zeros(pad, iy.dtype)])
        w = jnp.concatenate([w, jnp.zeros(pad, w.dtype)])
    nblocks = (n + pad) // block
    out_dtype = w.dtype
    # lane (minor) dims must be 128-multiples; sublane pads to 8
    nxp = -(-nx // 8) * 8
    nyp = -(-ny // 128) * 128

    ix_col = ix.reshape(nblocks * block, 1)       # (block, 1) tiles
    iy_col = iy.reshape(nblocks * block, 1)
    w_col = w.reshape(nblocks * block, 1)

    def kernel(ix_ref, iy_ref, w_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        xio = jax.lax.broadcasted_iota(jnp.int32, (block, nxp), 1)
        x1 = (ix_ref[...] == xio).astype(jnp.bfloat16)
        yio = jax.lax.broadcasted_iota(jnp.int32, (block, nyp), 1)
        y1 = ((iy_ref[...] == yio).astype(out_dtype)
              * w_ref[...]).astype(jnp.bfloat16)
        # contract over the packet (sublane) dim: H += x1^T y1 on the MXU
        out_ref[...] += jax.lax.dot_general(
            x1, y1, (((0,), (0,)), ((), ())),
            preferred_element_type=out_dtype)

    hist = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((block, 1), lambda i: (i, 0)),
            pl.BlockSpec((block, 1), lambda i: (i, 0)),
            pl.BlockSpec((block, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((nxp, nyp), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((nxp, nyp), out_dtype),
        interpret=interpret,
    )(ix_col, iy_col, w_col)
    return hist[:nx, :ny]


def bin_centers(lo, hi, nbins: int):
    width = (hi - lo) / nbins
    return lo + width * (jnp.arange(nbins) + 0.5)

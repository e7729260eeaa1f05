"""Round-5 experiment: MXU-form dense LOS kernel vs the VPU form.

The production dense kernel (`ops/los._spectrum_kernel`) is elementwise
per (packet, spectrum) pair — ~35 VPU ops including a sqrt and a divide.
The cone test can instead be phrased on MXU matmuls:

    losrad[N,S] = P @ B.T - (sc.b)          (one [N,3]x[3,S] dot_general)
    d2[N,S]     = |p|^2 - 2 P @ SC.T + |sc|^2   (second dot_general)
    inview      = (losrad >= 0) & (losrad^2 >= d2 cos^2 dphi) & ...
    w           = weight * inview * recip(d2) / (pi sin^2 rp_cm^2)

which eliminates the sqrt and the clip/divide chain (radiance weighting
only ever needs 1/d^2) and moves 12 of the flops to the MXU.  Two known
hazards, both measured here:

* bf16 MXU rounding — countered with ``Precision.HIGHEST`` (the smear
  histogram needed the same fix, docs/scaling.md smear ladder);
* catastrophic cancellation in the d2 expansion when a packet passes
  within ~1e-3 R_p of the spacecraft (the elementwise form subtracts
  positions BEFORE squaring).  The comparison prints the worst relative
  radiance error alongside the speedup so the accuracy cost is part of
  the record.

Usage (real TPU):  python scripts/bench_los_mxu.py [--npackets 22] [--spectra 1024]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from functools import partial

from nexoclom_tpu.utilities.jaxcache import enable_compilation_cache


_CHUNK = 128


@partial(jax.jit, static_argnames=('chunk',))
def los_reduce_mxu(px, py, pz, weight, sc_pos, bore, obstruction, outer_dd,
                   dphi, rp_cm, chunk: int = _CHUNK):
    """Radiance-mode dense LOS reduction with the pair geometry on the MXU."""
    cos2 = jnp.cos(dphi) ** 2
    inv_apix_const = 1.0 / (jnp.pi * (jnp.sin(dphi) * rp_cm) ** 2)

    n_spectra = sc_pos.shape[0]
    pad = (-n_spectra) % chunk
    sc_pos = jnp.concatenate([sc_pos, jnp.zeros((pad, 3), sc_pos.dtype)])
    bore = jnp.concatenate([bore, jnp.zeros((pad, 3), bore.dtype)])
    bore = bore.at[n_spectra:, 0].set(1.0) if pad else bore
    obstruction = jnp.concatenate(
        [obstruction, jnp.zeros(pad, obstruction.dtype)])
    outer_dd = jnp.concatenate(
        [outer_dd, jnp.full(pad, -1.0, outer_dd.dtype)])

    P = jnp.stack([px, py, pz], axis=1)                 # [N, 3]
    p2 = (P * P).sum(axis=1, keepdims=True)             # [N, 1]

    nchunks = (n_spectra + pad) // chunk
    chunked = (sc_pos.reshape(nchunks, chunk, 3),
               bore.reshape(nchunks, chunk, 3),
               obstruction.reshape(nchunks, chunk),
               outer_dd.reshape(nchunks, chunk))

    def body(carry, operands):
        sc, b, ob, dd = operands                         # [C,3],[C,3],[C],[C]
        pb = jax.lax.dot_general(                        # [N, C] on the MXU
            P, b, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        psc = jax.lax.dot_general(
            P, sc, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        scb = (sc * b).sum(axis=1)                       # [C]
        sc2 = (sc * sc).sum(axis=1)                      # [C]
        losrad = pb - scb[None, :]                       # [N, C]
        d2 = jnp.maximum(p2 - 2.0 * psc + sc2[None, :], 1e-30)
        inview = ((losrad < ob[None, :])
                  & (losrad >= 0.0)
                  & (losrad * losrad >= d2 * cos2)
                  & (losrad <= dd[None, :]))
        # shadow column test (radiance mode)
        hx = sc[None, :, 0] + b[None, :, 0] * losrad
        hy = sc[None, :, 1] + b[None, :, 1] * losrad
        hz = sc[None, :, 2] + b[None, :, 2] * losrad
        lit = (hx * hx + hz * hz > 1.0) | (hy < 0.0)
        w = jnp.where(inview & lit, weight[:, None] / d2, 0.0)
        return carry, (w.sum(axis=0) * inv_apix_const, inview.sum(axis=0))

    _, (rad, npack) = jax.lax.scan(body, 0, chunked)
    return rad.reshape(-1)[:n_spectra], npack.reshape(-1)[:n_spectra]


def _pull(x):
    return float(jnp.sum(x))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--npackets', type=int, default=22,
                    help='log2 packet count (default 2^22 = 4M)')
    ap.add_argument('--spectra', type=int, default=1024)
    ap.add_argument('--reps', type=int, default=3)
    args = ap.parse_args()

    enable_compilation_cache()
    from nexoclom_tpu.ops.los import los_reduce

    n = 1 << args.npackets
    s = args.spectra
    rng = np.random.default_rng(3)
    # packets in a shell 1..8 R_p, MESSENGER-like orbit geometry
    r = rng.uniform(1.0, 8.0, n) ** 0.5 * 8.0 ** 0.5
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    pos = (u.T * r).T.astype(np.float32)
    weight = rng.uniform(0.0, 1.0, n).astype(np.float32)
    theta = np.linspace(0, 2 * np.pi, s, endpoint=False)
    sc = np.stack([3.0 * np.cos(theta), 0.4 * np.sin(theta),
                   3.0 * np.sin(theta)], axis=1).astype(np.float32)
    bore = (-sc / np.linalg.norm(sc, axis=1, keepdims=True)).astype(np.float32)
    obstruction = np.full(s, 1e30, np.float32)
    outer_dd = np.full(s, 40.0, np.float32)
    dphi = np.float32(np.deg2rad(0.5))
    rp_cm = np.float32(2.4397e8)

    px, py, pz = (jnp.asarray(pos[:, i]) for i in range(3))
    wj = jnp.asarray(weight)
    scj, bj = jnp.asarray(sc), jnp.asarray(bore)
    obj, ddj = jnp.asarray(obstruction), jnp.asarray(outer_dd)

    def time_fn(fn, tag):
        out = fn()
        _pull(out[0])
        reps = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn()
            _pull(out[0])
            reps.append(time.perf_counter() - t0)
        best = min(reps)
        pairs = n * s / best
        print(f'{tag}: best {best*1e3:.1f} ms  {pairs:.3e} pairs/s  '
              f'reps {[round(t*1e3,1) for t in reps]}')
        return out, best

    ref, t_ref = time_fn(
        lambda: los_reduce(px, py, pz, wj, scj, bj, obj, ddj, dphi, rp_cm),
        'dense VPU (production)')
    mxu, t_mxu = time_fn(
        lambda: los_reduce_mxu(px, py, pz, wj, scj, bj, obj, ddj, dphi,
                               rp_cm),
        'dense MXU (prototype) ')

    rad_ref = np.asarray(ref[0], np.float64)
    rad_mxu = np.asarray(mxu[0], np.float64)
    np_ref = np.asarray(ref[1])
    np_mxu = np.asarray(mxu[1])
    denom = np.maximum(np.abs(rad_ref), np.abs(rad_ref).max() * 1e-12)
    rel = np.abs(rad_mxu - rad_ref) / denom
    print(f'speedup {t_ref / t_mxu:.2f}x   max rel radiance diff '
          f'{rel.max():.3e} (median {np.median(rel):.3e})   '
          f'npackets-in-view mismatch rows: '
          f'{int((np_ref != np_mxu).sum())}/{s} '
          f'(max count delta {int(np.abs(np_ref - np_mxu).max())})')


if __name__ == '__main__':
    main()

"""Microbenchmark the candidate swap-boundary compaction primitives.

The pool loop's per-iteration overhead over the monolithic driver
(3.20 vs 2.15 ms/iter at the tuned 64:0.0625 config — docs/scaling.md)
is the swap boundary: an 11-payload stable sort of the full batch plus
the carry crossing.  VERDICT round 3 asks for a cheaper compaction
primitive.  Candidates, at the production geometry (batch 2^20,
k = batch/16 finished lanes to retire):

  sort11     the incumbent: 11 separate (key, payload) stable sorts
             (sort_group=1 production form)
  sort1      ONE (key, iota) stable sort -> permutation only
  gatherk    k-sized gather leaf[pos] for 10 leaves (retire reads)
  scatterk   k-sized scatter leaf.at[pos].set(fresh) for 11 leaves
  scatter1m  full-batch scatter (cumsum-rank form, 1 leaf, 1M updates)
  cumsum     full-batch i32 cumsum (rank computation)
  nonzero    jnp.nonzero(finished, size=k) position extraction
  topk       lax.top_k over keyed iota position extraction
  swap_scatter  the full candidate swap: sort1 positions + k-gather
             retire (10 leaves) + k-scatter refill (11 leaves)

Every op runs ITERS times inside ONE jitted lax.fori_loop (the bare
per-dispatch round trip on axon is ~27 ms and buries single-op
timings); a data dependency threads through the loop so XLA cannot
hoist the body.  Pull-a-scalar barrier (block_until_ready lies on
axon — CLAUDE.md), best of REPS dispatches.  Run on a QUIET host.
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from nexoclom_tpu.utilities.jaxcache import enable_compilation_cache

BATCH = 1 << 20
K = BATCH // 16
N_STATE = 9           # PacketState leaves
ITERS = 50
REPS = 3


def timed(name, body, init):
    """Time ITERS applications of body inside one lax.fori_loop."""
    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, ITERS, body, c)

    out = run(init)
    float(jnp.sum(out[0][0] if isinstance(out[0], list) else out[0]))
    best = float('inf')
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = run(init)
        leaf = out[0][0] if isinstance(out[0], list) else out[0]
        float(jnp.sum(leaf))
        best = min(best, time.perf_counter() - t0)
    per = (best * 1e3) / ITERS
    print(f'{name:14s} {per:8.3f} ms/op')
    return per


def main():
    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    finished = jax.random.uniform(key, (BATCH,)) < 0.0700
    alive_key = (~finished).astype(jnp.int32)
    leaves = [jax.random.normal(jax.random.fold_in(key, i), (BATCH,))
              for i in range(N_STATE + 2)]          # + h + ids stand-ins
    iota = jnp.arange(BATCH, dtype=jnp.int32)
    pos0 = jnp.sort(jnp.where(finished, iota, BATCH))[:K]
    fresh = jax.random.normal(jax.random.fold_in(key, 99), (K,))
    for leaf in leaves + [alive_key, pos0, fresh]:
        jax.block_until_ready(leaf)

    # each body perturbs its carry so iterations can't be CSE'd/hoisted

    def b_sort11(i, c):
        ls, k_ = c
        k2 = k_ ^ (i & 1)
        out = [jax.lax.sort((k2, leaf), num_keys=1, is_stable=True)[1]
               for leaf in ls]
        return out, k_

    def b_sort1(i, c):
        io, k_ = c
        k2 = k_ ^ (i & 1)
        return jax.lax.sort((k2, io), num_keys=1, is_stable=True)[1], k_

    def b_gatherk(i, c):
        outs, p = c
        p2 = (p + i) % BATCH
        return [leaf[p2] for leaf in leaves[:10]], p

    def b_scatterk(i, c):
        ls, p = c
        p2 = (p + i) % BATCH
        return [leaf.at[p2].set(fresh + i) for leaf in ls], p

    def b_scatter1m(i, c):
        out, fin = c
        rank = jnp.cumsum(fin.astype(jnp.int32)) - 1 + (i & 1)
        dest = jnp.where(fin & (rank < K), rank, K)
        return out.at[dest].set(leaves[0], mode='drop'), fin

    def b_cumsum(i, c):
        out, fin = c
        return jnp.cumsum(fin.astype(jnp.int32) + (i & 1)), fin

    def b_nonzero(i, c):
        out, fin = c
        return jnp.nonzero(fin ^ (i < 0), size=K, fill_value=BATCH)[0], fin

    def b_topk(i, c):
        out, fin = c
        keyed = jnp.where(fin, iota + (i & 1), BATCH)
        return -jax.lax.top_k(-keyed, K)[0], fin

    def b_swap_scatter(i, c):
        ls, k_ = c
        k2 = k_ ^ (i & 1)
        perm = jax.lax.sort((k2, iota), num_keys=1, is_stable=True)[1]
        p = perm[:K]
        retired = [leaf[p] for leaf in ls[:10]]         # retire reads
        new = [leaf.at[p].set(fresh + retired[j % 10][0])
               for j, leaf in enumerate(ls)]            # refill writes
        return new, k_

    timed('sort11', b_sort11, (leaves, alive_key))
    timed('sort1', b_sort1, (iota, alive_key))
    timed('gatherk', b_gatherk, ([leaf[:K] for leaf in leaves[:10]], pos0))
    timed('scatterk', b_scatterk, (leaves, pos0))
    timed('scatter1m', b_scatter1m,
          (jnp.zeros((K + 1,), leaves[0].dtype), finished))
    timed('cumsum', b_cumsum, (jnp.zeros((BATCH,), jnp.int32), finished))
    timed('nonzero', b_nonzero, (pos0, finished))
    timed('topk', b_topk, (pos0, finished))
    timed('swap_scatter', b_swap_scatter, (leaves, alive_key))


if __name__ == '__main__':
    main()

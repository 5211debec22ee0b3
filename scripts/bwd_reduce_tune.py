"""Measure per-Gaussian gradient-reduction variants on real TPU.

The backward pass must reduce per-pair gradient rows [16, P_aligned] to
per-Gaussian gradients [N, 16].  The round-1 design used the autodiff
transpose of the record gather — an XLA scatter-add — measured at ~1/3 of the
whole backward (docs/DESIGN.md).  Candidates:

  A  scatter-add (autodiff transpose; round-1 baseline)
  B  unique-index row scatter-SET into the dense [N*R] candidate grid,
     then a dense reshape [N, R, 16] sum over R (no collisions by
     construction: each candidate slot becomes at most one sorted pair)
  C  int32 inverse-permutation scatter + row gather + dense sum
  D  sort-based inverse (lax.sort on (q, pos)) + row gather + dense sum

    python scripts/bwd_reduce_tune.py --gaussians 100000 --pairs $((1<<20))
"""

import argparse
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def timeit(fn, *args, iters=20):
    import jax

    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gaussians", type=int, default=100000)
    ap.add_argument("--pairs", type=int, default=2**20)
    ap.add_argument("--tiles", type=int, default=2500)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--R", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    N, R, C = args.gaussians, args.R, args.chunk
    P = args.pairs + args.tiles * C
    NR = N * R
    rng = np.random.default_rng(0)

    # Realistic structure: ~11 pairs per gaussian, clustered candidate slots.
    per_g = max(args.pairs // N, 1)
    gauss = np.repeat(np.arange(N), per_g)[: args.pairs]
    npairs = len(gauss)
    r_slot = np.concatenate([np.arange(min(per_g, R))] * N)[:npairs]
    q = (gauss * R + r_slot).astype(np.int32)
    rng.shuffle(q)  # aligned order is tile-major: scattered in candidate space
    q_al = np.full(P, NR, np.int32)
    valid_pos = rng.permutation(P)[:npairs]
    q_al[valid_pos] = q
    aligned_idx = np.where(q_al < NR, q_al // R, 0).astype(np.int32)
    within = (q_al < NR)

    g = jnp.asarray(rng.normal(size=(16, P)).astype(np.float32))
    q_al = jnp.asarray(q_al)
    aligned_idx_j = jnp.asarray(aligned_idx)
    within_j = jnp.asarray(within)

    @jax.jit
    def variant_a(g):
        gathered_bar = jnp.where(within_j[:, None], g.T, 0.0)
        return jnp.zeros((N, 16), jnp.float32).at[aligned_idx_j].add(gathered_bar)

    @jax.jit
    def variant_b(g):
        cand = jnp.zeros((NR + 1, 16), jnp.float32).at[q_al].set(
            g.T, mode="drop", unique_indices=True
        )
        return cand[:NR].reshape(N, R, 16).sum(axis=1)

    @jax.jit
    def variant_c(g):
        inv = jnp.full((NR + 1,), P, jnp.int32).at[q_al].set(
            jnp.arange(P, dtype=jnp.int32), mode="drop", unique_indices=True
        )
        gpad = jnp.concatenate([g.T, jnp.zeros((1, 16), jnp.float32)], axis=0)
        cand = gpad[jnp.minimum(inv[:NR], P)]
        return cand.reshape(N, R, 16).sum(axis=1)

    @jax.jit
    def variant_d(g):
        # sort (q, pos); valid candidates land in slots [0, num_valid) in
        # candidate order.  Dense inverse via a second sort of the identity.
        qs, ps = jax.lax.sort(
            (q_al, jnp.arange(P, dtype=jnp.int32)), num_keys=1, is_stable=True
        )
        # For each candidate q: position via searchsorted over the sorted keys
        pos = jnp.searchsorted(qs, jnp.arange(NR, dtype=jnp.int32), method="sort")
        hit = qs[jnp.minimum(pos, P - 1)] == jnp.arange(NR, dtype=jnp.int32)
        src = jnp.where(hit, ps[jnp.minimum(pos, P - 1)], P)
        gpad = jnp.concatenate([g.T, jnp.zeros((1, 16), jnp.float32)], axis=0)
        cand = gpad[jnp.minimum(src, P)]
        return cand.reshape(N, R, 16).sum(axis=1)

    # --- sorted-segment family -------------------------------------------
    # E: rows permuted to gaussian-sorted order (perm precomputed), then
    #    segment_sum with indices_are_sorted.  F adds the cost of computing
    #    the permutation with sorts (what binning would pay per step).
    @jax.jit
    def compute_perm():
        gid = jnp.where(within_j, aligned_idx_j, N)
        perm = jax.lax.sort((gid, jnp.arange(P, dtype=jnp.int32)),
                            num_keys=1, is_stable=True)[1]
        return perm, jnp.sort(gid)

    perm_j, gid_sorted_j = jax.jit(compute_perm)()
    perm_j.block_until_ready()

    @jax.jit
    def variant_e(g):
        rows = jnp.where(within_j[:, None], g.T, 0.0)[perm_j]
        return jax.ops.segment_sum(
            rows, gid_sorted_j, num_segments=N + 1, indices_are_sorted=True
        )[:N]

    @jax.jit
    def variant_f(g):
        gid = jnp.where(within_j, aligned_idx_j, N)
        perm = jax.lax.sort((gid, jnp.arange(P, dtype=jnp.int32)),
                            num_keys=1, is_stable=True)[1]
        rows = jnp.where(within_j[:, None], g.T, 0.0)[perm]
        return jax.ops.segment_sum(
            rows, jnp.sort(gid), num_segments=N + 1, indices_are_sorted=True
        )[:N]

    @jax.jit
    def variant_g(g):
        # sort rows directly (16 f32 payloads) by gaussian id
        gid = jnp.where(within_j, aligned_idx_j, N)
        cols = jax.lax.sort((gid,) + tuple(g[i] for i in range(16)),
                            num_keys=1, is_stable=True)
        rows = jnp.stack(cols[1:], axis=1)
        return jax.ops.segment_sum(
            rows, cols[0], num_segments=N + 1, indices_are_sorted=True
        )[:N]

    ref = np.asarray(variant_a(g))
    for name, fn in [("A scatter-add", variant_a), ("B row-set+sum", variant_b),
                     ("C int-inv+gather", variant_c), ("D sort-inv+gather", variant_d),
                     ("E perm+sorted-seg", variant_e), ("F +perm-sorts", variant_f),
                     ("G rowsort+seg", variant_g)]:
        try:
            out = np.asarray(fn(g))
            err = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-9)
            ms = timeit(fn, g)
            print(f"{name:20s} {ms:8.2f} ms   relerr {err:.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:20s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()

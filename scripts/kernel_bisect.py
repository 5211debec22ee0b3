"""Isolate the rasterizer's cost: empty grid / DMA-only / compute-only."""

import os
import sys
import time
from functools import partial
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussiansplattingmlx_tpu.ops import rasterize_pallas as RP

C = 128
TT = 256
NUM_TILES = 625
NCHUNKS = 13  # ~pairs 1M / 625 tiles / 128
P = NUM_TILES * NCHUNKS * C

st = RP.RasterStatic(
    chunk=C, tile_h=16, tile_w=16, grid_h=25, grid_w=25,
    num_aligned=P, alpha_clamp=0.99, transmittance_eps=1e-4, undo_denom_floor=1e-6, interpret=False,
)


def make_kernel(mode):
    def kernel(start_ref, count_ref, rec_hbm, out_ref, rec_vmem, sem):
        t = pl.program_id(0)
        start = start_ref[t]
        count = count_ref[t]
        nchunks = pl.cdiv(count, C)
        basis = RP._tile_basis(st)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)

        @pl.when(jnp.logical_and(nchunks > 0, mode != "empty"))
        def _():
            RP._rec_copy(rec_hbm, rec_vmem, sem, start, 0, 0, C).start()

        def body(ci, carry):
            acc4 = carry
            slot = jax.lax.rem(ci, 2)
            if mode in ("dma", "full"):
                RP._rec_copy(rec_hbm, rec_vmem, sem, start, ci, slot, C).wait()

                @pl.when(ci + 1 < nchunks)
                def _():
                    RP._rec_copy(rec_hbm, rec_vmem, sem, start, ci + 1, 1 - slot, C).start()

            if mode in ("compute", "full", "scan", "book"):
                rec = rec_vmem[slot]
                valid = (lane_iota + ci * C) < count
                a, _, _ = RP._chunk_alpha_mxu(rec, basis, t, valid, st)
                if mode in ("scan", "book"):
                    om = 1.0 - a
                    li = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
                    lj = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
                    lt_excl = jnp.where(li < lj, 1.0, 0.0)
                    tu = jnp.exp(RP._mm(jnp.log(om), lt_excl, ((1,), (0,))))
                    m = tu >= 1e-4
                    mf = jnp.where(m, 1.0, 0.0)
                    w = tu * a * mf
                    acc4 = acc4 + RP._mm(rec[6:10, :], w, ((1,), (1,)))
                    if mode == "book":
                        has = jnp.max(mf, axis=1, keepdims=True)
                        t_after = jnp.min(jnp.where(m, tu - tu*a, 1.0), axis=1, keepdims=True)
                        acc4 = acc4 + jnp.mean(has + t_after)
                else:
                    acc4 = acc4 + RP._mm(rec[6:10, :], a, ((1,), (1,)))
            else:
                acc4 = acc4 + 1.0
            return acc4

        acc4 = jnp.zeros((4, TT), jnp.float32)
        if mode != "empty":
            acc4 = jax.lax.fori_loop(0, nchunks, body, acc4)
        out_ref[0] = jnp.concatenate(
            [acc4, jnp.zeros((2, TT), jnp.float32)], axis=0
        )

    return kernel


def run(mode, counts_val):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NUM_TILES,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, 6, TT), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, RP.REC_DIM, C), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    f = pl.pallas_call(
        make_kernel(mode),
        out_shape=jax.ShapeDtypeStruct((NUM_TILES, 6, TT), jnp.float32),
        grid_spec=grid_spec,
    )
    starts = jnp.arange(NUM_TILES, dtype=jnp.int32) * (NCHUNKS * C)
    counts = jnp.full((NUM_TILES,), counts_val, jnp.int32)
    rec = jnp.ones((RP.REC_DIM, P), jnp.float32) * 0.1
    g = jax.jit(lambda s, c, r: f(s, c, r))
    out = g(starts, counts, rec)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = g(starts, counts, rec)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / 20 * 1e3


for mode, cnt in [("empty", 0), ("dma", NCHUNKS * C), ("compute", NCHUNKS * C),
                  ("full", NCHUNKS * C), ("scan", NCHUNKS * C), ("book", NCHUNKS * C)]:
    print(f"{mode:8s} count={cnt:5d}: {run(mode, cnt):8.2f} ms", flush=True)

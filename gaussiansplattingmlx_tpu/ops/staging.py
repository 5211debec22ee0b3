"""Fused pair staging: binning + sort + chunk-aligned relayout in ONE pass.

The split pipeline (ops/binning.py + the relayout in ops/rasterize_pallas.py)
pays four [max_pairs]-scale index operations between projection and the
rasterizer kernel — measured on v5e (docs/DESIGN.md roofline, 2M budget):

    table row-gather (binning)          ~13 ms
    3-column pair sort                  ~8-12 ms
    sorted_gauss_idx[src] relayout      ~14 ms   (gathers cost ~6.5 ns/INDEX,
    rec[aligned_idx] record row-gather  ~13 ms    nearly independent of width)

Because TPU gather cost is per-index — a 24-wide row costs the same as an
8-wide row — and lax.sort scales sub-linearly in payload columns (17 columns
at 1.3M rows: 5.7 ms), the four operations fuse into two [max_pairs]-scale
indexed passes plus MXU work that rides the merge kernel:

    1. The pair-stream gather is FUSED into the blocked-merge kernel
       (merge_pallas.merge_gather): the per-gaussian table carries the tile
       rect columns AND the 11 record floats as real f32 values, and each
       block's rank-relative row selection is ONE one-hot MXU contraction
       against the table window already in VMEM — no [max_pairs] row gather
       at all.
    2. ONE sort on (tile, depth) carrying the records + gaussian id as
       payloads — the pairs land in composite order with their records.
    3. The chunk-aligned relayout is a blocked-copy Pallas kernel (every
       aligned chunk copies a CONTIGUOUS sorted run: floor-aligned DMA +
       dynamic lane roll + tail mask), not a per-index gather.

Differentiability: staging is index machinery around ONE linear read of the
packed records, so the whole pipeline is a custom_vjp whose backward is the
per-Gaussian segment reduction (sort + MXU segment-sum kernel,
rasterize_pallas._segment_reduce_pallas) applied to the record-buffer
cotangent — gradients never differentiate through the sort itself.
Exactness vs the split pipeline is asserted bit-for-bit in
tests/test_staging.py (same keys, same stable sort, same emission order).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import binning as binning_mod
from . import merge_pallas
from . import rasterize_pallas as rp

# packed [N, 11] reference layout -> kernel record layout (depth/op swapped);
# an involution, so it is its own inverse in the backward pass.
_PERM = (0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 9)


class StagingStatic(NamedTuple):
    """Hashable static config for the fused staging custom_vjp."""

    image_width: int
    image_height: int
    tile_w: int
    tile_h: int
    max_pairs: int
    chunk: int  # rasterizer chunk (alignment quantum)
    num_rec: int  # N
    grad_reduce: str  # "segsum" | "scatter"
    interpret: bool


class StagedPairs(NamedTuple):
    records_cm: jax.Array  # [16, num_aligned] kernel-layout record buffer
    aligned_start: jax.Array  # [num_tiles] chunk-aligned column starts
    tile_count: jax.Array  # [num_tiles] real pairs per tile
    num_pairs: jax.Array  # []
    overflow_gaussians: jax.Array  # []
    overflow_pairs: jax.Array  # []


def _num_aligned(st: StagingStatic) -> int:
    grid_w = -(-st.image_width // st.tile_w)
    grid_h = -(-st.image_height // st.tile_h)
    return st.max_pairs + grid_w * grid_h * st.chunk


def _use_merge_gather(st: StagingStatic, n: int) -> bool:
    """Gate for the fused merge+gather kernel: value-exact f32 carriage
    needs n, max_pairs <= 2^24; GSPLAT_MERGE=sort forces the portable
    row-gather fallback."""
    mode = os.environ.get("GSPLAT_MERGE", "auto")
    return (
        mode != "sort"
        and st.max_pairs % merge_pallas.BLOCK == 0
        and st.max_pairs <= 2 ** 24
        and n <= 2 ** 24
        and (mode == "pallas" or st.interpret
             or jax.default_backend() == "tpu")
    )


def _use_gather_records() -> bool:
    """GSPLAT_STAGE_RECORDS=gather: the (tile, depth) sort carries ONLY the
    gaussian id; the 11 record floats are gathered AFTER the sort from the
    compact per-gaussian [N, 11] table (records are per-GAUSSIAN — every pair
    of a gaussian shares them — so the gather reads N rows, not max_pairs).
    Trades 10 sorted payload columns + 17 merge table rows at [max_pairs]
    scale for one [max_pairs]-index row gather (~6.5 ns/index).  Bit-exact
    either way (same source values, same stable sort permutation); which is
    faster is a measured A/B (scripts/round5_wrapup.sh)."""
    return os.environ.get("GSPLAT_STAGE_RECORDS", "payload") == "gather"


def _sorted_pairs(st: StagingStatic, packed, rect_min, rect_max, radii, depths):
    """Steps 1-2: fused merge+gather + payload sort.  Returns
    (sorted_cols, tile_start, tile_count, expansion)."""
    n = packed.shape[0]
    grid_w = -(-st.image_width // st.tile_w)
    grid_h = -(-st.image_height // st.tile_h)
    num_tiles = grid_w * grid_h

    depths = jax.lax.stop_gradient(depths)
    use_kernel = _use_merge_gather(st, n)
    gather_records = _use_gather_records()
    e = binning_mod.expand_pairs(
        rect_min, rect_max, radii, depths,
        st.image_width, st.image_height, st.tile_w, st.tile_h, st.max_pairs,
        need_rank=not use_kernel,
    )
    keep = e.keep_idx

    # --- 1. per-gaussian table (compacted order), REAL f32 values -----------
    # Small integers (tile rect, block_start <= max_pairs for any selected
    # row, gaussian id) are exact in f32 up to 2^24 (gated above); depth and
    # the 11 record floats pass through unchanged.  No bitcasting: the fused
    # kernel's one-hot MXU contraction reproduces values bit-for-bit.
    rec_kernel = packed[:, list(_PERM)].astype(jnp.float32)  # [N, 11]
    head = jnp.stack(
        [
            e.tmin_x[keep].astype(jnp.float32),
            e.tmin_y[keep].astype(jnp.float32),
            e.rw[keep].astype(jnp.float32),
            e.block_start[keep].astype(jnp.float32),
            depths.astype(jnp.float32)[keep],
            keep.astype(jnp.float32),
        ],
        axis=0,
    )  # [6, n]
    if gather_records:
        # Lean table: records do not ride the merge (gathered post-sort).
        tbl = jnp.concatenate(
            [head, jnp.zeros((2, n), jnp.float32)], axis=0
        )  # [8, n]
    else:
        tbl = jnp.concatenate(
            [
                head,
                rec_kernel[keep].T,
                jnp.zeros((merge_pallas.TBL_ROWS - 17, n), jnp.float32),
            ],
            axis=0,
        )  # [24, n]

    if use_kernel:
        # Merge + gather in ONE Pallas pass: the [max_pairs] row gather
        # (~6.5 ns/index, ~10 ms at 2M pairs) becomes an in-kernel one-hot
        # MXU contraction against the table window already in VMEM.
        g = merge_pallas.merge_gather(
            e.cum_keep, tbl, st.max_pairs, interpret=st.interpret
        )  # [tbl_rows, max_pairs]
    else:
        g = tbl[:, e.rank]  # portable fallback: one [max_pairs] row gather

    p = jnp.arange(st.max_pairs, dtype=jnp.int32)
    valid = p < e.num_pairs
    tiles = binning_mod.enumerate_tiles(
        g[3].astype(jnp.int32),
        jnp.maximum(g[2].astype(jnp.int32), 1),  # zero-pad rows: avoid /0
        g[0].astype(jnp.int32),
        g[1].astype(jnp.int32),
        grid_w,
    )
    tile_ids = jnp.where(valid, tiles, num_tiles)
    depth_keys = jnp.where(valid, g[4], jnp.inf)
    gid = jnp.where(valid, g[5].astype(jnp.int32), 0)

    # --- 2. ONE stable sort on (tile, depth) -------------------------------
    # Identical keys + stable + identical gaussian-major input order as the
    # split pipeline => identical permutation (bit-exact parity).
    if gather_records:
        # Only the gaussian id rides the sort; records are gathered from the
        # compact [N, 11] table afterwards.  Invalid lanes (key = +inf, all
        # stably at the tail past num_pairs) gather row 0 and are re-zeroed —
        # the exact zeros the payload carriage produced.
        s_tile, s_depth, s_gid = jax.lax.sort(
            (tile_ids, depth_keys, gid), num_keys=2, is_stable=True
        )
        rec_s = jnp.where(valid[:, None], rec_kernel[s_gid], 0.0)
        row9 = jnp.where(valid, s_depth, 0.0)
        sorted_cols = (
            (s_tile, s_depth)
            + tuple(rec_s[:, i] for i in range(9))
            + (row9, rec_s[:, 10], s_gid)
        )
    else:
        # Records as sort payloads.  Record row 9 (depth) is NOT carried: it
        # equals the depth KEY for valid lanes (both are packed column 10 =
        # p.depths through the same merge), so the sorted key column is
        # reused and invalid lanes (key +inf) are re-zeroed to match the
        # zero-pad rows the payload carried — one elementwise select instead
        # of a 14th sorted column.
        sorted_13 = jax.lax.sort(
            (tile_ids, depth_keys)
            + tuple(g[6 + i] for i in range(11) if i != 9)
            + (gid,),
            num_keys=2,
            is_stable=True,
        )
        row9 = jnp.where(valid, sorted_13[1], 0.0)
        sorted_cols = sorted_13[:11] + (row9,) + sorted_13[11:13]
    sorted_tile = sorted_cols[0]
    tile_iota = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(
        sorted_tile, tile_iota, side="left"
    ).astype(jnp.int32)
    tile_end = jnp.searchsorted(
        sorted_tile, tile_iota, side="right"
    ).astype(jnp.int32)
    tile_count = tile_end - tile_start
    return sorted_cols, tile_start, tile_count, e


# --- Pallas chunk-aligned relayout -------------------------------------------
#
# The aligned relayout is NOT a general gather: every C-slot output chunk
# copies a CONTIGUOUS run of sorted pair columns (its tile's pairs, offset by
# the chunk's within-tile rank).  A per-index row gather costs ~6.5 ns/index
# (~13-14 ms at the 2M budget); a blocked copy kernel pays only the DMA — it
# reads the floor-aligned window, lane-ROLLS by the misalignment (dynamic
# shift), masks the tail past tile_count to exact zeros, and writes the
# aligned chunk.  Row 11 carries the gaussian id as an exact f32 VALUE —
# never as bitcast int bits: those are denormals, and the TPU lowering
# flushed them to zero at segmented grid sizes (see _stage_impl).


def _relayout_kernel(src128_ref, shift_ref, nvalid_ref, sorted_hbm, out_ref,
                     win_vmem, sem, *, C, K2, SUB, ng):
    g = pl.program_id(0)

    def copy(chunk, slot):
        off = pl.multiple_of(src128_ref[chunk], 128)
        return pltpu.make_async_copy(
            sorted_hbm.at[:, pl.ds(off, K2)], win_vmem.at[slot], sem.at[slot]
        )

    @pl.when(g == 0)
    def _():
        for j in range(SUB):
            copy(j, j).start()

    phase = jax.lax.rem(g, 2)
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    for j in range(SUB):
        slot = phase * SUB + j

        @pl.when(g + 1 < ng)
        def _(j=j):
            copy((g + 1) * SUB + j, (1 - phase) * SUB + j).start()

        copy(g * SUB + j, slot).wait()
        c = g * SUB + j
        win = win_vmem[slot]  # (REC_DIM, K2)
        rolled = pltpu.roll(win, -shift_ref[c], axis=1)[:, :C]
        # Padding-chunk shifts can exceed K2 (roll wraps) — nvalid == 0 there,
        # so the mask yields the exact zeros the gradient path requires.
        out_ref[:, j * C:(j + 1) * C] = jnp.where(
            lane_c < nvalid_ref[c], rolled, 0.0
        )


# Per-call chunk-plan cap: the plan rides scalar prefetch (SMEM, ~1 MB on
# v5e).  3 int32 arrays x 32768 chunks = 384 KB leaves headroom; beyond it
# the relayout is issued as several pallas_calls over chunk segments — a
# single call at a 16.8M-pair budget needs a 133k-chunk plan = 1.6 MB and
# dies with a permanent smem-OOM compile error.  The jnp.concatenate of the
# segment outputs costs one extra HBM copy of the aligned buffer at those
# (rare, >8.4M-budget) sizes; acceptable until a multi-output aliasing form
# is worth the complexity.
_RELAYOUT_SEG_CHUNKS = 32768


def _relayout_pallas(st: StagingStatic, sorted_cm, tile_start, tile_count,
                     owner, rank0):
    """sorted_cm [REC_DIM, max_pairs] -> aligned records [REC_DIM,
    num_aligned], bit-identical to the per-slot gather path."""
    C = st.chunk
    K2 = ((C + 127) // 128 + 1) * 128  # window: C lanes + up-to-127 shift
    num_aligned = _num_aligned(st)
    nchunks = num_aligned // C

    src0 = tile_start[owner] + rank0
    nvalid = jnp.clip(tile_count[owner] - rank0, 0, C)
    # Clamp padding-chunk windows into the zero tail (max_pairs is a
    # 128-multiple, so the clamped offset stays lane-aligned).
    src128 = jnp.minimum((src0 // 128) * 128, st.max_pairs).astype(jnp.int32)
    shift = (src0 - src128).astype(jnp.int32)
    sorted_pad = jnp.concatenate(
        [sorted_cm, jnp.zeros((rp.REC_DIM, K2), jnp.float32)], axis=1
    )

    def call(src128_s, shift_s, nvalid_s, seg_chunks):
        sub = 8
        while seg_chunks % sub:
            sub //= 2
        ng = seg_chunks // sub
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(ng,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((rp.REC_DIM, sub * C), lambda g, *_: (0, g),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2 * sub, rp.REC_DIM, K2), jnp.float32),
                pltpu.SemaphoreType.DMA((2 * sub,)),
            ],
        )
        return pl.pallas_call(
            functools.partial(_relayout_kernel, C=C, K2=K2, SUB=sub, ng=ng),
            out_shape=jax.ShapeDtypeStruct(
                (rp.REC_DIM, seg_chunks * C), jnp.float32
            ),
            grid_spec=grid_spec,
            interpret=st.interpret,
        )(src128_s, shift_s, nvalid_s, sorted_pad)

    if nchunks <= _RELAYOUT_SEG_CHUNKS:
        return call(src128, shift, nvalid, nchunks)
    outs = []
    for s0 in range(0, nchunks, _RELAYOUT_SEG_CHUNKS):
        s1 = min(s0 + _RELAYOUT_SEG_CHUNKS, nchunks)
        outs.append(
            call(src128[s0:s1], shift[s0:s1], nvalid[s0:s1], s1 - s0)
        )
    return jnp.concatenate(outs, axis=1)


def _use_relayout_kernel(st: StagingStatic) -> bool:
    """GSPLAT_RELAYOUT=gather forces the per-slot row-gather fallback."""
    mode = os.environ.get("GSPLAT_RELAYOUT", "auto")
    return (
        mode != "gather"
        and st.max_pairs % 128 == 0
        and (mode == "pallas" or st.interpret
             or jax.default_backend() == "tpu")
    )


def _stage_impl(st: StagingStatic, packed, rect_min, rect_max, radii, depths):
    # Row 11 of the record buffer carries the gaussian id as an f32 VALUE;
    # exactness requires ids < 2^24 (max_gaussians tops out at 2^20).
    assert st.num_rec < 2 ** 24, "gid f32-value carriage needs num_rec < 2^24"
    grid_w = -(-st.image_width // st.tile_w)
    grid_h = -(-st.image_height // st.tile_h)
    num_tiles = grid_w * grid_h
    C = st.chunk
    sorted_cols, tile_start, tile_count, e = _sorted_pairs(
        st, packed, rect_min, rect_max, radii, depths
    )

    # --- 3. chunk-aligned relayout ------------------------------------------
    # Index math shared with the split pipeline (rasterize_pallas.
    # aligned_chunk_plan) so the paths cannot diverge.  Default: the Pallas
    # blocked-copy kernel (each aligned chunk is a contiguous sorted run —
    # no per-index gather).  Fallback: ONE [num_aligned] row gather.
    num_aligned = _num_aligned(st)
    aligned_start, owner, rank0 = rp.aligned_chunk_plan(
        tile_start, tile_count, num_tiles, C, num_aligned
    )
    lane = jnp.arange(C, dtype=jnp.int32)[None, :]
    within = ((rank0[:, None] + lane) < tile_count[owner][:, None]).reshape(-1)

    if _use_relayout_kernel(st):
        # Sorted pair table [16, max_pairs] column-major: 11 record
        # components, the gaussian id in row 11 as an exact f32 VALUE
        # (<= 2^24, same gate as the merge table; the kernels never read
        # past row 10).  NOT a bitcast: small-int bit patterns are f32
        # DENORMALS, and on real TPU the relayout lowering flushed them to
        # zero at large (segmented) grids — every gradient then attributed
        # to gaussian 0 and training silently froze (round-4 campaign).
        sorted_cm = jnp.stack(
            list(sorted_cols[2:13])
            + [sorted_cols[13].astype(jnp.float32)]
            + [jnp.zeros((st.max_pairs,), jnp.float32)] * (rp.REC_DIM - 12),
            axis=0,
        )
        records_cm = _relayout_pallas(
            st, sorted_cm, tile_start, tile_count, owner, rank0
        )
        gid_aligned = jnp.where(
            within, records_cm[11].astype(jnp.int32), st.num_rec
        ).astype(jnp.int32)
    else:
        sorted_table = jnp.stack(
            list(sorted_cols[2:13])
            + [sorted_cols[13].astype(jnp.float32)]  # exact value, no bitcast
            + [jnp.zeros((st.max_pairs,), jnp.float32)] * (rp.REC_DIM - 12),
            axis=1,
        )
        rank = rank0[:, None] + lane
        src = jnp.where(
            within, (tile_start[owner][:, None] + rank).reshape(-1), 0
        )
        aligned = sorted_table[src]  # [num_aligned, 16] row gather
        # Select-form masking: garbage in never-written tails cannot reach
        # the gradient (0 * NaN would).
        aligned = jnp.where(within[:, None], aligned, 0.0)
        gid_aligned = jnp.where(
            within, aligned[:, 11].astype(jnp.int32), st.num_rec
        ).astype(jnp.int32)
        records_cm = aligned.T

    staged = StagedPairs(
        records_cm=records_cm,
        aligned_start=aligned_start,
        tile_count=tile_count,
        num_pairs=e.num_pairs,
        overflow_gaussians=e.overflow_gaussians,
        overflow_pairs=e.overflow_pairs,
    )
    return staged, gid_aligned


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def stage_pairs(
    st: StagingStatic, packed, rect_min, rect_max, radii, depths
) -> StagedPairs:
    staged, _ = _stage_impl(st, packed, rect_min, rect_max, radii, depths)
    return staged


def _stage_fwd(st, packed, rect_min, rect_max, radii, depths):
    staged, gid_aligned = _stage_impl(
        st, packed, rect_min, rect_max, radii, depths
    )
    return staged, gid_aligned


def _reduce_record_cotangent(st: StagingStatic, g_cm, gid):
    """Shared backward for BOTH staging VJPs (aligned and sorted-train):
    d packed = per-Gaussian segment reduction of the record-buffer cotangent
    — the same reduction the split pipeline's gather transpose performs
    (sort + MXU segment sum, or the XLA scatter-add fallback).  One body so
    the two custom VJPs cannot drift (live-rows set, row-4 copy, layout
    perm)."""
    total = g_cm.shape[1]
    seg_chunk = (
        rp.pick_seg_chunk(total, st.chunk)
        if st.grad_reduce == "segsum" else 0
    )
    if seg_chunk:
        sst = rp.SegsumStatic(
            num_rec=st.num_rec, num_aligned=total,
            chunk=seg_chunk, block_b=128, interpret=st.interpret,
            live_rows=rp.RASTER_LIVE_ROWS,
        )
        grad_rec = rp._segment_reduce_pallas(sst, g_cm, gid)
        grad_rec = grad_rec.at[:, 4].set(grad_rec[:, 3])  # d_c10 = d_c01
    else:
        valid = gid < st.num_rec
        rows = jnp.where(valid[:, None], g_cm.T, 0.0)
        idx = jnp.where(valid, gid, 0)
        grad_rec = jnp.zeros((st.num_rec, rp.REC_DIM), jnp.float32).at[
            idx
        ].add(rows)
    # Kernel layout -> packed layout (the perm is an involution).
    d_packed = grad_rec[:, list(_PERM)]
    # Geometry inputs are stop-gradient staging machinery (the split pipeline
    # stop-grads them inside binning): zero cotangents, same semantics.
    n = st.num_rec
    return (
        d_packed,
        jnp.zeros((n, 2), jnp.float32),  # rect_min
        jnp.zeros((n, 2), jnp.float32),  # rect_max
        jnp.zeros((n,), jnp.float32),  # radii
        jnp.zeros((n,), jnp.float32),  # depths
    )


def _stage_bwd(st, gid_aligned, cot: StagedPairs):
    return _reduce_record_cotangent(st, cot.records_cm, gid_aligned)


stage_pairs.defvjp(_stage_fwd, _stage_bwd)


def _train_pad(st: StagingStatic) -> int:
    """Zero columns appended after max_pairs for the training-sorted buffer:
    at least `chunk` (the kernel's last window read overruns the final tile
    by up to chunk-1 columns) and padding the total to a 512 multiple (the
    segment-reduce's best DMA chunk, scripts/bwd_reduce_tune.py)."""
    base = st.max_pairs + st.chunk
    return -(-base // 512) * 512 - st.max_pairs


def _stage_train_impl(st: StagingStatic, packed, rect_min, rect_max, radii,
                      depths):
    assert st.num_rec < 2 ** 24, "gid f32-value carriage needs num_rec < 2^24"
    sorted_cols, tile_start, tile_count, e = _sorted_pairs(
        st, packed, rect_min, rect_max, radii, depths
    )
    pad = _train_pad(st)
    sorted_table = jnp.stack(
        list(sorted_cols[2:13])
        + [jnp.zeros((st.max_pairs,), jnp.float32)] * (rp.REC_DIM - 11),
        axis=0,
    )
    records_cm = jnp.concatenate(
        [sorted_table, jnp.zeros((rp.REC_DIM, pad), jnp.float32)], axis=1
    )
    valid = jnp.arange(st.max_pairs, dtype=jnp.int32) < e.num_pairs
    gid_full = jnp.concatenate(
        [
            jnp.where(valid, sorted_cols[13], st.num_rec).astype(jnp.int32),
            jnp.full((pad,), st.num_rec, jnp.int32),
        ]
    )
    staged = SortedPairs(
        records_cm=records_cm,
        tile_start=tile_start,
        tile_count=tile_count,
        num_pairs=e.num_pairs,
        overflow_gaussians=e.overflow_gaussians,
        overflow_pairs=e.overflow_pairs,
    )
    return staged, gid_full


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def stage_pairs_train(
    st: StagingStatic, packed, rect_min, rect_max, radii, depths
) -> "SortedPairs":
    """TRAINING staging in raw sorted order: no aligned relayout at all.

    The forward kernel has tolerated unaligned tile starts since round 3 (the
    inference fast path); round 5 adds the boundary-carry backward kernel
    (rasterize_pallas._bwd_kernel_sorted), so training no longer pays the
    relayout (~6 ms/step at the bench workload) or the per-tile alignment
    padding in the forward/backward sweeps and the gradient segment
    reduction (~18% of rows).  Gradients match stage_pairs up to fp
    regrouping of the kernels' per-chunk prefix products (chunk boundaries
    fall at different pair offsets — same ULP-level effect as the inference
    fast path); include sets, contributor counts, and the gid-sort reduction
    order are exact (the aligned layout preserves sorted order within tiles,
    so removing the padding does not reorder any gaussian's pair rows)."""
    staged, _ = _stage_train_impl(st, packed, rect_min, rect_max, radii, depths)
    return staged


def _stage_train_fwd(st, packed, rect_min, rect_max, radii, depths):
    return _stage_train_impl(st, packed, rect_min, rect_max, radii, depths)


def _stage_train_bwd(st, gid_full, cot: "SortedPairs"):
    return _reduce_record_cotangent(st, cot.records_cm, gid_full)


stage_pairs_train.defvjp(_stage_train_fwd, _stage_train_bwd)


class SortedPairs(NamedTuple):
    # [16, max_pairs + pad] SORTED-order records.  pad differs by producer:
    # stage_pairs_sorted (inference) pads exactly `chunk` columns;
    # stage_pairs_train pads _train_pad(st) (>= chunk, total rounded to a
    # 512 multiple for the segment-reduce DMA).  Consumers must size from
    # records_cm.shape[1], never from max_pairs + chunk.
    records_cm: jax.Array
    tile_start: jax.Array  # [num_tiles] raw (unaligned) starts
    tile_count: jax.Array  # [num_tiles]
    num_pairs: jax.Array  # []
    overflow_gaussians: jax.Array  # []
    overflow_pairs: jax.Array  # []


def stage_pairs_sorted(
    st: StagingStatic, packed, rect_min, rect_max, radii, depths
) -> SortedPairs:
    """Inference staging: records in SORTED pair order, NO aligned relayout.

    The forward kernel tolerates unaligned tile starts (it DMAs from the
    chunk-aligned floor and masks the head lanes), so the [num_aligned] row
    gather — ~14 ms/frame at flagship scale — disappears entirely.  Forward
    only (no VJP): the viewer/eval path (render(inference=True)).

    The trailing `chunk` zero columns keep the kernel's last window read in
    bounds: a tile ending at column max_pairs-1 sweeps at most chunk-1
    columns past it.
    """
    sorted_cols, tile_start, tile_count, e = _sorted_pairs(
        st, packed, rect_min, rect_max, radii, depths
    )
    sorted_table = jnp.stack(
        list(sorted_cols[2:13])
        + [jnp.zeros((st.max_pairs,), jnp.float32)] * (rp.REC_DIM - 11),
        axis=1,
    )
    records_cm = jnp.concatenate(
        [sorted_table.T, jnp.zeros((rp.REC_DIM, st.chunk), jnp.float32)],
        axis=1,
    )
    return SortedPairs(
        records_cm=jax.lax.stop_gradient(records_cm),
        tile_start=tile_start,
        tile_count=tile_count,
        num_pairs=e.num_pairs,
        overflow_gaussians=e.overflow_gaussians,
        overflow_pairs=e.overflow_pairs,
    )

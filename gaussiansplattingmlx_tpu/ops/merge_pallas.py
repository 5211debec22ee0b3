"""Pallas merge kernel: pair slot -> owning gaussian rank.

Binning's exact pair expansion needs, for every pair slot p in [0, max_pairs),
the rank of its owning gaussian: rank(p) = #{j : cum[j] <= p} where `cum` is
the inclusive cumsum of (strictly positive) footprints — i.e. a merge of two
already-sorted streams.  XLA's `searchsorted(method="sort")` solves it with a
full merge-sort of the concatenation: 36 ms at 2M pairs on v5e, the single
largest line item in binning (docs/DESIGN.md roofline).

Both streams are sorted AND the queries are consecutive integers, so a
blocked compare does the merge in linear work: for a block of B consecutive
slots, all owners live in a K = B + 128 window of `cum` (strictly increasing
values ⇒ at most B owners per B consecutive integers; +128 covers the
alignment floor), located by a cheap coarse searchsorted at block
granularity.  Per block:

  * `cum` window on LANES: a (1, K) dynamic HBM slice (offset pre-floored to
    a lane-aligned multiple of 128 — Mosaic requires it), double-buffered.
  * slot positions on SUBLANES: a (B, 1) iota.
  * the (B, K) compare is VPU work; the count is ONE tiny MXU contraction
    (cmp @ ones) instead of a cross-lane reduction; no transposes anywhere
    (the output block is (B, 1) sublane-major).
  * SUB blocks are processed per grid step inside a fori loop (the same
    double-buffered-chunk structure as the rasterizer kernels) so the
    per-grid-step overhead amortizes.

Used by ops/binning.py on TPU; the sort-based path remains as the portable
fallback and the parity oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 512  # slots per sub-block (measured best on v5e)
SUB = 8  # sub-blocks per grid step (bounds in-flight DMAs to 2*SUB)
_PAD_VALUE = 2 ** 30  # > any slot index AND > binning._CUM_CLAMP (2^30 - 1)


def _merge_kernel(lo_ref, cum_hbm, out_ref, cum_vmem, sem, *, B, K, SUB, ng):
    g = pl.program_id(0)

    def copy(block, slot):
        off = pl.multiple_of(lo_ref[block], 128)
        return pltpu.make_async_copy(
            cum_hbm.at[:, pl.ds(off, K)], cum_vmem.at[slot], sem.at[slot]
        )

    # Static UNROLL over SUB sub-blocks per grid step: every scalar-ref index
    # and output offset is a static expression of program_id.  2*SUB buffer
    # slots: this step's windows were prefetched by the previous step; this
    # step prefetches the next one's.
    @pl.when(g == 0)
    def _():
        for j in range(SUB):
            copy(j, j).start()

    phase = jax.lax.rem(g, 2)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
    for j in range(SUB):
        slot = phase * SUB + j

        @pl.when(g + 1 < ng)
        def _(j=j):
            copy((g + 1) * SUB + j, (1 - phase) * SUB + j).start()

        copy(g * SUB + j, slot).wait()
        cum = cum_vmem[slot]  # (1, K) window on lanes
        pos = sub_iota + (g * SUB + j) * B  # (B, 1) positions on sublanes
        cmp = (cum <= pos).astype(jnp.int32)  # (B, K)
        cnt = jnp.sum(cmp, axis=1, keepdims=True)  # (B, 1)
        out_ref[j * B:(j + 1) * B, :] = lo_ref[g * SUB + j] + cnt


def _plan(n: int, max_pairs: int):
    """Shared block plan: (B, SUB-adjusted, nb, ng, K, npad)."""
    B = BLOCK
    nb = max_pairs // B
    sub = SUB
    while nb % sub:
        sub //= 2
    assert max_pairs % B == 0, "max_pairs must be a multiple of the block"
    K = B + 128
    npad = -(-(n + K) // 128) * 128
    return B, sub, nb, nb // sub, K, npad


def merge_ranks(cum: jax.Array, max_pairs: int, *, interpret: bool = False):
    """rank[p] = #{j: cum[j] <= p} for p in [0, max_pairs).

    `cum` must be nondecreasing with values in [0, _PAD_VALUE], STRICTLY
    increasing below binning._CUM_CLAMP (binning guarantees this by compacting
    zero-footprint gaussians first; entries saturated at the clamp may repeat,
    which is safe because every query p < max_pairs << _CUM_CLAMP — window
    entries at the clamp always compare greater than any real slot).
    """
    n = cum.shape[0]
    B, sub, nb, _, K, npad = _plan(n, max_pairs)

    # Pad so the (lane-aligned) K-window never reads out of bounds.
    cum_p = jnp.full((1, npad), _PAD_VALUE, jnp.int32)
    cum_p = jax.lax.dynamic_update_slice(
        cum_p, cum.astype(jnp.int32)[None, :], (0, 0)
    )

    # Coarse: first owner rank per block, floored to the DMA lane alignment.
    starts = jnp.arange(nb, dtype=jnp.int32) * B
    lo = jnp.searchsorted(cum, starts, side="left").astype(jnp.int32)
    lo128 = (lo // 128) * 128  # rank floor == lane-aligned window offset

    ng = nb // sub
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ng,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((sub * B, 1), lambda g, *_: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * sub, 1, K), jnp.int32),
            pltpu.SemaphoreType.DMA((2 * sub,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_merge_kernel, B=B, K=K, SUB=sub, ng=ng),
        out_shape=jax.ShapeDtypeStruct((nb * B, 1), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(lo128, cum_p)
    return out[:, 0]


# --- fused merge + gather -----------------------------------------------------
#
# The rank is only ever USED to gather a per-gaussian table row for each pair
# slot (ops/staging.py step 1) — a [max_pairs]-scale row gather that costs
# ~6.5 ns per index on v5e (~10-13 ms at 2M pairs).  But the merge kernel
# already holds, in VMEM, the exact K-window of gaussians a block's ranks can
# land in — so the gather collapses into ONE MXU one-hot contraction per
# block:  out(R, B) = window(R, K) . onehot(B, K)^T  with onehot[b, k] =
# (k == cnt[b]) — the (rank - lo128) local index IS the count.
#
# Exactness: the table carries real f32 VALUES (small integers <= 2^24 are
# exact in f32; depth/record floats pass through unchanged), and a 0/1
# contraction at HIGHEST precision reproduces the selected value bit-for-bit
# (x*1 + 0*y... sums one nonzero term).  Rank == n (slots past the last real
# pair) selects a zero-padded table column; callers mask those slots anyway.

TBL_ROWS = 24  # table height: 8-sublane multiple; 17 live rows + zero pad


def _merge_gather_kernel(lo_ref, cum_hbm, tbl_hbm, out_ref, cum_vmem,
                         tbl_vmem, sem, tsem, *, B, K, SUB, ng):
    g = pl.program_id(0)

    def copy_cum(block, slot):
        off = pl.multiple_of(lo_ref[block], 128)
        return pltpu.make_async_copy(
            cum_hbm.at[:, pl.ds(off, K)], cum_vmem.at[slot], sem.at[slot]
        )

    def copy_tbl(block, slot):
        off = pl.multiple_of(lo_ref[block], 128)
        return pltpu.make_async_copy(
            tbl_hbm.at[:, pl.ds(off, K)], tbl_vmem.at[slot], tsem.at[slot]
        )

    @pl.when(g == 0)
    def _():
        for j in range(SUB):
            copy_cum(j, j).start()
            copy_tbl(j, j).start()

    phase = jax.lax.rem(g, 2)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
    lane_bk = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
    for j in range(SUB):
        slot = phase * SUB + j

        @pl.when(g + 1 < ng)
        def _(j=j):
            copy_cum((g + 1) * SUB + j, (1 - phase) * SUB + j).start()
            copy_tbl((g + 1) * SUB + j, (1 - phase) * SUB + j).start()

        copy_cum(g * SUB + j, slot).wait()
        copy_tbl(g * SUB + j, slot).wait()
        cum = cum_vmem[slot]  # (1, K) window on lanes
        tbl = tbl_vmem[slot]  # (R, K) table window, same offset
        pos = sub_iota + (g * SUB + j) * B  # (B, 1)
        cnt = jnp.sum((cum <= pos).astype(jnp.int32), axis=1, keepdims=True)
        onehot = jnp.where(lane_bk == cnt, 1.0, 0.0)  # (B, K)
        # (R, K) . (B, K) contracted on K: exact row selection on the MXU.
        out = jax.lax.dot_general(
            tbl, onehot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (R, B)
        out_ref[:, j * B:(j + 1) * B] = out


def merge_gather(cum: jax.Array, table_cm: jax.Array, max_pairs: int, *,
                 interpret: bool = False) -> jax.Array:
    """Fused rank-merge + table-row gather.

    `cum` as in merge_ranks (strictly increasing below the clamp, compacted);
    `table_cm` is [R, n] f32 in the SAME compacted order (R a multiple of 8
    sublanes; TBL_ROWS for the payload-carriage staging, 8 for the lean
    gather-records staging), carrying real values (integer rows must stay
    <= 2^24 for exact f32 round-trip).  Returns [R, max_pairs]: column
    p = table_cm[:, rank(p)], zeros where rank(p) == n.
    """
    n = cum.shape[0]
    R = table_cm.shape[0]
    assert table_cm.shape == (R, n) and R % 8 == 0, table_cm.shape
    assert n <= 2 ** 24 and max_pairs <= 2 ** 24, (
        "f32-exact value carriage requires n, max_pairs <= 2^24"
    )
    B, sub, nb, ng, K, npad = _plan(n, max_pairs)

    cum_p = jnp.full((1, npad), _PAD_VALUE, jnp.int32)
    cum_p = jax.lax.dynamic_update_slice(
        cum_p, cum.astype(jnp.int32)[None, :], (0, 0)
    )
    tbl_p = jnp.zeros((R, npad), jnp.float32)
    tbl_p = jax.lax.dynamic_update_slice(
        tbl_p, table_cm.astype(jnp.float32), (0, 0)
    )

    starts = jnp.arange(nb, dtype=jnp.int32) * B
    lo = jnp.searchsorted(cum, starts, side="left").astype(jnp.int32)
    lo128 = (lo // 128) * 128

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((R, sub * B), lambda g, *_: (0, g),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * sub, 1, K), jnp.int32),
            pltpu.VMEM((2 * sub, R, K), jnp.float32),
            pltpu.SemaphoreType.DMA((2 * sub,)),
            pltpu.SemaphoreType.DMA((2 * sub,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_merge_gather_kernel, B=B, K=K, SUB=sub, ng=ng),
        out_shape=jax.ShapeDtypeStruct((R, nb * B), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(lo128, cum_p, tbl_p)

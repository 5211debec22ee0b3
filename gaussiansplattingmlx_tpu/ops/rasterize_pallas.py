"""Pallas TPU tile rasterizer: forward + custom-VJP backward.

TPU-native re-design of the reference's per-pixel compositing kernels
(slang/gaussian_tile_global_kernels.slang:406-881).  Differences from the
GPU design, chosen for the TPU memory/compute model:

  * Grid = pixel tiles (default 32x32 = 1024 px).  Each grid program DMAs its
    depth-sorted Gaussian records from HBM in chunks of `chunk_size` and
    composites all tile pixels at once on the VPU/MXU, instead of 1 thread
    per pixel marching serially.
  * The serial front-to-back recurrence is evaluated with a vector identity
    (see ops/rasterize_ref.py): transmittance is an exclusive prefix product
    over the chunk axis (computed as log + triangular-ones MXU matmul + exp),
    the include-mask falls out of the unmasked scan, and color/depth
    accumulation is one MXU contraction per chunk.  The alpha exponent is
    itself a basis(TT,6) @ coef(6,C) matmul in tile-local coordinates — the
    kernel is VMEM-bandwidth bound, so elementwise passes are the scarce
    resource and the MXU does everything quadratic.
  * Backward: the reference's reverse march + WaveActiveSum + InterlockedAdd
    float atomics (slang :728-877) is replaced by reverse suffix-scans plus
    per-pair gradient rows written to DISJOINT column slices of a [12, P]
    buffer (each sorted pair belongs to exactly one tile) — deterministic, no
    atomics.  The pair-gradient buffer is scattered back to per-Gaussian
    grads by the autodiff transpose of the record gather (XLA scatter-add).
  * Early exit: a tile stops fetching chunks once every pixel's transmittance
    crossed 1e-4 (the reference's per-pixel break, slang :599-604).

Memory layout (Mosaic requires DMA slice shapes aligned to the 128-lane
tiling, so records are component-major and every tile's pair range starts at
a chunk-aligned offset):

  records   [16, P_aligned] f32 in HBM (row count padded to the 8-sublane
            tiling Mosaic requires for HBM slices); rows:
            0 mean_x, 1 mean_y, 2 c00, 3 c01, 4 c10, 5 c11,
            6 colR, 7 colG, 8 colB, 9 depth, 10 opacity, 11-15 zero
  per tile  columns [aligned_start[t], aligned_start[t] + ceil(count/C)*C)
  compute   pixel-major (TT, C): pixels on sublanes, chunk gaussians on lanes

(The reference packs [N,11] with opacity before depth,
GaussianRenderer.swift:45-51; we swap so color+depth are contiguous for one
MXU contraction.)

Forward output [num_tiles, 6, TT]: rows 0-2 accumulated RGB, 3 accumulated
depth, 4 alpha (=1-T), 5 n_contrib.  Background is applied OUTSIDE in JAX.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rasterize_ref import RenderOutputs

REC_DIM = 16
OUT_CHANNELS = 6
# Gradient rows with distinct content out of the backward kernels: rows 3
# and 4 (conic off-diagonals) both receive d_cs, so row 4 is dropped from
# the segment-reduce's gid sort and copied from row 3 after the reduction.
RASTER_LIVE_ROWS = (0, 1, 2, 3, 5, 6, 7, 8, 9, 10)


class RasterStatic(NamedTuple):
    """Hashable static configuration threaded through the custom_vjp."""

    chunk: int
    tile_h: int
    tile_w: int
    grid_h: int
    grid_w: int
    num_aligned: int  # total columns of the (aligned or sorted) record buffer
    alpha_clamp: float
    transmittance_eps: float
    undo_denom_floor: float
    interpret: bool
    # True: records are in raw SORTED order (tile starts NOT chunk-aligned);
    # the backward uses _bwd_kernel_sorted (zero-initialized gradient buffer +
    # read-modify-write windows) instead of exclusive chunk ownership.
    sorted_mode: bool = False


def _scan_lanes(x, reverse: bool):
    """Inclusive prefix (or suffix) sum along axis 1 via log-step shifts
    (static concat/slice only — portable inside Pallas)."""
    n = x.shape[1]
    shift = 1
    while shift < n:
        if reverse:
            x = x + jnp.concatenate(
                [x[:, shift:], jnp.zeros_like(x[:, :shift])], axis=1
            )
        else:
            x = x + jnp.concatenate(
                [jnp.zeros_like(x[:, :shift]), x[:, :-shift]], axis=1
            )
        shift *= 2
    return x


def _scan_prod(x, reverse: bool, exclusive: bool = False):
    """Prefix (or suffix) product along axis 1, shifting in ones.

    Linear-space transmittance scans match the reference's serial float
    arithmetic (it multiplies, it doesn't sum logs) and avoid 3 transcendental
    passes per chunk.  No underflow hazard: see kernel comments."""
    ones = jnp.ones_like(x[:, :1])
    if exclusive:
        if reverse:
            x = jnp.concatenate([x[:, 1:], ones], axis=1)
        else:
            x = jnp.concatenate([ones, x[:, :-1]], axis=1)
    n = x.shape[1]
    shift = 1
    while shift < n:
        if reverse:
            x = x * jnp.concatenate(
                [x[:, shift:], jnp.broadcast_to(ones, (x.shape[0], shift))], axis=1
            )
        else:
            x = x * jnp.concatenate(
                [jnp.broadcast_to(ones, (x.shape[0], shift)), x[:, :-shift]], axis=1
            )
        shift *= 2
    return x


def _mm(a, b, dims):
    """MXU contraction with full-f32 accumulation (default precision runs
    bf16 passes that visibly corrupt color/gradients; a 3-pass HIGH A/B was
    tried in round 4 and crashed in the Mosaic lowering — HIGHEST it is)."""
    return jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _tile_basis(st: RasterStatic):
    """Per-tile pixel basis [1, x, y, x^2, y^2, xy] in TILE-LOCAL coordinates
    as a (TT, 6) block.  Tile-local coordinates keep the expanded quadratic
    form numerically tame (global coordinates would cancel catastrophically
    in f32 for off-tile means)."""
    tt = st.tile_h * st.tile_w
    i = jax.lax.broadcasted_iota(jnp.int32, (tt, 1), 0)
    x = (i % st.tile_w).astype(jnp.float32)
    y = (i // st.tile_w).astype(jnp.float32)
    one = jnp.ones_like(x)
    return jnp.concatenate([one, x, y, x * x, y * y, x * y], axis=1)  # (TT, 6)


def _chunk_coefs(rec, t, st: RasterStatic):
    """Quadratic-form coefficients (6, C) so that the alpha exponent becomes
    one MXU matmul: E' = basis @ coef, raw = exp(E') = exp(e) * opacity.

    e = -0.5 (dx^2 c00 + dy^2 c11 + dx dy (c01 + c10)) with dx = px - mx
    expands over the basis [1, x, y, x^2, y^2, xy]; opacity folds in as
    +ln(op) on the constant term.  Returns (coef (6, C), derived rows)."""
    tile_y = t // st.grid_w
    tile_x = t % st.grid_w
    mx = rec[0:1, :] - (tile_x * st.tile_w).astype(jnp.float32)  # tile-local
    my = rec[1:2, :] - (tile_y * st.tile_h).astype(jnp.float32)
    c00 = rec[2:3, :]
    cs = rec[3:4, :] + rec[4:5, :]  # c01 + c10 share the exponent term
    c11 = rec[5:6, :]
    op = rec[10:11, :]
    lnop = jnp.log(jnp.maximum(op, 1e-37))
    coef = jnp.concatenate(
        [
            -0.5 * (c00 * mx * mx + c11 * my * my + cs * mx * my) + lnop,
            c00 * mx + 0.5 * cs * my,
            c11 * my + 0.5 * cs * mx,
            -0.5 * c00,
            -0.5 * c11,
            -0.5 * cs,
        ],
        axis=0,
    )  # (6, C)
    return coef, (mx, my, c00, cs, c11, op)


def _chunk_alpha_mxu(rec, basis, t, valid_row, st: RasterStatic):
    """raw/alpha for a chunk via the MXU path.  Returns (a, raw, rows)."""
    coef, rows = _chunk_coefs(rec, t, st)
    e_op = _mm(basis, coef, ((1,), (0,)))  # (TT, C) = e + ln(op)
    raw = jnp.exp(e_op)
    a = jnp.where(valid_row, jnp.minimum(raw, st.alpha_clamp), 0.0)
    return a, raw, rows


def _rec_copy(rec_hbm, rec_vmem, sem, start, ci, slot, C):
    """Descriptor for the chunk-`ci` record DMA into double-buffer `slot`."""
    cstart = pl.multiple_of(start + ci * C, C)
    return pltpu.make_async_copy(
        rec_hbm.at[:, pl.ds(cstart, C)], rec_vmem.at[slot], sem.at[slot]
    )


def _grad_copy(grad_hbm, grad_vmem, gsem, start, ci, slot, C):
    """Descriptor for the chunk-`ci` gradient write from double-buffer `slot`."""
    cstart = pl.multiple_of(start + ci * C, C)
    return pltpu.make_async_copy(
        grad_vmem.at[slot], grad_hbm.at[:, pl.ds(cstart, C)], gsem.at[slot]
    )


def _fwd_kernel(start_ref, count_ref, rec_hbm, out_ref, rec_vmem, sem, *, st: RasterStatic):
    C = st.chunk
    tt = st.tile_h * st.tile_w
    t = pl.program_id(0)
    # Tile range [start, start+count).  `start` need NOT be chunk-aligned:
    # the DMA sweep begins at the aligned floor and the head lanes before
    # `start` are masked out (shift).  The training path passes aligned
    # starts (shift == 0, identical behavior); the inference path skips the
    # aligned relayout entirely and passes raw sorted-order starts.
    start = start_ref[t]
    count = count_ref[t]
    off = (start // C) * C
    shift = start - off
    count_w = shift + count  # masked window length from `off`
    basis = _tile_basis(st)  # (TT, 6)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    # Strictly-lower-triangular ones: exclusive prefix sums as one MXU matmul
    # (the shift-network scan was ~15 VPU passes; the kernel is VMEM-bandwidth
    # bound, so passes are the currency).
    li = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    lt_excl = jnp.where(li < lj, 1.0, 0.0)
    eps = st.transmittance_eps
    # Empty tiles sweep nothing even when `start` is unaligned (shift > 0
    # with count == 0 would otherwise DMA+evaluate one fully-masked chunk —
    # up to a whole grid of wasted work in sparse scenes).
    nchunks = jnp.where(count > 0, pl.cdiv(count_w, C), 0)

    @pl.when(nchunks > 0)
    def _():
        _rec_copy(rec_hbm, rec_vmem, sem, off, 0, 0, C).start()

    def cond(carry):
        ci, _, _, _, alive = carry
        return jnp.logical_and(ci < nchunks, alive)

    def body(carry):
        ci, t_in, acc4, ncon, _ = carry
        slot = jax.lax.rem(ci, 2)
        _rec_copy(rec_hbm, rec_vmem, sem, off, ci, slot, C).wait()

        # Prefetch the next chunk while this one computes.
        @pl.when(ci + 1 < nchunks)
        def _():
            _rec_copy(rec_hbm, rec_vmem, sem, off, ci + 1, 1 - slot, C).start()

        rec = rec_vmem[slot]
        lane_g = lane_iota + ci * C
        valid = jnp.logical_and(lane_g >= shift, lane_g < count_w)  # (1, C)
        a, _, _ = _chunk_alpha_mxu(rec, basis, t, valid, st)
        om = 1.0 - a  # 1 for invalid lanes
        # Exclusive prefix product via log + triangular matmul + exp.
        tu = t_in * jnp.exp(_mm(jnp.log(om), lt_excl, ((1,), (0,))))  # (TT, C)
        m = tu >= eps  # include mask (matches the serial break exactly)
        mf = jnp.where(m, 1.0, 0.0)
        ta = tu * a
        w = ta * mf  # (TT, C)
        cd = rec[6:10, :]  # (4, C): RGB + depth
        acc4 = acc4 + _mm(cd, w, ((1,), (1,)))  # (4, TT)
        # T after the chunk = running product at the LAST included lane
        # = min over included lanes of tu-ta (products decrease monotonically);
        # Mosaic has no reduce_prod, but reduce_min works.
        has = jnp.max(mf, axis=1, keepdims=True)
        t_after = jnp.min(jnp.where(m, tu - ta, 1.0), axis=1, keepdims=True)
        t_in = jnp.where(has > 0.0, t_after, t_in)
        ncon = ncon + jnp.sum(
            mf * jnp.where(valid, 1.0, 0.0), axis=1, keepdims=True
        )
        alive = jnp.max(t_in) >= eps
        return ci + 1, t_in, acc4, ncon, alive

    init = (
        jnp.int32(0),
        jnp.ones((tt, 1), jnp.float32),
        jnp.zeros((4, tt), jnp.float32),
        jnp.zeros((tt, 1), jnp.float32),
        jnp.bool_(True),
    )
    final_ci, t_fin, acc4, ncon, _ = jax.lax.while_loop(cond, body, init)

    # Early exit may leave one prefetched chunk in flight: drain it so the
    # semaphore is clean for the next grid step.
    @pl.when(final_ci < nchunks)
    def _():
        _rec_copy(
            rec_hbm, rec_vmem, sem, off, final_ci, jax.lax.rem(final_ci, 2), C
        ).wait()

    alpha = (1.0 - t_fin).reshape(1, tt)
    out_ref[0] = jnp.concatenate([acc4, alpha, ncon.reshape(1, tt)], axis=0)


def _bwd_kernel(
    start_ref, count_ref, rec_hbm, cot_ref, grad_ref, rec_vmem, grad_vmem,
    sem, gsem, *, st: RasterStatic
):
    """cot_ref: (1, TT, 8) VMEM block for this tile, columns
    [cotR, cotG, cotB, cotDepth, cotAlpha, alpha_fwd, ncon_fwd, pad]."""
    C = st.chunk
    tt = st.tile_h * st.tile_w
    t = pl.program_id(0)
    start = start_ref[t]
    count = count_ref[t]
    basis = _tile_basis(st)  # (TT, 6)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    # Upper-inclusive-triangular ones: inclusive suffix sums via one matmul.
    li = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    ut_incl = jnp.where(li >= lj, 1.0, 0.0)
    nchunks = pl.cdiv(count, C)

    cot4 = cot_ref[0, :, 0:4]  # (TT, 4) color+depth cotangents
    cot_alpha = cot_ref[0, :, 4:5]  # (TT, 1)
    alpha_fwd = cot_ref[0, :, 5:6]
    ncon = cot_ref[0, :, 6:7]
    t_final = 1.0 - alpha_fwd
    cot_t_fin = -cot_alpha  # alpha = 1 - T_final; background applied outside
    tfin_term = cot_t_fin * t_final  # (TT, 1), constant over the march

    # Early-exit replay at CHUNK granularity: the forward's include set is a
    # per-pixel PREFIX of the tile's list (transmittance is non-increasing),
    # so every pair at position >= max(ncon) has zero gradient for every
    # pixel and identity state updates.  Only the first `live` chunks need
    # the reverse march; the dead tail is zero-FILLED (its grad slots must
    # still be written — the reduction reads the whole aligned buffer).
    max_ncon = jnp.max(ncon).astype(jnp.int32)
    live = jnp.minimum(nchunks, pl.cdiv(max_ncon, C))
    n_dead = nchunks - live

    @pl.when(n_dead > 0)
    def _():
        zero = jnp.zeros((REC_DIM, C), jnp.float32)
        grad_vmem[0] = zero
        grad_vmem[1] = zero

        def zbody(j, _):
            zslot = jax.lax.rem(j, 2)

            @pl.when(j >= 2)
            def _():
                _grad_copy(
                    grad_ref, grad_vmem, gsem, start, live + j - 2, zslot, C
                ).wait()

            _grad_copy(
                grad_ref, grad_vmem, gsem, start, live + j, zslot, C
            ).start()
            return 0

        jax.lax.fori_loop(0, n_dead, zbody, 0)

        @pl.when(n_dead >= 1)
        def _():
            _grad_copy(
                grad_ref, grad_vmem, gsem, start, nchunks - 1,
                jax.lax.rem(n_dead - 1, 2), C
            ).wait()

        @pl.when(n_dead >= 2)
        def _():
            _grad_copy(
                grad_ref, grad_vmem, gsem, start, nchunks - 2,
                jax.lax.rem(n_dead - 2, 2), C
            ).wait()

    @pl.when(live > 0)
    def _():
        _rec_copy(rec_hbm, rec_vmem, sem, start, live - 1, 0, C).start()

    def body(k, carry):
        t_end, acc = carry
        ci = live - 1 - k
        slot = jax.lax.rem(k, 2)
        _rec_copy(rec_hbm, rec_vmem, sem, start, ci, slot, C).wait()

        @pl.when(ci > 0)
        def _():
            _rec_copy(rec_hbm, rec_vmem, sem, start, ci - 1, 1 - slot, C).start()

        rec = rec_vmem[slot]
        valid = (lane_iota + ci * C) < count
        a, raw, rows = _chunk_alpha_mxu(rec, basis, t, valid, st)
        mx, my, c00, cs, c11, op = rows  # (1, C) each; mx/my tile-local
        # Include-mask replayed from the stored per-pixel contributor count —
        # exact forward early-exit replay (slang :766 uses lastContrib).
        m = (lane_iota + ci * C).astype(jnp.float32) < ncon  # (TT, C)
        mf = jnp.where(m, 1.0, 0.0)
        om_m = jnp.where(m, 1.0 - a, 1.0)
        # Masked suffix product sp_j = T_end / Tu_j is bounded below by
        # T_final >= eps*(1-alpha_clamp): the early exit freezes T once it
        # crosses eps, so the division cannot underflow/overflow.
        sp = jnp.exp(_mm(jnp.log(om_m), ut_incl, ((1,), (0,))))
        tu = t_end / sp
        w = tu * a * mf  # (TT, C)

        # u = cotangent contracted with this record's color/depth (MXU).
        cd = rec[6:10, :]  # (4, C)
        u = _mm(cot4, cd, ((1,), (0,)))  # (TT, C)
        wu = w * u
        suf_wu = _mm(wu, ut_incl, ((1,), (0,)))  # inclusive suffix sums
        acc_g = acc + (suf_wu - wu)  # strictly-later terms

        # (1 - a) >= 1 - alpha_clamp = 0.01; the floor mirrors the
        # reference's undoTileGlobalPixelState guard (slang :506-510).
        one_minus = jnp.maximum(1.0 - a, st.undo_denom_floor)
        dl_da = mf * (u * tu - (acc_g + tfin_term) / one_minus)
        # Alpha clamp at 0.99 has zero gradient above (slang :455).
        draw = jnp.where(raw <= st.alpha_clamp, dl_da, 0.0)
        de = draw * raw  # d wrt (e + ln op) through exp

        # All per-record pixel reductions in two MXU contractions.
        dcoef = _mm(basis, de, ((0,), (0,)))  # (6, C)
        d_cd = _mm(cot4, w, ((0,), (0,)))  # (4, C): d color RGB, d depth

        # Chain rule coef -> (mean2d, conic, opacity); (1, C) row math.
        dc0, dc1, dc2 = dcoef[0:1, :], dcoef[1:2, :], dcoef[2:3, :]
        dc3, dc4, dc5 = dcoef[3:4, :], dcoef[4:5, :], dcoef[5:6, :]
        d_mx = dc0 * (-0.5 * (2.0 * c00 * mx + cs * my)) + dc1 * c00 + dc2 * (0.5 * cs)
        d_my = dc0 * (-0.5 * (2.0 * c11 * my + cs * mx)) + dc2 * c11 + dc1 * (0.5 * cs)
        d_c00 = dc0 * (-0.5 * mx * mx) + dc1 * mx - 0.5 * dc3
        d_c11 = dc0 * (-0.5 * my * my) + dc2 * my - 0.5 * dc4
        d_cs = dc0 * (-0.5 * mx * my) + dc1 * (0.5 * my) + dc2 * (0.5 * mx) - 0.5 * dc5
        # d op through the +ln(op) fold: d ln(op) = dcoef0.
        d_op = jnp.where(op > 1e-37, dc0 / jnp.maximum(op, 1e-37), 0.0)

        # Double-buffered gradient write-back: wait for the write two steps
        # ago before overwriting its slot.
        @pl.when(k >= 2)
        def _():
            _grad_copy(grad_ref, grad_vmem, gsem, start, ci + 2, slot, C).wait()

        grad_vmem[slot] = jnp.concatenate(
            [d_mx, d_my, d_c00, d_cs, d_cs, d_c11, d_cd, d_op,
             jnp.zeros((REC_DIM - 11, C), jnp.float32)],
            axis=0,
        )
        _grad_copy(grad_ref, grad_vmem, gsem, start, ci, slot, C).start()

        t_end = t_end / sp[:, 0:1]  # = T at the start of this chunk
        acc = acc + suf_wu[:, 0:1]  # total wu of this chunk
        return t_end, acc

    jax.lax.fori_loop(
        0,
        live,
        body,
        (t_final, jnp.zeros((tt, 1), jnp.float32)),
    )

    # Drain the last (up to) two in-flight gradient writes.
    @pl.when(live >= 1)
    def _():
        _grad_copy(
            grad_ref, grad_vmem, gsem, start, 0, jax.lax.rem(live - 1, 2), C
        ).wait()

    @pl.when(live >= 2)
    def _():
        _grad_copy(
            grad_ref, grad_vmem, gsem, start, 1, jax.lax.rem(live - 2, 2), C
        ).wait()


def _bwd_kernel_sorted(
    start_ref, count_ref, rec_hbm, cot_ref, zeros_hbm, grad_ref,
    rec_vmem, grad_vmem, gr_vmem, sem, gsem, grsem, *, st: RasterStatic
):
    """Backward over SORTED-order records (tile starts NOT chunk-aligned).

    The aligned kernel (_bwd_kernel) owns whole chunks exclusively; here a
    128-lane window at a tile boundary is shared by two (or more, for tiny
    tiles) consecutive tiles.  Resolution: the gradient buffer is ZERO-
    INITIALIZED (input_output_aliases on a zeros array) and every window
    write is a read-modify-write — the TPU grid is sequential, and each grid
    step fully drains its write DMAs, so a later tile's read always sees the
    earlier tile's completed boundary write (the "boundary carry" of
    docs/DESIGN.md).  Non-owned lanes carry exact zeros through the add.
    Values match the aligned path up to fp regrouping of the per-chunk
    prefix products (chunk boundaries fall at different pair offsets); the
    include sets and contributor counts are exact.  Dead windows (past the
    early-exit replay) are simply never touched — the zero-init replaces
    the aligned kernel's explicit dead-tail zero-fill.
    Reference counterpart: the backward tile sweep reads the same packed list
    the forward used (slang/gaussian_tile_global_kernels.slang:728-753).
    """
    del zeros_hbm  # aliased to grad_ref: same buffer, already zero-filled
    C = st.chunk
    tt = st.tile_h * st.tile_w
    t = pl.program_id(0)
    start = start_ref[t]
    count = count_ref[t]
    off = (start // C) * C
    shift = start - off
    count_w = shift + count
    basis = _tile_basis(st)  # (TT, 6)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    li = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    ut_incl = jnp.where(li >= lj, 1.0, 0.0)

    cot4 = cot_ref[0, :, 0:4]
    cot_alpha = cot_ref[0, :, 4:5]
    alpha_fwd = cot_ref[0, :, 5:6]
    ncon = cot_ref[0, :, 6:7]
    t_final = 1.0 - alpha_fwd
    cot_t_fin = -cot_alpha
    tfin_term = cot_t_fin * t_final

    # Early-exit replay at window granularity: the last contributing pair
    # sits at lane shift + max(ncon) - 1 from the window floor.
    max_ncon = jnp.max(ncon).astype(jnp.int32)
    live = jnp.where(
        jnp.logical_and(count > 0, max_ncon > 0),
        pl.cdiv(shift + max_ncon, C),
        0,
    )

    def grad_read(ci, slot):
        cstart = pl.multiple_of(off + ci * C, C)
        return pltpu.make_async_copy(
            grad_ref.at[:, pl.ds(cstart, C)], gr_vmem.at[slot], grsem.at[slot]
        )

    @pl.when(live > 0)
    def _():
        _rec_copy(rec_hbm, rec_vmem, sem, off, live - 1, 0, C).start()
        grad_read(live - 1, 0).start()

    def body(k, carry):
        t_end, acc = carry
        ci = live - 1 - k
        slot = jax.lax.rem(k, 2)
        _rec_copy(rec_hbm, rec_vmem, sem, off, ci, slot, C).wait()

        @pl.when(ci > 0)
        def _():
            _rec_copy(rec_hbm, rec_vmem, sem, off, ci - 1, 1 - slot, C).start()
            grad_read(ci - 1, 1 - slot).start()

        rec = rec_vmem[slot]
        lane_g = lane_iota + ci * C
        valid = jnp.logical_and(lane_g >= shift, lane_g < count_w)
        a, raw, rows = _chunk_alpha_mxu(rec, basis, t, valid, st)
        mx, my, c00, cs, c11, op = rows
        # Include mask from the stored contributor count, in within-tile RANK
        # space (rank = lane - shift); head lanes of a shared window belong to
        # the PREVIOUS tile and must not see this tile's cotangents.
        rank = (lane_g - shift).astype(jnp.float32)
        m = jnp.logical_and(rank >= 0.0, rank < ncon)  # (TT, C)
        mf = jnp.where(m, 1.0, 0.0)
        om_m = jnp.where(m, 1.0 - a, 1.0)
        sp = jnp.exp(_mm(jnp.log(om_m), ut_incl, ((1,), (0,))))
        tu = t_end / sp
        w = tu * a * mf

        cd = rec[6:10, :]
        u = _mm(cot4, cd, ((1,), (0,)))
        wu = w * u
        suf_wu = _mm(wu, ut_incl, ((1,), (0,)))
        acc_g = acc + (suf_wu - wu)

        one_minus = jnp.maximum(1.0 - a, st.undo_denom_floor)
        dl_da = mf * (u * tu - (acc_g + tfin_term) / one_minus)
        draw = jnp.where(raw <= st.alpha_clamp, dl_da, 0.0)
        de = draw * raw

        dcoef = _mm(basis, de, ((0,), (0,)))
        d_cd = _mm(cot4, w, ((0,), (0,)))

        dc0, dc1, dc2 = dcoef[0:1, :], dcoef[1:2, :], dcoef[2:3, :]
        dc3, dc4, dc5 = dcoef[3:4, :], dcoef[4:5, :], dcoef[5:6, :]
        d_mx = dc0 * (-0.5 * (2.0 * c00 * mx + cs * my)) + dc1 * c00 + dc2 * (0.5 * cs)
        d_my = dc0 * (-0.5 * (2.0 * c11 * my + cs * mx)) + dc2 * c11 + dc1 * (0.5 * cs)
        d_c00 = dc0 * (-0.5 * mx * mx) + dc1 * mx - 0.5 * dc3
        d_c11 = dc0 * (-0.5 * my * my) + dc2 * my - 0.5 * dc4
        d_cs = dc0 * (-0.5 * mx * my) + dc1 * (0.5 * my) + dc2 * (0.5 * mx) - 0.5 * dc5
        d_op = jnp.where(op > 1e-37, dc0 / jnp.maximum(op, 1e-37), 0.0)

        @pl.when(k >= 2)
        def _():
            _grad_copy(grad_ref, grad_vmem, gsem, off, ci + 2, slot, C).wait()

        grad_read(ci, slot).wait()
        grad_vmem[slot] = gr_vmem[slot] + jnp.concatenate(
            [d_mx, d_my, d_c00, d_cs, d_cs, d_c11, d_cd, d_op,
             jnp.zeros((REC_DIM - 11, C), jnp.float32)],
            axis=0,
        )
        _grad_copy(grad_ref, grad_vmem, gsem, off, ci, slot, C).start()

        t_end = t_end / sp[:, 0:1]
        acc = acc + suf_wu[:, 0:1]
        return t_end, acc

    jax.lax.fori_loop(
        0, live, body, (t_final, jnp.zeros((tt, 1), jnp.float32))
    )

    # Drain the (up to) two in-flight gradient writes before the next grid
    # step may read-modify-write a shared boundary window.
    @pl.when(live >= 1)
    def _():
        _grad_copy(
            grad_ref, grad_vmem, gsem, off, 0, jax.lax.rem(live - 1, 2), C
        ).wait()

    @pl.when(live >= 2)
    def _():
        _grad_copy(
            grad_ref, grad_vmem, gsem, off, 1, jax.lax.rem(live - 2, 2), C
        ).wait()


def _zero_cot(x):
    return jnp.zeros(x.shape, dtype=jax.dtypes.float0)


def aligned_chunk_plan(tile_start, tile_count, num_tiles: int, C: int,
                       num_aligned: int):
    """Per-CHUNK relayout plan, shared by the split pipeline, the fused
    staging gather, AND the Pallas relayout kernel so they can never diverge.

    Every C-slot chunk has exactly one owning tile, so the owner table is
    computed per CHUNK (num_aligned/C entries) and broadcast — per-SLOT
    searchsorted/gathers over the [num_aligned] axis lower to while-loops
    that cost ~100x more than all the real work (measured).

    Returns (aligned_start [num_tiles], owner [nchunks], rank0 [nchunks]):
    chunk c copies the owner's sorted pairs starting at within-tile rank
    rank0[c] (>= 0; ranks past tile_count are padding)."""
    nchunks_per_tile = -(-tile_count // C)  # ceil
    aligned_sizes = nchunks_per_tile * C
    aligned_start = (jnp.cumsum(aligned_sizes) - aligned_sizes).astype(jnp.int32)
    nchunks_total = num_aligned // C
    chunk_first_slot = jnp.arange(nchunks_total, dtype=jnp.int32) * C
    # Owning tile: last tile whose aligned range starts at or before the
    # chunk (empty tiles share the next tile's start and own no chunks).
    owner = jnp.clip(
        jnp.searchsorted(aligned_start, chunk_first_slot, side="right").astype(
            jnp.int32
        )
        - 1,
        0,
        num_tiles - 1,
    )  # [nchunks_total]
    rank0 = chunk_first_slot - aligned_start[owner]
    return aligned_start, owner, rank0


def aligned_relayout(tile_start, tile_count, num_tiles: int, C: int,
                     num_aligned: int):
    """Per-SLOT relayout index math on top of aligned_chunk_plan.

    Returns (aligned_start [num_tiles], src [num_aligned], within
    [num_aligned]): tile t's pairs live at aligned columns
    [aligned_start[t], aligned_start[t] + tile_count[t]), sourced from
    sorted-pair positions `src` where `within` is True."""
    aligned_start, owner, rank0 = aligned_chunk_plan(
        tile_start, tile_count, num_tiles, C, num_aligned
    )
    lane = jnp.arange(C, dtype=jnp.int32)[None, :]
    rank = rank0[:, None] + lane
    within = (rank < tile_count[owner][:, None]).reshape(-1)
    src = jnp.where(
        within, (tile_start[owner][:, None] + rank).reshape(-1), 0
    )
    return aligned_start, src, within


def pick_seg_chunk(num_aligned: int, C: int) -> int:
    """DMA chunk width for the segment-sum reduction: 512-wide amortizes copy
    latency best (scripts/bwd_reduce_tune.py); falls back to any divisor of
    the aligned width, or 0 if none (caller uses the scatter path)."""
    return next((c for c in (512, 256, 128, C) if num_aligned % c == 0), 0)


# --- per-Gaussian gradient reduction (sort + MXU segment sum) ---------------
#
# The backward pass produces one 16-float gradient row per sorted pair
# ([16, P_aligned]); the per-Gaussian gradient is the sum of each Gaussian's
# rows.  The reference does this with float atomics (slang :849-877).  The
# obvious XLA translation — the autodiff transpose of the record gather, a
# scatter-add — serializes on TPU (~17 ns/row: 22.7 ms at the 1M-pair
# workload, ~23% of the whole train step; scripts/bwd_reduce_tune.py).
#
# TPU-first replacement: lax.sort IS fast on TPU (5.7 ms for 17 columns at
# 1.3M rows), so sort the rows by Gaussian id and reduce contiguous segments
# with an MXU one-hot contraction per Gaussian block:
#
#   1. gid = aligned_idx (invalid pairs -> sentinel, sorted to the tail and
#      never touched again)
#   2. one lax.sort carries the 11 live gradient rows as payloads
#   3. a Pallas kernel tiles Gaussians into blocks of B; block b's pairs are
#      the contiguous range [bounds[b], bounds[b+1]) of the sorted array
#      (searchsorted), and the segment sum inside the block is
#      onehot(C, B)^T-style contraction  acc(B,16) += onehot(B,C) . rows(16,C)
#      — exact, deterministic, no atomics, and the MXU does the reduction.
#
# Precision: one-hot entries are exactly representable in bf16 and f32
# splits are exact, so HIGHEST-precision passes reproduce the f32 sum.


class SegsumStatic(NamedTuple):
    num_rec: int  # N (rows of the gathered record table)
    num_aligned: int  # P (columns of the pair-gradient buffer)
    chunk: int  # pair chunk per DMA (must divide num_aligned)
    block_b: int  # Gaussians per grid block
    interpret: bool
    # Gradient rows carried through the gid sort.  The backward kernels
    # write d_cs to BOTH conic off-diagonal rows 3 and 4 (the reference VJP
    # splits the gradient across both slots), so raster callers drop row 4
    # from the sort payload and copy the reduced row 3 back afterwards —
    # one fewer sorted column at [num_aligned] scale.
    live_rows: tuple = tuple(range(11))


def _segsum_kernel(bounds_ref, gid_hbm, rows_hbm, out_ref, rows_vmem,
                   ids_vmem, sem, isem, *, st: SegsumStatic):
    B, C = st.block_b, st.chunk
    b = pl.program_id(0)
    pstart = bounds_ref[b]
    pend = bounds_ref[b + 1]
    c0 = (pstart // C) * C  # chunk-aligned sweep start
    nchunks = pl.cdiv(pend - c0, C)
    base = b * B

    def rows_copy(ci, slot):
        cstart = pl.multiple_of(c0 + ci * C, C)
        return pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds(cstart, C)], rows_vmem.at[slot], sem.at[slot]
        )

    def ids_copy(ci, slot):
        cstart = pl.multiple_of(c0 + ci * C, C)
        return pltpu.make_async_copy(
            gid_hbm.at[:, pl.ds(cstart, C)], ids_vmem.at[slot], isem.at[slot]
        )

    @pl.when(nchunks > 0)
    def _():
        rows_copy(0, 0).start()
        ids_copy(0, 0).start()

    iota_b = jax.lax.broadcasted_iota(jnp.int32, (B, C), 0)

    def body(ci, acc):
        slot = jax.lax.rem(ci, 2)
        rows_copy(ci, slot).wait()
        ids_copy(ci, slot).wait()

        @pl.when(ci + 1 < nchunks)
        def _():
            rows_copy(ci + 1, 1 - slot).start()
            ids_copy(ci + 1, 1 - slot).start()

        rows = rows_vmem[slot]  # (16, C)
        local = ids_vmem[slot] - base  # (1, C); out-of-block -> no match
        onehot = jnp.where(iota_b == local, 1.0, 0.0)  # (B, C)
        # NT contraction on the shared lane axis: (B, C) . (16, C) -> (B, 16).
        return acc + _mm(onehot, rows, ((1,), (1,)))

    acc = jax.lax.fori_loop(0, nchunks, body, jnp.zeros((B, 16), jnp.float32))
    out_ref[...] = acc


def _segsum_call(st: SegsumStatic, bounds, gid_s, rows_s):
    """The block segment-sum pallas_call on PRE-SORTED inputs — split out of
    _segment_reduce_pallas so the fine profiler can time the kernel apart
    from the gid sort."""
    B = st.block_b
    nblk = -(-st.num_rec // B)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((B, 16), lambda b, *_: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, REC_DIM, st.chunk), jnp.float32),
            pltpu.VMEM((2, 1, st.chunk), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_segsum_kernel, st=st),
        out_shape=jax.ShapeDtypeStruct((nblk * B, 16), jnp.float32),
        grid_spec=grid_spec,
        interpret=st.interpret,
    )(bounds, gid_s, rows_s)


def _segment_reduce_pallas(st: SegsumStatic, grad_cm, gid):
    """[16, P] pair-gradient rows + [P] Gaussian ids -> [N, 16] sums."""
    B = st.block_b
    nblk = -(-st.num_rec // B)
    sentinel = nblk * B
    gid = jnp.where(gid < st.num_rec, gid, sentinel)
    # One sort carries the live rows; invalid/padding pairs sort to the
    # tail beyond bounds[nblk] and are never swept.
    nlive = len(st.live_rows)
    cols = jax.lax.sort(
        (gid,) + tuple(grad_cm[i] for i in st.live_rows), num_keys=1
    )
    gid_s = cols[0].reshape(1, st.num_aligned)
    rows_s = jnp.concatenate(
        [
            jnp.stack(cols[1:], axis=0),
            jnp.zeros((REC_DIM - nlive, st.num_aligned), jnp.float32),
        ],
        axis=0,
    )
    bounds = jnp.searchsorted(
        cols[0], jnp.arange(nblk + 1, dtype=jnp.int32) * B, side="left"
    ).astype(jnp.int32)

    out = _segsum_call(st, bounds, gid_s, rows_s)[: st.num_rec]
    if st.live_rows != tuple(range(11)):
        # Swept column j holds the sum of grad row live_rows[j]; scatter the
        # columns back to their kernel-row positions (dropped rows -> 0).
        full = jnp.zeros((st.num_rec, REC_DIM), jnp.float32)
        for j, r in enumerate(st.live_rows):
            full = full.at[:, r].set(out[:, j])
        out = full
    return out


class GatherStatic(NamedTuple):
    num_rec: int
    num_aligned: int
    chunk: int
    block_b: int
    grad_reduce: str  # "segsum" | "scatter"
    interpret: bool


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_records(gst: GatherStatic, rec, aligned_idx, aligned_valid):
    out, _ = _gather_records_fwd(gst, rec, aligned_idx, aligned_valid)
    return out


def _gather_records_fwd(gst, rec, aligned_idx, aligned_valid):
    gathered = rec[aligned_idx]  # [P_aligned, 16]
    gathered = jnp.where(aligned_valid[:, None], gathered, 0.0)
    return gathered.T, (aligned_idx, aligned_valid)


def _gather_records_bwd(gst, residuals, g_cm):
    aligned_idx, aligned_valid = residuals
    if gst.grad_reduce == "segsum":
        gid = jnp.where(aligned_valid, aligned_idx, gst.num_rec).astype(jnp.int32)
        st = SegsumStatic(
            num_rec=gst.num_rec, num_aligned=gst.num_aligned,
            chunk=gst.chunk, block_b=gst.block_b, interpret=gst.interpret,
            live_rows=RASTER_LIVE_ROWS,
        )
        grad_rec = _segment_reduce_pallas(st, g_cm, gid)
        grad_rec = grad_rec.at[:, 4].set(grad_rec[:, 3])  # d_c10 = d_c01
    else:
        rows = jnp.where(aligned_valid[:, None], g_cm.T, 0.0)
        grad_rec = jnp.zeros((gst.num_rec, REC_DIM), jnp.float32).at[
            aligned_idx
        ].add(rows)
    return grad_rec, _zero_cot(aligned_idx), _zero_cot(aligned_valid)


_gather_records.defvjp(_gather_records_fwd, _gather_records_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _raster_core(st: RasterStatic, records_cm, aligned_start, tile_count):
    out, _ = _raster_fwd(st, records_cm, aligned_start, tile_count)
    return out


def _fwd_call(st: RasterStatic, records_cm, aligned_start, tile_count):
    num_tiles = st.grid_h * st.grid_w
    tt = st.tile_h * st.tile_w
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, OUT_CHANNELS, tt),
            lambda t, *_: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, REC_DIM, st.chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, st=st),
        out_shape=jax.ShapeDtypeStruct((num_tiles, OUT_CHANNELS, tt), jnp.float32),
        grid_spec=grid_spec,
        interpret=st.interpret,
    )(aligned_start, tile_count, records_cm)


def _raster_fwd(st: RasterStatic, records_cm, aligned_start, tile_count):
    out = _fwd_call(st, records_cm, aligned_start, tile_count)
    residuals = (records_cm, aligned_start, tile_count, out[:, 4:6])
    return out, residuals


def _raster_bwd(st: RasterStatic, residuals, cot_out):
    records_cm, aligned_start, tile_count, alpha_ncon = residuals
    num_tiles = st.grid_h * st.grid_w
    tt = st.tile_h * st.tile_w
    # Per-tile cotangent/residual block [T, TT, 8], columns
    # [cotR, cotG, cotB, cotD, cotAlpha, alpha_fwd, ncon_fwd, pad].
    cot_block = jnp.concatenate(
        [cot_out[:, 0:5], alpha_ncon, jnp.zeros((num_tiles, 1, tt), jnp.float32)],
        axis=1,
    ).transpose(0, 2, 1)
    if st.sorted_mode:
        # Sorted-order backward: zero-initialized gradient buffer (aliased
        # zeros input) + read-modify-write windows with boundary carry.
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((1, tt, 8), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((2, REC_DIM, st.chunk), jnp.float32),
                pltpu.VMEM((2, REC_DIM, st.chunk), jnp.float32),
                pltpu.VMEM((2, REC_DIM, st.chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        zeros = jnp.zeros((REC_DIM, st.num_aligned), jnp.float32)
        grad_records = pl.pallas_call(
            functools.partial(_bwd_kernel_sorted, st=st),
            out_shape=jax.ShapeDtypeStruct(
                (REC_DIM, st.num_aligned), jnp.float32
            ),
            grid_spec=grid_spec,
            interpret=st.interpret,
            # Operand indices count the scalar-prefetch args (Mosaic offsets
            # only dynamic grid bounds): (start, count, records, cot, zeros).
            input_output_aliases={4: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(aligned_start, tile_count, records_cm, cot_block, zeros)
        return grad_records, _zero_cot(aligned_start), _zero_cot(tile_count)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, tt, 8), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, REC_DIM, st.chunk), jnp.float32),
            pltpu.VMEM((2, REC_DIM, st.chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    grad_records = pl.pallas_call(
        functools.partial(_bwd_kernel, st=st),
        out_shape=jax.ShapeDtypeStruct((REC_DIM, st.num_aligned), jnp.float32),
        grid_spec=grid_spec,
        interpret=st.interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(aligned_start, tile_count, records_cm, cot_block)
    return grad_records, _zero_cot(aligned_start), _zero_cot(tile_count)


_raster_core.defvjp(_raster_fwd, _raster_bwd)


def rasterize_pallas(
    packed: jax.Array,
    sorted_gauss_idx: jax.Array,
    pair_valid: jax.Array,
    tile_start: jax.Array,
    tile_count: jax.Array,
    image_width: int,
    image_height: int,
    tile_w: int,
    tile_h: int,
    *,
    chunk_size: int = 128,
    alpha_clamp: float = 0.99,
    transmittance_eps: float = 1e-4,
    undo_denom_floor: float = 1e-6,
    grad_reduce: str = "segsum",
    interpret: bool = False,
) -> RenderOutputs:
    """Full rasterize: packed [N, 11] (reference layout) -> image outputs.

    The sorted pair list is re-laid out so every tile's range starts at a
    chunk-aligned column (static capacity max_pairs + num_tiles*chunk); the
    record gather stays in plain JAX so its autodiff transpose (deterministic
    XLA scatter-add) performs the per-Gaussian gradient reduction that the
    reference does with float atomics (slang :849-877).
    """
    grid_w = -(-image_width // tile_w)
    grid_h = -(-image_height // tile_h)
    num_tiles = grid_w * grid_h
    max_pairs = sorted_gauss_idx.shape[0]
    C = chunk_size
    if not interpret:
        # Mosaic HBM DMA slices must be 128-lane aligned in both offset and
        # extent; the aligned layout guarantees offsets are multiples of C.
        assert C % 128 == 0, "compiled rasterizer requires chunk_size % 128 == 0"
    num_aligned = max_pairs + num_tiles * C
    st = RasterStatic(
        chunk=C,
        tile_h=tile_h,
        tile_w=tile_w,
        grid_h=grid_h,
        grid_w=grid_w,
        num_aligned=num_aligned,
        alpha_clamp=alpha_clamp,
        transmittance_eps=transmittance_eps,
        undo_denom_floor=undo_denom_floor,
        interpret=interpret,
    )

    # --- chunk-aligned pair layout (gather-only: TPU scatters serialize) ----
    aligned_start, src, within = aligned_relayout(
        tile_start, tile_count, num_tiles, C, num_aligned
    )
    aligned_idx = jnp.where(within, sorted_gauss_idx[src], 0)
    aligned_valid = within

    # --- records in kernel layout ------------------------------------------
    # Reference layout [.., opacity, depth] -> kernel layout [.., depth, op].
    # Row gather (16-element slices per index) vectorizes well on TPU;
    # per-component scalar gathers lower to serial loops (measured ~10x
    # slower).  Select-form masking: its VJP selects too, so garbage in the
    # unwritten gradient tail cannot reach Gaussian 0 (0 * NaN would).
    perm = jnp.asarray([0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 9], dtype=jnp.int32)
    rec = packed[:, perm]
    rec = jnp.concatenate(
        [rec, jnp.zeros((rec.shape[0], REC_DIM - 11), rec.dtype)], axis=1
    )
    # The gather's gradient is the per-Gaussian reduction; its path is chosen
    # here (sort + MXU segment-sum kernel, or the XLA scatter-add fallback —
    # see _gather_records).  The segment-sum sweep requires chunk-aligned
    # total columns, which the aligned layout guarantees when max_pairs is a
    # chunk multiple.  Block/chunk sizes from the measured TPU sweep
    # (scripts/bwd_reduce_tune.py): total matmul work is
    # 2*16*(P*block_b + N*chunk), so a SMALL Gaussian block wins; 512-wide
    # DMA chunks amortize copy latency.
    seg_chunk = pick_seg_chunk(num_aligned, C)
    if seg_chunk == 0:
        grad_reduce = "scatter"
        seg_chunk = C
    gst = GatherStatic(
        num_rec=rec.shape[0], num_aligned=num_aligned, chunk=seg_chunk,
        block_b=128, grad_reduce=grad_reduce, interpret=interpret,
    )
    records_cm = _gather_records(gst, rec, aligned_idx, aligned_valid)

    out = _raster_core(st, records_cm, aligned_start, tile_count)  # [T, 6, TT]
    return _untile(out, st, image_width, image_height)


def _untile(out, st: RasterStatic, image_width: int, image_height: int):
    x = out.reshape(st.grid_h, st.grid_w, OUT_CHANNELS, st.tile_h, st.tile_w)
    x = x.transpose(2, 0, 3, 1, 4).reshape(
        OUT_CHANNELS, st.grid_h * st.tile_h, st.grid_w * st.tile_w
    )
    x = x[:, :image_height, :image_width]
    return RenderOutputs(
        color=x[0:3].transpose(1, 2, 0),
        depth=x[3],
        alpha=x[4],
        n_contrib=x[5].astype(jnp.int32),
    )


def rasterize_staged(
    records_cm: jax.Array,
    aligned_start: jax.Array,
    tile_count: jax.Array,
    image_width: int,
    image_height: int,
    tile_w: int,
    tile_h: int,
    *,
    chunk_size: int = 128,
    alpha_clamp: float = 0.99,
    transmittance_eps: float = 1e-4,
    undo_denom_floor: float = 1e-6,
    interpret: bool = False,
    sorted_mode: bool = False,
) -> RenderOutputs:
    """Rasterize a pre-staged record buffer (ops/staging.py): the fused
    staging path already produced kernel-layout records with its own
    custom-VJP gradient reduction, so this is just the raster core + untile.

    sorted_mode=True: records are in raw sorted order (aligned_start carries
    the UNALIGNED tile starts); the backward runs the boundary-carry kernel.
    """
    grid_w = -(-image_width // tile_w)
    grid_h = -(-image_height // tile_h)
    if not interpret:
        assert chunk_size % 128 == 0, (
            "compiled rasterizer requires chunk_size % 128 == 0"
        )
    st = RasterStatic(
        chunk=chunk_size,
        tile_h=tile_h,
        tile_w=tile_w,
        grid_h=grid_h,
        grid_w=grid_w,
        num_aligned=records_cm.shape[1],
        alpha_clamp=alpha_clamp,
        transmittance_eps=transmittance_eps,
        undo_denom_floor=undo_denom_floor,
        interpret=interpret,
        sorted_mode=sorted_mode,
    )
    out = _raster_core(st, records_cm, aligned_start, tile_count)
    return _untile(out, st, image_width, image_height)

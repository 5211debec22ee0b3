"""Pallas TPU tile rasterizer: forward + custom-VJP backward.

TPU-native re-design of the reference's per-pixel compositing kernels
(slang/gaussian_tile_global_kernels.slang:406-881).  Differences from the
GPU design, chosen for the TPU memory/compute model:

  * Grid = pixel tiles (default 32x32 = 1024 px, held as (C,1024)-shaped
    vectors).  Each grid program DMAs its depth-sorted Gaussian records from
    HBM in chunks of `chunk_size` and composites all 1024 pixels at once on
    the VPU/MXU, instead of 1 thread per pixel marching serially.
  * The serial front-to-back recurrence is evaluated with the vector identity
    (see ops/rasterize_ref.py): transmittance is a log-space prefix-scan over
    the chunk axis, the include-mask falls out of the unmasked scan, and
    color/depth accumulation becomes a (4,C)x(C,1024) MXU contraction.
  * Backward: the reference's reverse march + WaveActiveSum + InterlockedAdd
    float atomics (slang :728-877) is replaced by reverse suffix-scans plus
    per-pair gradient rows written to DISJOINT slices of a [P,12] buffer
    (each sorted pair belongs to exactly one tile) — deterministic, no
    atomics.  The pair-gradient buffer is scattered back to per-Gaussian
    grads by the autodiff transpose of the record gather (XLA scatter-add).
  * Early exit: a tile stops fetching chunks once every pixel's transmittance
    crossed 1e-4 (the reference's per-pixel break, slang :599-604).

Record layout in HBM ([P, 12] float32, P = max_pairs + chunk pad):
  0 mean_x, 1 mean_y, 2 c00, 3 c01, 4 c10, 5 c11,
  6 colR, 7 colG, 8 colB, 9 depth, 10 opacity, 11 unused/zero
(reference packs [N,11] with opacity before depth, GaussianRenderer.swift:45-51;
we swap so color+depth are contiguous for one MXU contraction.)

Tile-major output layout [num_tiles, 6, tile_pixels]:
  rows 0-2 accumulated RGB, 3 accumulated depth, 4 alpha (=1-T), 5 n_contrib.
Background compositing is applied OUTSIDE the kernel in plain JAX.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rasterize_ref import RenderOutputs

REC_DIM = 12
OUT_CHANNELS = 6


class RasterStatic(NamedTuple):
    """Hashable static configuration threaded through the custom_vjp."""

    chunk: int
    tile_h: int
    tile_w: int
    grid_h: int
    grid_w: int
    num_pairs: int  # padded record rows (max_pairs + chunk)
    alpha_clamp: float
    transmittance_eps: float
    interpret: bool


def _prefix_incl(x):
    """Inclusive prefix-sum along axis 0 via a log-step shift network
    (portable inside Pallas: static concat/slice shifts only)."""
    n = x.shape[0]
    shift = 1
    while shift < n:
        x = x + jnp.concatenate([jnp.zeros_like(x[:shift]), x[:-shift]], axis=0)
        shift *= 2
    return x


def _suffix_incl(x):
    """Inclusive suffix-sum along axis 0."""
    n = x.shape[0]
    shift = 1
    while shift < n:
        x = x + jnp.concatenate([x[shift:], jnp.zeros_like(x[:shift])], axis=0)
        shift *= 2
    return x


def _tile_pixel_coords(t, st: RasterStatic):
    """Global pixel coordinates for this tile as (1, TT) float rows."""
    tt = st.tile_h * st.tile_w
    tile_y = t // st.grid_w
    tile_x = t % st.grid_w
    i = jax.lax.broadcasted_iota(jnp.int32, (1, tt), 1)
    px = (tile_x * st.tile_w + i % st.tile_w).astype(jnp.float32)
    py = (tile_y * st.tile_h + i // st.tile_w).astype(jnp.float32)
    return px, py


def _chunk_alpha(rec, px, py, valid_rows, st: RasterStatic):
    """Per-(gaussian, pixel) alpha for one chunk.

    rec: (C, 12) VMEM records; px/py: (1, TT); valid_rows: (C, 1) bool.
    Returns (a, raw) with invalid rows zeroed (tileGlobalAlphaFromGaussian,
    slang :438-456)."""
    mx = rec[:, 0:1]
    my = rec[:, 1:2]
    c00 = rec[:, 2:3]
    cs = rec[:, 3:4] + rec[:, 4:5]  # c01 + c10 share the exponent term
    c11 = rec[:, 5:6]
    op = rec[:, 10:11]
    dx = px - mx  # (C, TT)
    dy = py - my
    e = -0.5 * (dx * dx * c00 + dy * dy * c11 + dx * dy * cs)
    raw = jnp.exp(e) * op
    a = jnp.minimum(raw, st.alpha_clamp)
    a = jnp.where(valid_rows, a, 0.0)
    return a, raw, dx, dy, c00, cs, c11


def _fwd_kernel(start_ref, count_ref, rec_hbm, out_ref, rec_vmem, sem, *, st: RasterStatic):
    C = st.chunk
    tt = st.tile_h * st.tile_w
    t = pl.program_id(0)
    start = start_ref[t]
    count = count_ref[t]
    px, py = _tile_pixel_coords(t, st)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
    ln_eps = math.log(st.transmittance_eps)
    nchunks = pl.cdiv(count, C)

    def cond(carry):
        ci, ln_t, _, _, alive = carry
        return jnp.logical_and(ci < nchunks, alive)

    def body(carry):
        ci, ln_t, acc4, ncon, _ = carry
        cstart = start + ci * C
        copy = pltpu.make_async_copy(rec_hbm.at[pl.ds(cstart, C), :], rec_vmem, sem)
        copy.start()
        copy.wait()
        rec = rec_vmem[:, :]
        valid = (row_iota + ci * C) < count
        a, _, _, _, _, _, _ = _chunk_alpha(rec, px, py, valid, st)
        ln1ma = jnp.log(1.0 - a)
        ln_tu = ln_t + (_prefix_incl(ln1ma) - ln1ma)  # exclusive prefix
        tu = jnp.exp(ln_tu)
        m = ln_tu >= ln_eps  # include mask (valid rows only matter: a=0 else)
        mf = jnp.where(m, 1.0, 0.0)
        w = tu * a * mf
        cd = rec[:, 6:10]  # (C, 4): RGB + depth
        acc4 = acc4 + jax.lax.dot_general(
            cd, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        ln_t = ln_t + jnp.sum(mf * ln1ma, axis=0, keepdims=True)
        ncon = ncon + jnp.sum(
            jnp.where(jnp.logical_and(m, valid), 1.0, 0.0), axis=0, keepdims=True
        )
        alive = jnp.max(ln_t) >= ln_eps
        return ci + 1, ln_t, acc4, ncon, alive

    init = (
        jnp.int32(0),
        jnp.zeros((1, tt), jnp.float32),
        jnp.zeros((4, tt), jnp.float32),
        jnp.zeros((1, tt), jnp.float32),
        jnp.bool_(True),
    )
    _, ln_t, acc4, ncon, _ = jax.lax.while_loop(cond, body, init)
    alpha = 1.0 - jnp.exp(ln_t)
    out_ref[0] = jnp.concatenate([acc4, alpha, ncon], axis=0)


def _bwd_kernel_impl(
    start_ref, count_ref, rec_hbm, cot_ref, grad_ref, rec_vmem, grad_vmem,
    sem, gsem, *, st: RasterStatic
):
    """cot_ref: (1, 8, TT) VMEM block for this tile with rows
    [cotR, cotG, cotB, cotDepth, cotAlpha, alpha_fwd, ncon_fwd, pad]."""
    C = st.chunk
    tt = st.tile_h * st.tile_w
    t = pl.program_id(0)
    start = start_ref[t]
    count = count_ref[t]
    px, py = _tile_pixel_coords(t, st)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
    nchunks = pl.cdiv(count, C)

    cot4 = cot_ref[0, 0:4]  # (4, TT) color+depth cotangents
    cot_alpha = cot_ref[0, 4:5]  # (1, TT)
    alpha_fwd = cot_ref[0, 5:6]
    ncon = cot_ref[0, 6:7]
    t_final = 1.0 - alpha_fwd  # bounded below by eps*(1-alpha_clamp) > 0
    cot_t_fin = -cot_alpha  # d alpha = -d T_final; background applied outside
    tfin_term = cot_t_fin * t_final  # (1, TT), constant over the march

    def body(k, carry):
        ln_t_end, acc = carry
        ci = nchunks - 1 - k
        cstart = start + ci * C
        copy = pltpu.make_async_copy(rec_hbm.at[pl.ds(cstart, C), :], rec_vmem, sem)
        copy.start()
        copy.wait()
        rec = rec_vmem[:, :]
        valid = (row_iota + ci * C) < count
        a, raw, dx, dy, c00, cs, c11 = _chunk_alpha(rec, px, py, valid, st)
        # Include-mask from the stored per-pixel contributor count — exact
        # replay of the forward early exit (slang :766 uses lastContrib).
        m = (row_iota + ci * C).astype(jnp.float32) < ncon  # (C, TT)
        mf = jnp.where(m, 1.0, 0.0)
        ln1ma_m = mf * jnp.log(1.0 - a)
        suf = _suffix_incl(ln1ma_m)  # (C, TT) inclusive suffix
        ln_tu = ln_t_end - suf
        tu = jnp.exp(ln_tu)
        am = a * mf
        w = tu * am

        # u = per-pixel cotangent contracted with this record's color/depth.
        cd = rec[:, 6:10]  # (C, 4)
        u = jax.lax.dot_general(
            cd, cot4, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (C, TT)
        wu = w * u
        acc_g = acc + (_suffix_incl(wu) - wu)  # strictly-later terms

        # (1 - a) >= 1 - alpha_clamp = 0.01; the 1e-6 floor mirrors the
        # reference's undoTileGlobalPixelState guard (slang :506-510).
        one_minus = jnp.maximum(1.0 - a, 1e-6)
        dl_da = mf * (u * tu - (acc_g + tfin_term) / one_minus)
        draw = jnp.where(raw <= st.alpha_clamp, dl_da, 0.0)
        de = draw * raw  # d wrt the exponent e (through exp)

        # Per-record reductions over pixels.
        d_mx = jnp.sum(de * (dx * c00 + 0.5 * dy * cs), axis=1, keepdims=True)
        d_my = jnp.sum(de * (dy * c11 + 0.5 * dx * cs), axis=1, keepdims=True)
        d_c00 = jnp.sum(de * (-0.5 * dx * dx), axis=1, keepdims=True)
        d_cs = jnp.sum(de * (-0.5 * dx * dy), axis=1, keepdims=True)
        d_c11 = jnp.sum(de * (-0.5 * dy * dy), axis=1, keepdims=True)
        op = rec[:, 10:11]
        d_op = jnp.sum(draw * raw, axis=1, keepdims=True) / jnp.where(
            op > 0.0, op, 1.0
        )
        d_cd = jax.lax.dot_general(
            w, cot4, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (C, 4): d color RGB + d depth

        grad_vmem[:, :] = jnp.concatenate(
            [d_mx, d_my, d_c00, d_cs, d_cs, d_c11, d_cd, d_op,
             jnp.zeros((C, 1), jnp.float32)],
            axis=1,
        )
        out_copy = pltpu.make_async_copy(
            grad_vmem, grad_ref.at[pl.ds(cstart, C), :], gsem
        )
        out_copy.start()
        out_copy.wait()

        ln_t_end = ln_t_end - jnp.sum(ln1ma_m, axis=0, keepdims=True)
        acc = acc + jnp.sum(wu, axis=0, keepdims=True)
        return ln_t_end, acc

    ln_t_final = jnp.log(t_final)
    jax.lax.fori_loop(
        0,
        nchunks,
        body,
        (ln_t_final, jnp.zeros((1, tt), jnp.float32)),
    )


def _zero_cot(x):
    return jnp.zeros(x.shape, dtype=jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _raster_core(st: RasterStatic, records, tile_start, tile_count):
    out, _ = _raster_fwd(st, records, tile_start, tile_count)
    return out


def _fwd_call(st: RasterStatic, records, tile_start, tile_count):
    num_tiles = st.grid_h * st.grid_w
    tt = st.tile_h * st.tile_w
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, OUT_CHANNELS, tt),
            lambda t, *_: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((st.chunk, REC_DIM), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, st=st),
        out_shape=jax.ShapeDtypeStruct((num_tiles, OUT_CHANNELS, tt), jnp.float32),
        grid_spec=grid_spec,
        interpret=st.interpret,
    )(tile_start, tile_count, records)


def _raster_fwd(st: RasterStatic, records, tile_start, tile_count):
    out = _fwd_call(st, records, tile_start, tile_count)
    residuals = (records, tile_start, tile_count, out[:, 4:6])
    return out, residuals


def _raster_bwd(st: RasterStatic, residuals, cot_out):
    records, tile_start, tile_count, alpha_ncon = residuals
    num_tiles = st.grid_h * st.grid_w
    tt = st.tile_h * st.tile_w
    # Assemble the 8-row per-tile cotangent/residual block:
    # [cotR, cotG, cotB, cotD, cotAlpha, alpha_fwd, ncon_fwd, pad]
    cot_block = jnp.concatenate(
        [
            cot_out[:, 0:4],
            cot_out[:, 4:5],
            alpha_ncon,
            jnp.zeros((num_tiles, 1, tt), jnp.float32),
        ],
        axis=1,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, 8, tt), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((st.chunk, REC_DIM), jnp.float32),
            pltpu.VMEM((st.chunk, REC_DIM), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    grad_records = pl.pallas_call(
        functools.partial(_bwd_kernel_impl, st=st),
        out_shape=jax.ShapeDtypeStruct((st.num_pairs, REC_DIM), jnp.float32),
        grid_spec=grid_spec,
        interpret=st.interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_start, tile_count, records, cot_block)
    return grad_records, _zero_cot(tile_start), _zero_cot(tile_count)


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
    interpret: bool = False,
) -> RenderOutputs:
    """Full rasterize: packed [N, 11] (reference layout) -> image outputs.

    The record gather is plain JAX, so its autodiff transpose (deterministic
    XLA scatter-add) performs the per-Gaussian gradient reduction that the
    reference does with float atomics (slang :849-877).
    """
    grid_w = -(-image_width // tile_w)
    grid_h = -(-image_height // tile_h)
    max_pairs = sorted_gauss_idx.shape[0]
    st = RasterStatic(
        chunk=chunk_size,
        tile_h=tile_h,
        tile_w=tile_w,
        grid_h=grid_h,
        grid_w=grid_w,
        num_pairs=max_pairs + chunk_size,
        alpha_clamp=alpha_clamp,
        transmittance_eps=transmittance_eps,
        interpret=interpret,
    )

    # Reference layout [.., opacity, depth] -> kernel layout [.., depth, op].
    perm = jnp.asarray([0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 9], dtype=jnp.int32)
    rec = packed[:, perm]
    rec = jnp.concatenate([rec, jnp.zeros((rec.shape[0], 1), rec.dtype)], axis=1)
    records = rec[sorted_gauss_idx]  # [P, 12]
    # Zero the records of invalid (sentinel) pairs so the gather transpose
    # cannot pick up garbage cotangents from the unwritten gradient tail.
    records = jnp.where(pair_valid[:, None], records, 0.0)
    records = jnp.concatenate(
        [records, jnp.zeros((chunk_size, REC_DIM), records.dtype)], axis=0
    )

    out = _raster_core(st, records, tile_start, tile_count)  # [T, 6, tt]

    # Un-tile to images.
    tt = tile_h * tile_w
    x = out.reshape(grid_h, grid_w, OUT_CHANNELS, tile_h, tile_w)
    x = x.transpose(2, 0, 3, 1, 4).reshape(
        OUT_CHANNELS, grid_h * tile_h, grid_w * tile_w
    )
    x = x[:, :image_height, :image_width]
    return RenderOutputs(
        color=x[0:3].transpose(1, 2, 0),
        depth=x[3],
        alpha=x[4],
        n_contrib=x[5].astype(jnp.int32),
    )

"""Static-shape tile binning: (gaussian, tile) pair expansion + depth sort.

Replaces the reference's five-kernel dynamic pipeline
(count_tiles_per_gaussian / generate_keys / radix_sort / compute_tile_ranges /
build_packed_tile_indices, slang/gaussian_tile_global_kernels.slang:8-404)
whose two `.item()` host syncs (GaussianRenderer.swift:398-409,462) are
impossible under `jax.jit`.  The TPU design:

  1. Per-Gaussian tile footprint from the screen rect — identical tile index
     math to count_tiles_per_gaussian (floor(min/tile) .. floor(max/tile)+1,
     clamped to the grid).
  2. Dense [N, R] candidate expansion (R = max_tiles_per_gaussian static cap)
     with invalid slots keyed to a sentinel tile.
  3. One stable lexicographic `lax.sort` on (tile_id, depth) with the Gaussian
     index as payload, truncated to the static `max_pairs` budget — sorting
     replaces the reference's hand-written single-threadgroup radix sort.
     XLA's TPU sort runs at ~10 Gelem/s while TPU scatters serialize, so the
     pipeline is deliberately sort/gather-only (no scatter compaction).
  4. Per-tile (start, count) ranges via searchsorted — the analogue of
     compute_tile_ranges.

Overflow (footprint > R, or total pairs > max_pairs) is counted and reported
instead of reallocating; capacities are config knobs.  Everything here is
integer/stop-grad — gradients never flow through binning, matching the
reference's stopGradient tile-slice builder (GaussianRenderer.swift:333-490).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TileBinning(NamedTuple):
    sorted_gauss_idx: jax.Array  # [max_pairs] gaussian id per pair (pad: 0)
    sorted_tile_id: jax.Array  # [max_pairs] tile id per pair (pad: num_tiles)
    tile_start: jax.Array  # [num_tiles] first pair index per tile
    tile_count: jax.Array  # [num_tiles] pairs per tile
    num_pairs: jax.Array  # [] total valid pairs (<= max_pairs)
    overflow_gaussians: jax.Array  # [] gaussians whose footprint was truncated
    overflow_pairs: jax.Array  # [] pairs dropped by the max_pairs budget
    pair_valid: jax.Array  # [max_pairs] bool


def _tile_bounds(rect_min, rect_max, tile_w, tile_h, grid_w, grid_h):
    """Tile index bounds, exactly as count_tiles_per_gaussian
    (tile_global_kernels.slang:44-55)."""
    tmin_x = jnp.floor(rect_min[:, 0] / tile_w).astype(jnp.int32)
    tmin_y = jnp.floor(rect_min[:, 1] / tile_h).astype(jnp.int32)
    tmax_x = jnp.floor(rect_max[:, 0] / tile_w).astype(jnp.int32) + 1
    tmax_y = jnp.floor(rect_max[:, 1] / tile_h).astype(jnp.int32) + 1
    tmin_x = jnp.clip(tmin_x, 0, grid_w)
    tmin_y = jnp.clip(tmin_y, 0, grid_h)
    tmax_x = jnp.clip(tmax_x, 0, grid_w)
    tmax_y = jnp.clip(tmax_y, 0, grid_h)
    return tmin_x, tmin_y, tmax_x, tmax_y


def bin_gaussians(
    rect_min: jax.Array,
    rect_max: jax.Array,
    radii: jax.Array,
    depths: jax.Array,
    image_width: int,
    image_height: int,
    tile_w: int,
    tile_h: int,
    max_tiles_per_gaussian: int,
    max_pairs: int,
) -> TileBinning:
    n = rect_min.shape[0]
    grid_w = -(-image_width // tile_w)
    grid_h = -(-image_height // tile_h)
    num_tiles = grid_w * grid_h
    R = max_tiles_per_gaussian

    rect_min = jax.lax.stop_gradient(rect_min)
    rect_max = jax.lax.stop_gradient(rect_max)
    radii = jax.lax.stop_gradient(radii)
    depths = jax.lax.stop_gradient(depths)

    tmin_x, tmin_y, tmax_x, tmax_y = _tile_bounds(
        rect_min, rect_max, float(tile_w), float(tile_h), grid_w, grid_h
    )
    active = radii > 0.0
    rw = jnp.where(active, tmax_x - tmin_x, 0)
    rh = jnp.where(active, tmax_y - tmin_y, 0)
    footprint = rw * rh  # true tile count per gaussian
    count = jnp.minimum(footprint, R)  # truncated to the static cap
    overflow_gaussians = jnp.sum((footprint > R).astype(jnp.int32))
    total = jnp.sum(count)
    num_pairs = jnp.minimum(total, max_pairs)
    overflow_pairs = jnp.maximum(total - max_pairs, 0)

    # Dense [N, R] candidates; invalid slots keyed to the sentinel tile so the
    # sort pushes them past every real pair.
    r_iota = jnp.arange(R, dtype=jnp.int32)[None, :]  # [1, R]
    safe_rw = jnp.maximum(rw, 1)[:, None]
    ty = tmin_y[:, None] + r_iota // safe_rw
    tx = tmin_x[:, None] + r_iota % safe_rw
    valid = r_iota < count[:, None]
    tile_ids = jnp.where(valid, ty * grid_w + tx, num_tiles)
    depth_keys = jnp.where(valid, depths[:, None], jnp.inf)
    gauss_ids = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, R)
    )

    # Stable lexicographic sort on (tile, depth); stability preserves gaussian
    # index order on depth ties like the reference's LSD radix sort.  The
    # row-major [N, R] flattening enumerates candidates in gaussian order, so
    # stability semantics match the reference's generate_keys emission order.
    sorted_tile, _, sorted_idx = jax.lax.sort(
        (
            tile_ids.reshape(-1),
            depth_keys.reshape(-1),
            gauss_ids.reshape(-1),
        ),
        num_keys=2,
        is_stable=True,
    )
    if n * R >= max_pairs:
        sorted_tile = sorted_tile[:max_pairs]
        sorted_idx = sorted_idx[:max_pairs]
    else:
        pad = max_pairs - n * R
        sorted_tile = jnp.concatenate(
            [sorted_tile, jnp.full((pad,), num_tiles, jnp.int32)]
        )
        sorted_idx = jnp.concatenate([sorted_idx, jnp.zeros((pad,), jnp.int32)])

    tile_iota = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(sorted_tile, tile_iota, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(sorted_tile, tile_iota, side="right").astype(jnp.int32)
    tile_count = tile_end - tile_start

    pair_valid = sorted_tile < num_tiles

    return TileBinning(
        sorted_gauss_idx=sorted_idx,
        sorted_tile_id=sorted_tile,
        tile_start=tile_start,
        tile_count=tile_count,
        num_pairs=num_pairs,
        overflow_gaussians=overflow_gaussians,
        overflow_pairs=overflow_pairs,
        pair_valid=pair_valid,
    )

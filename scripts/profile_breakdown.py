"""Stage-by-stage timing of the train step on real TPU: projection, binning
(expand/sort/ranges), record gather, rasterizer fwd, rasterizer bwd."""

import argparse
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def timeit(fn, *args, iters=10):
    import jax
    import numpy as _np

    def sync(r):
        # Device-to-host fetch: on tunneled backends block_until_ready can
        # return before execution finishes; a fetch of the last result waits
        # for everything queued before it.  Slice to ONE element ON DEVICE
        # first — np.asarray(leaf) would ship the whole array through the
        # tunnel (a ~120 MB records buffer inflated staging timings ~10x).
        leaf = jax.tree.leaves(r)[0]
        _np.asarray(leaf.ravel()[0:1])

    r = fn(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    sync(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=400)
    ap.add_argument("--gaussians", type=int, default=50000)
    ap.add_argument("--tile", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--max-pairs", type=int, default=2**20)
    ap.add_argument("--fine", action="store_true",
                    help="also time each fused-staging sub-stage (expand, "
                         "merge+gather, sort, tile ranges, relayout, "
                         "gradient segment-sum) on precomputed inputs")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gaussiansplattingmlx_tpu.config import RasterizerConfig
    from gaussiansplattingmlx_tpu.models import gaussians
    from gaussiansplattingmlx_tpu.ops import binning as binning_mod
    from gaussiansplattingmlx_tpu.ops import losses as losses_mod
    from gaussiansplattingmlx_tpu.ops import projection, rasterize_pallas, rasterize_ref
    from gaussiansplattingmlx_tpu.render import render
    from gaussiansplattingmlx_tpu.utils.camera import Camera

    W = H = args.size
    N = args.gaussians
    cfg = RasterizerConfig(
        tile_h=args.tile, tile_w=args.tile, chunk_size=args.chunk,
        max_pairs=args.max_pairs,
    )
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(N, 3)).astype(np.float32) * 0.6
    cols = rng.uniform(0.05, 0.95, size=(N, 3)).astype(np.float32)
    params, _ = gaussians.create_from_points(pts, cols, sh_degree=3, capacity=N)
    c2w = np.eye(4)
    c2w[2, 3] = -4.0
    cam = Camera.from_c2w(W, H, 1.4 * W, 1.4 * W, c2w)
    t = cam.tensors()
    cam_args = (
        jnp.asarray(t["view"]), jnp.asarray(t["proj"]),
        jnp.asarray(t["camera_center"]),
        t["fov_x"], t["fov_y"], t["focal_x"], t["focal_y"],
    )
    target = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
    zeros_hw = jnp.zeros((H, W), jnp.float32)

    means, shs, opacity, scales, rots = gaussians.activations(params)

    @jax.jit
    def stage_project(means, scales, rots, shs):
        return projection.project_gaussians(
            means, scales, rots, shs, *cam_args, W, H, 3
        )

    p = jax.tree.map(lambda x: x, stage_project(means, scales, rots, shs))

    @jax.jit
    def stage_bin(p):
        return binning_mod.bin_gaussians(
            p.rect_min, p.rect_max, p.radii, p.depths, W, H,
            cfg.tile_w, cfg.tile_h, cfg.max_pairs,
        )

    b = stage_bin(p)
    packed = rasterize_ref.pack_gaussians(p.means2d, p.conic, p.colors, opacity, p.depths)

    @jax.jit
    def stage_core_inputs(packed, b):
        # The REAL input-prep path: chunk-level owner table + row gather,
        # exactly as rasterize_pallas builds it (per-SLOT owner computation
        # lowers to serial searchsorted loops ~100x slower — measured; keep
        # this calling the module code so the profile can't drift from it).
        from gaussiansplattingmlx_tpu.ops.rasterize_pallas import (
            GatherStatic, REC_DIM, _gather_records,
        )
        grid_w = -(-W // cfg.tile_w)
        grid_h = -(-H // cfg.tile_h)
        num_tiles = grid_w * grid_h
        Cc = cfg.chunk_size
        num_aligned = args.max_pairs + num_tiles * Cc
        nchunks = -(-b.tile_count // Cc)
        sizes = nchunks * Cc
        astart = (jnp.cumsum(sizes) - sizes).astype(jnp.int32)
        nchunks_total = num_aligned // Cc
        chunk_first = jnp.arange(nchunks_total, dtype=jnp.int32) * Cc
        owner_c = jnp.clip(
            jnp.searchsorted(astart, chunk_first, side="right").astype(jnp.int32) - 1,
            0, num_tiles - 1,
        )
        slot = jnp.arange(num_aligned, dtype=jnp.int32).reshape(nchunks_total, Cc)
        rank = slot - astart[owner_c][:, None]
        within = rank < b.tile_count[owner_c][:, None]
        src = jnp.where(within, b.tile_start[owner_c][:, None] + rank, 0).reshape(-1)
        within = within.reshape(-1)
        aligned_idx = jnp.where(within, b.sorted_gauss_idx[src], 0)
        perm = jnp.asarray([0,1,2,3,4,5,6,7,8,10,9], dtype=jnp.int32)
        rec = packed[:, perm]
        rec = jnp.concatenate([rec, jnp.zeros((rec.shape[0], REC_DIM-11), rec.dtype)], axis=1)
        gst = GatherStatic(
            num_rec=rec.shape[0], num_aligned=num_aligned, chunk=Cc,
            block_b=128, grad_reduce="segsum", interpret=False,
        )
        return _gather_records(gst, rec, aligned_idx, within), astart

    records_cm, astart_real = stage_core_inputs(packed, b)

    def stage_core(records_cm, astart, counts):
        from gaussiansplattingmlx_tpu.ops.rasterize_pallas import RasterStatic, _raster_core
        grid_w = -(-W // cfg.tile_w); grid_h = -(-H // cfg.tile_h)
        st2 = RasterStatic(chunk=cfg.chunk_size, tile_h=cfg.tile_h, tile_w=cfg.tile_w,
            grid_h=grid_h, grid_w=grid_w,
            num_aligned=records_cm.shape[1], alpha_clamp=0.99,
            transmittance_eps=1e-4, undo_denom_floor=1e-6, interpret=False)
        return _raster_core(st2, records_cm, astart, counts)

    stage_core_jit = jax.jit(stage_core)

    @jax.jit
    def stage_raster_fwd(packed, b):
        return rasterize_pallas.rasterize_pallas(
            packed, b.sorted_gauss_idx, b.pair_valid, b.tile_start, b.tile_count,
            W, H, cfg.tile_w, cfg.tile_h, chunk_size=cfg.chunk_size,
        )

    @jax.jit
    def stage_raster_both(packed, b):
        def f(pk):
            out = rasterize_pallas.rasterize_pallas(
                pk, b.sorted_gauss_idx, b.pair_valid, b.tile_start, b.tile_count,
                W, H, cfg.tile_w, cfg.tile_h, chunk_size=cfg.chunk_size,
            )
            return jnp.sum((out.color - target) ** 2) + jnp.sum(out.alpha)

        return jax.value_and_grad(f)(packed)

    @jax.jit
    def full_fwd(means, shs, opacity, scales, rots):
        out, _ = render(
            means, shs, opacity, scales, rots, *cam_args, W, H, 3, raster_cfg=cfg
        )
        loss, _ = losses_mod.total_loss(out.color, target, out.depth, zeros_hw, zeros_hw)
        return loss

    @jax.jit
    def full_both(ptuple):
        def f(pt):
            pp = gaussians.GaussianParams.from_tuple(pt)
            m, s, o, sc, r = gaussians.activations(pp)
            out, _ = render(m, s, o, sc, r, *cam_args, W, H, 3, raster_cfg=cfg)
            loss, _ = losses_mod.total_loss(out.color, target, out.depth, zeros_hw, zeros_hw)
            return loss

        return jax.value_and_grad(f)(ptuple)

    # --- fused staging stages (ops/staging.py, the default pallas path) -----
    from gaussiansplattingmlx_tpu.ops import staging as staging_mod

    sst = staging_mod.StagingStatic(
        image_width=W, image_height=H, tile_w=cfg.tile_w, tile_h=cfg.tile_h,
        max_pairs=cfg.max_pairs, chunk=cfg.chunk_size, num_rec=packed.shape[0],
        grad_reduce="segsum", interpret=False,
    )

    @jax.jit
    def stage_fused(packed, p):
        return staging_mod.stage_pairs(
            sst, packed, p.rect_min, p.rect_max, p.radii, p.depths
        )

    @jax.jit
    def stage_sorted(packed, p):
        return staging_mod.stage_pairs_sorted(
            sst, packed, p.rect_min, p.rect_max, p.radii, p.depths
        )

    @jax.jit
    def full_fwd_split(means, shs, opacity, scales, rots):
        import dataclasses as _dc

        out, _ = render(
            means, shs, opacity, scales, rots, *cam_args, W, H, 3,
            raster_cfg=_dc.replace(cfg, staging="split"),
        )
        loss, _ = losses_mod.total_loss(out.color, target, out.depth, zeros_hw, zeros_hw)
        return loss

    @jax.jit
    def full_inference(means, shs, opacity, scales, rots):
        out, _ = render(
            means, shs, opacity, scales, rots, *cam_args, W, H, 3,
            raster_cfg=cfg, inference=True,
        )
        return out.color

    print(f"workload {W}x{H}, {N} gaussians, tile {args.tile}, chunk {args.chunk}, "
          f"max_pairs {args.max_pairs}, pairs={int(b.num_pairs)}")
    print(f"projection        {timeit(stage_project, means, scales, rots, shs):8.2f} ms", flush=True)
    print(f"binning (split)   {timeit(stage_bin, p):8.2f} ms", flush=True)
    print(f"core inputs(split){timeit(stage_core_inputs, packed, b):8.2f} ms", flush=True)
    print(f"staging (fused)   {timeit(stage_fused, packed, p):8.2f} ms", flush=True)
    print(f"staging (sorted)  {timeit(stage_sorted, packed, p):8.2f} ms", flush=True)
    print(f"core kernel       {timeit(stage_core_jit, records_cm, astart_real, b.tile_count):8.2f} ms", flush=True)
    print(f"raster fwd        {timeit(stage_raster_fwd, packed, b):8.2f} ms", flush=True)
    print(f"raster fwd+bwd    {timeit(stage_raster_both, packed, b):8.2f} ms", flush=True)
    print(f"full fwd (fused)  {timeit(full_fwd, means, shs, opacity, scales, rots):8.2f} ms", flush=True)
    print(f"full fwd (split)  {timeit(full_fwd_split, means, shs, opacity, scales, rots):8.2f} ms", flush=True)
    print(f"full inference    {timeit(full_inference, means, shs, opacity, scales, rots):8.2f} ms", flush=True)
    print(f"full fwd+bwd      {timeit(full_both, params.as_tuple()):8.2f} ms")

    if args.fine:
        fine_staging(sst, packed, p, args)


def fine_staging(sst, packed, p, args):
    """Time each fused-staging sub-stage on precomputed device inputs —
    the line items behind the `staging (fused)` total, so the free-chip
    tuning window can attack the biggest one directly."""
    import jax
    import jax.numpy as jnp

    from gaussiansplattingmlx_tpu.ops import binning as binning_mod
    from gaussiansplattingmlx_tpu.ops import merge_pallas
    from gaussiansplattingmlx_tpu.ops import rasterize_pallas as rp
    from gaussiansplattingmlx_tpu.ops import staging as staging_mod

    st = sst
    rect_min, rect_max, radii, depths = p.rect_min, p.rect_max, p.radii, p.depths
    grid_w = -(-st.image_width // st.tile_w)
    grid_h = -(-st.image_height // st.tile_h)
    num_tiles = grid_w * grid_h

    @jax.jit
    def f_expand(rect_min, rect_max, radii, depths):
        return binning_mod.expand_pairs(
            rect_min, rect_max, radii, depths,
            st.image_width, st.image_height, st.tile_w, st.tile_h,
            st.max_pairs, need_rank=False,
        )

    e = f_expand(rect_min, rect_max, radii, depths)
    keep = e.keep_idx
    rec_kernel = packed[:, list(staging_mod._PERM)].astype(jnp.float32)
    n = packed.shape[0]
    tbl = jnp.concatenate(
        [
            jnp.stack([
                e.tmin_x[keep].astype(jnp.float32),
                e.tmin_y[keep].astype(jnp.float32),
                e.rw[keep].astype(jnp.float32),
                e.block_start[keep].astype(jnp.float32),
                depths.astype(jnp.float32)[keep],
                keep.astype(jnp.float32),
            ], axis=0),
            rec_kernel[keep].T,
            jnp.zeros((merge_pallas.TBL_ROWS - 17, n), jnp.float32),
        ],
        axis=0,
    )

    @jax.jit
    def f_merge(cum, tbl):
        return merge_pallas.merge_gather(cum, tbl, st.max_pairs)

    g = f_merge(e.cum_keep, tbl)
    pp = jnp.arange(st.max_pairs, dtype=jnp.int32)
    valid = pp < e.num_pairs
    tiles = binning_mod.enumerate_tiles(
        g[3].astype(jnp.int32), jnp.maximum(g[2].astype(jnp.int32), 1),
        g[0].astype(jnp.int32), g[1].astype(jnp.int32), grid_w,
    )
    tile_ids = jnp.where(valid, tiles, num_tiles)
    depth_keys = jnp.where(valid, g[4], jnp.inf)
    gid = jnp.where(valid, g[5].astype(jnp.int32), 0)

    @jax.jit
    def f_enumerate(g, num_pairs):
        v = pp < num_pairs
        t = binning_mod.enumerate_tiles(
            g[3].astype(jnp.int32), jnp.maximum(g[2].astype(jnp.int32), 1),
            g[0].astype(jnp.int32), g[1].astype(jnp.int32), grid_w,
        )
        return (jnp.where(v, t, num_tiles), jnp.where(v, g[4], jnp.inf),
                jnp.where(v, g[5].astype(jnp.int32), 0))

    @jax.jit
    def f_sort(tile_ids, depth_keys, g, gid):
        return jax.lax.sort(
            (tile_ids, depth_keys) + tuple(g[6 + i] for i in range(11)) + (gid,),
            num_keys=2, is_stable=True,
        )

    sorted_cols = f_sort(tile_ids, depth_keys, g, gid)

    @jax.jit
    def f_ranges(sorted_tile):
        ti = jnp.arange(num_tiles, dtype=jnp.int32)
        s = jnp.searchsorted(sorted_tile, ti, side="left").astype(jnp.int32)
        t = jnp.searchsorted(sorted_tile, ti, side="right").astype(jnp.int32)
        return s, t - s

    tile_start, tile_count = f_ranges(sorted_cols[0])
    num_aligned = staging_mod._num_aligned(st)

    @jax.jit
    def f_relayout(sorted_cols, tile_start, tile_count):
        aligned_start, owner, rank0 = rp.aligned_chunk_plan(
            tile_start, tile_count, num_tiles, st.chunk, num_aligned
        )
        sorted_cm = jnp.stack(
            list(sorted_cols[2:13])
            + [jax.lax.bitcast_convert_type(sorted_cols[13], jnp.float32)]
            + [jnp.zeros((st.max_pairs,), jnp.float32)] * (rp.REC_DIM - 12),
            axis=0,
        )
        return staging_mod._relayout_pallas(
            st, sorted_cm, tile_start, tile_count, owner, rank0
        )

    records_cm = f_relayout(sorted_cols, tile_start, tile_count)
    # Timing stand-in: padding rows attribute to gaussian 0 — irrelevant for
    # the segsum kernel's cost (same rows, same reduction structure).
    gid_aligned = jax.lax.bitcast_convert_type(
        records_cm[11], jnp.int32
    ).astype(jnp.int32)

    seg_chunk = rp.pick_seg_chunk(num_aligned, st.chunk)

    @jax.jit
    def f_segsum(g_cm, gid_aligned):
        sstt = rp.SegsumStatic(
            num_rec=n, num_aligned=num_aligned,
            chunk=seg_chunk, block_b=128, interpret=False,
        )
        return rp._segment_reduce_pallas(sstt, g_cm, gid_aligned)

    cot = records_cm * 1e-3  # stand-in cotangent buffer, same shape

    # Segsum split: the gid sort vs the MXU block-reduce kernel.
    live = rp.RASTER_LIVE_ROWS

    @jax.jit
    def f_gidsort(g_cm, gid_a):
        sent = (-(-n // 128)) * 128
        gs = jnp.where(gid_a < n, gid_a, sent)
        return jax.lax.sort(
            (gs,) + tuple(g_cm[i] for i in live), num_keys=1
        )

    gid_sorted_cols = f_gidsort(cot, gid_aligned)

    @jax.jit
    def f_segkernel(cols):
        sstt = rp.SegsumStatic(
            num_rec=n, num_aligned=num_aligned,
            chunk=seg_chunk, block_b=128, interpret=False,
        )
        gid_s = cols[0].reshape(1, num_aligned)
        rows_s = jnp.concatenate(
            [jnp.stack(cols[1:], axis=0),
             jnp.zeros((rp.REC_DIM - len(live), num_aligned), jnp.float32)],
            axis=0,
        )
        nblk = -(-n // 128)
        bounds = jnp.searchsorted(
            cols[0], jnp.arange(nblk + 1, dtype=jnp.int32) * 128, side="left"
        ).astype(jnp.int32)
        return rp._segsum_call(sstt, bounds, gid_s, rows_s)

    # Gather-records A/B pieces (GSPLAT_STAGE_RECORDS=gather): lean 8-row
    # merge, 3-column sort, post-sort record gather from the [N,11] table.
    tbl_lean = jnp.concatenate(
        [tbl[:6], jnp.zeros((2, n), jnp.float32)], axis=0
    )

    @jax.jit
    def f_merge_lean(cum, tbl8):
        return merge_pallas.merge_gather(cum, tbl8, st.max_pairs)

    @jax.jit
    def f_sort3(tile_ids, depth_keys, gid):
        return jax.lax.sort(
            (tile_ids, depth_keys, gid), num_keys=2, is_stable=True
        )

    s3 = f_sort3(tile_ids, depth_keys, gid)

    @jax.jit
    def f_recgather(s_gid, num_pairs):
        v = pp < num_pairs
        return jnp.where(v[:, None], rec_kernel[s_gid], 0.0)

    print("--- fused staging fine breakdown ---", flush=True)
    print(f"expand_pairs      {timeit(f_expand, rect_min, rect_max, radii, depths):8.2f} ms", flush=True)
    print(f"table build+merge {timeit(f_merge, e.cum_keep, tbl):8.2f} ms", flush=True)
    print(f"enumerate tiles   {timeit(f_enumerate, g, e.num_pairs):8.2f} ms", flush=True)
    print(f"pair sort (14col) {timeit(f_sort, tile_ids, depth_keys, g, gid):8.2f} ms", flush=True)
    print(f"tile ranges       {timeit(f_ranges, sorted_cols[0]):8.2f} ms", flush=True)
    print(f"relayout kernel   {timeit(f_relayout, sorted_cols, tile_start, tile_count):8.2f} ms", flush=True)
    print(f"grad segment-sum  {timeit(f_segsum, cot, gid_aligned):8.2f} ms", flush=True)
    print(f"  segsum gid sort {timeit(f_gidsort, cot, gid_aligned):8.2f} ms", flush=True)
    print(f"  segsum kernel   {timeit(f_segkernel, gid_sorted_cols):8.2f} ms", flush=True)
    print("--- gather-records A/B pieces ---", flush=True)
    print(f"merge lean (8row) {timeit(f_merge_lean, e.cum_keep, tbl_lean):8.2f} ms", flush=True)
    print(f"pair sort (3col)  {timeit(f_sort3, tile_ids, depth_keys, gid):8.2f} ms", flush=True)
    print(f"record gather     {timeit(f_recgather, s3[2], e.num_pairs):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()

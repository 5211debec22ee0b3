"""Fused staging (ops/staging.py) vs the split pipeline: bit-exact parity.

The fused path must reproduce the split path's chunk-aligned record buffer
bit-for-bit (same keys, same stable sort, same emission order) and its
gradients must match the split path's gather-transpose reduction exactly.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from gaussiansplattingmlx_tpu.config import RasterizerConfig
from gaussiansplattingmlx_tpu.models import gaussians
from gaussiansplattingmlx_tpu.ops import binning, rasterize_ref, staging
from gaussiansplattingmlx_tpu.ops import rasterize_pallas as rp
from gaussiansplattingmlx_tpu.render import render
from gaussiansplattingmlx_tpu.utils.camera import Camera

W, H = 48, 48
TILE = 16
CHUNK = 32
MAX_PAIRS = 4096


def scene(n=80, seed=3):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    cols = rng.uniform(0.1, 0.9, size=(n, 3)).astype(np.float32)
    params, _ = gaussians.create_from_points(pts, cols, sh_degree=0, capacity=n)
    params = dataclasses.replace(
        params,
        scales=jnp.asarray(
            np.log(rng.uniform(0.05, 0.25, size=(n, 3))).astype(np.float32)
        ),
        opacity=jnp.asarray(rng.normal(0.5, 1.0, size=(n, 1)).astype(np.float32)),
    )
    c2w = np.eye(4)
    c2w[2, 3] = -4.0
    cam = Camera.from_c2w(W, H, 60.0, 60.0, c2w)
    return params, cam


def _split_records(packed, rect_min, rect_max, radii, depths):
    """The split pipeline's aligned record buffer (bin_gaussians + the
    relayout from rasterize_pallas), replicated as the parity oracle."""
    b = binning.bin_gaussians(
        rect_min, rect_max, radii, depths, W, H, TILE, TILE, MAX_PAIRS
    )
    grid_w = -(-W // TILE)
    grid_h = -(-H // TILE)
    num_tiles = grid_w * grid_h
    C = CHUNK
    num_aligned = MAX_PAIRS + num_tiles * C
    nchunks_per_tile = -(-b.tile_count // C)
    sizes = nchunks_per_tile * C
    aligned_start = (jnp.cumsum(sizes) - sizes).astype(jnp.int32)
    nchunks_total = num_aligned // C
    first = jnp.arange(nchunks_total, dtype=jnp.int32) * C
    owner = jnp.clip(
        jnp.searchsorted(aligned_start, first, side="right").astype(jnp.int32) - 1,
        0, num_tiles - 1,
    )
    slot = jnp.arange(num_aligned, dtype=jnp.int32).reshape(nchunks_total, C)
    rank = slot - aligned_start[owner][:, None]
    within = (rank < b.tile_count[owner][:, None]).reshape(-1)
    src = jnp.where(within, (b.tile_start[owner][:, None] + rank).reshape(-1), 0)
    aligned_idx = jnp.where(within, b.sorted_gauss_idx[src], 0)
    perm = jnp.asarray([0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 9], jnp.int32)
    rec = packed[:, perm]
    rec = jnp.concatenate(
        [rec, jnp.zeros((rec.shape[0], rp.REC_DIM - 11), rec.dtype)], axis=1
    )
    gathered = jnp.where(within[:, None], rec[aligned_idx], 0.0)
    return gathered.T, aligned_start, b, aligned_idx, within


def _staged(packed, rect_min, rect_max, radii, depths):
    st = staging.StagingStatic(
        image_width=W, image_height=H, tile_w=TILE, tile_h=TILE,
        max_pairs=MAX_PAIRS, chunk=CHUNK, num_rec=packed.shape[0],
        grad_reduce="scatter", interpret=True,
    )
    return st, staging.stage_pairs(
        st, packed, rect_min, rect_max, radii, depths
    )


def _geometry(params, cam):
    from gaussiansplattingmlx_tpu.ops import projection

    means, shs, opacity, scales, rots = gaussians.activations(params)
    t = cam.tensors()
    p = projection.project_gaussians(
        means, scales, rots, shs,
        jnp.asarray(t["view"]), jnp.asarray(t["proj"]),
        jnp.asarray(t["camera_center"]),
        t["fov_x"], t["fov_y"], t["focal_x"], t["focal_y"],
        W, H, 0,
    )
    packed = rasterize_ref.pack_gaussians(
        p.means2d, p.conic, p.colors, opacity, p.depths
    )
    return p, packed


def test_staged_records_bit_exact():
    params, cam = scene()
    p, packed = _geometry(params, cam)
    split_cm, split_start, b, _, _ = _split_records(
        packed, p.rect_min, p.rect_max, p.radii, p.depths
    )
    _, staged = _staged(packed, p.rect_min, p.rect_max, p.radii, p.depths)
    # Record components (rows 0-10) bit-identical; row 11 carries gid bits in
    # the fused layout (the kernels never read it), rows 12-15 zero in both.
    np.testing.assert_array_equal(
        np.asarray(split_cm[:11]), np.asarray(staged.records_cm[:11])
    )
    np.testing.assert_array_equal(
        np.asarray(staged.records_cm[12:]), 0.0
    )
    np.testing.assert_array_equal(
        np.asarray(split_start), np.asarray(staged.aligned_start)
    )
    np.testing.assert_array_equal(
        np.asarray(b.tile_count), np.asarray(staged.tile_count)
    )
    assert int(staged.num_pairs) == int(b.num_pairs) > 0
    assert int(staged.overflow_pairs) == int(b.overflow_pairs)


def test_staged_gid_matches_split_aligned_idx():
    params, cam = scene(seed=5)
    p, packed = _geometry(params, cam)
    _, _, _, aligned_idx, within = _split_records(
        packed, p.rect_min, p.rect_max, p.radii, p.depths
    )
    st, staged = _staged(packed, p.rect_min, p.rect_max, p.radii, p.depths)
    _, gid = staging._stage_impl(
        st, packed, p.rect_min, p.rect_max, p.radii, p.depths
    )
    want = np.where(np.asarray(within), np.asarray(aligned_idx), packed.shape[0])
    np.testing.assert_array_equal(np.asarray(gid), want)


def test_fused_render_matches_split_bitwise():
    """Full render through the interpret-mode pallas kernels: fused staging
    == split staging, values AND gradients."""
    params, cam = scene(seed=7)
    t = cam.tensors()
    target = jnp.asarray(
        np.random.default_rng(0).uniform(size=(H, W, 3)).astype(np.float32)
    )

    def loss_for(staging_mode):
        # train_staging pinned to "aligned": fused-vs-split is bit-exact on
        # the aligned layout; the sorted training path regroups per-chunk fp
        # (covered by test_train_sorted_matches_aligned).
        cfg = RasterizerConfig(
            tile_h=TILE, tile_w=TILE, max_pairs=MAX_PAIRS, chunk_size=CHUNK,
            staging=staging_mode, train_staging="aligned",
        )

        def f(ptuple):
            pp = gaussians.GaussianParams.from_tuple(ptuple)
            means, shs, opacity, scales, rots = gaussians.activations(pp)
            out, aux = render(
                means, shs, opacity, scales, rots,
                jnp.asarray(t["view"]), jnp.asarray(t["proj"]),
                jnp.asarray(t["camera_center"]),
                t["fov_x"], t["fov_y"], t["focal_x"], t["focal_y"],
                W, H, 0, raster_cfg=cfg, backend="pallas_interpret",
            )
            return jnp.sum((out.color - target) ** 2) + jnp.sum(out.depth), (
                out, aux)

        (loss, (out, aux)), grads = jax.value_and_grad(f, has_aux=True)(
            params.as_tuple()
        )
        return loss, out, aux, grads

    l1, o1, a1, g1 = loss_for("fused")
    l2, o2, a2, g2 = loss_for("split")
    np.testing.assert_array_equal(np.asarray(o1.color), np.asarray(o2.color))
    np.testing.assert_array_equal(np.asarray(o1.depth), np.asarray(o2.depth))
    np.testing.assert_array_equal(
        np.asarray(o1.n_contrib), np.asarray(o2.n_contrib)
    )
    assert float(l1) == float(l2)
    assert int(a1.num_pairs) == int(a2.num_pairs) > 0
    for x, y in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_fused_render_overflow_budget():
    """Fused staging under a biting pair budget: overflow counters match the
    split path and the kept prefix renders identically."""
    params, cam = scene(seed=11)
    p, packed = _geometry(params, cam)
    b = binning.bin_gaussians(
        p.rect_min, p.rect_max, p.radii, p.depths, W, H, TILE, TILE, 64
    )
    st = staging.StagingStatic(
        image_width=W, image_height=H, tile_w=TILE, tile_h=TILE,
        max_pairs=64, chunk=CHUNK, num_rec=packed.shape[0],
        grad_reduce="scatter", interpret=True,
    )
    staged = staging.stage_pairs(
        st, packed, p.rect_min, p.rect_max, p.radii, p.depths
    )
    assert int(staged.overflow_pairs) == int(b.overflow_pairs) > 0
    assert int(staged.num_pairs) == int(b.num_pairs) == 64
    np.testing.assert_array_equal(
        np.asarray(staged.tile_count), np.asarray(b.tile_count)
    )


def test_inference_render_matches_training_forward():
    """render(inference=True) — sorted-order records, no aligned relayout,
    unaligned tile starts masked in-kernel — must match the training forward.

    Tolerance: the chunk boundaries fall at different pair offsets, so the
    per-chunk exp/log prefix-product groupings differ — pure fp regrouping,
    a few ULPs (measured max 2.4e-7).  The include mask and contributor
    counts are exact (asserted bitwise)."""
    params, cam = scene(seed=13)
    t = cam.tensors()
    means, shs, opacity, scales, rots = gaussians.activations(params)
    cfg = RasterizerConfig(
        tile_h=TILE, tile_w=TILE, max_pairs=MAX_PAIRS, chunk_size=CHUNK,
    )

    def run(inference):
        out, aux = render(
            means, shs, opacity, scales, rots,
            jnp.asarray(t["view"]), jnp.asarray(t["proj"]),
            jnp.asarray(t["camera_center"]),
            t["fov_x"], t["fov_y"], t["focal_x"], t["focal_y"],
            W, H, 0, raster_cfg=cfg, backend="pallas_interpret",
            inference=inference,
        )
        return out, aux

    o1, a1 = run(inference=True)
    o2, a2 = run(inference=False)
    assert int(a1.num_pairs) == int(a2.num_pairs) > 0
    np.testing.assert_allclose(
        np.asarray(o1.color), np.asarray(o2.color), atol=2e-6, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(o1.depth), np.asarray(o2.depth), atol=2e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(o1.alpha), np.asarray(o2.alpha), atol=2e-6, rtol=1e-5
    )
    # The include set itself is exact: identical contributor counts.
    np.testing.assert_array_equal(
        np.asarray(o1.n_contrib), np.asarray(o2.n_contrib)
    )


def test_inference_unaligned_starts_exercised():
    """The inference path's tile starts must actually be chunk-UNALIGNED in
    the parity scene above (otherwise the head-mask logic is untested)."""
    params, cam = scene(seed=13)
    p, packed = _geometry(params, cam)
    st = staging.StagingStatic(
        image_width=W, image_height=H, tile_w=TILE, tile_h=TILE,
        max_pairs=MAX_PAIRS, chunk=CHUNK, num_rec=packed.shape[0],
        grad_reduce="scatter", interpret=True,
    )
    sp = staging.stage_pairs_sorted(
        st, packed, p.rect_min, p.rect_max, p.radii, p.depths
    )
    starts = np.asarray(sp.tile_start)
    counts = np.asarray(sp.tile_count)
    assert ((starts[counts > 0] % CHUNK) != 0).any()


def test_bwd_dead_chunk_skip_heavy_occlusion():
    """Early-exit replay at chunk granularity: with near-opaque stacked
    gaussians the forward terminates after a few contributors, so most
    backward chunks are DEAD (zero gradient) — they must be zero-filled and
    skipped without corrupting the gradients of the live prefix."""
    n = 96  # 3 chunks of 32 in one tile; only the first few contribute
    rng = np.random.default_rng(17)
    means2d = np.full((n, 2), 8.0, np.float32)
    conic = np.zeros((n, 4), np.float32)
    conic[:, 0] = conic[:, 3] = 0.01  # wide AND strong over the whole tile
    colors = rng.uniform(0.1, 0.9, size=(n, 3)).astype(np.float32)
    opacity = np.full((n, 1), 0.98, np.float32)
    depths = np.arange(1, n + 1, dtype=np.float32)
    radii = np.full((n,), 8.0, np.float32)
    rect_min = np.zeros((n, 2), np.float32)
    rect_max = np.full((n, 2), 15.0, np.float32)

    packed = rasterize_ref.pack_gaussians(
        jnp.asarray(means2d), jnp.asarray(conic), jnp.asarray(colors),
        jnp.asarray(opacity), jnp.asarray(depths),
    )
    b = binning.bin_gaussians(
        jnp.asarray(rect_min), jnp.asarray(rect_max), jnp.asarray(radii),
        jnp.asarray(depths), 16, 16, 16, 16, 128,
    )
    assert int(b.num_pairs) == n
    target = jnp.asarray(rng.uniform(size=(16, 16, 3)).astype(np.float32))

    def loss_pallas(p):
        out = rp.rasterize_pallas(
            p, b.sorted_gauss_idx, b.pair_valid, b.tile_start, b.tile_count,
            16, 16, 16, 16, chunk_size=32, interpret=True,
            grad_reduce="scatter",
        )
        return jnp.sum((out.color - target) ** 2) + jnp.sum(out.alpha)

    def loss_ref(p):
        out = rasterize_ref.rasterize_reference(
            p, b.sorted_gauss_idx, b.sorted_tile_id, 16, 16, 16, 16
        )
        return jnp.sum((out.color - target) ** 2) + jnp.sum(out.alpha)

    out = rp.rasterize_pallas(
        packed, b.sorted_gauss_idx, b.pair_valid, b.tile_start, b.tile_count,
        16, 16, 16, 16, chunk_size=32, interpret=True,
    )
    ncon_max = int(np.asarray(out.n_contrib).max())
    assert ncon_max < 32, f"early exit did not bite (ncon {ncon_max})"

    g = jax.grad(loss_pallas)(packed)
    g_ref = jax.grad(loss_ref)(packed)
    # Near-saturated compositing conditions the VJP; kernel-vs-oracle fp
    # noise here is ~5e-5 relative (different but equivalent formulations).
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), rtol=1e-3, atol=1e-4
    )
    # The dead gaussians (never contributing to any pixel) get EXACT zeros.
    dead = np.asarray(g)[ncon_max + 8:]
    np.testing.assert_array_equal(dead, 0.0)


def test_relayout_kernel_matches_gather_fallback(monkeypatch):
    """The Pallas blocked-copy relayout == the per-slot row-gather fallback
    bit-for-bit (records, gid sentinel layout, aligned starts)."""
    params, cam = scene(seed=11)
    p, packed = _geometry(params, cam)
    st, staged_k = _staged(packed, p.rect_min, p.rect_max, p.radii, p.depths)
    assert staging._use_relayout_kernel(st)
    _, gid_k = staging._stage_impl(
        st, packed, p.rect_min, p.rect_max, p.radii, p.depths
    )
    monkeypatch.setenv("GSPLAT_RELAYOUT", "gather")
    assert not staging._use_relayout_kernel(st)
    staged_g, gid_g = staging._stage_impl(
        st, packed, p.rect_min, p.rect_max, p.radii, p.depths
    )
    np.testing.assert_array_equal(
        np.asarray(staged_k.records_cm), np.asarray(staged_g.records_cm)
    )
    np.testing.assert_array_equal(np.asarray(gid_k), np.asarray(gid_g))
    np.testing.assert_array_equal(
        np.asarray(staged_k.aligned_start), np.asarray(staged_g.aligned_start)
    )


def test_fused_render_tile32_matches_split():
    """The fused staging pipeline is parametric in tile size: at the 32x32
    A/B setting (GSPLAT_BENCH_TILE=32) fused and split renders must still
    agree bit-for-bit, and the oracle must agree in value."""
    params, cam = scene(n=60, seed=9)
    means, shs, opacity, scales, rots = gaussians.activations(params)
    t = cam.tensors()

    def run(backend, staging_mode):
        cfg = RasterizerConfig(
            tile_h=32, tile_w=32, max_pairs=2048, chunk_size=32,
            staging=staging_mode, train_staging="aligned",
        )
        out, aux = render(
            means, shs, opacity, scales, rots,
            jnp.asarray(t["view"]), jnp.asarray(t["proj"]),
            jnp.asarray(t["camera_center"]),
            t["fov_x"], t["fov_y"], t["focal_x"], t["focal_y"],
            W, H, 0, raster_cfg=cfg, backend=backend,
        )
        assert int(aux.overflow_pairs) == 0
        return np.asarray(out.color)

    fused = run("pallas_interpret", "fused")
    split = run("pallas_interpret", "split")
    np.testing.assert_array_equal(fused, split)
    oracle = run("reference", "split")
    np.testing.assert_allclose(fused, oracle, rtol=1e-4, atol=1e-5)


def test_relayout_segmented_matches_single_call(monkeypatch):
    """Above _RELAYOUT_SEG_CHUNKS the relayout is issued as several
    pallas_calls over chunk segments (the per-chunk plan rides SMEM, which
    overflows at very large pair budgets — observed as a permanent compile
    error at a 16.8M-pair budget on v5e).  Segmented output must be
    bit-identical to the single-call path."""
    params, cam = scene(seed=11)
    p, packed = _geometry(params, cam)
    st, staged_one = _staged(packed, p.rect_min, p.rect_max, p.radii, p.depths)
    assert staging._use_relayout_kernel(st)
    nchunks = staging._num_aligned(st) // st.chunk
    monkeypatch.setattr(staging, "_RELAYOUT_SEG_CHUNKS", max(nchunks // 3, 1))
    staged_seg, gid_seg = staging._stage_impl(
        st, packed, p.rect_min, p.rect_max, p.radii, p.depths
    )
    np.testing.assert_array_equal(
        np.asarray(staged_one.records_cm), np.asarray(staged_seg.records_cm)
    )


def test_train_sorted_matches_aligned():
    """Training over SORTED-order records (stage_pairs_train + boundary-carry
    backward) vs the aligned-relayout path: same include sets (n_contrib
    bitwise), values and gradients equal up to fp regrouping of the
    per-chunk prefix products (the same ULP-level effect the inference fast
    path exhibits), and exact zero gradients for untouched gaussians."""
    params, cam = scene(seed=7)
    t = cam.tensors()
    target = jnp.asarray(
        np.random.default_rng(0).uniform(size=(H, W, 3)).astype(np.float32)
    )

    def loss_for(train_staging):
        cfg = RasterizerConfig(
            tile_h=TILE, tile_w=TILE, max_pairs=MAX_PAIRS, chunk_size=CHUNK,
            train_staging=train_staging,
        )

        def f(ptuple):
            pp = gaussians.GaussianParams.from_tuple(ptuple)
            means, shs, opacity, scales, rots = gaussians.activations(pp)
            out, aux = render(
                means, shs, opacity, scales, rots,
                jnp.asarray(t["view"]), jnp.asarray(t["proj"]),
                jnp.asarray(t["camera_center"]),
                t["fov_x"], t["fov_y"], t["focal_x"], t["focal_y"],
                W, H, 0, raster_cfg=cfg, backend="pallas_interpret",
            )
            return jnp.sum((out.color - target) ** 2) + jnp.sum(out.depth), (
                out, aux)

        (loss, (out, aux)), grads = jax.value_and_grad(f, has_aux=True)(
            params.as_tuple()
        )
        return loss, out, aux, grads

    l1, o1, a1, g1 = loss_for("sorted")
    l2, o2, a2, g2 = loss_for("aligned")
    assert int(a1.num_pairs) == int(a2.num_pairs) > 0
    np.testing.assert_array_equal(
        np.asarray(o1.n_contrib), np.asarray(o2.n_contrib)
    )
    np.testing.assert_allclose(
        np.asarray(o1.color), np.asarray(o2.color), atol=2e-6, rtol=1e-5
    )
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for x, y in zip(g1, g2):
        x, y = np.asarray(x), np.asarray(y)
        if x.size == 0:
            continue
        scale = np.maximum(np.abs(y).max(), 1e-30)
        np.testing.assert_allclose(x / scale, y / scale, atol=3e-5)
        # Exact-zero structure must be preserved (a gaussian with no
        # contributing pair gets exactly zero gradient on both paths).
        np.testing.assert_array_equal(x == 0.0, y == 0.0)


def test_train_sorted_tiny_tiles_share_windows():
    """Several tiles inside one 128-lane window: the boundary-carry RMW must
    accumulate every tile's rows (window shared by >2 tiles)."""
    params, cam = scene(n=6, seed=23)
    import dataclasses as dc
    params = dc.replace(
        params,
        scales=jnp.full((6, 3), np.log(0.35), jnp.float32),
        opacity=jnp.full((6, 1), 1.5, jnp.float32),
    )
    t = cam.tensors()
    target = jnp.asarray(
        np.random.default_rng(1).uniform(size=(H, W, 3)).astype(np.float32)
    )

    def loss_for(train_staging):
        cfg = RasterizerConfig(
            tile_h=TILE, tile_w=TILE, max_pairs=256, chunk_size=CHUNK,
            train_staging=train_staging,
        )

        def f(ptuple):
            pp = gaussians.GaussianParams.from_tuple(ptuple)
            means, shs, opacity, scales, rots = gaussians.activations(pp)
            out, _ = render(
                means, shs, opacity, scales, rots,
                jnp.asarray(t["view"]), jnp.asarray(t["proj"]),
                jnp.asarray(t["camera_center"]),
                t["fov_x"], t["fov_y"], t["focal_x"], t["focal_y"],
                W, H, 0, raster_cfg=cfg, backend="pallas_interpret",
            )
            return jnp.sum((out.color - target) ** 2)

        return jax.grad(f)(params.as_tuple())

    # With 9 tiles, max_pairs 256, chunk 32: several tiles per chunk window.
    g1 = loss_for("sorted")
    g2 = loss_for("aligned")
    for x, y in zip(g1, g2):
        x, y = np.asarray(x), np.asarray(y)
        if x.size == 0:
            continue
        scale = np.maximum(np.abs(y).max(), 1e-30)
        np.testing.assert_allclose(x / scale, y / scale, atol=3e-5)
    assert any(np.abs(np.asarray(x)).max() > 0 for x in g2 if np.asarray(x).size)


def test_gather_records_staging_bit_exact(monkeypatch):
    """GSPLAT_STAGE_RECORDS=gather (3-column sort + post-sort record gather
    from the compact [N,11] table) reproduces the payload-carriage staging
    bit-for-bit: records, gid, tile ranges, overflow counters — on BOTH the
    aligned and sorted-train layouts."""
    params, cam = scene(seed=13)
    p, packed = _geometry(params, cam)
    st = staging.StagingStatic(
        image_width=W, image_height=H, tile_w=TILE, tile_h=TILE,
        max_pairs=MAX_PAIRS, chunk=CHUNK, num_rec=packed.shape[0],
        grad_reduce="scatter", interpret=True,
    )
    args = (packed, p.rect_min, p.rect_max, p.radii, p.depths)

    base_aligned, base_gid = staging._stage_impl(st, *args)
    base_train, base_gid_full = staging._stage_train_impl(st, *args)

    monkeypatch.setenv("GSPLAT_STAGE_RECORDS", "gather")
    g_aligned, g_gid = staging._stage_impl(st, *args)
    g_train, g_gid_full = staging._stage_train_impl(st, *args)

    for a, b in zip(base_aligned, g_aligned):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(base_gid), np.asarray(g_gid))
    for a, b in zip(base_train, g_train):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(base_gid_full), np.asarray(g_gid_full)
    )

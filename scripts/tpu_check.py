"""Compiled-Mosaic parity check on real TPU: pallas vs oracle."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
import time
import numpy as np
import jax
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp

from gaussiansplattingmlx_tpu.ops import binning, rasterize_pallas, rasterize_ref

rng = np.random.default_rng(0)
n, W, H, tw, th = 200, 128, 96, 32, 32
means2d = np.stack([rng.uniform(2, W-2, n), rng.uniform(2, H-2, n)], 1).astype(np.float32)
sigma = rng.uniform(1.0, 5.0, n).astype(np.float32)
conic = np.zeros((n, 4), np.float32)
conic[:, 0] = 1/sigma**2; conic[:, 3] = 1/sigma**2
off = rng.uniform(-0.02, 0.02, n).astype(np.float32); conic[:,1]=off; conic[:,2]=off
colors = rng.uniform(size=(n,3)).astype(np.float32)
opacity = rng.uniform(0.3, 0.95, size=(n,1)).astype(np.float32)
depths = rng.uniform(1, 10, n).astype(np.float32)
radii = (3*sigma).astype(np.float32)
rect_min = np.maximum(means2d - radii[:,None], 0)
rect_max = np.minimum(means2d + radii[:,None], np.array([W-1,H-1],np.float32))

packed = rasterize_ref.pack_gaussians(jnp.asarray(means2d), jnp.asarray(conic),
    jnp.asarray(colors), jnp.asarray(opacity), jnp.asarray(depths))
b = binning.bin_gaussians(jnp.asarray(rect_min), jnp.asarray(rect_max),
    jnp.asarray(radii), jnp.asarray(depths), W, H, tw, th, 4096)

@jax.jit
def run_fwd(p):
    return rasterize_pallas.rasterize_pallas(p, b.sorted_gauss_idx, b.pair_valid,
        b.tile_start, b.tile_count, W, H, tw, th, chunk_size=128)

target = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))

@jax.jit
def run_grad(p):
    def loss(p):
        out = rasterize_pallas.rasterize_pallas(p, b.sorted_gauss_idx, b.pair_valid,
            b.tile_start, b.tile_count, W, H, tw, th, chunk_size=128)
        return jnp.sum((out.color-target)**2) + 0.3*jnp.sum(out.depth**2) + 0.7*jnp.sum(out.alpha)
    return jax.grad(loss)(p)

t0 = time.time(); out = jax.tree.map(lambda x: x.block_until_ready(), run_fwd(packed))
print("fwd compile+run", time.time()-t0)
t0 = time.time(); g = run_grad(packed).block_until_ready()
print("bwd compile+run", time.time()-t0)

oracle_fwd = jax.jit(lambda p: rasterize_ref.rasterize_reference(p, b.sorted_gauss_idx, b.sorted_tile_id, W, H, tw, th))
want = oracle_fwd(packed)
print("color maxdiff", float(jnp.abs(out.color - want.color).max()))
print("alpha maxdiff", float(jnp.abs(out.alpha - want.alpha).max()))
print("depth maxdiff", float(jnp.abs(out.depth - want.depth).max()))
print("ncon mismatch frac", float(jnp.mean((out.n_contrib != want.n_contrib).astype(jnp.float32))))

def loss_o(p):
    o = rasterize_ref.rasterize_reference(p, b.sorted_gauss_idx, b.sorted_tile_id, W, H, tw, th)
    return jnp.sum((o.color-target)**2) + 0.3*jnp.sum(o.depth**2) + 0.7*jnp.sum(o.alpha)
g_o = jax.jit(jax.grad(loss_o))(packed)
d = jnp.abs(g - g_o)
rel = d / (jnp.abs(g_o) + 1e-3)
import numpy as _np
gn = float(jnp.linalg.norm(g_o))
print("grad maxdiff", float(d.max()), "maxrel", float(rel.max()))
print("grad relnorm", float(jnp.linalg.norm(g - g_o)) / gn, "g_o norm", gn,
      "g_o absmax", float(jnp.abs(g_o).max()))

# ---- fused staging (ops/staging.py): the default training path ------------
from gaussiansplattingmlx_tpu.ops import staging

sst = staging.StagingStatic(
    image_width=W, image_height=H, tile_w=tw, tile_h=th,
    max_pairs=4096, chunk=128, num_rec=n, grad_reduce="segsum",
    interpret=False,
)
rm, rx = jnp.asarray(rect_min), jnp.asarray(rect_max)
rd, dp = jnp.asarray(radii), jnp.asarray(depths)

@jax.jit
def run_fused(p):
    s = staging.stage_pairs(sst, p, rm, rx, rd, dp)
    return rasterize_pallas.rasterize_staged(
        s.records_cm, s.aligned_start, s.tile_count, W, H, tw, th,
        chunk_size=128)

@jax.jit
def run_fused_grad(p):
    def loss(p):
        o = run_fused.__wrapped__(p)
        return jnp.sum((o.color-target)**2) + 0.3*jnp.sum(o.depth**2) + 0.7*jnp.sum(o.alpha)
    return jax.grad(loss)(p)

fo = run_fused(packed)
print("FUSED color maxdiff", float(jnp.abs(fo.color - want.color).max()))
print("FUSED ncon mismatch frac",
      float(jnp.mean((fo.n_contrib != want.n_contrib).astype(jnp.float32))))
gf = run_fused_grad(packed)
print("FUSED grad relnorm", float(jnp.linalg.norm(gf - g_o)) / gn)

# ---- inference path: sorted-order records, unaligned starts ----------------
@jax.jit
def run_inference(p):
    s = staging.stage_pairs_sorted(sst, p, rm, rx, rd, dp)
    return rasterize_pallas.rasterize_staged(
        s.records_cm, s.tile_start, s.tile_count, W, H, tw, th,
        chunk_size=128)

io_ = run_inference(packed)
print("INFER color maxdiff", float(jnp.abs(io_.color - want.color).max()))
print("INFER ncon mismatch frac",
      float(jnp.mean((io_.n_contrib != want.n_contrib).astype(jnp.float32))))

# ---- sorted-order TRAINING path: boundary-carry backward (round 5) ---------
@jax.jit
def run_sorted(p):
    s = staging.stage_pairs_train(sst, p, rm, rx, rd, dp)
    return rasterize_pallas.rasterize_staged(
        s.records_cm, s.tile_start, s.tile_count, W, H, tw, th,
        chunk_size=128, sorted_mode=True)

@jax.jit
def run_sorted_grad(p):
    def loss(p):
        o = run_sorted.__wrapped__(p)
        return jnp.sum((o.color-target)**2) + 0.3*jnp.sum(o.depth**2) + 0.7*jnp.sum(o.alpha)
    return jax.grad(loss)(p)

so_ = run_sorted(packed)
print("SORTED color maxdiff", float(jnp.abs(so_.color - want.color).max()))
print("SORTED ncon mismatch frac",
      float(jnp.mean((so_.n_contrib != want.n_contrib).astype(jnp.float32))))
gs = run_sorted_grad(packed)
print("SORTED grad relnorm", float(jnp.linalg.norm(gs - g_o)) / gn)
print("OK")

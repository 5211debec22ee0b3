"""Fixed-capacity densify/prune rules (GaussianTrainer.swift:766-908)."""

import numpy as np
import jax
import jax.numpy as jnp

from gaussiansplattingmlx_tpu.models.gaussians import GaussianParams, INACTIVE_OPACITY
from gaussiansplattingmlx_tpu.train import densify


def make_params(n, cap, scales_log=-3.0, opacity_logit=0.0):
    def full(shape, v=0.0):
        return jnp.full(shape, v, jnp.float32)

    return GaussianParams(
        xyz=jnp.arange(cap * 3, dtype=jnp.float32).reshape(cap, 3) * 0.01,
        features_dc=full((cap, 1, 3), 0.5),
        features_rest=full((cap, 3, 3)),
        scales=full((cap, 3), scales_log),
        rotation=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (cap, 1)),
        opacity=full((cap, 1), opacity_logit),
    )


def run(params, n, accum, denom=1.0, **kw):
    return densify.split_and_prune(
        params,
        jnp.int32(n),
        jnp.asarray(accum, jnp.float32),
        jnp.float32(denom),
        jax.random.PRNGKey(0),
        **kw,
    )


def test_keep_only():
    cap = 8
    params = make_params(4, cap)
    newp, stats, _, _ = run(params, 4, np.zeros(cap))
    assert int(stats.num_active) == 4
    assert int(stats.n_keep) == 4
    assert int(stats.n_split) == int(stats.n_clone) == int(stats.n_prune) == 0
    np.testing.assert_allclose(np.asarray(newp.xyz[:4]), np.asarray(params.xyz[:4]))
    # dead slots deactivated
    assert float(newp.opacity[4:].max()) == INACTIVE_OPACITY


def test_prune_low_opacity():
    cap = 8
    params = make_params(4, cap, opacity_logit=0.0)
    # Make slot 1 transparent: sigmoid(-8) ~ 3e-4 < 5e-3.
    params = GaussianParams(
        **{
            **{k: getattr(params, k) for k in ("xyz", "features_dc", "features_rest", "scales", "rotation")},
            "opacity": params.opacity.at[1, 0].set(-8.0),
        }
    )
    newp, stats, _, _ = run(params, 4, np.zeros(cap))
    assert int(stats.n_prune) == 1
    assert int(stats.num_active) == 3
    # Survivors are slots 0, 2, 3 in order.
    np.testing.assert_allclose(
        np.asarray(newp.xyz[:3]), np.asarray(params.xyz[jnp.asarray([0, 2, 3])])
    )


def test_clone_small_gaussian():
    cap = 16
    params = make_params(3, cap, scales_log=-6.0)  # exp(-6) << max_scale
    accum = np.zeros(cap)
    accum[2] = 1.0  # high positional gradient on slot 2
    newp, stats, _, _ = run(params, 3, accum)
    assert int(stats.n_clone) == 1
    assert int(stats.n_split) == 0
    assert int(stats.num_active) == 4
    # Clone copy sits next to the original with small noise (0.01 * N(0,1)).
    orig = np.asarray(params.xyz[2])
    copies = np.asarray(newp.xyz[2:4])
    assert np.allclose(copies[0], orig)  # original kept unchanged
    assert 0 < np.abs(copies[1] - orig).max() < 0.1


def test_split_large_gaussian():
    cap = 16
    params = make_params(3, cap, scales_log=0.0)  # exp(0)=1 > max_scale=0.01
    accum = np.zeros(cap)
    accum[0] = 1.0
    newp, stats, _, _ = run(params, 3, accum)
    assert int(stats.n_split) == 1
    assert int(stats.num_active) == 4
    # Both children scaled down by 1.6 in linear space.
    child_scales = np.asarray(newp.scales[0:2])
    np.testing.assert_allclose(child_scales, -np.log(1.6), rtol=1e-6)
    # Children displaced by +- mean(exp(src_scale)) * 0.1 * N(0,1); like the
    # reference, each output slot draws its own noise (GaussianTrainer.swift:
    # 881-890), so the two children are displaced independently.
    orig = np.asarray(params.xyz[0])
    kids = np.asarray(newp.xyz[0:2])
    assert np.abs(kids - orig).max() > 1e-4
    assert np.abs(kids - orig).max() < 1.0  # ~0.1 sigma displacement scale
    assert np.abs(kids[0] - kids[1]).max() > 1e-4


def test_densify_threshold_uses_average():
    cap = 8
    params = make_params(2, cap, scales_log=-6.0)
    accum = np.zeros(cap)
    accum[0] = 3e-4  # avg over denom=2 -> 1.5e-4 < 2e-4: no clone
    newp, stats, _, _ = run(params, 2, accum, denom=2.0)
    assert int(stats.n_clone) == 0
    accum[0] = 5e-4  # avg 2.5e-4 > 2e-4: clone
    newp, stats, _, _ = run(params, 2, accum, denom=2.0)
    assert int(stats.n_clone) == 1


def test_capacity_guard_disables_densify():
    cap = 4
    params = make_params(4, cap, scales_log=-6.0)
    accum = np.ones(cap)  # everything wants to clone -> 8 outputs > cap 4
    newp, stats, _, _ = run(params, 4, accum)
    assert not bool(stats.densify_enabled)
    assert int(stats.num_active) == 4  # keep-only fallback


def test_max_gaussians_budget():
    cap = 16
    params = make_params(8, cap, scales_log=-6.0)
    accum = np.ones(cap)
    newp, stats, _, _ = run(params, 8, accum, max_gaussians=8)
    assert int(stats.n_clone) == 0  # budget reached: densification off
    assert int(stats.num_active) == 8


def test_prune_world_scale():
    """INRIA-style oversized prune (DensifyConfig.prune_world_scale): a live
    gaussian whose max world-space scale exceeds the threshold is removed even
    at full opacity; off (0.0) keeps reference behaviour."""
    cap = 8
    params = make_params(4, cap, scales_log=-3.0, opacity_logit=5.0)
    # gaussian 2 becomes huge: exp(1.0) ~ 2.72 world units
    params = params.__class__(
        **{**params.__dict__, "scales": params.scales.at[2, 0].set(1.0)}
    )
    newp, stats, _, _ = run(params, 4, np.zeros(cap))  # default: off
    assert int(stats.n_prune) == 0 and int(stats.num_active) == 4
    newp, stats, _, _ = run(params, 4, np.zeros(cap), prune_world_scale=2.0)
    assert int(stats.n_prune) == 1 and int(stats.num_active) == 3


def test_prune_world_scale_beats_split():
    """An oversized gaussian with a high grad is pruned, not split."""
    cap = 8
    params = make_params(2, cap, scales_log=1.0, opacity_logit=5.0)
    accum = np.ones(cap)
    newp, stats, _, _ = run(params, 2, accum, prune_world_scale=2.0)
    assert int(stats.n_split) == 0 and int(stats.n_prune) == 2


def test_reset_opacity():
    """Opacity reset clamps live gaussians to <= reset_value in sigmoid space
    and leaves inactive slots and already-transparent ones untouched."""
    cap = 8
    params = make_params(4, cap, opacity_logit=6.0)  # sigmoid ~ 0.998
    params = params.__class__(
        **{**params.__dict__,
           "opacity": params.opacity.at[1, 0].set(-8.0)  # already transparent
                                    .at[6, 0].set(INACTIVE_OPACITY)}
    )
    out = densify.reset_opacity(params, jnp.int32(4), reset_value=0.01)
    sig = jax.nn.sigmoid(np.asarray(out.opacity[:, 0]))
    assert np.all(sig[:4] <= 0.01 + 1e-6)
    assert np.isclose(float(out.opacity[1, 0]), -8.0)  # not raised
    assert float(out.opacity[6, 0]) == INACTIVE_OPACITY  # untouched
    assert np.allclose(np.asarray(out.opacity[4:6, 0]),
                       np.asarray(params.opacity[4:6, 0]))


def test_prune_non_finite_rows():
    """NaN-poisoned rows evade every NaN-comparison-based rule (all False)
    and would occupy capacity forever; densify must cull them (observed: 128
    NaN rows carried across 6k iterations of a round-4 campaign)."""
    cap = 8
    params = make_params(4, cap, opacity_logit=5.0)
    params = params.__class__(
        **{**params.__dict__,
           "xyz": params.xyz.at[1].set(jnp.nan),
           "opacity": params.opacity.at[2, 0].set(jnp.nan)}
    )
    newp, stats, _, _ = run(params, 4, np.zeros(cap))
    assert int(stats.n_prune) == 2
    assert int(stats.num_active) == 2
    n = int(stats.num_active)
    assert np.isfinite(np.asarray(newp.xyz[:n])).all()
    assert np.isfinite(np.asarray(newp.opacity[:n])).all()


def test_prune_near_cameras():
    cap = 8
    params = make_params(4, cap)
    # camera at the position of gaussian 2 (xyz rows are arange*0.01)
    cam = jnp.asarray(params.xyz[2:3])
    newp, stats, _, _ = run(
        params, 4, np.zeros(cap),
        prune_near_cameras=0.02, camera_centers=cam,
    )
    # gaussians 1,2,3 are within 0.06 of row 2; row 0 is at distance 0.0six..
    d = np.linalg.norm(np.asarray(params.xyz[:4]) - np.asarray(cam), axis=1)
    expect_prune = int((d < 0.02).sum())
    assert int(stats.n_prune) == expect_prune
    assert int(stats.num_active) == 4 - expect_prune


def test_prune_needle_ratio():
    cap = 8
    params = make_params(4, cap)
    # gaussian 1 is a needle: one axis 10x the others; gaussian 2 is a disk:
    # two large axes, one tiny (must survive a max/mid ratio prune).
    scales = np.full((cap, 3), -3.0, np.float32)
    scales[1] = [-3.0 + np.log(50.0), -3.0, -3.0]      # needle max/mid = 50
    scales[2] = [0.0, 0.0, -6.0]                        # disk   max/mid = 1
    import dataclasses
    params = dataclasses.replace(params, scales=jnp.asarray(scales))
    newp, stats, _, _ = run(
        params, 4, np.zeros(cap), prune_needle_ratio=10.0,
    )
    assert int(stats.n_prune) == 1
    assert int(stats.num_active) == 3


def test_prune_only_variant_never_grows():
    cap = 8
    params = make_params(4, cap)
    accum = np.zeros(cap)
    accum[:4] = 1.0  # every gaussian far above grad threshold
    newp, stats, _, _ = run(
        params, 4, accum, allow_densify=False, grad_threshold=1e-9,
    )
    assert int(stats.n_split) == 0 and int(stats.n_clone) == 0
    assert int(stats.num_active) == 4

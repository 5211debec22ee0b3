"""Full training checkpoint: params + Adam state + step + counters + RNG.

The reference's only checkpoint is the PLY snapshot (params only; optimizer
state is lost and even reset every densify, GaussianTrainer.swift:909-929,
1105-1110), so training cannot actually resume.  Here a checkpoint restores
training BIT-exactly: all parameter buffers, Adam moments, the active count,
densification accumulators, the step counter, the host RNG state (camera
sampling sequence) and the JAX PRNG key (densify noise), as a single .npz —
a resumed run replays the identical camera/noise sequence from the
checkpoint step, not from step 0.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrainConfig
from ..models.gaussians import GaussianParams, PARAM_NAMES
from . import optimizer as adam


def save(
    path,
    state,
    cfg: TrainConfig | None = None,
    host_rng: np.random.Generator | None = None,
    jax_key=None,
) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {}
    p = jax.device_get(state.params)
    m = jax.device_get(state.opt.m)
    v = jax.device_get(state.opt.v)
    for name in PARAM_NAMES:
        arrays[f"param_{name}"] = np.asarray(getattr(p, name))
        arrays[f"adam_m_{name}"] = np.asarray(getattr(m, name))
        arrays[f"adam_v_{name}"] = np.asarray(getattr(v, name))
    arrays["adam_count"] = np.asarray(jax.device_get(state.opt.count))
    arrays["num_active"] = np.asarray(jax.device_get(state.num_active))
    arrays["grad_accum"] = np.asarray(jax.device_get(state.grad_accum))
    arrays["grad_denom"] = np.asarray(jax.device_get(state.grad_denom))
    arrays["step"] = np.asarray(jax.device_get(state.step))
    arrays["overflow_acc"] = np.asarray(jax.device_get(state.overflow_acc))
    if cfg is not None:
        arrays["config_json"] = np.frombuffer(
            cfg.to_json().encode("utf-8"), dtype=np.uint8
        )
    if host_rng is not None:
        rng_json = json.dumps(host_rng.bit_generator.state)
        arrays["host_rng_json"] = np.frombuffer(rng_json.encode("utf-8"), np.uint8)
    if jax_key is not None:
        if jnp.issubdtype(jnp.asarray(jax_key).dtype, jax.dtypes.prng_key):
            arrays["jax_key"] = np.asarray(jax.random.key_data(jax_key))
            # Record the key impl so load() can rewrap a TYPED key: returning
            # the raw uint32 data as a legacy key under a non-default impl
            # (e.g. jax_enable_custom_prng) would change the densify noise
            # stream and break bit-exact resume.
            arrays["jax_key_impl"] = np.frombuffer(
                str(jax.random.key_impl(jax_key)).encode("utf-8"), np.uint8
            )
        else:
            arrays["jax_key"] = np.asarray(jax_key)
    np.savez(path, **arrays)


def load(path):
    """Returns (TrainState, host_rng | None, jax_key | None)."""
    from .trainer import TrainState

    z = np.load(path)
    params = GaussianParams(**{n: jnp.asarray(z[f"param_{n}"]) for n in PARAM_NAMES})
    opt = adam.AdamState(
        m=GaussianParams(**{n: jnp.asarray(z[f"adam_m_{n}"]) for n in PARAM_NAMES}),
        v=GaussianParams(**{n: jnp.asarray(z[f"adam_v_{n}"]) for n in PARAM_NAMES}),
        count=jnp.asarray(z["adam_count"]),
    )
    state = TrainState(
        params=params,
        opt=opt,
        num_active=jnp.asarray(z["num_active"]),
        grad_accum=jnp.asarray(z["grad_accum"]),
        grad_denom=jnp.asarray(z["grad_denom"]),
        step=jnp.asarray(z["step"]),
        # Absent in pre-round-3 checkpoints: treat as zero overflow history.
        overflow_acc=jnp.asarray(
            z["overflow_acc"] if "overflow_acc" in z
            else np.zeros((2,), np.float32)
        ),
    )
    host_rng = None
    if "host_rng_json" in z:
        rng_state = json.loads(bytes(z["host_rng_json"]).decode("utf-8"))
        host_rng = np.random.default_rng(0)
        host_rng.bit_generator.state = rng_state
    jax_key = None
    if "jax_key" in z:
        jax_key = jnp.asarray(z["jax_key"])
        if "jax_key_impl" in z:
            # Rewrap to the TYPED key it was saved from (same impl), so the
            # restored noise stream is identical under any jax key config.
            impl = bytes(z["jax_key_impl"]).decode("utf-8")
            jax_key = jax.random.wrap_key_data(jax_key, impl=impl)
    return state, host_rng, jax_key


def load_config(path) -> TrainConfig | None:
    z = np.load(path)
    if "config_json" not in z:
        return None
    return TrainConfig.from_json(bytes(z["config_json"]).decode("utf-8"))

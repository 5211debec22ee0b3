"""Full training checkpoint: params + Adam state + step + counters.

The reference's only checkpoint is the PLY snapshot (params only; optimizer
state is lost and even reset every densify, GaussianTrainer.swift:909-929,
1105-1110), so training cannot actually resume.  Here a checkpoint restores
training exactly: all parameter buffers, Adam moments, the active count,
densification accumulators, and the step counter, as a single .npz.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrainConfig
from ..models.gaussians import GaussianParams, PARAM_NAMES
from . import optimizer as adam


def save(path, state, cfg: TrainConfig | None = None) -> None:
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
    if cfg is not None:
        arrays["config_json"] = np.frombuffer(
            cfg.to_json().encode("utf-8"), dtype=np.uint8
        )
    np.savez(path, **arrays)


def load(path):
    from .trainer import TrainState

    z = np.load(path)
    params = GaussianParams(**{n: jnp.asarray(z[f"param_{n}"]) for n in PARAM_NAMES})
    opt = adam.AdamState(
        m=GaussianParams(**{n: jnp.asarray(z[f"adam_m_{n}"]) for n in PARAM_NAMES}),
        v=GaussianParams(**{n: jnp.asarray(z[f"adam_v_{n}"]) for n in PARAM_NAMES}),
        count=jnp.asarray(z["adam_count"]),
    )
    return TrainState(
        params=params,
        opt=opt,
        num_active=jnp.asarray(z["num_active"]),
        grad_accum=jnp.asarray(z["grad_accum"]),
        grad_denom=jnp.asarray(z["grad_denom"]),
        step=jnp.asarray(z["step"]),
    )


def load_config(path) -> TrainConfig | None:
    z = np.load(path)
    if "config_json" not in z:
        return None
    return TrainConfig.from_json(bytes(z["config_json"]).decode("utf-8"))

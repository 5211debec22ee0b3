"""Adam exactly as the reference wires MLXOptimizers.Adam.

MLX's Adam (and the Swift binding used at GaussianTrainer.swift:941-945,
1066-1079) applies NO bias correction:

    m <- b1*m + (1-b1)*g ;  v <- b2*v + (1-b2)*g^2
    p <- p - lr * m / (sqrt(v) + eps)          (eps = 1e-15)

with a per-parameter learning rate set each step.  `bias_correction=True`
switches to standard Adam for experimentation.  Implemented as a plain pytree
transform (optax would work too, but the exact MLX update rule plus
densify-time state surgery is simpler to guarantee by hand).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    m: Any  # pytree like params
    v: Any
    count: jax.Array  # [] int32 (used only when bias_correction)


def init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(m=zeros, v=jax.tree.map(jnp.zeros_like, params), count=jnp.int32(0))


def update(
    params,
    grads,
    state: AdamState,
    lr_tree,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-15,
    bias_correction: bool = False,
):
    """One Adam step.  `lr_tree` is a pytree of scalars matching `params`
    (or a single scalar)."""
    count = state.count + 1
    if jax.tree.structure(lr_tree) != jax.tree.structure(params):
        # Single scalar learning rate: broadcast over the parameter tree.
        lr_tree = jax.tree.map(lambda _: lr_tree, params)

    def upd(p, g, m, v, lr):
        m = beta1 * m + (1.0 - beta1) * g
        v = beta2 * v + (1.0 - beta2) * (g * g)
        if bias_correction:
            mhat = m / (1.0 - beta1 ** count.astype(jnp.float32))
            vhat = v / (1.0 - beta2 ** count.astype(jnp.float32))
        else:
            mhat, vhat = m, v
        return p - lr * mhat / (jnp.sqrt(vhat) + eps), m, v

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.m)
    flat_v = treedef.flatten_up_to(state.v)
    flat_lr = treedef.flatten_up_to(lr_tree)
    new_p, new_m, new_v = [], [], []
    for p, g, m, v, lr in zip(flat_p, flat_g, flat_m, flat_v, flat_lr):
        pn, mn, vn = upd(p, g, m, v, lr)
        new_p.append(pn)
        new_m.append(mn)
        new_v.append(vn)
    return (
        treedef.unflatten(new_p),
        AdamState(m=treedef.unflatten(new_m), v=treedef.unflatten(new_v), count=count),
    )

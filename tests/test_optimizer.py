"""Adam update rule (MLX semantics: no bias correction, eps=1e-15) and a
convergence smoke test mirroring TrainTests.swift:15-43."""

import numpy as np
import jax
import jax.numpy as jnp

from gaussiansplattingmlx_tpu.train import optimizer as adam


def test_single_step_matches_manual():
    p = {"a": jnp.asarray([1.0, 2.0]), "b": jnp.asarray([[3.0]])}
    g = {"a": jnp.asarray([0.1, -0.2]), "b": jnp.asarray([[0.5]])}
    st = adam.init(p)
    lr = {"a": jnp.float32(0.1), "b": jnp.float32(0.01)}
    newp, st2 = adam.update(p, g, st, lr, beta1=0.9, beta2=0.999, eps=1e-15)
    # m = 0.1*g, v = 0.001*g^2, update = lr*m/(sqrt(v)+eps)
    for k in ("a", "b"):
        m = 0.1 * np.asarray(g[k])
        v = 0.001 * np.asarray(g[k]) ** 2
        expect = np.asarray(p[k]) - float(lr[k]) * m / (np.sqrt(v) + 1e-15)
        np.testing.assert_allclose(np.asarray(newp[k]), expect, rtol=1e-6)


def test_no_bias_correction_first_step_magnitude():
    # Without bias correction the first step is lr * 0.1g / (sqrt(0.001)|g|)
    # = lr * 3.1623 * sign(g), NOT lr * sign(g) as with correction.
    p = jnp.asarray([0.0])
    g = jnp.asarray([1.0])
    st = adam.init(p)
    newp, _ = adam.update(p, g, st, jnp.float32(1.0))
    assert abs(float(newp[0]) + 0.1 / np.sqrt(0.001)) < 1e-3


def test_bias_correction_flag():
    p = jnp.asarray([0.0])
    g = jnp.asarray([1.0])
    st = adam.init(p)
    newp, _ = adam.update(p, g, st, jnp.float32(1.0), bias_correction=True)
    assert abs(float(newp[0]) + 1.0) < 1e-4


def test_linear_system_converges(rng):
    # 200-step Adam on a small least-squares problem (TrainTests.swift analog).
    A = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    x_true = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    y = A @ x_true

    def loss(x):
        return jnp.mean((A @ x - y) ** 2)

    x = jnp.zeros(4)
    st = adam.init(x)
    step = jax.jit(
        lambda x, st: adam.update(x, jax.grad(loss)(x), st, jnp.float32(0.1))
    )
    for _ in range(300):
        x, st = step(x, st)
    assert float(loss(x)) < 1e-2

"""L-BFGS refinement (train/lbfgs.py): convergence + PINN polish."""

import jax
import jax.numpy as jnp
import numpy as np

from qcpinn_tpu.train.lbfgs import lbfgs_refine, make_fixed_batch_loss


def test_quadratic_converges_fast():
    A = jnp.asarray(np.diag([1.0, 10.0, 100.0]), dtype=jnp.float32)
    b = jnp.asarray([1.0, -2.0, 3.0])

    def loss(p):
        return 0.5 * p @ A @ p - b @ p

    p0 = jnp.zeros(3)
    p, losses = lbfgs_refine(loss, p0, steps=30)
    expect = jnp.linalg.solve(A, b)
    np.testing.assert_allclose(p, expect, atol=1e-4)
    assert losses[-1] < losses[0]


def test_chunked_matches_unchunked():
    def loss(p):
        return jnp.sum((p - 2.0) ** 4 + 0.5 * p**2)

    p0 = jnp.asarray([5.0, -3.0])
    p_a, _ = lbfgs_refine(loss, p0, steps=24)
    p_b, _ = lbfgs_refine(loss, p0, steps=24, chunk=6)
    np.testing.assert_allclose(p_a, p_b, atol=1e-6)


def test_polishes_small_regression_below_adam_floor():
    # tiny supervised fit: L-BFGS should land orders below a short Adam run
    key = jax.random.PRNGKey(0)
    X = jax.random.uniform(key, (128, 2))
    y = jnp.sin(3.0 * X[:, :1]) * X[:, 1:2]
    w0 = {
        "w1": jax.random.normal(jax.random.PRNGKey(1), (2, 16)) * 0.5,
        "b1": jnp.zeros(16),
        "w2": jax.random.normal(jax.random.PRNGKey(2), (16, 1)) * 0.5,
        "b2": jnp.zeros(1),
    }

    def apply(p, x):
        return jnp.tanh(x @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"]

    loss_fn = make_fixed_batch_loss(
        apply, None, {"sup": (X, y)}, {"sup": 1.0}, {"sup": "value"}
    )
    params, losses = lbfgs_refine(loss_fn, w0, steps=150)
    assert float(losses[-1]) < 1e-4, float(losses[-1])
    assert float(losses[-1]) < float(losses[0]) * 1e-3

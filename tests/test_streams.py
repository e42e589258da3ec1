"""Tangent-stream residuals must match nested-autodiff residuals exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qcpinn_tpu.config import QCPINNConfig
from qcpinn_tpu.models import DVSolver
from qcpinn_tpu.models.dv_fourier import DVFourierSolver
from qcpinn_tpu.physics.operators_fwd import diffusion_operator_fwd
from qcpinn_tpu.physics.streams import dv_diffusion_residual_streams


@pytest.mark.parametrize("kind", ["plain", "fourier"])
@pytest.mark.parametrize("ansatz", ["cascade", "cross_mesh"])
def test_streams_match_autodiff(rng, kind, ansatz):
    cfg = QCPINNConfig(
        num_qubits=3, classic_network=(3, 10, 1), q_ansatz=ansatz, seed=3
    )
    model = DVSolver(cfg) if kind == "plain" else DVFourierSolver(cfg, mapping_size=4)
    params = model.init(jax.random.PRNGKey(0))
    X = jnp.asarray(rng.uniform(0.1, 0.9, (8, 3)).astype(np.float32))

    u_ref, r_ref = jax.jit(
        lambda Xp: diffusion_operator_fwd(lambda Xq: model.apply(params, Xq), Xp)
    )(X)
    u_st, r_st = jax.jit(
        lambda p, Xp: dv_diffusion_residual_streams(model, p, Xp)
    )(params, X)
    np.testing.assert_allclose(np.asarray(u_st), np.asarray(u_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r_st), np.asarray(r_ref), rtol=5e-3, atol=5e-4)


def test_streams_gradients(rng):
    cfg = QCPINNConfig(num_qubits=3, classic_network=(3, 8, 1), q_ansatz="cascade")
    model = DVSolver(cfg)
    params = model.init(jax.random.PRNGKey(0))
    X = jnp.asarray(rng.uniform(0.1, 0.9, (6, 3)).astype(np.float32))

    def loss_stream(p):
        _, r = dv_diffusion_residual_streams(model, p, X)
        return jnp.mean(r**2)

    def loss_ref(p):
        _, r = diffusion_operator_fwd(lambda Xp: model.apply(p, Xp), X)
        return jnp.mean(r**2)

    g1 = jax.jit(jax.grad(loss_stream))(params)
    g2 = jax.jit(jax.grad(loss_ref))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-4)


def test_streams_match_autodiff_rot_ring_pi_encoding(rng):
    """angle_pi chain rule through the streams: the scale s=pi enters the
    first tangents once and the curvature twice (via the doubly-applied
    scaled tangent) — must match nested autodiff exactly."""
    cfg = QCPINNConfig(
        num_qubits=3, classic_network=(3, 10, 1), q_ansatz="rot_ring",
        encoding="angle_pi", seed=3,
    )
    model = DVSolver(cfg)
    params = model.init(jax.random.PRNGKey(0))
    X = jnp.asarray(rng.uniform(0.1, 0.9, (8, 3)).astype(np.float32))
    u_ref, r_ref = jax.jit(
        lambda Xp: diffusion_operator_fwd(lambda Xq: model.apply(params, Xq), Xp)
    )(X)
    u_st, r_st = jax.jit(
        lambda p, Xp: dv_diffusion_residual_streams(model, p, Xp)
    )(params, X)
    np.testing.assert_allclose(np.asarray(u_st), np.asarray(u_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r_st), np.asarray(r_ref), rtol=5e-3, atol=5e-4)


def test_streams_multilayer_with_haar(rng):
    cfg = QCPINNConfig(
        num_qubits=4, num_quantum_layers=2, classic_network=(3, 8, 1),
        q_ansatz="layered", seed=7,
    )
    model = DVSolver(cfg)
    params = model.init(jax.random.PRNGKey(1))
    X = jnp.asarray(rng.uniform(0.1, 0.9, (5, 3)).astype(np.float32))
    _, r_ref = diffusion_operator_fwd(lambda Xp: model.apply(params, Xp), X)
    _, r_st = dv_diffusion_residual_streams(model, params, X)
    np.testing.assert_allclose(np.asarray(r_st), np.asarray(r_ref), rtol=5e-3, atol=5e-4)


@pytest.mark.slow
def test_streams_with_pallas_evolve(rng):
    """streams + Pallas reverse-sweep evolve (interpret mode) == XLA path."""
    cfg = QCPINNConfig(num_qubits=3, classic_network=(3, 8, 1), q_ansatz="cross_mesh")
    model = DVSolver(cfg)
    model.use_pallas(interpret=True)
    params = model.init(jax.random.PRNGKey(0))
    X = jnp.asarray(rng.uniform(0.1, 0.9, (4, 3)).astype(np.float32))

    u_p, r_p = dv_diffusion_residual_streams(model, params, X)
    model._fused = None
    u_x, r_x = dv_diffusion_residual_streams(model, params, X)
    np.testing.assert_allclose(np.asarray(u_p), np.asarray(u_x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r_p), np.asarray(r_x), rtol=5e-3, atol=5e-4)

    # gradients through pallas-evolve streams
    model.use_pallas(interpret=True)

    def loss(p):
        _, r = dv_diffusion_residual_streams(model, p, X)
        return jnp.mean(r**2)

    g = jax.grad(loss)(params)
    model._fused = None
    g2 = jax.grad(loss)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=3e-4)


def test_train_step_with_streams_residual_fn_matches_operator(rng):
    """make_train_step(residual_fn=...) — the streams hook the 16q north
    star trains through — must follow the nested-AD operator trajectory."""
    import optax

    from qcpinn_tpu.data import diffusion as dd
    from qcpinn_tpu.train import TermSpec, make_train_step
    from qcpinn_tpu.train import optim as topt

    cfg = QCPINNConfig(
        num_qubits=3, classic_network=(3, 8, 1), q_ansatz="cross_mesh",
        batch_size=8, epochs=4, lr=1e-3, seed=2,
    )
    model = DVFourierSolver(cfg, mapping_size=4)
    params = model.init(jax.random.PRNGKey(0))
    box = dd._box
    terms = {
        "res": TermSpec(
            dd.Sampler(box([[0, 0, 0], [1, 1, 1]]), dd.r_true), 1.0, 8, "residual"
        ),
        "ic": TermSpec(
            dd.Sampler(box([[0, 0, 0], [0, 1, 1]]), dd.u), 10.0, 4, "value"
        ),
    }
    optimizer = topt.make_optimizer(cfg.lr, grad_clip=1.0)

    def run(residual_fn):
        _, scan_steps = make_train_step(
            model.apply, diffusion_operator_fwd, terms, optimizer, cfg,
            residual_fn=residual_fn,
        )
        out = scan_steps(
            params, optimizer.init(params), topt.plateau_init(),
            jax.random.PRNGKey(1), 0, 3,
        )
        return np.asarray(out[3]["loss"])

    l_op = run(None)
    l_st = run(lambda p, X: dv_diffusion_residual_streams(model, p, X))
    np.testing.assert_allclose(l_st, l_op, rtol=2e-3, atol=1e-5)

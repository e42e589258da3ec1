"""Additive Gaussian-RBF output head (models/nn_core.py rbf_*): analytic
parity, streams composition, and the accuracy mechanism it exists for."""

import jax
import jax.numpy as jnp
import numpy as np

from qcpinn_tpu.config import QCPINNConfig
from qcpinn_tpu.models import nn_core as nc
from qcpinn_tpu.models.dv_fourier import DVFourierSolver
from qcpinn_tpu.physics.operators_fwd import diffusion_operator_fwd
from qcpinn_tpu.physics.streams import dv_diffusion_residual_streams


def test_rbf_apply_matches_formula():
    p = nc.rbf_init(jax.random.PRNGKey(0), 3, 4, width=5.0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (6, 3))
    got = np.asarray(nc.rbf_apply(p, x))
    c, w, v, a = map(np.asarray, (p["c"], p["w"], p["v"], p["a"]))
    expect = np.zeros((6, 1))
    for i in range(6):
        for k in range(4):
            q = np.sum((w[k] * (x[i] - c[k])) ** 2) + np.sum(v[k] * np.asarray(x[i]))
            expect[i, 0] += float(a[k].reshape(())) * np.exp(-q)
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_rbf_single_unit_represents_gaussian_pulse_exactly():
    # u = exp(-100((x-.5)^2+(y-.5)^2)) * exp(-t) is one unit with
    # w=(0,10,10), c=(*,.5,.5), v=(1,0,0), a=1 — the design rationale
    p = {
        "c": jnp.asarray([[0.0, 0.5, 0.5]]),
        "w": jnp.asarray([[0.0, 10.0, 10.0]]),
        "v": jnp.asarray([[1.0, 0.0, 0.0]]),
        "a": jnp.asarray([1.0]),
    }
    X = jax.random.uniform(jax.random.PRNGKey(2), (64, 3))
    from qcpinn_tpu.data import diffusion as dd

    np.testing.assert_allclose(
        np.asarray(nc.rbf_apply(p, X)), np.asarray(dd.u(X)), rtol=1e-5, atol=1e-7
    )


def test_rbf_centers_from_samples_concentrate():
    from qcpinn_tpu.data import diffusion as dd

    X = jax.random.uniform(jax.random.PRNGKey(3), (4096, 3))
    c = nc.rbf_centers_from_samples(jax.random.PRNGKey(4), X, dd.r_true(X), 16)
    c = np.asarray(c)
    assert c.shape == (16, 3)
    # |forcing| mass sits near (x, y) = (.5, .5)
    assert np.mean(np.abs(c[:, 1] - 0.5)) < 0.15
    assert np.mean(np.abs(c[:, 2] - 0.5)) < 0.15


def test_fourier_solver_with_rbf_head_streams_match_fwd_operator():
    cfg = QCPINNConfig(num_qubits=3, classic_network=(3, 10, 1), q_ansatz="cross_mesh")
    model = DVFourierSolver(cfg, mapping_size=4, rbf_count=4, rbf_width=5.0)
    params = model.init(jax.random.PRNGKey(0))
    assert "rbf" in params
    X = jnp.asarray(
        np.random.RandomState(5).uniform(0.1, 0.9, (8, 3)).astype(np.float32)
    )
    u_ref, r_ref = jax.jit(
        lambda Xp: diffusion_operator_fwd(lambda Xq: model.apply(params, Xq), Xp)
    )(X)
    u_st, r_st = jax.jit(
        lambda p, Xp: dv_diffusion_residual_streams(model, p, Xp)
    )(params, X)
    np.testing.assert_allclose(np.asarray(u_st), np.asarray(u_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r_st), np.asarray(r_ref), rtol=5e-3, atol=5e-4)


def test_rbf_head_is_optional_and_off_by_default():
    cfg = QCPINNConfig(num_qubits=3, classic_network=(3, 10, 1))
    model = DVFourierSolver(cfg, mapping_size=4)
    params = model.init(jax.random.PRNGKey(0))
    assert "rbf" not in params

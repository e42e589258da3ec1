"""Forward-mode operators must match the reverse-mode (torch-semantics)
operators exactly for point-decoupled models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qcpinn_tpu.config import QCPINNConfig
from qcpinn_tpu.data import diffusion as dd
from qcpinn_tpu.models import DVSolver
from qcpinn_tpu.physics import operators as rev
from qcpinn_tpu.physics import operators_fwd as fwd
from qcpinn_tpu.physics.cylindrical import cz_residuals
from qcpinn_tpu.physics.operators_fwd import cz_residuals_fwd


def _dv_apply(rng):
    cfg = QCPINNConfig(num_qubits=3, classic_network=(3, 12, 3), q_ansatz="cascade")
    model = DVSolver(cfg)
    params = model.init(jax.random.PRNGKey(0))
    return lambda X: model.apply(params, X)


def test_diffusion_fwd_matches_rev(rng):
    apply = _dv_apply(rng)
    X = jnp.asarray(rng.uniform(0.1, 0.9, (16, 3)).astype(np.float32))
    u_r, res_r = jax.jit(lambda Xp: rev.diffusion_operator(apply, Xp))(X)
    u_f, res_f = jax.jit(lambda Xp: fwd.diffusion_operator_fwd(apply, Xp))(X)
    np.testing.assert_allclose(np.asarray(u_f), np.asarray(u_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(res_f), np.asarray(res_r), rtol=2e-3, atol=2e-4)


def test_diffusion_fwd_analytic_oracle(rng):
    X = jnp.asarray(rng.uniform(0.1, 0.9, (32, 3)).astype(np.float32))
    _, res = fwd.diffusion_operator_fwd(dd.u, X)
    np.testing.assert_allclose(np.asarray(res), np.asarray(dd.r_true(X)), rtol=2e-3, atol=2e-4)


def test_wave_kg_helmholtz_fwd_match(rng):
    cfg = QCPINNConfig(num_qubits=2, classic_network=(2, 10, 1))
    model = DVSolver(cfg)
    params = model.init(jax.random.PRNGKey(1))
    apply = lambda X: model.apply(params, X)
    X = jnp.asarray(rng.uniform(0.1, 0.9, (12, 2)).astype(np.float32))
    for op_r, op_f in [
        (rev.wave_operator, fwd.wave_operator_fwd),
        (rev.klein_gordon_operator, fwd.klein_gordon_operator_fwd),
        (rev.helmholtz_operator, fwd.helmholtz_operator_fwd),
    ]:
        _, r1 = op_r(apply, X)
        _, r2 = op_f(apply, X)
        np.testing.assert_allclose(np.asarray(r2), np.asarray(r1), rtol=2e-3, atol=3e-4)


def test_navier_stokes_fwd_matches(rng):
    def model3(Xp):
        t, x, y = Xp[:, 0:1], Xp[:, 1:2], Xp[:, 2:3]
        u = jnp.sin(x) * jnp.cos(y) * jnp.exp(-t)
        v = -jnp.cos(x) * jnp.sin(y) * jnp.exp(-t)
        p = 0.25 * (jnp.cos(2 * x) + jnp.cos(2 * y)) * jnp.exp(-2 * t)
        return jnp.concatenate([u, v, p], axis=1)

    X = jnp.asarray(rng.uniform(0.1, 0.9, (8, 3)).astype(np.float32))
    c1, fu1, fv1 = rev.navier_stokes_2d_operator(model3, X)
    c2, fu2, fv2 = fwd.navier_stokes_2d_operator_fwd(model3, X)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c1), atol=3e-4)
    np.testing.assert_allclose(np.asarray(fu2), np.asarray(fu1), atol=3e-4)
    np.testing.assert_allclose(np.asarray(fv2), np.asarray(fv1), atol=3e-4)


@pytest.mark.slow
def test_cz_residuals_fwd_matches(rng):
    from qcpinn_tpu.models.czochralski import Hybrid16QPINN

    model = Hybrid16QPINN(n_qubits=4, n_layers=1)
    params = model.init(jax.random.PRNGKey(0))
    apply = lambda X: model.apply(params, X)
    x = jnp.asarray(rng.uniform(0.1, 1.0, (8, 2)).astype(np.float32))
    t1, terms1 = cz_residuals(apply, x, 1.3, 100.0, 0.011, 1e5)
    t2, terms2 = cz_residuals_fwd(apply, x, 1.3, 100.0, 0.011, 1e5)
    for k in terms1:
        np.testing.assert_allclose(
            np.asarray(terms2[k]), np.asarray(terms1[k]), rtol=5e-3, atol=1e-5
        )


def test_fwd_operator_trains(rng):
    """grad through the fwd-mode residual works (reverse-over-forward)."""
    cfg = QCPINNConfig(num_qubits=2, classic_network=(3, 8, 1))
    model = DVSolver(cfg)
    params = model.init(jax.random.PRNGKey(0))
    X = jnp.asarray(rng.uniform(0.1, 0.9, (8, 3)).astype(np.float32))

    @jax.jit
    def loss(p):
        _, res = fwd.diffusion_operator_fwd(lambda Xp: model.apply(p, Xp), X)
        return jnp.mean(res**2)

    g = jax.jit(jax.grad(loss))(params)
    assert all(
        np.all(np.isfinite(np.asarray(l))) for l in jax.tree_util.tree_leaves(g)
    )

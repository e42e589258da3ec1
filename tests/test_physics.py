"""PDE operators: residual of the analytic solution must equal the analytic
forcing (the reference's de-facto oracle, SURVEY.md §4), plus derivative
semantics checks for batch-coupled models (torch grad_outputs=ones parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from qcpinn_tpu.data import diffusion as dd
from qcpinn_tpu.physics import operators as ops


def _points(rng, n, d):
    return jnp.asarray(rng.uniform(0.05, 0.95, size=(n, d)).astype(np.float32))


def test_diffusion_residual_of_analytic_solution_is_forcing(rng):
    X = _points(rng, 64, 3)
    u_pred, res = ops.diffusion_operator(dd.u, X)
    np.testing.assert_allclose(np.asarray(u_pred), np.asarray(dd.u(X)), atol=1e-6)
    # the autodiff residual equals the *true* forcing ...
    np.testing.assert_allclose(
        np.asarray(res), np.asarray(dd.r_true(X)), rtol=2e-3, atol=2e-4
    )
    # ... and the reference-parity forcing differs by exactly +400 D u
    # (the reference's analytic-second-partial defect, see data/diffusion.py)
    np.testing.assert_allclose(
        np.asarray(dd.r(X) - dd.r_true(X)),
        np.asarray(400.0 * dd.DEFAULT_D * dd.u(X)),
        rtol=1e-5,
        atol=1e-6,
    )


def test_diffusion_sine_solution_solves_pure_diffusion(rng):
    X = _points(rng, 64, 3)
    f = lambda Xp: dd.u_sine(Xp, D=0.01)
    _, res = ops.diffusion_operator(f, X, v_x=0.0, v_y=0.0, D=0.01)
    np.testing.assert_allclose(np.asarray(res), 0.0, atol=5e-4)


def test_wave_travelling_solution(rng):
    # u = sin(x - 2t) solves u_tt - 4 u_xx = 0 (c=2, nn/pde.py:42-52)
    X = _points(rng, 32, 2)
    f = lambda Xp: jnp.sin(Xp[:, 1:2] - 2.0 * Xp[:, 0:1])
    _, res = ops.wave_operator(f, X)
    np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-4)


def test_klein_gordon_closed_form(rng):
    # u = t^2 + x^2: u_tt=2, u_xx=2, residual = 2 - 2 + u^3 = u^3
    X = _points(rng, 32, 2)
    f = lambda Xp: (Xp[:, 0:1] ** 2 + Xp[:, 1:2] ** 2)
    u, res = ops.klein_gordon_operator(f, X)
    np.testing.assert_allclose(np.asarray(res), np.asarray(u) ** 3, rtol=1e-4, atol=1e-5)


def test_helmholtz_eigenfunction(rng):
    # u = sin(pi x) sin(pi y): residual = (1 - 2 pi^2) u
    X = _points(rng, 32, 2)
    f = lambda Xp: jnp.sin(jnp.pi * Xp[:, 0:1]) * jnp.sin(jnp.pi * Xp[:, 1:2])
    u, res = ops.helmholtz_operator(f, X)
    np.testing.assert_allclose(
        np.asarray(res), (1.0 - 2.0 * np.pi**2) * np.asarray(u), rtol=1e-3, atol=1e-4
    )


def test_navier_stokes_taylor_green_like(rng):
    """Check NS residuals against independent finite differences of an
    arbitrary smooth field."""
    X = _points(rng, 8, 3)

    def model(Xp):
        t, x, y = Xp[:, 0:1], Xp[:, 1:2], Xp[:, 2:3]
        u = jnp.sin(x) * jnp.cos(y) * jnp.exp(-t)
        v = -jnp.cos(x) * jnp.sin(y) * jnp.exp(-t)
        p = 0.25 * (jnp.cos(2 * x) + jnp.cos(2 * y)) * jnp.exp(-2 * t)
        return jnp.concatenate([u, v, p], axis=1)

    cont, f_u, f_v = ops.navier_stokes_2d_operator(model, X)
    # continuity: u_x + v_y = cos(x)cos(y)e^-t - cos(x)cos(y)e^-t = 0
    np.testing.assert_allclose(np.asarray(cont), 0.0, atol=1e-4)

    # spot-check f_u against closed form with the reference constants
    mu, rho = 0.00345, 1056.0
    t, x, y = [np.asarray(X[:, i]) for i in range(3)]
    u = np.sin(x) * np.cos(y) * np.exp(-t)
    v = -np.cos(x) * np.sin(y) * np.exp(-t)
    u_t = -u
    u_x = np.cos(x) * np.cos(y) * np.exp(-t)
    u_y = -np.sin(x) * np.sin(y) * np.exp(-t)
    p_x = -0.5 * np.sin(2 * x) * np.exp(-2 * t)
    lap_u = -2 * u
    expect = u_t + u * u_x + v * u_y + p_x / rho - mu * lap_u
    np.testing.assert_allclose(np.asarray(f_u)[:, 0], expect, rtol=1e-3, atol=1e-4)


def test_batch_coupled_semantics_match_torch_convention(rng):
    """For a batch-coupled model (like the Hopfield baseline) the operator
    must reproduce torch's grad(u, x, ones) = sum_i du_i/dx_j, not the
    per-point diagonal. Verified against an explicit dense jacobian."""
    B = 5
    X = _points(rng, B, 3)
    W = jnp.asarray(rng.standard_normal((B, B)).astype(np.float32)) * 0.1

    def coupled(Xp):
        # mixes the batch: u_i = sum_j W_ij * tanh(sum_d X_jd^2)
        s = jnp.tanh(jnp.sum(Xp**2, axis=1))
        return (W @ s)[:, None]

    _, res = ops.diffusion_operator(coupled, X)

    # independent dense computation
    f_flat = lambda Xf: coupled(Xf.reshape(B, 3)).sum()
    g = jax.grad(f_flat)(X.reshape(-1)).reshape(B, 3)
    H = jax.hessian(f_flat)(X.reshape(-1)).reshape(B, 3, B, 3)
    u_t = g[:, 0]
    u_x = g[:, 1]
    u_y = g[:, 2]
    u_xx = jnp.einsum("ij->i", H[:, 1, :, 1])
    u_yy = jnp.einsum("ij->i", H[:, 2, :, 2])
    expect = u_t + u_x + u_y - 0.01 * (u_xx + u_yy)
    np.testing.assert_allclose(np.asarray(res)[:, 0], np.asarray(expect), rtol=1e-4, atol=1e-5)


def test_operators_jit_and_grad(rng):
    """Operators must compose with jit and grad (the training path)."""
    X = _points(rng, 16, 3)
    w = jnp.asarray(rng.standard_normal((3, 1)).astype(np.float32))

    @jax.jit
    def loss(w):
        f = lambda Xp: jnp.tanh(Xp @ w)
        _, res = ops.diffusion_operator(f, X)
        return jnp.mean(res**2)

    g = jax.grad(loss)(w)
    assert np.all(np.isfinite(np.asarray(g)))


def test_sampler_bounds_and_targets(rng):
    samplers = dd.gaussian_pulse_samplers()
    key = jax.random.PRNGKey(0)
    X, Y = samplers["ics"].sample(key, 100)
    assert X.shape == (100, 3) and Y.shape == (100, 1)
    np.testing.assert_allclose(np.asarray(X[:, 0]), 0.0, atol=1e-7)  # t = 0 slice
    assert np.all(np.asarray(X[:, 1:]) >= 0) and np.all(np.asarray(X[:, 1:]) <= 1)
    np.testing.assert_allclose(np.asarray(Y), np.asarray(dd.u(X)), atol=1e-6)

    sine = dd.sine_samplers()
    Xb, Yb = sine["bc3"].sample(key, 10)
    np.testing.assert_allclose(np.asarray(Xb[:, 2]), 0.0, atol=1e-7)  # y = 0 wall
    np.testing.assert_allclose(np.asarray(Yb), 0.0)


def test_mixture_sampler_focus_and_targets(rng):
    s = dd.pulse_residual_sampler(frac=0.5, sigma=0.1, func=dd.r_true)
    X, Y = s.sample(jax.random.PRNGKey(2), 2000)
    Xn = np.asarray(X)
    assert np.all(Xn >= 0.0) and np.all(Xn <= 1.0)
    np.testing.assert_allclose(np.asarray(Y), np.asarray(dd.r_true(X)), atol=1e-5)
    # first half is pulse-focused in (x, y) but uniform in t
    foc, uni = Xn[:1000], Xn[1000:]
    assert np.std(foc[:, 1] - 0.5) < 0.15 < np.std(uni[:, 1] - 0.5) * 2
    assert abs(np.std(foc[:, 0]) - np.std(uni[:, 0])) < 0.05  # t untouched
    # frac=0 degenerates to the uniform sampler's support
    s0 = dd.pulse_residual_sampler(frac=0.0)
    X0, _ = s0.sample(jax.random.PRNGKey(3), 500)
    assert np.std(np.asarray(X0)[:, 1] - 0.5) > 0.2


def test_taylor_green_is_exact_ns_solution():
    """The Taylor-Green field (data/navier_stokes.py) must zero the
    reference-form NS residuals (nn/pde.py:2-27) — analytic oracle for the
    runnable navier_stokes config."""
    from qcpinn_tpu.data import navier_stokes as ns
    from qcpinn_tpu.physics import (
        navier_stokes_2d_operator,
        navier_stokes_2d_operator_fwd,
    )

    X = jnp.asarray(
        np.random.default_rng(0).uniform(
            [0, 0, 0], [1.0, np.pi, np.pi], (64, 3)
        ).astype(np.float32)
    )
    for op in (navier_stokes_2d_operator, navier_stokes_2d_operator_fwd):
        cont, f_u, f_v = jax.jit(lambda X, op=op: op(ns.uvp, X))(X)
        np.testing.assert_allclose(np.asarray(cont), 0.0, atol=2e-4)
        np.testing.assert_allclose(np.asarray(f_u), 0.0, atol=2e-3)
        np.testing.assert_allclose(np.asarray(f_v), 0.0, atol=2e-3)

"""PDE residual operators via JAX autodiff through the full model.

TPU-native translation of nn/pde.py: the reference chains
``torch.autograd.grad(create_graph=True)`` calls; here first derivatives come
from one reverse pass (``jax.vjp`` with a ones cotangent — identical
semantics to torch's ``grad_outputs=ones``, including batch-coupled models
like the Hopfield baseline), and second derivatives from
forward-over-reverse (``jax.linearize`` of the gradient map), which for the
symmetric Hessian of sum(u) is exactly torch's
``grad(u_x, x, ones)``. Everything is one fused jit graph; no retain_graph
bookkeeping, bounded memory.

Every operator takes ``apply: [B, d] -> [B, m]`` (the model with params
already bound) and the input coordinate block ``X``; constants match the
reference exactly (cited per function).
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray
ModelFn = Callable[[Array], Array]


def _sum_grad(f_col: Callable[[Array], Array], X: Array) -> Tuple[Array, Array]:
    """u = f_col(X) ([B]) and g[B,d] = d(sum u)/dX — torch's
    ``grad(u, X, ones)``."""
    u, vjp_fn = jax.vjp(f_col, X)
    (g,) = vjp_fn(jnp.ones_like(u))
    return u, g


def _hess_cols(
    f_col: Callable[[Array], Array], X: Array, cols: Sequence[int]
) -> Tuple[Array, Array, list[Array]]:
    """u, first-derivative block g[B,d], and for each c in cols the Hessian
    column H[:, :, c][:, c] i.e. d^2(sum u)/dX_c^2 per batch row ([B])."""

    def grad_map(Xp: Array) -> Array:
        return _sum_grad(f_col, Xp)[1]

    g, lin = jax.linearize(grad_map, X)
    u = f_col(X)
    seconds = []
    for c in cols:
        tangent = jnp.zeros_like(X).at[:, c].set(1.0)
        seconds.append(lin(tangent)[:, c])
    return u, g, seconds


def diffusion_operator(
    apply: ModelFn,
    X: Array,
    sigma_t: float = 1.0,
    sigma_x: float = 1.0,
    sigma_y: float = 1.0,
    D: float = 0.01,
    v_x: float = 1.0,
    v_y: float = 1.0,
) -> Tuple[Array, Array]:
    """Convection-diffusion residual u_t + v.grad(u) - D lap(u)
    (nn/pde.py:53-72). ``X = [t, x, y]`` columns; returns (u, residual) as
    ``[B, 1]`` like the reference."""

    def f(Xp):
        return apply(Xp)[:, 0]

    u, g, (u_xx, u_yy) = _hess_cols(f, X, cols=(1, 2))
    u_t = g[:, 0] / sigma_t
    u_x = g[:, 1] / sigma_x
    u_y = g[:, 2] / sigma_y
    u_xx = u_xx / (sigma_x * sigma_x)
    u_yy = u_yy / (sigma_y * sigma_y)
    residual = u_t + v_x * u_x + v_y * u_y - D * (u_xx + u_yy)
    return u[:, None], residual[:, None]


def wave_operator(
    apply: ModelFn, X: Array, sigma_t: float = 1.0, sigma_x: float = 1.0
) -> Tuple[Array, Array]:
    """u_tt - c^2 u_xx with c = 2 (nn/pde.py:42-52). ``X = [t, x]``."""
    c = 2.0

    def f(Xp):
        return apply(Xp)[:, 0]

    u, _, (u_tt, u_xx) = _hess_cols(f, X, cols=(0, 1))
    residual = u_tt - c * c * u_xx
    return u[:, None], residual[:, None]


def klein_gordon_operator(apply: ModelFn, X: Array) -> Tuple[Array, Array]:
    """u_tt + alpha u_xx + beta u + gamma u^k, alpha=-1, beta=0, gamma=1,
    k=3 (nn/pde.py:28-41). ``X = [t, x]``."""
    alpha, beta, gamma, k = -1.0, 0.0, 1.0, 3

    def f(Xp):
        return apply(Xp)[:, 0]

    u, _, (u_tt, u_xx) = _hess_cols(f, X, cols=(0, 1))
    residual = u_tt + alpha * u_xx + beta * u + gamma * u**k
    return u[:, None], residual[:, None]


def helmholtz_operator(apply: ModelFn, X: Array) -> Tuple[Array, Array]:
    """u_x1x1 + u_x2x2 + lambda u with lambda = 1 (nn/pde.py:73-95).
    ``X = [x1, x2]``."""
    lam = 1.0

    def f(Xp):
        return apply(Xp)[:, 0]

    u, _, (u_11, u_22) = _hess_cols(f, X, cols=(0, 1))
    residual = u_11 + u_22 + lam * u
    return u[:, None], residual[:, None]


def navier_stokes_2d_operator(
    apply: ModelFn, X: Array
) -> Tuple[Array, Array, Array]:
    """Incompressible 2D Navier-Stokes residuals [continuity, f_u, f_v]
    with mu = 0.00345, rho = 1056 (nn/pde.py:2-27). ``X = [t, x, y]``;
    model outputs ``[u, v, p]``."""
    mu = 0.00345
    rho = 1056.0

    fu = lambda Xp: apply(Xp)[:, 0]
    fv = lambda Xp: apply(Xp)[:, 1]
    fp = lambda Xp: apply(Xp)[:, 2]

    u, gu, (u_xx, u_yy) = _hess_cols(fu, X, cols=(1, 2))
    v, gv, (v_xx, v_yy) = _hess_cols(fv, X, cols=(1, 2))
    _, gp = _sum_grad(fp, X)

    u_t, u_x, u_y = gu[:, 0], gu[:, 1], gu[:, 2]
    v_t, v_x, v_y = gv[:, 0], gv[:, 1], gv[:, 2]
    p_x, p_y = gp[:, 1], gp[:, 2]

    continuity = u_x + v_y
    f_u = u_t + (u * u_x + v * u_y) + p_x / rho - mu * (u_xx + u_yy)
    f_v = v_t + (u * v_x + v * v_y) + p_y / rho - mu * (v_xx + v_yy)
    return continuity[:, None], f_u[:, None], f_v[:, None]

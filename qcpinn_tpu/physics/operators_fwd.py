"""Forward-mode PDE residual operators (the fast path).

The default operators (operators.py) use vjp + linearize to reproduce
torch's sum-gradient semantics exactly — required for batch-coupled models
(the Hopfield baseline's B x B attention). For *point-decoupled* models
(every DV/CV solver: each collocation point flows through the network
independently) the Jacobian across the batch is diagonal, and pure
forward-over-forward differentiation gives identical residuals while
storing NO intermediates: no reverse pass, no transposed program, no
full-state HLO temps per gate per derivative level. On the v5e this is the
difference between bandwidth-bound triple-nested reverse-mode and a single
fused forward stream.

Semantics: identical to operators.py for point-decoupled models (tested);
do NOT use with the Classical (Hopfield) solver.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray
ModelFn = Callable[[Array], Array]


def _col_tangent(X: Array, col: int) -> Array:
    return jnp.zeros_like(X).at[:, col].set(1.0)


def _d1(f: ModelFn, X: Array, col: int) -> Tuple[Array, Array]:
    """(u, du/dcol) via one jvp."""
    return jax.jvp(f, (X,), (_col_tangent(X, col),))


def _d2(f: ModelFn, X: Array, col: int) -> Tuple[Array, Array, Array]:
    """(u, du/dcol, d2u/dcol2) via jvp-over-jvp."""
    tangent = _col_tangent(X, col)

    def g(Xp):
        return jax.jvp(f, (Xp,), (tangent,))

    (u, du), (_, d2u) = jax.jvp(g, (X,), (tangent,))
    return u, du, d2u


def diffusion_operator_fwd(
    apply: ModelFn,
    X: Array,
    sigma_t: float = 1.0,
    sigma_x: float = 1.0,
    sigma_y: float = 1.0,
    D: float = 0.01,
    v_x: float = 1.0,
    v_y: float = 1.0,
) -> Tuple[Array, Array]:
    f = lambda Xp: apply(Xp)[:, 0]
    _, u_t = _d1(f, X, 0)
    u, u_x, u_xx = _d2(f, X, 1)
    _, u_y, u_yy = _d2(f, X, 2)
    residual = (
        u_t / sigma_t
        + v_x * u_x / sigma_x
        + v_y * u_y / sigma_y
        - D * (u_xx / sigma_x**2 + u_yy / sigma_y**2)
    )
    return u[:, None], residual[:, None]


def wave_operator_fwd(apply: ModelFn, X: Array, **_) -> Tuple[Array, Array]:
    c = 2.0
    f = lambda Xp: apply(Xp)[:, 0]
    u, _, u_tt = _d2(f, X, 0)
    _, _, u_xx = _d2(f, X, 1)
    return u[:, None], (u_tt - c * c * u_xx)[:, None]


def klein_gordon_operator_fwd(apply: ModelFn, X: Array) -> Tuple[Array, Array]:
    alpha, beta, gamma, k = -1.0, 0.0, 1.0, 3
    f = lambda Xp: apply(Xp)[:, 0]
    u, _, u_tt = _d2(f, X, 0)
    _, _, u_xx = _d2(f, X, 1)
    residual = u_tt + alpha * u_xx + beta * u + gamma * u**k
    return u[:, None], residual[:, None]


def helmholtz_operator_fwd(apply: ModelFn, X: Array) -> Tuple[Array, Array]:
    lam = 1.0
    f = lambda Xp: apply(Xp)[:, 0]
    u, _, u_11 = _d2(f, X, 0)
    _, _, u_22 = _d2(f, X, 1)
    return u[:, None], (u_11 + u_22 + lam * u)[:, None]


def navier_stokes_2d_operator_fwd(
    apply: ModelFn, X: Array
) -> Tuple[Array, Array, Array]:
    mu = 0.00345
    rho = 1056.0

    # one jvp per (coordinate, order) over the full 3-output model
    f = lambda Xp: apply(Xp)

    def d2_full(col):
        tangent = _col_tangent(X, col)

        def g(Xp):
            return jax.jvp(f, (Xp,), (tangent,))

        (uvp, duvp), (_, d2uvp) = jax.jvp(g, (X,), (tangent,))
        return uvp, duvp, d2uvp

    uvp, d_t = jax.jvp(f, (X,), (_col_tangent(X, 0),))
    _, d_x, d2_x = d2_full(1)
    _, d_y, d2_y = d2_full(2)

    u, v = uvp[:, 0], uvp[:, 1]
    u_t, v_t = d_t[:, 0], d_t[:, 1]
    u_x, v_x, p_x = d_x[:, 0], d_x[:, 1], d_x[:, 2]
    u_y, v_y, p_y = d_y[:, 0], d_y[:, 1], d_y[:, 2]
    u_xx, v_xx = d2_x[:, 0], d2_x[:, 1]
    u_yy, v_yy = d2_y[:, 0], d2_y[:, 1]

    continuity = u_x + v_y
    f_u = u_t + (u * u_x + v * u_y) + p_x / rho - mu * (u_xx + u_yy)
    f_v = v_t + (u * v_x + v * v_y) + p_y / rho - mu * (v_xx + v_yy)
    return continuity[:, None], f_u[:, None], f_v[:, None]


def cz_residuals_fwd(
    apply: ModelFn,
    x: Array,
    pressure_coeff: float,
    re: float,
    pr: float,
    gr: float,
):
    """Forward-mode version of physics.cylindrical.cz_residuals."""
    f = lambda Xp: apply(Xp)

    def d2_full(col):
        tangent = _col_tangent(x, col)

        def g(Xp):
            return jax.jvp(f, (Xp,), (tangent,))

        (pred, dpred), (_, d2pred) = jax.jvp(g, (x,), (tangent,))
        return pred, dpred, d2pred

    pred, d_r, d2_r = d2_full(0)
    _, d_z, d2_z = d2_full(1)

    u_r, u_z, u_t, theta = pred[:, 0], pred[:, 1], pred[:, 2], pred[:, 4]
    ur_r, uz_r, ut_r, p_r, T_r = (d_r[:, i] for i in range(5))
    ur_z, uz_z, ut_z, p_z, T_z = (d_z[:, i] for i in range(5))
    ur_rr, uz_rr, ut_rr, T_rr = d2_r[:, 0], d2_r[:, 1], d2_r[:, 2], d2_r[:, 4]
    ur_zz, uz_zz, ut_zz, T_zz = d2_z[:, 0], d2_z[:, 1], d2_z[:, 2], d2_z[:, 4]

    r = jnp.clip(x[:, 0], min=1e-4)
    pc = pressure_coeff
    continuity = ur_r + u_r / r + uz_z
    mom_r = (
        u_r * ur_r + u_z * ur_z - (u_t**2) / r + pc * p_r
        - (1.0 / re) * (ur_rr + ur_r / r - u_r / (r**2) + ur_zz)
    )
    mom_z = (
        u_r * uz_r + u_z * uz_z + pc * p_z
        - (1.0 / re) * (uz_rr + uz_r / r + uz_zz)
        - (gr / (re**2)) * theta
    )
    swirl = (
        u_r * ut_r + u_z * ut_z + (u_r * u_t) / r
        - (1.0 / re) * (ut_rr + ut_r / r - u_t / (r**2) + ut_zz)
    )
    energy = u_r * T_r + u_z * T_z - (1.0 / (pr * re)) * (T_rr + T_r / r + T_zz)

    terms = {
        "cont": jnp.mean(continuity**2),
        "mom_r": jnp.mean(mom_r**2),
        "mom_z": jnp.mean(mom_z**2),
        "swirl": jnp.mean(swirl**2),
        "energy": jnp.mean(energy**2),
    }
    return sum(terms.values()), terms

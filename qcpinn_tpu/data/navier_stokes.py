"""Taylor-Green vortex: the analytic oracle for the Navier-Stokes 2D
problem (BASELINE.json config #5 — "CV photonic solver on Navier-Stokes
2D"). The reference defines the NS residual operator (nn/pde.py:2-27) but
never ships a runnable NS training config; this module supplies one with a
closed-form solution so relative-L2 is computable exactly, the same role
data/diffusion_dataset.py:20-38 plays for the diffusion problem.

With the reference operator's exact form
  f_u = u_t + u u_x + v u_y + p_x / rho - MU (u_xx + u_yy)
(coefficient MU directly on the Laplacian, nn/pde.py:17-21), the decaying
Taylor-Green field

  u =  -cos(x) sin(y) e^(-2 MU t)
  v =   sin(x) cos(y) e^(-2 MU t)
  p =  -(RHO / 4) (cos(2x) + cos(2y)) e^(-4 MU t)

satisfies continuity, f_u and f_v identically. Domain: (t, x, y) in
[0, 1] x [0, pi] x [0, pi].
"""

from __future__ import annotations

import jax.numpy as jnp

from .diffusion import Sampler, _box

MU = 0.00345  # nn/pde.py:17 (used as the Laplacian coefficient)
RHO = 1056.0  # nn/pde.py:18

PI = float(jnp.pi)


def uvp(X: jnp.ndarray) -> jnp.ndarray:
    """Analytic [u, v, p] for X = [t, x, y] rows -> [B, 3]."""
    t, x, y = X[:, 0], X[:, 1], X[:, 2]
    decay = jnp.exp(-2.0 * MU * t)
    u = -jnp.cos(x) * jnp.sin(y) * decay
    v = jnp.sin(x) * jnp.cos(y) * decay
    p = -(RHO / 4.0) * (jnp.cos(2 * x) + jnp.cos(2 * y)) * decay**2
    return jnp.stack([u, v, p], axis=-1)


def zero_residuals(X: jnp.ndarray) -> jnp.ndarray:
    """Residual targets [continuity, f_u, f_v] = 0."""
    return jnp.zeros((X.shape[0], 3), dtype=X.dtype)


def taylor_green_samplers() -> dict:
    """res (interior), ic (t=0), and the four spatial walls — all targets
    analytic so every term is an exact oracle."""
    return {
        "res": Sampler(_box([[0, 0, 0], [1, PI, PI]]), zero_residuals, "res"),
        "ics": Sampler(_box([[0, 0, 0], [0, PI, PI]]), uvp, "ics"),
        "bc1": Sampler(_box([[0, 0, 0], [1, 0, PI]]), uvp, "bc_x0"),
        "bc2": Sampler(_box([[0, PI, 0], [1, PI, PI]]), uvp, "bc_x1"),
        "bc3": Sampler(_box([[0, 0, 0], [1, PI, 0]]), uvp, "bc_y0"),
        "bc4": Sampler(_box([[0, 0, PI], [1, PI, PI]]), uvp, "bc_y1"),
    }


def residual_stack(operator):
    """Adapt a 3-tuple NS operator to the train loop's (u, pred) contract:
    pred = [continuity, f_u, f_v] stacked to [B, 3] (matched against
    zero_residuals targets)."""

    def op(apply, X):
        continuity, f_u, f_v = operator(apply, X)
        return None, jnp.concatenate([continuity, f_u, f_v], axis=-1)

    return op

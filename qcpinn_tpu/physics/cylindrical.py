"""Axisymmetric cylindrical Navier-Stokes + energy residuals for the
Czochralski melt (CG_HQPINN_IBMtest_16qubits.py:322-397).

Model: (r, z) -> (u_r, u_z, u_theta, p_hat, theta). Nondimensional steady
equations with Re/Pr/Gr and the dataset pressure_coeff:

  continuity: du_r/dr + u_r/r + du_z/dz
  mom_r:  u_r u_r,r + u_z u_r,z - u_t^2/r + pc p,r
          - (1/Re)(u_r,rr + u_r,r/r - u_r/r^2 + u_r,zz)
  mom_z:  u_r u_z,r + u_z u_z,z + pc p,z
          - (1/Re)(u_z,rr + u_z,r/r + u_z,zz) - (Gr/Re^2) theta
  swirl:  u_r u_t,r + u_z u_t,z + u_r u_t / r
          - (1/Re)(u_t,rr + u_t,r/r - u_t/r^2 + u_t,zz)
  energy: u_r T,r + u_z T,z - (1/(Pr Re))(T,rr + T,r/r + T,zz)

The reference takes 13 torch autograd passes per step; here each of the five
output fields gets one vjp (first derivatives) and one linearized jvp pair
(second derivatives), all fused into the jitted loss graph.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from .operators import _hess_cols, _sum_grad

Array = jnp.ndarray


def cz_residuals(
    apply: Callable[[Array], Array],
    x: Array,
    pressure_coeff: float,
    re: float,
    pr: float,
    gr: float,
) -> Tuple[Array, Dict[str, Array]]:
    """Returns (total, per-term mean-square dict) matching
    physics_loss (CG...16qubits.py:322-397)."""
    pred = apply(x)
    u_r = pred[:, 0]
    u_z = pred[:, 1]
    u_t = pred[:, 2]
    theta = pred[:, 4]
    r = jnp.clip(x[:, 0], min=1e-4)

    f_ur = lambda X: apply(X)[:, 0]
    f_uz = lambda X: apply(X)[:, 1]
    f_ut = lambda X: apply(X)[:, 2]
    f_p = lambda X: apply(X)[:, 3]
    f_T = lambda X: apply(X)[:, 4]

    _, g_ur, (ur_rr, ur_zz) = _hess_cols(f_ur, x, cols=(0, 1))
    _, g_uz, (uz_rr, uz_zz) = _hess_cols(f_uz, x, cols=(0, 1))
    _, g_ut, (ut_rr, ut_zz) = _hess_cols(f_ut, x, cols=(0, 1))
    _, g_T, (T_rr, T_zz) = _hess_cols(f_T, x, cols=(0, 1))
    _, g_p = _sum_grad(f_p, x)

    ur_r, ur_z = g_ur[:, 0], g_ur[:, 1]
    uz_r, uz_z = g_uz[:, 0], g_uz[:, 1]
    ut_r, ut_z = g_ut[:, 0], g_ut[:, 1]
    T_r, T_z = g_T[:, 0], g_T[:, 1]
    p_r, p_z = g_p[:, 0], g_p[:, 1]

    pc = pressure_coeff
    continuity = ur_r + u_r / r + uz_z
    mom_r = (
        u_r * ur_r
        + u_z * ur_z
        - (u_t**2) / r
        + pc * p_r
        - (1.0 / re) * (ur_rr + ur_r / r - u_r / (r**2) + ur_zz)
    )
    mom_z = (
        u_r * uz_r
        + u_z * uz_z
        + pc * p_z
        - (1.0 / re) * (uz_rr + uz_r / r + uz_zz)
        - (gr / (re**2)) * theta
    )
    swirl = (
        u_r * ut_r
        + u_z * ut_z
        + (u_r * u_t) / r
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
    total = sum(terms.values())
    return total, terms

"""Phase-field crystal-growth physics (hybrid_qpinn_2dcrystal_ibmtest.py).

Model outputs (u, v, p, c, phi) on (x, y); physics:

- anisotropic surface energy eps(theta) = EPS0 (1 + DELTA cos(m theta)),
  theta = atan2(phi_y, phi_x + 1e-8)                      (:196-198)
- chemical potential mu = -eps^2 lap(phi) + phi(phi^2 - 1) - 2 LAMBDA_C c phi
                                                          (:200-206)
- Stefan residual mu - LAMBDA_T c |grad phi|              (:208-210)
- crystal-growth loss = <mu^2> + <stefan^2> + <|grad phi|^2>  (:241-265)
- adaptive interface sampling: oversample candidates with |phi| < 0.1
  (:216-235), topped up with uniform draws.

Derivatives use the same sum-gradient (torch grad_outputs=ones) semantics as
the reference: grads = d(sum over outputs)/dx — note the reference
differentiates the SUM OF ALL FIVE OUTPUTS at once (:245-248), so phi_x here
is really d(u+v+p+c+phi)/dx; reproduced exactly (documented quirk).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

EPS0 = 0.01
DELTA_ANISO = 0.05
ANISO_M = 4
LAMBDA_C = 1.0
LAMBDA_T = 1.0


def anisotropic_epsilon(phi_x: Array, phi_y: Array) -> Array:
    theta = jnp.arctan2(phi_y, phi_x + 1e-8)
    return EPS0 * (1.0 + DELTA_ANISO * jnp.cos(ANISO_M * theta))


def phase_field_mu(phi, phi_x, phi_y, lap_phi, c) -> Array:
    eps = anisotropic_epsilon(phi_x, phi_y)
    return -(eps**2) * lap_phi + phi * (phi**2 - 1.0) - 2.0 * LAMBDA_C * c * phi


def stefan_residual(mu, phi_x, phi_y, c) -> Array:
    grad_norm = jnp.sqrt(phi_x**2 + phi_y**2 + 1e-8)
    return mu - LAMBDA_T * c * grad_norm


def crystal_growth_loss(apply: Callable[[Array], Array], x: Array) -> Array:
    """The reference's loss (:241-265), with its exact derivative semantics:
    gradients of the SUM of all outputs wrt x."""

    def f_sum(Xp):
        return jnp.sum(apply(Xp), axis=1)  # sum over the 5 outputs per point

    out = apply(x)
    c = out[:, 3]
    phi = out[:, 4]

    def grad_map(Xp):
        u, vjp_fn = jax.vjp(f_sum, Xp)
        (g,) = vjp_fn(jnp.ones_like(u))
        return g

    g, lin = jax.linearize(grad_map, x)
    phi_x, phi_y = g[:, 0], g[:, 1]
    lap_phi = (
        lin(jnp.zeros_like(x).at[:, 0].set(1.0))[:, 0]
        + lin(jnp.zeros_like(x).at[:, 1].set(1.0))[:, 1]
    )

    mu = phase_field_mu(phi, phi_x, phi_y, lap_phi, c)
    stefan = stefan_residual(mu, phi_x, phi_y, c)
    return (
        jnp.mean(mu**2)
        + jnp.mean(stefan**2)
        + jnp.mean(phi_x**2 + phi_y**2)
    )


def adaptive_interface_sampling(
    apply: Callable[[Array], Array],
    key: jax.Array,
    n_bulk: int = 32,
    n_interface: int = 64,
    threshold: float = 0.1,
    candidate_factor: int = 5,
) -> Array:
    """Oversample near the solid-liquid interface |phi| < threshold
    (:216-235). Jit-compatible: candidates are ranked by |phi| and the
    n_interface smallest are kept (equivalent coverage to the reference's
    mask-then-top-up, but static-shaped)."""
    k_bulk, k_cand = jax.random.split(key)
    x_bulk = jax.random.uniform(k_bulk, (n_bulk, 2))
    x_cand = jax.random.uniform(k_cand, (candidate_factor * n_interface, 2))
    phi = apply(x_cand)[:, 4]
    score = jnp.where(jnp.abs(phi) < threshold, jnp.abs(phi), jnp.abs(phi) + 1e3)
    idx = jnp.argsort(score)[:n_interface]
    return jnp.concatenate([x_bulk, x_cand[idx]], axis=0)

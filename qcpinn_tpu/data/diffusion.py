"""Convection-diffusion analytic solutions, forcing, and samplers.

Two exact solutions exist in the reference and both are reproduced here to
numerical tolerance (BASELINE requirement):

1. Gaussian pulse (data/diffusion_dataset.py:20-38):
   u = exp(-100((x-0.5)^2 + (y-0.5)^2)) * exp(-t), with closed-form partials
   and forcing r = u_t + v.grad(u) - D lap(u).
2. Separable sine (train_hybrid_qpinn.py:116-131):
   u = sin(pi x) sin(pi y) exp(-2 pi^2 D t), which solves the *pure*
   diffusion equation u_t = D lap(u) with zero Dirichlet boundaries.

Samplers are pure-functional: uniform draws over a coordinate hyper-rectangle
keyed by a JAX PRNG key (replacing torch.rand in
data/diffusion_dataset.py:12-19).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

DEFAULT_D = 0.01
DEFAULT_V_X = 1.0
DEFAULT_V_Y = 1.0


# -- Gaussian-pulse solution (data/diffusion_dataset.py:20-38) ----------------

def u(txy: Array) -> Array:
    t = txy[:, 0:1]
    x = txy[:, 1:2]
    y = txy[:, 2:3]
    return jnp.exp(-100.0 * ((x - 0.5) ** 2 + (y - 0.5) ** 2)) * jnp.exp(-t)


def u_t(txy: Array) -> Array:
    return -u(txy)


def u_x(txy: Array) -> Array:
    return -200.0 * (txy[:, 1:2] - 0.5) * u(txy)


def u_y(txy: Array) -> Array:
    return -200.0 * (txy[:, 2:3] - 0.5) * u(txy)


def u_xx(txy: Array) -> Array:
    """NOTE: matches the *reference formula* (data/diffusion_dataset.py:31-32)
    verbatim for parity. The reference's constant is wrong: the true second
    partial of exp(-100 (x-1/2)^2) has -200, not -400 — so the reference's
    forcing ``r`` is NOT the residual of its own analytic solution (its
    training target is inconsistent by exactly ``+400 D u``, verified by
    autodiff). Use :func:`u_xx_true` / :func:`r_true` for correct physics."""
    return (40000.0 * (txy[:, 1:2] - 0.5) ** 2 - 400.0) * u(txy)


def u_yy(txy: Array) -> Array:
    """Reference-parity formula; see :func:`u_xx` for the defect note."""
    return (40000.0 * (txy[:, 2:3] - 0.5) ** 2 - 400.0) * u(txy)


def u_xx_true(txy: Array) -> Array:
    return (40000.0 * (txy[:, 1:2] - 0.5) ** 2 - 200.0) * u(txy)


def u_yy_true(txy: Array) -> Array:
    return (40000.0 * (txy[:, 2:3] - 0.5) ** 2 - 200.0) * u(txy)


def r(
    txy: Array,
    D: float = DEFAULT_D,
    v_x: float = DEFAULT_V_X,
    v_y: float = DEFAULT_V_Y,
) -> Array:
    """Reference-parity forcing (data/diffusion_dataset.py:35-38). Because it
    uses the reference's wrong second partials (see :func:`u_xx`), this
    exceeds the true residual of the analytic u by ``+400 D u``."""
    return u_t(txy) + v_x * u_x(txy) + v_y * u_y(txy) - D * (u_xx(txy) + u_yy(txy))


def r_true(
    txy: Array,
    D: float = DEFAULT_D,
    v_x: float = DEFAULT_V_X,
    v_y: float = DEFAULT_V_Y,
) -> Array:
    """The actual forcing of the analytic solution: the PINN residual of the
    exact u equals this (verified by autodiff in tests)."""
    return (
        u_t(txy)
        + v_x * u_x(txy)
        + v_y * u_y(txy)
        - D * (u_xx_true(txy) + u_yy_true(txy))
    )


# -- Separable sine solution (train_hybrid_qpinn.py:116-131) ------------------

def u_sine(txy: Array, D: float = DEFAULT_D) -> Array:
    t = txy[:, 0:1]
    x = txy[:, 1:2]
    y = txy[:, 2:3]
    pi = jnp.pi
    return jnp.sin(pi * x) * jnp.sin(pi * y) * jnp.exp(-2.0 * pi**2 * D * t)


def zero_target(txy: Array) -> Array:
    return jnp.zeros((txy.shape[0], 1), dtype=txy.dtype)


# -- Samplers ------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Sampler:
    """Uniform sampler over a hyper-rectangle with a target function.

    ``coords`` is ``[2, dim]``: row 0 = mins, row 1 = maxs
    (data/diffusion_dataset.py:5-19)."""

    coords: np.ndarray  # static, [2, dim] float32
    func: Callable[[Array], Array]
    name: Optional[str] = None

    @property
    def dim(self) -> int:
        return self.coords.shape[1]

    def sample(self, key: jax.Array, n: int) -> tuple[Array, Array]:
        lo = jnp.asarray(self.coords[0:1, :], dtype=jnp.float32)
        hi = jnp.asarray(self.coords[1:2, :], dtype=jnp.float32)
        rand = jax.random.uniform(key, (n, self.dim), dtype=jnp.float32)
        x = lo + (hi - lo) * rand
        return x, self.func(x)


@dataclasses.dataclass(frozen=True)
class MixtureSampler:
    """Uniform/focused mixture sampler for sharply-localized solutions.

    The Gaussian-pulse target (data/diffusion_dataset.py:20-24) has
    sigma ~= 0.07: uniform collocation puts ~1.5% of draws inside the pulse,
    so at B=256 each step sees ~4 informative residual points — the
    round-1 accuracy plateau. A ``frac`` fraction of each batch is drawn
    from a truncated Gaussian around ``focus`` instead (the same adaptive-
    sampling idea the reference applies at phase-field interfaces,
    hybrid_qpinn_2dcrystal_ibmtest.py:216-235). Dims with ``sigma <= 0``
    stay uniform. Targets are exact either way; only the training
    distribution changes, so the uniform-grid rel-L2 metric is unaffected.
    """

    coords: np.ndarray  # [2, dim]
    func: Callable[[Array], Array]
    focus: np.ndarray  # [dim]
    sigma: np.ndarray  # [dim]; <= 0 -> uniform in that dim
    frac: float = 0.5
    name: Optional[str] = None

    @property
    def dim(self) -> int:
        return self.coords.shape[1]

    def sample(self, key: jax.Array, n: int) -> tuple[Array, Array]:
        ku, kg = jax.random.split(key)
        lo = jnp.asarray(self.coords[0:1, :], dtype=jnp.float32)
        hi = jnp.asarray(self.coords[1:2, :], dtype=jnp.float32)
        x_uni = lo + (hi - lo) * jax.random.uniform(
            ku, (n, self.dim), dtype=jnp.float32
        )
        mu = jnp.asarray(self.focus, dtype=jnp.float32)[None, :]
        sd = jnp.asarray(self.sigma, dtype=jnp.float32)[None, :]
        x_foc = jnp.clip(
            mu + sd * jax.random.normal(kg, (n, self.dim), dtype=jnp.float32),
            lo,
            hi,
        )
        use_foc = (
            jnp.arange(n, dtype=jnp.float32)[:, None] < self.frac * n
        ) & (sd > 0.0)
        x = jnp.where(use_foc, x_foc, x_uni)
        return x, self.func(x)


def pulse_residual_sampler(
    frac: float = 0.5, sigma: float = 0.12, func: Optional[Callable] = None
) -> MixtureSampler:
    """Residual sampler focused on the Gaussian pulse at (x, y) = (.5, .5).

    Defaults to the *consistent* forcing :func:`r_true`; pass ``func=r``
    explicitly for reference-defect parity experiments (see :func:`u_xx`)."""
    if func is None:
        func = r_true
    return MixtureSampler(
        _box([[0, 0, 0], [1, 1, 1]]),
        func,
        focus=np.array([0.5, 0.5, 0.5], dtype=np.float32),
        sigma=np.array([-1.0, sigma, sigma], dtype=np.float32),
        frac=frac,
        name="Forcing (pulse-focused)",
    )


def _box(rows) -> np.ndarray:
    return np.asarray(rows, dtype=np.float32)


def gaussian_pulse_samplers() -> dict[str, Sampler]:
    """Canonical IC/BC/domain boxes (data/diffusion_dataset.py:39-57):
    IC at t=0; Dirichlet boundaries at x=0 and x=1; forcing over the cube."""
    return {
        "ics": Sampler(_box([[0, 0, 0], [0, 1, 1]]), u, "Initial Condition"),
        "bc1": Sampler(_box([[0, 0, 0], [1, 0, 1]]), u, "Dirichlet BC1"),
        "bc2": Sampler(_box([[0, 1, 0], [1, 1, 1]]), u, "Dirichlet BC2"),
        "res": Sampler(_box([[0, 0, 0], [1, 1, 1]]), r, "Forcing"),
    }


def sine_samplers(D: float = DEFAULT_D) -> dict[str, Sampler]:
    """train_hybrid_qpinn.py:159-200: IC from the analytic solution, four
    zero-Dirichlet boundaries, zero-residual domain sampler."""
    ic_fn = lambda X: u_sine(X, D)
    return {
        "ics": Sampler(_box([[0, 0, 0], [0, 1, 1]]), ic_fn, "Initial Condition"),
        "bc1": Sampler(_box([[0, 0, 0], [1, 0, 1]]), zero_target, "x=0"),
        "bc2": Sampler(_box([[0, 1, 0], [1, 1, 1]]), zero_target, "x=1"),
        "bc3": Sampler(_box([[0, 0, 0], [1, 1, 0]]), zero_target, "y=0"),
        "bc4": Sampler(_box([[0, 0, 1], [1, 1, 1]]), zero_target, "y=1"),
        "res": Sampler(_box([[0, 0, 0], [1, 1, 1]]), zero_target, "Residual"),
    }

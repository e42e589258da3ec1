"""Minimal pure-functional NN building blocks (params = pytrees of arrays).

Deliberately not flax/haiku: PDE operators take vjp/jvp through whole models,
and plain ``init(key) -> params`` / ``apply(params, x)`` pairs keep those
transforms transparent. Initialization matches the reference:
``xavier_normal_`` weights + zero bias (nn/DVPDESolver.py:69-76,
nn/ClassicalSolver.py:51-56).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def linear_init(key: jax.Array, in_dim: int, out_dim: int, bias: bool = True) -> dict:
    """Xavier-normal weight (std = sqrt(2/(in+out)), torch convention),
    zero bias."""
    std = math.sqrt(2.0 / (in_dim + out_dim))
    params = {"w": std * jax.random.normal(key, (in_dim, out_dim), dtype=jnp.float32)}
    if bias:
        params["b"] = jnp.zeros((out_dim,), dtype=jnp.float32)
    return params


def linear_apply(params: dict, x: Array) -> Array:
    # HIGHEST precision: second-order PDE residuals amplify bf16 rounding.
    y = jnp.dot(
        x,
        params["w"],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if "b" in params:
        y = y + params["b"]
    return y


def mlp_init(key: jax.Array, dims: Sequence[int]) -> list:
    keys = jax.random.split(key, len(dims) - 1)
    return [linear_init(k, dims[i], dims[i + 1]) for i, k in enumerate(keys)]


def mlp_apply(params: list, x: Array, final_activation: bool = False) -> Array:
    """Linear -> Tanh -> ... -> Linear (tanh between layers, like the
    reference's Sequential(Linear, Tanh, Linear) stacks)."""
    n = len(params)
    for i, layer in enumerate(params):
        x = linear_apply(layer, x)
        if i < n - 1 or final_activation:
            x = jnp.tanh(x)
    return x


def layernorm_init(dim: int) -> dict:
    return {
        "gamma": jnp.ones((dim,), dtype=jnp.float32),
        "beta": jnp.zeros((dim,), dtype=jnp.float32),
    }


def layernorm_apply(params: dict, x: Array, eps: float = 1e-5) -> Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return params["gamma"] * (x - mean) * jax.lax.rsqrt(var + eps) + params["beta"]


def fourier_features_init(
    key: jax.Array, in_dim: int, mapping_size: int, scale: float
) -> dict:
    """Random Fourier feature matrix B ~ N(0,1)*scale — a fixed (non-trained)
    buffer, as in CG_HQPINN_IBMtest_16qubits.py:52-59."""
    return {"B": scale * jax.random.normal(key, (in_dim, mapping_size), dtype=jnp.float32)}


def fourier_features_apply(params: dict, x: Array) -> Array:
    proj = 2.0 * jnp.pi * jnp.dot(x, jax.lax.stop_gradient(params["B"]))
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def rbf_init(
    key: jax.Array,
    in_dim: int,
    count: int,
    centers: Array | None = None,
    width: float = 8.0,
    lo: float = 0.0,
    hi: float = 1.0,
    out_dim: int = 1,
) -> dict:
    """Anisotropic Gaussian-RBF head parameters.

    Each unit contributes ``a_k * exp(-sum_d (w_kd (x_d - c_kd))^2
    - sum_d v_kd x_d)`` — an exponential of a learnable quadratic, so a
    single unit can represent separable Gaussian pulses exactly (including
    an exp(-lambda*t) decay factor via the linear term ``v``). ``centers``
    overrides the uniform draw (see :func:`rbf_centers_from_samples` for
    the data-driven init)."""
    kc, kw = jax.random.split(key)
    if centers is None:
        centers = lo + (hi - lo) * jax.random.uniform(
            kc, (count, in_dim), dtype=jnp.float32
        )
    return {
        "c": jnp.asarray(centers, dtype=jnp.float32),
        "w": width
        * (1.0 + 0.25 * jax.random.normal(kw, (count, in_dim), dtype=jnp.float32)),
        "v": jnp.zeros((count, in_dim), dtype=jnp.float32),
        "a": jnp.full((count, out_dim), 0.1, dtype=jnp.float32),
    }


def rbf_centers_from_samples(
    key: jax.Array, X: Array, weights: Array, count: int, jitter: float = 0.02
) -> Array:
    """Draw RBF centers from sample points with probability proportional to
    ``|weights|`` (e.g. |forcing| at collocation points) — the localized-
    feature analog of the reference's adaptive interface sampling
    (hybrid_qpinn_2dcrystal_ibmtest.py:216-235)."""
    kp, kj = jax.random.split(key)
    w = jnp.abs(weights).reshape(-1)
    idx = jax.random.choice(kp, X.shape[0], (count,), p=w / jnp.sum(w))
    return X[idx] + jitter * jax.random.normal(kj, (count, X.shape[1]))


def rbf_apply(params: dict, x: Array) -> Array:
    """[B, in] -> [B, out] additive head value (out from a's trailing dim;
    a 1-D ``a`` yields [B, 1])."""
    d = x[:, None, :] - params["c"][None, :, :]
    q = jnp.sum((params["w"][None, :, :] * d) ** 2, axis=-1) + jnp.sum(
        params["v"][None, :, :] * x[:, None, :], axis=-1
    )
    # the learnable linear term v.x is unbounded below; clamp the exponent
    # so a few bad optimizer steps on v cannot overflow exp(-q) to inf and
    # poison training (normal operation never approaches the clamp)
    out = jnp.exp(-jnp.maximum(q, -30.0)) @ params["a"]
    return out[:, None] if out.ndim == 1 else out


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


def count_trainable(params) -> int:
    """count_params minus non-trainable buffers.

    The Fourier-feature matrix params['ff']['B'] is drawn once at init and
    never updated (fourier_features_init); the reference's documented model
    sizes (cg-hqpinn/diagnostics/readme.md:1 — 126,021 at 3 layers, 125,973
    at the 2-layer CLI default) count trainable parameters only.
    """
    total = count_params(params)
    ff = params.get("ff") if isinstance(params, dict) else None
    if isinstance(ff, dict) and "B" in ff:
        total -= int(ff["B"].size)
    return total

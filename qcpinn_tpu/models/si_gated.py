"""SI-gated hybrid head and the coupled adaptive loss balancer
(hybrid_testing/modified_qpinn_cg.py).

- SI gating (:101-124): h = tanh(W h0); m, n = sigmoid gates;
  h <- h*m + (1-h)*n — a stabilized post-quantum feature mixer.
- CoupledAdaptiveWeighting (:142-156): uncertainty weighting with a FIXED
  data:physics noise ratio — one learnable log_eps_data, physics eps tied
  at sqrt(target_ratio) times it:
  L = 0.5/eps_d^2 * L_data + 0.5/eps_p^2 * L_phys + log(eps_d eps_p).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from . import nn_core as nc

Array = jnp.ndarray


def si_gated_head_init(key: jax.Array, in_dim: int, hidden: int, out_dim: int) -> dict:
    ks = jax.random.split(key, 4)
    return {
        "post_dense": nc.linear_init(ks[0], in_dim, hidden),
        "gate_m": nc.linear_init(ks[1], hidden, hidden),
        "gate_n": nc.linear_init(ks[2], hidden, hidden),
        "out": nc.linear_init(ks[3], hidden, out_dim),
    }


def si_gated_head_apply(params: dict, q_out: Array) -> Array:
    h = jnp.tanh(nc.linear_apply(params["post_dense"], q_out))
    m = jax.nn.sigmoid(nc.linear_apply(params["gate_m"], h))
    n = jax.nn.sigmoid(nc.linear_apply(params["gate_n"], h))
    h = h * m + (1.0 - h) * n
    return nc.linear_apply(params["out"], h)


def coupled_weighting_init() -> dict:
    return {"log_eps_data": jnp.zeros((1,), dtype=jnp.float32)}


def coupled_weighting_apply(
    params: dict, l_data: Array, l_phys: Array, target_ratio: float = 100.0
) -> Array:
    eps_data = jnp.exp(params["log_eps_data"][0])
    eps_phys = eps_data * math.sqrt(target_ratio)
    return (
        0.5 / (eps_data**2) * l_data
        + 0.5 / (eps_phys**2) * l_phys
        + jnp.log(eps_data * eps_phys)
    )

"""Composite physics-informed losses and adaptive balancers.

- Fixed weighting: L = w_r L_res + w_bc L_bc + w_ic L_ic, default (2, 4, 2)
  (trainer/diffusion_train.py:47); train_hybrid_qpinn uses the same triple,
  trainer/train.py uses (1, 5, 5).
- EMAWeights: normalized-magnitude EMA balancer
  (CG_HQPINN_IBMtest_16qubits.py:408-423), jit-compatible.
- Uncertainty (homoscedastic) balancer: sum exp(-s_k) L_k + s_k with
  learnable log-variances s_k (si_q_pinn_improved.py:143-164).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

Array = jnp.ndarray


def mse(pred: Array, target: Array) -> Array:
    return jnp.mean((pred - target) ** 2)


def weighted_sum(losses: Dict[str, Array], weights: Dict[str, float]) -> Array:
    total = 0.0
    for k, v in losses.items():
        total = total + weights.get(k, 1.0) * v
    return total


def ema_weights_init(names) -> Dict[str, Array]:
    return {k: jnp.asarray(1.0, dtype=jnp.float32) for k in names}


def ema_weights_update(
    state: Dict[str, Array], losses: Dict[str, Array], beta: float = 0.95
) -> Dict[str, Array]:
    """EMA of each term's magnitude relative to the mean term magnitude
    (CG_HQPINN_IBMtest_16qubits.py:413-422). Uses lax.stop_gradient-free
    scalar values — call on detached losses."""
    avg = jnp.maximum(
        sum(losses.values()) / max(len(losses), 1), jnp.asarray(1e-12)
    )
    new = {}
    for k, v in losses.items():
        target = v / avg
        new[k] = beta * state[k] + (1.0 - beta) * target
    return new


def uncertainty_init(names) -> Dict[str, Array]:
    """Learnable log-variances, one per loss term (init 0)."""
    return {k: jnp.asarray(0.0, dtype=jnp.float32) for k in names}


def uncertainty_combine(log_vars: Dict[str, Array], losses: Dict[str, Array]) -> Array:
    """sum_k exp(-s_k) L_k + s_k (si_q_pinn_improved.py:143-164)."""
    total = 0.0
    for k, loss in losses.items():
        s = log_vars[k]
        total = total + jnp.exp(-s) * loss + s
    return total


def relative_l2(pred: Array, target: Array, eps: float = 1e-12) -> Array:
    """||pred - target||_2 / ||target||_2 — the reference's evaluation metric
    (trainer/diffusion_hybrid_trainer.py:176-184)."""
    num = jnp.sqrt(jnp.sum((pred - target) ** 2))
    den = jnp.sqrt(jnp.sum(target**2) + eps)
    return num / den

"""SPSA: simultaneous-perturbation stochastic approximation — 2 loss
evaluations per step regardless of parameter count, the reference's
hardware-efficient gradient mode
(cg-hqpinn/CG_HQPINN_IBMtest_16q_effective.py:484-512,
hybrid_qpinn_2dcrystal_ibmtest.py:271-294).

Both reference variants are provided:
- `spsa_step`: decaying gains a_k = a/k^alpha, c_k = c/k^gamma (the 16q
  pipeline), applied to a params *pytree* with Rademacher perturbations.
- constant-gain behaviour falls out of alpha=gamma=0.

The loss function may be stochastic (shot-sampled) — SPSA only needs zeroth-
order evaluations, which is exactly why the reference uses it on hardware.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class SPSAConfig:
    a: float = 0.1
    c: float = 0.02
    alpha: float = 0.602
    gamma: float = 0.101


def _rademacher_like(key: jax.Array, tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    deltas = [
        (jax.random.randint(k, l.shape, 0, 2).astype(l.dtype) * 2.0 - 1.0)
        for k, l in zip(keys, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, deltas)


def spsa_step(
    loss_fn: Callable,
    params,
    k: jnp.ndarray,
    key: jax.Array,
    cfg: SPSAConfig = SPSAConfig(),
    has_aux: bool = False,
    lr_scale: "jnp.ndarray | float" = 1.0,
) -> Tuple:
    """One SPSA update on a params pytree. ``loss_fn(params, key) -> scalar``
    (the key lets shot-sampled losses stay reproducible). ``k`` is the
    1-based step counter. Returns ``(new_params, mean loss)`` — or a
    3-tuple with ``has_aux=True``, below. Jit-compatible.

    With ``has_aux=True``, ``loss_fn`` returns ``(scalar, aux)`` and the
    step returns ``(new_params, mean loss, aux)`` where aux is the
    leaf-wise mean of the two perturbed evaluations — per-term metrics at
    the SPSA 2-evaluations-per-step hardware budget (no third evaluation;
    the ±c_k average matches the unperturbed value to O(c_k²)).
    """
    kf = k.astype(jnp.float32)
    # lr_scale lets an outer scheduler (e.g. plateau) modulate the gain on
    # top of the decaying a_k — same role scale_updates plays for Adam
    ak = lr_scale * cfg.a / (kf**cfg.alpha)
    ck = cfg.c / (kf**cfg.gamma)

    k_delta, k_plus, k_minus = jax.random.split(key, 3)
    delta = _rademacher_like(k_delta, params)

    plus = jax.tree_util.tree_map(lambda p, d: p + ck * d, params, delta)
    minus = jax.tree_util.tree_map(lambda p, d: p - ck * d, params, delta)
    if has_aux:
        loss_plus, aux_plus = loss_fn(plus, k_plus)
        loss_minus, aux_minus = loss_fn(minus, k_minus)
    else:
        loss_plus = loss_fn(plus, k_plus)
        loss_minus = loss_fn(minus, k_minus)

    ghat = (loss_plus - loss_minus) / (2.0 * ck)
    # reference divides by d elementwise; d in {-1, +1} so /d == *d
    new_params = jax.tree_util.tree_map(
        lambda p, d: p - ak * ghat * d, params, delta
    )
    mean_loss = (loss_plus + loss_minus) / 2.0
    if has_aux:
        aux = jax.tree_util.tree_map(
            lambda a, b: (a + b) / 2.0, aux_plus, aux_minus
        )
        return new_params, mean_loss, aux
    return new_params, mean_loss


def make_spsa_trainer(loss_fn: Callable, cfg: SPSAConfig = SPSAConfig()):
    """jitted (params, k, key) -> (params, loss) closure."""

    @jax.jit
    def step(params, k, key):
        return spsa_step(loss_fn, params, k, key, cfg)

    return step

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


def split_params(params: dict, quantum_keys=("q",)) -> Tuple[dict, dict]:
    """Partition a top-level params dict into (quantum, classical) parts.

    Models in this framework keep their quantum weights under a top-level
    key (DVSolver/Hybrid16QPINN/CrystalPINN: ``"q"``) — the same structural
    boundary the reference draws when it hands ``[model.q_layer.weights]``
    to SPSA and everything else to Adam
    (cg-hqpinn/CG_HQPINN_IBMtest_16q_effective.py:700-748)."""
    q = {k: v for k, v in params.items() if k in quantum_keys}
    c = {k: v for k, v in params.items() if k not in quantum_keys}
    return q, c


def spsa_split_step(
    loss_fn: Callable,
    params: dict,
    k: jnp.ndarray,
    key: jax.Array,
    cfg: SPSAConfig,
    optimizer,
    opt_state,
    quantum_keys=("q",),
    has_aux: bool = False,
    lr_scale: "jnp.ndarray | float" = 1.0,
) -> Tuple:
    """The reference's split update (cg-hqpinn/...16q_effective.py:727-748):
    quantum weights move by SPSA (2 zeroth-order loss evaluations, both
    perturbing ONLY the quantum leaves), while the classical weights get a
    first-order optax (Adam) step from a backprop gradient taken at the
    unperturbed point with the quantum leaves held fixed — the reference's
    third evaluation, ``loss.backward()`` through the classical modules
    while the hardware quantum output carries no grad_fn.

    Cost: 3 loss evaluations per step (2 SPSA + 1 value_and_grad), exactly
    the reference's epoch-inner structure. Per-term metrics (``has_aux``)
    ride the unperturbed evaluation. Returns
    ``(new_params, new_opt_state, loss[, aux])``. ``optimizer`` must have
    been ``init``-ed on the classical partition only.
    """
    kf = k.astype(jnp.float32)
    ak = lr_scale * cfg.a / (kf**cfg.alpha)
    ck = cfg.c / (kf**cfg.gamma)

    k_delta, k_plus, k_minus, k_grad = jax.random.split(key, 4)
    q_params, c_params = split_params(params, quantum_keys)
    delta = _rademacher_like(k_delta, q_params)

    def merged(q, c):
        out = dict(c)
        out.update(q)
        return out

    def eval_loss(p, kk):
        out = loss_fn(p, kk)
        return out[0] if has_aux else out

    plus = jax.tree_util.tree_map(lambda p, d: p + ck * d, q_params, delta)
    minus = jax.tree_util.tree_map(lambda p, d: p - ck * d, q_params, delta)
    loss_plus = eval_loss(merged(plus, c_params), k_plus)
    loss_minus = eval_loss(merged(minus, c_params), k_minus)
    ghat = (loss_plus - loss_minus) / (2.0 * ck)
    new_q = jax.tree_util.tree_map(
        lambda p, d: p - ak * ghat * d, q_params, delta
    )

    # classical backprop step at the unperturbed point; stop_gradient on the
    # quantum leaves so this is d(loss)/d(classical) with quantum frozen —
    # on shot-sampled forwards the measurement is already non-differentiable,
    # reproducing the reference's hardware behaviour (gradients reach the
    # post-quantum head, not through the circuit)
    def c_loss(c):
        frozen_q = jax.tree_util.tree_map(jax.lax.stop_gradient, q_params)
        return loss_fn(merged(frozen_q, c), k_grad)

    if has_aux:
        (loss0, aux), c_grads = jax.value_and_grad(c_loss, has_aux=True)(c_params)
    else:
        loss0, c_grads = jax.value_and_grad(c_loss)(c_params)
    updates, opt_state = optimizer.update(c_grads, opt_state, c_params)
    updates = jax.tree_util.tree_map(lambda u: lr_scale * u, updates)
    import optax as _optax

    new_c = _optax.apply_updates(c_params, updates)

    new_params = merged(new_q, new_c)
    if has_aux:
        return new_params, opt_state, loss0, aux
    return new_params, opt_state, loss0


def make_spsa_trainer(loss_fn: Callable, cfg: SPSAConfig = SPSAConfig()):
    """jitted (params, k, key) -> (params, loss) closure."""

    @jax.jit
    def step(params, k, key):
        return spsa_step(loss_fn, params, k, key, cfg)

    return step

"""Staged training: classical-only pretrain, then quantum layer-wise
fine-tuning with gradient masking, adaptive shot scheduling, and noise-aware
early stopping (test_hqpinn_cg.py:180-280).

- Stage 1: freeze the quantum block, train the classical sandwich.
- Stage 2: for each quantum layer in REVERSE order (:227): train with all
  gradients masked except that layer's, under shot noise; estimate the loss
  noise floor sigma from repeated evaluations (:205-210); stop the layer
  when improvement < 2 sigma (:266-273); double the shots (512 -> ... ->
  4096) and retry, declaring convergence when shots are exhausted
  (:275-280).

Stage 2's losses MUST differentiate through the parameter-shift estimator
(the reference fine-tunes via param-shift, test_hqpinn_cg.py:233-254):
gradients through the plain shot-sampled measurement are identically zero
(ops/measure.py stop_gradient), so a naive shots= loss silently applies
zero updates. Build the loss with :func:`make_hw_data_loss` (or any loss
over a solver's ``hw_apply_fn``) so masked quantum gradients are real.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass
class StagedConfig:
    classical_epochs: int = 300
    layer_epochs: int = 40
    lr_classical: float = 1e-3
    lr_quantum: float = 1e-3
    initial_shots: int = 512
    max_shots: int = 4096
    shots_factor: int = 2
    noise_evals: int = 5
    noise_sigma_factor: float = 2.0
    seed: int = 0


def _masked_adam_step(optimizer, loss_and_grad, params, opt_state, mask):
    loss, grads = loss_and_grad(params)
    grads = jax.tree_util.tree_map(
        lambda g, m: g * jnp.asarray(m, g.dtype), grads, mask
    )
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def train_classical_only(
    loss_fn: Callable,
    params: dict,
    quantum_key: str = "q",
    cfg: StagedConfig = StagedConfig(),
    logger=None,
) -> Tuple[dict, List[float]]:
    """Stage 1 (:180-199): Adam on everything except the quantum params.
    ``loss_fn(params, key) -> scalar`` (exact mode)."""
    mask = jax.tree_util.tree_map_with_path(
        lambda path, _: path[0].key != quantum_key, params
    )
    optimizer = optax.adam(cfg.lr_classical)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, key):
        return _masked_adam_step(
            optimizer,
            lambda p: jax.value_and_grad(loss_fn)(p, key),
            params,
            opt_state,
            mask,
        )

    key = jax.random.PRNGKey(cfg.seed)
    history = []
    q_before = params[quantum_key]
    for epoch in range(cfg.classical_epochs):
        params, opt_state, loss = step(params, opt_state, jax.random.fold_in(key, epoch))
        history.append(float(loss))
        if logger is not None and (epoch % 50 == 0 or epoch == cfg.classical_epochs - 1):
            logger.print(f"[classical] epoch {epoch}: loss={history[-1]:.4e}")
    # invariant, not just intent: quantum params untouched
    np.testing.assert_array_equal(np.asarray(params[quantum_key]), np.asarray(q_before))
    return params, history


def make_hw_data_loss(hw_apply_fn: Callable, X, Y) -> Callable:
    """Build ``make_loss(shots)`` for :func:`train_quantum_layerwise` from a
    solver's hardware-apply factory (e.g. ``DVSolver.hw_apply_fn``): the
    returned losses evaluate under shot noise AND differentiate via the
    parameter-shift rules, so the layer-masked quantum gradients are real."""

    def make_loss(shots):
        apply = hw_apply_fn(shots)

        def loss(params, key):
            return jnp.mean((apply(params, X, key) - Y) ** 2)

        return loss

    return make_loss


def estimate_loss_noise(
    loss_fn: Callable, params: dict, key: jax.Array, n_evals: int = 5
) -> Tuple[float, float]:
    """Empirical (mean, sigma) of the shot-sampled loss (:205-210)."""
    vals = [
        float(loss_fn(params, jax.random.fold_in(key, i))) for i in range(n_evals)
    ]
    return float(np.mean(vals)), float(np.std(vals))


def _layer_mask(params: dict, quantum_key: str, layer_idx: int) -> dict:
    """Gradient mask: ONLY quantum layer `layer_idx` trains (:241-254)."""

    def build(path, leaf):
        if path[0].key != quantum_key:
            return jnp.zeros_like(leaf, dtype=jnp.float32)
        m = jnp.zeros_like(leaf, dtype=jnp.float32)
        return m.at[layer_idx].set(1.0)

    return jax.tree_util.tree_map_with_path(build, params)


def train_quantum_layerwise(
    make_loss: Callable[[int], Callable],
    params: dict,
    num_layers: int,
    quantum_key: str = "q",
    cfg: StagedConfig = StagedConfig(),
    logger=None,
) -> Tuple[dict, List[dict]]:
    """Stage 2 (:216-280). ``make_loss(shots)`` returns
    ``loss_fn(params, key) -> scalar`` under that shot budget. Layers are
    trained last-first; per layer, shots escalate 512 -> 4096 (x2) with
    noise-aware early stopping at each level."""

    def log(msg):
        if logger is not None:
            logger.print(msg)

    key = jax.random.PRNGKey(cfg.seed + 100)
    report = []
    for layer_idx in reversed(range(num_layers)):
        mask = _layer_mask(params, quantum_key, layer_idx)
        shots = cfg.initial_shots
        layer_log = {"layer": layer_idx, "levels": []}
        while True:
            loss_fn = make_loss(shots)
            optimizer = optax.adam(cfg.lr_quantum)
            opt_state = optimizer.init(params)

            @jax.jit
            def step(params, opt_state, key):
                return _masked_adam_step(
                    optimizer,
                    lambda p: jax.value_and_grad(loss_fn)(p, key),
                    params,
                    opt_state,
                    mask,
                )

            lkey = jax.random.fold_in(key, layer_idx * 1000 + shots)
            start_mean, sigma = estimate_loss_noise(
                loss_fn, params, jax.random.fold_in(lkey, 999_983), cfg.noise_evals
            )
            best = start_mean
            stopped_early = False
            for epoch in range(cfg.layer_epochs):
                params, opt_state, loss = step(
                    params, opt_state, jax.random.fold_in(lkey, epoch)
                )
                improvement = best - float(loss)
                if improvement > 0:
                    best = float(loss)
                # noise-aware early stop (:266-273): progress must exceed
                # the measured noise floor to count
                if epoch >= 5 and improvement < cfg.noise_sigma_factor * sigma:
                    stopped_early = True
                    break
            layer_log["levels"].append(
                {"shots": shots, "sigma": sigma, "start": start_mean,
                 "best": best, "early_stop": stopped_early}
            )
            log(
                f"[layerwise] layer {layer_idx} shots={shots}: best={best:.4e} "
                f"sigma={sigma:.2e} early_stop={stopped_early}"
            )
            if shots >= cfg.max_shots:
                break  # layer converged at max shot budget (:275-280)
            shots *= cfg.shots_factor
        report.append(layer_log)
    return params, report

"""Optimizers and schedulers on the jit path.

Adam + ReduceLROnPlateau is the reference's default pairing
(nn/DVPDESolver.py:59-64: factor=0.9, patience=1000); the Czochralski
pipeline uses CosineAnnealing (CG_HQPINN_IBMtest_16qubits.py:480). The
plateau scheduler is stateful-on-device (pure pytree state + jnp.where
logic) so the whole train step stays one compiled graph — no host round
trip per epoch.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class PlateauState(NamedTuple):
    best: jnp.ndarray  # best loss seen
    bad_epochs: jnp.ndarray  # epochs since last improvement
    scale: jnp.ndarray  # multiplicative lr scale


def plateau_init() -> PlateauState:
    return PlateauState(
        best=jnp.asarray(jnp.inf, dtype=jnp.float32),
        bad_epochs=jnp.asarray(0, dtype=jnp.int32),
        scale=jnp.asarray(1.0, dtype=jnp.float32),
    )


def plateau_update(
    state: PlateauState,
    loss: jnp.ndarray,
    factor: float = 0.9,
    patience: int = 1000,
    threshold: float = 1e-4,
    min_scale: float = 1e-8,
) -> PlateauState:
    """torch.optim.lr_scheduler.ReduceLROnPlateau semantics (mode='min',
    threshold_mode='rel'): improvement means loss < best * (1 - threshold);
    after `patience` consecutive non-improvements, scale *= factor."""
    loss = loss.astype(jnp.float32)
    improved = loss < state.best * (1.0 - threshold)
    best = jnp.where(improved, loss, state.best)
    bad = jnp.where(improved, 0, state.bad_epochs + 1)
    trip = bad > patience
    scale = jnp.where(trip, jnp.maximum(state.scale * factor, min_scale), state.scale)
    bad = jnp.where(trip, 0, bad)
    return PlateauState(best=best, bad_epochs=bad, scale=scale)


def make_optimizer(
    lr: float,
    grad_clip: Optional[float] = None,
    schedule: str = "plateau",
    epochs: int = 0,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """Adam with optional global-norm clipping. For 'cosine' the schedule is
    baked into the transformation; for 'plateau' the caller multiplies the
    update by PlateauState.scale (plateau depends on the loss, which optax
    schedules cannot see).

    ``weight_decay`` reproduces torch's *coupled* Adam weight decay (grad +=
    wd * param before the moment updates, not AdamW) — the reference's CV
    solver setting ``weight_decay=0.001`` (nn/CVPDESolver.py:73-75)."""
    parts = []
    if grad_clip is not None and grad_clip > 0:
        parts.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay and weight_decay > 0:
        parts.append(optax.add_decayed_weights(weight_decay))
    if schedule == "cosine":
        sched = optax.cosine_decay_schedule(lr, decay_steps=max(epochs, 1))
        parts.append(optax.adam(learning_rate=sched))
    else:
        parts.append(optax.adam(learning_rate=lr))
    return optax.chain(*parts)


def scale_updates(updates, scale: jnp.ndarray):
    return jax.tree_util.tree_map(lambda u: u * scale, updates)

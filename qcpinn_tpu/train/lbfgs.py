"""Full-batch L-BFGS refinement for PINN training.

The reference trains with Adam only (nn/DVPDESolver.py:59-64) and plateaus
accordingly; the standard PINN recipe is Adam (stochastic, explores) then
L-BFGS on a FIXED collocation set (deterministic full-batch quasi-Newton,
polishes into the basin — this is where PINN papers pick up their last 1-2
orders of magnitude of accuracy). TPU-native shape: the whole refinement is
one ``lax.scan`` of jitted L-BFGS steps (optax.lbfgs with zoom linesearch),
so it runs on-chip with no host round-trips.

Available to any trainer via ``lbfgs_refine``. (The shipped north-star
recipe does NOT use it — its accuracy comes from the additive RBF head,
pulse-focused sampling, and classical staging; see PARITY.md. L-BFGS was
part of the accuracy exploration and is kept as a general tool.)
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def lbfgs_refine(
    loss_fn: Callable,
    params,
    steps: int,
    memory_size: int = 20,
    chunk: Optional[int] = None,
) -> Tuple[object, jnp.ndarray]:
    """Minimize deterministic ``loss_fn(params) -> scalar`` with L-BFGS.

    Returns ``(refined_params, losses [steps])``. ``loss_fn`` must be pure
    and batch-fixed (sample the collocation set ONCE outside). ``chunk``
    splits the scan into jit-cached chunks so callers can stop on a
    wall-clock budget between chunks; ``lbfgs_refine`` itself runs them all.
    """
    opt = optax.lbfgs(
        memory_size=memory_size,
        linesearch=optax.scale_by_zoom_linesearch(
            max_linesearch_steps=20, verbose=False
        ),
    )
    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    def step(carry, _):
        params, state = carry
        value, grad = value_and_grad(params, state=state)
        updates, state = opt.update(
            grad, state, params, value=value, grad=grad, value_fn=loss_fn
        )
        params = optax.apply_updates(params, updates)
        return (params, state), value

    @jax.jit
    def run(params, state, n_ones):
        return jax.lax.scan(step, (params, state), n_ones)

    state = opt.init(params)
    chunk = chunk or steps
    losses = []
    done = 0
    while done < steps:
        n = min(chunk, steps - done)
        (params, state), vals = run(params, state, jnp.ones(n))
        losses.append(vals)
        done += n
    return params, jnp.concatenate(losses) if losses else jnp.zeros((0,))


def make_fixed_batch_loss(
    model_apply: Callable,
    operator: Optional[Callable],
    batches: dict,
    weights: dict,
    kinds: dict,
) -> Callable:
    """Deterministic composite loss over pre-sampled term batches.

    ``batches[name] = (X, y)``; ``kinds[name]`` is 'residual' (PDE operator
    through the model) or 'value' (direct MSE) — same contract as
    train/loop.py TermSpec."""

    def loss_fn(params):
        total = 0.0
        for name, (X, y) in batches.items():
            if kinds[name] == "residual":
                apply = lambda Xp: model_apply(params, Xp)
                _, pred = operator(apply, X)
            else:
                pred = model_apply(params, X)
            total = total + weights[name] * jnp.mean((pred - y) ** 2)
        return total

    return loss_fn

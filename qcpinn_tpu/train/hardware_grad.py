"""Parameter-shift gradients: the hardware-fidelity gradient path.

On real QPUs the reference differentiates circuits by evaluating them at
shifted parameters (diff_method="parameter-shift",
nn/DVQuantumLayer.py:140, CG_HQPINN_IBMtest_16qubits.py:557) — 2 evals per
rotation parameter, 4 per controlled rotation. Here the same estimator runs
against the shot-sampled engine, wrapped as a ``jax.custom_vjp`` around
``DVCircuit.apply`` so it composes with ordinary autodiff through the
classical layers (exactly how TorchConnector/QNode compose in the
reference).

Shift rules:
- rx/ry/rz/ps/rot components (generator eigenvalue gap 1):
    f'(t) = [f(t + pi/2) - f(t - pi/2)] / 2
- crx/cry/crz (frequencies {1/2, 1}): the four-term rule
    f'(t) = c+ [f(t+pi/2) - f(t-pi/2)] - c- [f(t+3pi/2) - f(t-3pi/2)],
    c+- = (sqrt(2) +- 1) / (4 sqrt(2))
- angle-encoded inputs RX(x_i): two-term rule per feature.

Every shifted evaluation draws fresh shot noise from a folded key — matching
the physical reality that each is a separate hardware job.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.circuit import DVCircuit

TWO_TERM = {"rx", "ry", "rz", "ps", "rot"}
FOUR_TERM = {"crx", "cry", "crz"}
_C_PLUS = (math.sqrt(2.0) + 1.0) / (4.0 * math.sqrt(2.0))
_C_MINUS = (math.sqrt(2.0) - 1.0) / (4.0 * math.sqrt(2.0))


def _param_kinds(circuit: DVCircuit) -> List[str]:
    """Gate kind for each per-layer parameter index (from the unfused
    program — fusion doesn't change which gate owns a parameter)."""
    kinds = [None] * circuit.params_per_layer
    for op in circuit.program_raw:
        for j in op.pidx:
            kinds[j] = op.kind
    if any(k is None for k in kinds):
        raise ValueError("program has unused parameter slots")
    return kinds


def make_hw_apply(circuit: DVCircuit, shots: Optional[int]):
    """Build ``hw_apply(params, x, key) -> [B, n]`` with parameter-shift VJP.

    ``shots=None`` gives the exact estimator through the same code path
    (useful for validating the shift rules against autodiff).
    """
    if circuit.encoding != "angle":
        raise ValueError("parameter-shift input gradients need angle encoding")

    kinds = _param_kinds(circuit)
    L, P = circuit.layers, circuit.params_per_layer
    two_idx = [j for j, k in enumerate(kinds) if k in TWO_TERM]
    four_idx = [j for j, k in enumerate(kinds) if k in FOUR_TERM]

    def evaluate(params, x, key):
        return circuit.apply(
            params, x, shots=shots, key=(key if shots is not None else None)
        )

    def _shift_evals(params, x, key, flat_indices, shift):
        """Evaluate at params +- shift for each flat (layer, j) index.
        Returns (plus, minus) of shape [K, B, n]."""
        flat = params.reshape(-1)

        def one(i, sgn, k):
            shifted = flat.at[i].add(sgn * shift).reshape(L, P)
            return evaluate(shifted, x, k)

        idx = jnp.asarray(flat_indices, dtype=jnp.int32)
        keys_p = jax.vmap(lambda i: jax.random.fold_in(key, 2 * i))(idx)
        keys_m = jax.vmap(lambda i: jax.random.fold_in(key, 2 * i + 1))(idx)
        plus = jax.vmap(lambda i, k: one(i, +1.0, k))(idx, keys_p)
        minus = jax.vmap(lambda i, k: one(i, -1.0, k))(idx, keys_m)
        return plus, minus

    def param_shift_jacobian(params, x, key) -> jnp.ndarray:
        """dZ[b, w] / dparams -> [L*P, B, n]."""
        flat_two = [l * P + j for l in range(L) for j in two_idx]
        flat_four = [l * P + j for l in range(L) for j in four_idx]
        jac = jnp.zeros((L * P,) + (x.shape[0], circuit.n), dtype=jnp.float32)
        if flat_two:
            p, m = _shift_evals(params, x, jax.random.fold_in(key, 1), flat_two, np.pi / 2)
            jac = jac.at[jnp.asarray(flat_two)].set((p - m) / 2.0)
        if flat_four:
            k4 = jax.random.fold_in(key, 2)
            p1, m1 = _shift_evals(params, x, jax.random.fold_in(k4, 0), flat_four, np.pi / 2)
            p2, m2 = _shift_evals(params, x, jax.random.fold_in(k4, 1), flat_four, 3 * np.pi / 2)
            jac = jac.at[jnp.asarray(flat_four)].set(
                _C_PLUS * (p1 - m1) - _C_MINUS * (p2 - m2)
            )
        return jac

    def input_shift_jacobian(params, x, key) -> jnp.ndarray:
        """dZ[b, w] / dx[b, i] -> [F, B, n] (per-sample: shifting feature i
        of sample b only affects row b)."""
        F = x.shape[1]

        def one(i, sgn, k):
            shifted = x.at[:, i].add(sgn * np.pi / 2)
            return evaluate(params, shifted, k)

        idx = jnp.arange(F, dtype=jnp.int32)
        keys_p = jax.vmap(lambda i: jax.random.fold_in(key, 2 * i))(idx)
        keys_m = jax.vmap(lambda i: jax.random.fold_in(key, 2 * i + 1))(idx)
        plus = jax.vmap(lambda i, k: one(i, +1.0, k))(idx, keys_p)
        minus = jax.vmap(lambda i, k: one(i, -1.0, k))(idx, keys_m)
        return (plus - minus) / 2.0

    @jax.custom_vjp
    def hw_apply(params, x, key):
        return evaluate(params, x, key)

    def fwd(params, x, key):
        return hw_apply(params, x, key), (params, x, key)

    def bwd(res, g):
        params, x, key = res
        kp, kx = jax.random.split(jax.random.fold_in(key, 7))
        jac_p = param_shift_jacobian(params, x, kp)  # [LP, B, n]
        d_params = jnp.einsum("kbn,bn->k", jac_p, g).reshape(L, P)
        jac_x = input_shift_jacobian(params, x, kx)  # [F, B, n]
        d_x = jnp.einsum("fbn,bn->bf", jac_x, g)
        return d_params, d_x, None

    hw_apply.defvjp(fwd, bwd)
    return hw_apply


def evals_per_step(circuit: DVCircuit) -> int:
    """Circuit-execution cost accounting (readme.md:166-171,
    cg-hqpinn/...:711-718): forward + 2 per two-term param + 4 per four-term
    param + 2 per input feature."""
    kinds = _param_kinds(circuit)
    per_layer = sum(2 if k in TWO_TERM else 4 for k in kinds)
    return 1 + circuit.layers * per_layer + 2 * circuit.n

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


def make_hw_apply(circuit: DVCircuit, shots: Optional[int], noise=None):
    """Build ``hw_apply(params, x, key) -> [B, n]`` with parameter-shift VJP.

    ``shots=None`` gives the exact estimator through the same code path
    (useful for validating the shift rules against autodiff). ``noise``
    (a measure.NoiseModel) is applied inside every evaluation — the shift
    rules stay exact for the noisy expectation because the channel acts on
    ⟨Z⟩ as a parameter-independent linear map, so training and evaluation
    see the same channel.
    """
    if circuit.encoding != "angle":
        raise ValueError("parameter-shift input gradients need angle encoding")

    kinds = _param_kinds(circuit)
    L, P = circuit.layers, circuit.params_per_layer
    two_idx = [j for j, k in enumerate(kinds) if k in TWO_TERM]
    four_idx = [j for j, k in enumerate(kinds) if k in FOUR_TERM]

    def evaluate(params, x, key):
        return circuit.apply(
            params, x, shots=shots, key=(key if shots is not None else None),
            noise=noise,
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


def _chunked_vmap(fn, idx: jnp.ndarray, chunk: int):
    """vmap(fn) over idx evaluated in lax.map chunks of ``chunk``: peak
    memory is one chunk's worth of circuit evaluations instead of all K
    shifts at once (at 16 qubits, 192 simultaneous shifted statevector
    forwards would hold ~17 GB of intermediates)."""
    k = idx.shape[0]
    if k <= chunk:
        return jax.vmap(fn)(idx)
    pad = (-k) % chunk
    idx_p = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)]) if pad else idx
    out = jax.lax.map(jax.vmap(fn), idx_p.reshape(-1, chunk))
    out = jax.tree_util.tree_map(lambda a: a.reshape((-1,) + a.shape[2:]), out)
    return jax.tree_util.tree_map(lambda a: a[:k], out)


def make_hw_apply_cz(qlayer, shots: Optional[int], noise=None, chunk: int = 32):
    """Parameter-shift estimator for the Czochralski data-reuploading
    circuit (models/czochralski.py CzQuantumLayer): ``hw_apply(weights, x,
    key) -> [B, n]`` with a custom VJP built from shift rules — the
    TPU-native equivalent of the reference's full-scope IBM fine-tuning
    QNode (CG_HQPINN_IBMtest_16qubits.py:557, diff_method="parameter-shift").

    Shift rules:
    - Rot weights (L, n, 3): all two-term (gap-1 generators), shift pi/2.
    - inputs: feature j occurs once as the RY(x_j) encoding (two-term) and
      once per layer l as the reupload RZ(0.5 x_j) on wire (j - l) mod n —
      the product rule sums a two-term estimate per occurrence, the
      reupload's inner derivative contributing the extra factor 1/2.

    Every shifted evaluation draws fresh shot noise (separate hardware
    jobs). ``shots=None`` validates the rules against exact autodiff.
    """
    L, n = qlayer.layers, qlayer.n
    half = np.pi / 2

    def evaluate(weights, x, key, enc_off=None, reup_off=None):
        return qlayer.apply(
            weights,
            x,
            shots=shots,
            key=(key if shots is not None else None),
            noise=noise,
            enc_off=enc_off,
            reup_off=reup_off,
        )

    def weight_jacobian(weights, x, key):
        """dZ/dweights -> [L*n*3, B, n]."""
        flat = weights.reshape(-1)
        idx = jnp.arange(flat.shape[0], dtype=jnp.int32)

        def one(i):
            p = evaluate(
                flat.at[i].add(half).reshape(L, n, 3), x,
                jax.random.fold_in(key, 2 * i),
            )
            m = evaluate(
                flat.at[i].add(-half).reshape(L, n, 3), x,
                jax.random.fold_in(key, 2 * i + 1),
            )
            return (p - m) / 2.0

        return _chunked_vmap(one, idx, chunk)

    def input_jacobian(weights, x, key):
        """dZ/dx -> [n_features, B, n] via per-occurrence shifts."""
        k_enc, k_re = jax.random.split(key)

        # encoding occurrences: RY(x_j) on wire j
        def enc_one(j):
            off = jnp.zeros((n,), jnp.float32).at[j].set(half)
            p = evaluate(weights, x, jax.random.fold_in(k_enc, 2 * j), enc_off=off)
            m = evaluate(weights, x, jax.random.fold_in(k_enc, 2 * j + 1),
                         enc_off=-off)
            return (p - m) / 2.0

        jac = _chunked_vmap(enc_one, jnp.arange(n, dtype=jnp.int32), chunk)

        # reupload occurrences: layer l = m // n, feature j = m % n lands
        # on wire (j - l) mod n; theta = x_j / 2 gives the extra 1/2
        mdx = jnp.arange(L * n, dtype=jnp.int32)

        def reup_one(m):
            l, j = m // n, m % n
            off = jnp.zeros((L, n), jnp.float32).at[l, (j - l) % n].set(half)
            p = evaluate(weights, x, jax.random.fold_in(k_re, 2 * m),
                         reup_off=off)
            mm = evaluate(weights, x, jax.random.fold_in(k_re, 2 * m + 1),
                          reup_off=-off)
            return (p - mm) / 2.0

        diffs = _chunked_vmap(reup_one, mdx, chunk)
        return jac.at[mdx % n].add(0.5 * diffs)

    @jax.custom_vjp
    def hw_apply(weights, x, key):
        return evaluate(weights, x, key)

    def fwd(weights, x, key):
        return hw_apply(weights, x, key), (weights, x, key)

    def bwd(res, g):
        weights, x, key = res
        kw, kx = jax.random.split(jax.random.fold_in(key, 11))
        jac_w = weight_jacobian(weights, x, kw)  # [K, B, n]
        d_w = jnp.einsum("kbn,bn->k", jac_w, g).reshape(L, n, 3)
        jac_x = input_jacobian(weights, x, kx)  # [F, B, n]
        d_x = jnp.einsum("fbn,bn->bf", jac_x, g)
        return d_w, d_x, None

    hw_apply.defvjp(fwd, bwd)
    return hw_apply


def evals_per_step_cz(qlayer) -> int:
    """Circuit-execution cost per full-scope Cz finetune step: forward +
    2 per Rot component + 2 per encoding feature + 2 per reupload
    occurrence."""
    L, n = qlayer.layers, qlayer.n
    return 1 + 2 * (L * n * 3) + 2 * n + 2 * (L * n)


def evals_per_step(circuit: DVCircuit) -> int:
    """Circuit-execution cost accounting (readme.md:166-171,
    cg-hqpinn/...:711-718): forward + 2 per two-term param + 4 per four-term
    param + 2 per input feature."""
    kinds = _param_kinds(circuit)
    per_layer = sum(2 if k in TWO_TERM else 4 for k in kinds)
    return 1 + circuit.layers * per_layer + 2 * circuit.n

"""Batched statevector engine.

This is the TPU-native replacement for the reference's PennyLane
``default.qubit`` / Qiskit Aer simulators (nn/DVQuantumLayer.py:143,
hybrid_testing/CG_HQPINN_IBMtest_16qubits.py:167-176): the quantum layer is a
pure function of (params, inputs) evaluated for the *whole collocation batch
at once*, with exact gradients obtained by ordinary JAX autodiff through the
simulation — no device abstraction, no parameter-shift needed on the training
path.

Layout and conventions
----------------------
- State: ``[B, 2^n]`` complex64. Wire 0 is the most significant bit of the
  basis index (PennyLane wire ordering), i.e. basis index
  ``sum_w bit_w * 2^(n-1-w)``.
- Gate application uses bit-split reshapes only (``[B, 2^w, 2, 2^(n-1-w)]``),
  which are free on TPU (no data movement), followed by small einsums that
  XLA fuses into vectorized multiply-adds.
- ``<Z_i>`` readout for all wires is a single ``[B, 2^n] @ [2^n, n]`` matmul
  with a +/-1 sign matrix — it rides the MXU instead of n reduction passes.

Gate matrices may be batched over the leading axis (shape ``[B, 2, 2]``),
which is how per-sample encoding angles (AngleEmbedding) are applied without
a Python loop over the batch (replacing the reference's per-sample hardware
loop, nn/DVQuantumLayer.py:156-174).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import gates

CDTYPE = jnp.complex64
RDTYPE = jnp.float32


def zero_state(batch: int, n: int) -> jnp.ndarray:
    """|0...0> for every batch element: ``[B, 2^n]`` complex64."""
    state = jnp.zeros((batch, 1 << n), dtype=CDTYPE)
    return state.at[:, 0].set(1.0 + 0.0j)


def apply_1q(state: jnp.ndarray, n: int, wire: int, m: jnp.ndarray) -> jnp.ndarray:
    """Apply a 1-qubit gate ``m`` ([2,2] or [B,2,2]) on ``wire``.

    Slice-and-stack formulation. Measured against flip-based and einsum
    formulations on v5e under the triple-nested autodiff of PDE residuals
    (12q cross_mesh train step, B=1024): stack 125 ms/step, flip 170,
    einsum OOM at compile — XLA's relayout copies for the stack are cheaper
    than the alternatives' lowering on this generation.
    """
    b = state.shape[0]
    lo = 1 << wire
    hi = 1 << (n - 1 - wire)
    s = state.reshape(b, lo, 2, hi)
    a0 = s[:, :, 0, :]
    a1 = s[:, :, 1, :]
    if m.ndim == 2:
        b0 = m[0, 0] * a0 + m[0, 1] * a1
        b1 = m[1, 0] * a0 + m[1, 1] * a1
    else:
        m = m[:, :, :, None, None]  # [B,2,2,1,1] broadcasting over (lo, hi)
        b0 = m[:, 0, 0] * a0 + m[:, 0, 1] * a1
        b1 = m[:, 1, 0] * a0 + m[:, 1, 1] * a1
    return jnp.stack([b0, b1], axis=2).reshape(b, 1 << n)


def apply_2q(
    state: jnp.ndarray, n: int, wire_a: int, wire_b: int, u: jnp.ndarray
) -> jnp.ndarray:
    """Apply a 2-qubit gate on (wire_a, wire_b).

    ``u`` is ``[4, 4]`` (or ``[B, 4, 4]``) in (wire_a, wire_b) index order,
    e.g. controlled gates built by :func:`qcpinn_tpu.ops.gates.controlled`
    have wire_a as control.
    """
    if wire_a == wire_b:
        raise ValueError("2-qubit gate needs distinct wires")
    batched = u.ndim == 3
    u4 = u.reshape(u.shape[:-2] + (2, 2, 2, 2))
    w1, w2 = (wire_a, wire_b) if wire_a < wire_b else (wire_b, wire_a)
    if wire_a > wire_b:
        # Re-express u in ascending-wire index order.
        perm = (0, 2, 1, 4, 3) if batched else (1, 0, 3, 2)
        u4 = u4.transpose(perm)
    b = state.shape[0]
    d_a = 1 << w1
    d_m = 1 << (w2 - w1 - 1)
    d_c = 1 << (n - 1 - w2)
    s = state.reshape(b, d_a, 2, d_m, 2, d_c)
    hi = jax.lax.Precision.HIGHEST  # TPU default rounds f32 to bf16
    if batched:
        out = jnp.einsum("bklij,baicjd->bakcld", u4, s, precision=hi)
    else:
        out = jnp.einsum("klij,baicjd->bakcld", u4, s, precision=hi)
    return out.reshape(b, 1 << n)


def apply_ctrl_1q(
    state: jnp.ndarray, n: int, ctrl: int, tgt: int, m: jnp.ndarray
) -> jnp.ndarray:
    """Apply a controlled 1-qubit gate (gate ``m`` on ``tgt`` when ``ctrl``
    is 1) — covers CNOT/CX, CRX, CRY, CRZ.

    Same elementwise flip formulation as :func:`apply_1q`, with a {0,1}
    selector broadcast along the control axis — no slicing, no concatenate,
    one fused pass.
    """
    b = state.shape[0]
    w1, w2 = (ctrl, tgt) if ctrl < tgt else (tgt, ctrl)
    d_a = 1 << w1
    d_m = 1 << (w2 - w1 - 1)
    d_c = 1 << (n - 1 - w2)
    s = state.reshape(b, d_a, 2, d_m, 2, d_c)
    ctrl_axis = 2 if ctrl < tgt else 4
    tgt_axis = 4 if ctrl < tgt else 2

    def along(vec, axis, batched):
        shape = [1] * 6
        shape[axis] = 2
        if batched:
            shape[0] = b
        return vec.reshape(shape)

    sel = along(jnp.asarray([0.0 + 0.0j, 1.0 + 0.0j], dtype=state.dtype), ctrl_axis, False)
    swapped = jnp.flip(s, axis=tgt_axis)
    if m.ndim == 2:
        diag = along(jnp.stack([m[0, 0], m[1, 1]]), tgt_axis, False)
        off = along(jnp.stack([m[0, 1], m[1, 0]]), tgt_axis, False)
    else:
        diag = along(jnp.stack([m[:, 0, 0], m[:, 1, 1]], axis=1), tgt_axis, True)
        off = along(jnp.stack([m[:, 0, 1], m[:, 1, 0]], axis=1), tgt_axis, True)
    out = s * (1.0 - sel) + sel * (diag * s + off * swapped)
    return out.reshape(b, 1 << n)


@functools.lru_cache(maxsize=32)
def _z_sign_matrix(n: int) -> np.ndarray:
    """``[2^n, n]`` float32 matrix with entry (s, w) = +1 if bit_w(s)=0 else -1."""
    idx = np.arange(1 << n, dtype=np.int64)
    bits = (idx[:, None] >> (n - 1 - np.arange(n))[None, :]) & 1
    return (1.0 - 2.0 * bits).astype(np.float32)


def z_expvals(state: jnp.ndarray, n: int) -> jnp.ndarray:
    """``<Z_w>`` for every wire: ``[B, n]`` float32 (single MXU matmul).

    Precision HIGHEST: TPU's default matmul precision rounds f32 inputs to
    bf16, which costs ~1e-3 on expectations — too coarse for PDE residuals.
    """
    probs = jnp.real(state * jnp.conj(state)).astype(RDTYPE)
    sign = jnp.asarray(_z_sign_matrix(n))
    return jnp.dot(
        probs,
        sign,
        preferred_element_type=RDTYPE,
        precision=jax.lax.Precision.HIGHEST,
    )


def bit_probabilities(state: jnp.ndarray, n: int) -> jnp.ndarray:
    """Marginal P(bit_w = 1) for every wire: ``[B, n]`` float32."""
    return (1.0 - z_expvals(state, n)) / 2.0


@functools.lru_cache(maxsize=32)
def _parity_sign_vector(n: int) -> np.ndarray:
    """``[2^n]`` float32 vector with entry s = (-1)^popcount(s) — the
    eigenvalues of the global Z⊗...⊗Z observable."""
    idx = np.arange(1 << n, dtype=np.int64)
    pop = np.zeros_like(idx)
    for w in range(n):
        pop += (idx >> w) & 1
    return (1.0 - 2.0 * (pop % 2)).astype(np.float32)


def global_z_expval(state: jnp.ndarray, n: int) -> jnp.ndarray:
    """``<Z⊗Z⊗...⊗Z>``: ``[B]`` float32 — the global-parity observable the
    crystal-growth pipeline reads out
    (hybrid_qpinn_2dcrystal_ibmtest.py:133-135, SparsePauliOp 'Z'*n)."""
    probs = jnp.real(state * jnp.conj(state)).astype(RDTYPE)
    sign = jnp.asarray(_parity_sign_vector(n))
    return jnp.dot(
        probs,
        sign,
        preferred_element_type=RDTYPE,
        precision=jax.lax.Precision.HIGHEST,
    )


def encode_angle(state: jnp.ndarray, n: int, x: jnp.ndarray) -> jnp.ndarray:
    """AngleEmbedding with rotation='X' (nn/DVQuantumLayer.py:182):
    ``RX(x_w)`` on wire w, batched over samples."""
    for w in range(n):
        state = apply_1q(state, n, w, gates.rx(x[:, w]))
    return state


def encode_angle_product(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """AngleEmbedding as a direct product-state construction.

    ``RX(theta)|0> = [cos(theta/2), -i sin(theta/2)]`` and the encoded state
    is the tensor product over wires: amplitude s is
    ``(-i)^popcount(s) * prod_w (cos or sin)`` — n fused elementwise selects
    over ``[B, 2^n]`` plus one static phase multiply, instead of n full-state
    gate sweeps. (A concat-doubling construction is algebraically identical
    but XLA's fusion of the concat tree into downstream consumers exploded
    compile time 40x when composed with the Pallas kernels.) Exactly equals
    ``encode_angle(zero_state(B, n), n, x)`` (tested); used by the fused
    Pallas backends, whose kernels run in evolve-only mode.
    """
    from .diag_fusion import bit_matrix

    c = jnp.cos(x / 2.0).astype(RDTYPE)
    s = jnp.sin(x / 2.0).astype(RDTYPE)
    bits = np.asarray(bit_matrix(n))  # [2^n, n] static
    mag = jnp.ones((x.shape[0], 1 << n), RDTYPE)
    for w in range(n):  # wire 0 is the most significant bit
        mask = jnp.asarray(bits[:, w][None, :])
        mag = mag * jnp.where(mask == 1.0, s[:, w : w + 1], c[:, w : w + 1])
    pop = bits.sum(axis=1).astype(np.int64) % 4
    phase = np.array([1, -1j, -1, 1j], dtype=np.complex64)[pop]  # (-i)^popcount
    return mag.astype(CDTYPE) * jnp.asarray(phase)[None, :]


def encode_amplitude(x: jnp.ndarray, n: int, eps: float = 1e-12) -> jnp.ndarray:
    """AmplitudeEmbedding(normalize=True, pad_with=0.0)
    (nn/DVQuantumLayer.py:177-180): pad features to 2^n and L2-normalize
    per sample. Returns the prepared state directly."""
    b, f = x.shape
    dim = 1 << n
    if f > dim:
        raise ValueError(f"{f} features do not fit in {n} qubits")
    padded = jnp.zeros((b, dim), dtype=RDTYPE).at[:, :f].set(x.astype(RDTYPE))
    norm = jnp.sqrt(jnp.sum(padded * padded, axis=1, keepdims=True) + eps)
    return (padded / norm).astype(CDTYPE)

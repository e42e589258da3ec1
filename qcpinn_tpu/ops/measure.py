"""Measurement: exact expectations, shot-noise sampling, noise channels.

The reference runs analytic expectations on simulators (shots=None,
nn/DVQuantumLayer.py:143) and sampled expectations on hardware
(shots=1024/4096). We keep both as *modes of the same engine*:

- exact: ``<Z_w>`` from the statevector (differentiable, the training path).
- shots: per-wire binomial sampling of the measured bit. Each single-qubit
  estimator has exactly the hardware law Var[Z_hat] = (1 - <Z>^2) / S
  (extras/cg_qpinn.tex:86-89); cross-qubit correlations are not modeled since
  only per-qubit ``<Z_i>`` are ever consumed downstream.
- depolarizing/readout noise: FakeSherbrooke-style stand-in
  (cg-hqpinn/CG_HQPINN_IBMtest_16q_effective.py:183-196) applied to the Z
  expectations. Two layers of fidelity:

  * measurement-stage scalars (``depolarizing``/``readout``): one
    depolarizing channel before measurement shrinks <Z> by (1-p) per
    qubit; readout error flips the measured bit with prob q, scaling <Z>
    by (1-2q). Depth-independent — a readout-error model.
  * **depth-aware per-gate depolarizing** (``per_gate``): rate p applied
    after every gate, on every wire the gate touches. Under the standard
    Pauli-twirl accounting (each single-qubit depolarizing channel
    commutes to the measurement as a (1-p) contraction of the traceless
    part of the observable), <Z_w> is damped by (1-p)^{c_w} where c_w is
    the number of gate-wire touches on wire w over the WHOLE circuit —
    encoding, all ansatz layers, epilogue. Error now accumulates with
    circuit depth like the reference's FakeSherbrooke device noise: a
    10-layer circuit sees ~10x the damping exponent of a 1-layer one.
    The counts are static circuit metadata; bind them with
    ``noise.bind(circuit)`` (every engine does this at its measurement
    site).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from . import statevector as sv


def gate_counts_per_wire(circuit) -> tuple:
    """Per-wire gate-touch counts over the full circuit (encoding + every
    ansatz layer + epilogue) — the static exponent of the depth-aware
    depolarizing channel. Circuits with bespoke structure (e.g. the Cz
    data-reuploading layer) expose their own ``gate_counts_per_wire()``
    method; DVCircuit-shaped circuits are counted from ``program_raw``
    (pre diagonal-fusion, so every CRZ of a cross_mesh counts) and
    ``epilogue``. The amplitude encoding's state prep is counted as one
    touch per wire (its transpiled depth is device-specific; one touch is
    the documented stand-in floor)."""
    own = getattr(circuit, "gate_counts_per_wire", None)
    if callable(own):
        return tuple(own())
    import numpy as np

    n = circuit.n
    counts = np.ones(n, dtype=np.int64)  # encoding: 1 touch per wire
    for op in circuit.program_raw:
        for w in op.wires:
            counts[w] += circuit.layers
    for op in circuit.epilogue:
        for w in op.wires:
            counts[w] += 1
    return tuple(int(c) for c in counts)


@dataclasses.dataclass(frozen=True)
class NoiseModel:
    """Per-qubit depolarizing + readout error applied to Z expectations.

    ``per_gate`` adds the depth-aware channel (module docstring): it needs
    per-wire gate counts, bound from a circuit via ``bind(circuit)``."""

    depolarizing: float = 0.0
    readout: float = 0.0
    per_gate: float = 0.0
    gate_counts: Optional[tuple] = None

    def bind(self, circuit) -> "NoiseModel":
        """Attach the circuit's static per-wire gate counts (no-op when
        the depth-aware channel is off or counts are already bound)."""
        if self.per_gate == 0.0 or self.gate_counts is not None:
            return self
        return dataclasses.replace(
            self, gate_counts=gate_counts_per_wire(circuit)
        )

    def wire_scales(self, n: int) -> jnp.ndarray:
        """[n] damping factors for the per-wire <Z_w> observables."""
        base = (1.0 - self.depolarizing) * (1.0 - 2.0 * self.readout)
        scales = jnp.full((n,), base, dtype=jnp.float32)
        if self.per_gate:
            if self.gate_counts is None:
                raise ValueError(
                    "per_gate noise needs per-wire gate counts; call "
                    "noise.bind(circuit) at the measurement site"
                )
            counts = jnp.asarray(self.gate_counts[:n], dtype=jnp.float32)
            scales = scales * (1.0 - self.per_gate) ** counts
        return scales

    def apply(self, z: jnp.ndarray) -> jnp.ndarray:
        return z * self.wire_scales(z.shape[-1])


def exact_z(state: jnp.ndarray, n: int, noise: Optional[NoiseModel] = None):
    z = sv.z_expvals(state, n)
    if noise is not None:
        z = noise.apply(z)
    return z


def exact_global_z(
    state: jnp.ndarray, n: int, noise: Optional[NoiseModel] = None
) -> jnp.ndarray:
    """``<Z⊗...⊗Z>`` per sample, ``[B]``. Each tensor factor of the
    n-qubit parity observable is damped independently, so the channel
    scales it by the product of the per-wire factors (depth-aware counts
    included when bound)."""
    z = sv.global_z_expval(state, n)
    if noise is not None:
        z = z * jnp.prod(noise.wire_scales(n))
    return z


def sampled_global_z(
    state: jnp.ndarray,
    n: int,
    shots: int,
    key: jax.Array,
    noise: Optional[NoiseModel] = None,
) -> jnp.ndarray:
    """Shot-sampled global parity: Binomial(shots, p_even) with
    p_even = (1 + <Z..Z>)/2, estimator 2*k/shots - 1 — the hardware law
    Var = (1 - <Z..Z>^2)/S for the crystal pipeline's single observable."""
    z = exact_global_z(state, n, noise)
    p_even = jnp.clip((1.0 + z) / 2.0, 0.0, 1.0)
    counts = jax.random.binomial(key, n=float(shots), p=p_even)
    est = 2.0 * counts.astype(jnp.float32) / float(shots) - 1.0
    return jax.lax.stop_gradient(est)


def sampled_z(
    state: jnp.ndarray,
    n: int,
    shots: int,
    key: jax.Array,
    noise: Optional[NoiseModel] = None,
) -> jnp.ndarray:
    """Shot-sampled ``<Z_w>``: draw Binomial(shots, p1_w) per wire and return
    1 - 2*k/shots. Not differentiable by construction — the hardware-fidelity
    gradient paths (parameter-shift, SPSA) re-evaluate this estimator at
    shifted parameters exactly as the reference does on IBM hardware
    (nn/DVQuantumLayer.py:140, cg-hqpinn/...:484-512).
    """
    return sample_z_from_expectations(exact_z(state, n, noise), shots, key)


def sample_z_from_expectations(
    z: jnp.ndarray, shots: int, key: jax.Array
) -> jnp.ndarray:
    """Binomial shot estimator on already-computed ``<Z>`` values — shared
    by the single-device path and the amp-sharded gate engine (whose psum
    already produced the full expectations)."""
    p1 = jnp.clip((1.0 - z) / 2.0, 0.0, 1.0)
    counts = jax.random.binomial(key, n=float(shots), p=p1)
    est = 1.0 - 2.0 * counts.astype(jnp.float32) / float(shots)
    return jax.lax.stop_gradient(est)

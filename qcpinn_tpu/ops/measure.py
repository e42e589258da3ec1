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
  (cg-hqpinn/CG_HQPINN_IBMtest_16q_effective.py:183-196) applied directly to
  the Z expectations — a depolarizing channel with rate p shrinks <Z> by
  (1-p) per qubit; readout error flips the measured bit with prob q, i.e.
  scales <Z> by (1-2q).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from . import statevector as sv


@dataclasses.dataclass(frozen=True)
class NoiseModel:
    """Per-qubit depolarizing + readout error applied to Z expectations."""

    depolarizing: float = 0.0
    readout: float = 0.0

    def apply(self, z: jnp.ndarray) -> jnp.ndarray:
        scale = (1.0 - self.depolarizing) * (1.0 - 2.0 * self.readout)
        return z * scale


def exact_z(state: jnp.ndarray, n: int, noise: Optional[NoiseModel] = None):
    z = sv.z_expvals(state, n)
    if noise is not None:
        z = noise.apply(z)
    return z


def exact_global_z(
    state: jnp.ndarray, n: int, noise: Optional[NoiseModel] = None
) -> jnp.ndarray:
    """``<Z⊗...⊗Z>`` per sample, ``[B]``. A per-qubit depolarizing/readout
    channel scales the n-qubit parity observable by the per-qubit factor to
    the n-th power (each tensor factor is damped independently)."""
    z = sv.global_z_expval(state, n)
    if noise is not None:
        scale = (1.0 - noise.depolarizing) * (1.0 - 2.0 * noise.readout)
        z = z * (scale**n)
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

"""Hybrid phase-field crystal-growth PINN — the reference's
``HybridCrystalPINN`` (hybrid_qpinn_2dcrystal_ibmtest.py:89-191) as a pure
params-pytree model:

  backbone:  Linear(2, 64) -> Tanh -> Linear(64, 32) -> Tanh      (:68-82)
  pre_q:     Linear(32, n_qubits)                                 (:180)
  quantum:   RX(x_q) input encoding; per layer {RX, RY, RZ per
             qubit} + CNOT chain (q, q+1); readout = the single
             global <Z⊗...⊗Z> observable                          (:89-113,
             :133-135)
  post:      Linear(1, 32) -> Tanh -> Linear(32, 5)               (:181-185)

Outputs per point (x, y): (u, v, p, c, phi) — velocities, pressure, solute
concentration, phase field (:170-175). The quantum weights live under the
top-level key ``"q"`` so the SPSA/Adam split (train/spsa.py:split_params)
draws the same boundary the reference does when it hands
``[model.q.weights]`` to its SPSAOptimizer (:316-320).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import measure
from ..ops import program as prog
from ..ops import statevector as sv
from . import nn_core as nc

Array = jnp.ndarray


def _crystal_program(n_qubits: int, n_layers: int) -> prog.Program:
    """The reference's hardware-efficient ansatz (:89-113): per layer, RX,
    RY, RZ on every qubit (one parameter each, qubit-major then gate-major
    like the reference's nested loop) followed by a CNOT chain."""
    ops = []
    p = 0
    for _ in range(n_layers):
        for q in range(n_qubits):
            for kind in ("rx", "ry", "rz"):
                ops.append(prog.Op(kind, (q,), (p,)))
                p += 1
        for q in range(n_qubits - 1):
            ops.append(prog.Op("cnot", (q, q + 1)))
    return tuple(ops)


class CrystalPINN:
    """5-output hybrid crystal-growth model around a global-Z quantum scalar."""

    quantum_param_keys = ("q",)

    def __init__(self, n_qubits: int = 4, n_layers: int = 3):
        self.n = n_qubits
        self.layers = n_layers
        self.program = _crystal_program(n_qubits, n_layers)
        self.num_q_params = prog.num_params(self.program)
        assert self.num_q_params == 3 * n_qubits * n_layers

    def gate_counts_per_wire(self):
        """Per-wire gate touches for the depth-aware noise channel: RY
        encode + the already-unrolled program's touches."""
        counts = [1] * self.n
        for op in self.program:
            for w in op.wires:
                counts[w] += 1
        return tuple(counts)

    def init(self, key: jax.Array) -> dict:
        kb, kp, kq, ko = jax.random.split(key, 4)
        return {
            "backbone": nc.mlp_init(kb, (2, 64, 32)),
            "pre_q": nc.linear_init(kp, 32, self.n),
            # reference init: 0.01 * randn(len(weight_params))  (:128-130)
            "q": 0.01
            * jax.random.normal(kq, (self.num_q_params,), dtype=jnp.float32),
            "post": nc.mlp_init(ko, (1, 32, 5)),
        }

    def quantum_scalar(
        self,
        q_params: Array,
        q_in: Array,
        *,
        shots: Optional[int] = None,
        key: Optional[jax.Array] = None,
        noise: Optional[measure.NoiseModel] = None,
    ) -> Array:
        """``[B, n] -> [B]`` global-parity expectation of the ansatz."""
        if noise is not None:
            noise = noise.bind(self)
        state = sv.zero_state(q_in.shape[0], self.n)
        state = sv.encode_angle(state, self.n, q_in)
        state = prog.apply_program(state, self.n, self.program, q_params)
        if shots is None:
            return measure.exact_global_z(state, self.n, noise)
        if key is None:
            raise ValueError("shots mode needs a PRNG key")
        return measure.sampled_global_z(state, self.n, shots, key, noise)

    def apply(
        self,
        params: dict,
        x: Array,
        *,
        shots: Optional[int] = None,
        key: Optional[jax.Array] = None,
        noise: Optional[measure.NoiseModel] = None,
    ) -> Array:
        """``[B, 2] -> [B, 5]`` (u, v, p, c, phi)."""
        z = nc.mlp_apply(params["backbone"], x, final_activation=True)
        q_in = nc.linear_apply(params["pre_q"], z)
        q_out = self.quantum_scalar(
            params["q"], q_in, shots=shots, key=key, noise=noise
        )
        return nc.mlp_apply(params["post"], q_out[:, None])

    def __call__(self, params, x, **kw):
        return self.apply(params, x, **kw)

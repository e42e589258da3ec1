"""SI-gated hybrid head, the coupled adaptive loss balancer, and the
EstimatorQNN-chain reuploading circuit (hybrid_testing/modified_qpinn_cg.py,
si_q_pinn_improved.py).

- SI gating (:101-124): h = tanh(W h0); m, n = sigmoid gates;
  h <- h*m + (1-h)*n — a stabilized post-quantum feature mixer.
- CoupledAdaptiveWeighting (:142-156): uncertainty weighting with a FIXED
  data:physics noise ratio — one learnable log_eps_data, physics eps tied
  at sqrt(target_ratio) times it:
  L = 0.5/eps_d^2 * L_data + 0.5/eps_p^2 * L_phys + log(eps_d eps_p).
- SIChainCircuit: the exact EstimatorQNN circuit of
  si_q_pinn_improved.py:277-287 — data-reuploading per layer with the
  FOUR inputs reused cyclically (RY(x[i % 4]) on wire i), then RX/RZ
  weight sweeps, then a CZ chain.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from . import nn_core as nc

Array = jnp.ndarray


def si_gated_head_init(key: jax.Array, in_dim: int, hidden: int, out_dim: int) -> dict:
    ks = jax.random.split(key, 4)
    return {
        "post_dense": nc.linear_init(ks[0], in_dim, hidden),
        "gate_m": nc.linear_init(ks[1], hidden, hidden),
        "gate_n": nc.linear_init(ks[2], hidden, hidden),
        "out": nc.linear_init(ks[3], hidden, out_dim),
    }


def si_gated_head_apply(params: dict, q_out: Array) -> Array:
    h = jnp.tanh(nc.linear_apply(params["post_dense"], q_out))
    m = jax.nn.sigmoid(nc.linear_apply(params["gate_m"], h))
    n = jax.nn.sigmoid(nc.linear_apply(params["gate_n"], h))
    h = h * m + (1.0 - h) * n
    return nc.linear_apply(params["out"], h)


class SIChainCircuit:
    """The EstimatorQNN hardware-efficient reuploading circuit
    (si_q_pinn_improved.py:277-287), natively batched and exactly ordered:

      per layer l (w_idx runs layer-major, qubit-minor, RX-then-RZ):
        RY(x[i % 4]) on wire i        (data reupload, 4 inputs recycled)
        RX(w), RZ(w)  on wire i
        CZ(i, i+1)    for i < n-1     (open chain, no ring closure)

    2 n L weight parameters; <Z_i> per-wire readout (the reference's
    SparsePauliOp observables). Differentiable to any order through the
    statevector (replacing EstimatorQNN's input_gradients=True path).
    Exposes gate_counts_per_wire() for the depth-aware noise channel."""

    def __init__(self, n_qubits: int, n_layers: int, n_inputs: int = 4):
        self.n = n_qubits
        self.layers = n_layers
        self.n_inputs = n_inputs
        self.num_params = 2 * n_qubits * n_layers

    def init(self, key: jax.Array) -> Array:
        # the reference initializes 0.01 * randn over the weight vector
        # (si_q_pinn_improved.py initial_weights convention)
        return 0.01 * jax.random.normal(
            key, (self.num_params,), dtype=jnp.float32
        )

    def gate_counts_per_wire(self):
        counts = [0] * self.n
        for w in range(self.n):
            counts[w] += self.layers * 3  # RY reupload + RX + RZ per layer
        for i in range(self.n - 1):  # CZ chain per layer
            counts[i] += self.layers
            counts[i + 1] += self.layers
        return tuple(counts)

    def apply(
        self,
        weights: Array,
        x: Array,
        *,
        shots=None,
        key=None,
        noise=None,
    ) -> Array:
        """``[B, n_inputs] -> [B, n]`` per-wire Z expectations."""
        from ..ops import gates, measure
        from ..ops import statevector as sv

        if noise is not None:
            noise = noise.bind(self)
        n = self.n
        w2 = weights.reshape(self.layers, n, 2)
        state = sv.zero_state(x.shape[0], n)
        # static CZ chain phases: one diagonal multiply per layer
        import numpy as np

        phases = np.zeros(1 << n, dtype=np.float32)
        idx = np.arange(1 << n)
        for i in range(n - 1):
            b_a = (idx >> (n - 1 - i)) & 1
            b_b = (idx >> (n - 2 - i)) & 1
            phases += np.pi * (b_a * b_b)
        cz_mult = jnp.exp(1j * jnp.asarray(phases))
        for l in range(self.layers):
            for i in range(n):
                state = sv.apply_1q(
                    state, n, i, gates.ry(x[:, i % self.n_inputs])
                )
            for i in range(n):
                state = sv.apply_1q(state, n, i, gates.rx(w2[l, i, 0]))
                state = sv.apply_1q(state, n, i, gates.rz(w2[l, i, 1]))
            state = state * cz_mult[None, :]
        if shots is None:
            return measure.exact_z(state, n, noise)
        if key is None:
            raise ValueError("shots mode needs a PRNG key")
        return measure.sampled_z(state, n, shots, key, noise)

    def __call__(self, weights, x, **kw):
        return self.apply(weights, x, **kw)


def coupled_weighting_init() -> dict:
    return {"log_eps_data": jnp.zeros((1,), dtype=jnp.float32)}


def coupled_weighting_apply(
    params: dict, l_data: Array, l_phys: Array, target_ratio: float = 100.0
) -> Array:
    eps_data = jnp.exp(params["log_eps_data"][0])
    eps_phys = eps_data * math.sqrt(target_ratio)
    return (
        0.5 / (eps_data**2) * l_data
        + 0.5 / (eps_phys**2) * l_phys
        + jnp.log(eps_data * eps_phys)
    )

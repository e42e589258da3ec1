"""The DV quantum layer as a pure batched function.

Replaces the reference's ``DVQuantumLayer`` QNode
(nn/DVQuantumLayer.py:176-214) with a compile-time circuit build + a pure
``apply(params, x) -> [B, n]`` evaluated on the whole collocation batch:

  encoding (angle RX / amplitude)            :176-182
  num_quantum_layers x ansatz                :184-201
  fixed seeded Haar 4x4 blocks on [0,1],[2,3] when n >= 4 and a seed is set
                                             :203-209
  Hadamard on the last wire                  :211-212
  <Z_w> for every wire                       :214

Gradients flow through the simulation by ordinary JAX autodiff ("backprop"
diff in reference terms, nn/DVQuantumLayer.py:144), for any order — the PDE
operators take second derivatives through this layer.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import ansatz as ansatz_lib
from . import diag_fusion, gates, measure
from . import program as prog
from . import statevector as sv


class DVCircuit:
    """Static circuit description + pure apply.

    Args mirror the reference's args dict (nn/DVQuantumLayer.py:12-23):
    num_qubits, num_quantum_layers, q_ansatz, encoding, seed.
    """

    def __init__(
        self,
        num_qubits: int,
        num_quantum_layers: int = 1,
        q_ansatz: str = "cascade",
        encoding: str = "angle",
        seed: Optional[int] = None,
        use_scan: Optional[bool] = None,
        fuse: bool = True,
        remat: bool = False,
    ):
        if encoding not in ("angle", "angle_pi", "amplitude"):
            raise ValueError(
                f"unknown encoding {encoding!r}; have angle, angle_pi, "
                "amplitude"
            )
        self.n = num_qubits
        self.layers = num_quantum_layers
        self.ansatz = q_ansatz
        self.encoding = encoding
        # 'angle_pi' is the standalone trainer's RX(pi * x_i) embedding
        # (trainer/train.py:205-207, inputs pre-squashed to [-1,1] by a
        # Tanh): same RX product encoder, inputs scaled by pi. Every
        # backend multiplies by ``input_scale`` before its angle encode.
        self.input_scale = math.pi if encoding == "angle_pi" else 1.0
        self.seed = seed
        self.program_raw = ansatz_lib.build(q_ansatz, num_qubits)
        self.params_per_layer = prog.num_params(self.program_raw)
        assert self.params_per_layer == ansatz_lib.PARAM_COUNTS[q_ansatz](num_qubits)
        # Diagonal fusion collapses commuting RZ/PS/CZ/CRZ runs into single
        # phase ops (cross_mesh: 240 CRZ -> 1 op at 16 qubits).
        self.program = (
            diag_fusion.fuse_diagonals(self.program_raw, num_qubits)
            if fuse
            else self.program_raw
        )

        epilogue = []
        if num_qubits >= 4 and seed is not None:
            u1, u2 = gates.haar_2q_pair(seed)
            epilogue.append(prog.Op("u2q", (0, 1), const=u1))
            epilogue.append(prog.Op("u2q", (2, 3), const=u2))
        if num_qubits > 0:
            epilogue.append(prog.Op("h", (num_qubits - 1,)))
        self.epilogue = tuple(epilogue)

        # lax.scan over layers keeps the traced graph O(1) in depth; unroll
        # for a single layer (nothing to scan) keeps XLA's fusion window big.
        self.use_scan = (self.layers > 1) if use_scan is None else use_scan
        # jax.checkpoint on the state evolution. Off by default: measured
        # SLOWER on v5e at B<=1024 (237 vs 170 ms/step) and the remote
        # compiler failed on remat+scan at large B. Kept as an opt-in for
        # memory-constrained reverse-mode workloads; the forward-mode
        # operators (physics/operators_fwd.py) are the preferred fix.
        self.remat = remat

    # -- parameters ---------------------------------------------------------

    def init_params(self, key: jax.Array) -> jnp.ndarray:
        """Xavier-normal over the (layers, P) view, matching
        ``torch.nn.init.xavier_normal_`` in nn/DVQuantumLayer.py:216-244:
        std = sqrt(2 / (fan_in + fan_out)) with fan_in=P, fan_out=layers."""
        shape = (self.layers, self.params_per_layer)
        std = math.sqrt(2.0 / (shape[0] + shape[1]))
        return std * jax.random.normal(key, shape, dtype=jnp.float32)

    @property
    def num_params(self) -> int:
        return self.layers * self.params_per_layer

    # -- forward ------------------------------------------------------------

    def prepare(self, x: jnp.ndarray) -> jnp.ndarray:
        """Encode inputs ``[B, F]`` into the initial state ``[B, 2^n]``."""
        if self.encoding == "amplitude":
            return sv.encode_amplitude(x, self.n)
        state = sv.zero_state(x.shape[0], self.n)
        return sv.encode_angle(state, self.n, x * self.input_scale)

    def evolve(self, params: jnp.ndarray, state: jnp.ndarray) -> jnp.ndarray:
        """Apply all ansatz layers + epilogue to a prepared state."""
        params = params.reshape(self.layers, self.params_per_layer)
        if self.use_scan and self.layers > 1:
            def step(s, layer_params):
                return prog.apply_program(s, self.n, self.program, layer_params), None

            state, _ = jax.lax.scan(step, state, params)
        else:
            for layer in range(self.layers):
                state = prog.apply_program(state, self.n, self.program, params[layer])
        return prog.apply_program(state, self.n, self.epilogue, jnp.zeros((0,)))

    def state(self, params: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        if self.remat:
            fn = jax.checkpoint(lambda p, xx: self.evolve(p, self.prepare(xx)))
            return fn(params, x)
        return self.evolve(params, self.prepare(x))

    def apply(
        self,
        params: jnp.ndarray,
        x: jnp.ndarray,
        *,
        shots: Optional[int] = None,
        key: Optional[jax.Array] = None,
        noise: Optional[measure.NoiseModel] = None,
    ) -> jnp.ndarray:
        """``[B, F] -> [B, n]`` per-wire Z expectations."""
        if noise is not None:
            noise = noise.bind(self)  # depth-aware gate counts (no-op otherwise)
        state = self.state(params, x)
        if shots is None:
            return measure.exact_z(state, self.n, noise)
        if key is None:
            raise ValueError("shots mode needs a PRNG key")
        return measure.sampled_z(state, self.n, shots, key, noise)

    def __call__(self, params, x, **kw):
        return self.apply(params, x, **kw)

    def dense_unitary(self, params: np.ndarray) -> np.ndarray:
        """Test oracle: the full circuit unitary (ansatz layers + epilogue),
        excluding the input encoding."""
        params = np.asarray(params).reshape(self.layers, self.params_per_layer)
        dim = 1 << self.n
        total = np.eye(dim, dtype=np.complex128)
        for layer in range(self.layers):
            total = prog.dense_unitary(self.n, self.program_raw, params[layer]) @ total
        total = prog.dense_unitary(self.n, self.epilogue, np.zeros(0)) @ total
        return total

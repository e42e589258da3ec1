"""DV hybrid PDE solver: classical encoder -> quantum circuit -> decoder.

TPU-native equivalent of nn/DVPDESolver.py:28-114 — a pure function of a
params pytree. Architecture (classic_network = [in, hidden, out]):

  preprocessor:  Linear(in, hidden) -> Tanh -> Linear(hidden, n_qubits)
  quantum:       DVCircuit (ansatz layers, exact <Z_w> readout)
  postprocessor: Linear(n_qubits, hidden) -> Tanh -> Linear(hidden, out)

The reference's shape fixups for PennyLane's (n, B)-vs-(B, n) output
(nn/DVPDESolver.py:98-107) are unnecessary: the engine is natively batched.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import QCPINNConfig
from ..ops import DVCircuit, NoiseModel
from . import nn_core as nc


class DVSolver:
    def __init__(self, config: QCPINNConfig):
        self.config = config
        self.n = config.num_qubits
        in_dim, hidden, out_dim = config.classic_network
        self.dims_pre = (in_dim, hidden, self.n)
        self.dims_post = (self.n, hidden, out_dim)
        self.circuit = DVCircuit(
            num_qubits=self.n,
            num_quantum_layers=config.num_quantum_layers,
            q_ansatz=config.q_ansatz,
            encoding=config.encoding,
            seed=config.seed,
        )
        self.noise = None
        if (config.noise_depolarizing or config.noise_readout
                or getattr(config, "noise_per_gate", 0.0)):
            self.noise = NoiseModel(
                config.noise_depolarizing,
                config.noise_readout,
                getattr(config, "noise_per_gate", 0.0),
            )
        self._fused = None

    def use_pallas(self, interpret: bool = False, backend: str = "auto") -> "DVSolver":
        """Switch the quantum block to a fused-circuit backend.
        ``backend``: auto | block | loop | unrolled — auto picks the MXU
        block-fused engine (any-order AD) for n >= 10, the unrolled Pallas
        kernels otherwise. The Pallas backends (loop/unrolled) are
        first-order reverse only — PDE-residual training composes with
        them via tangent streams (physics/streams.py); the block backend
        also supports the nested-AD operators directly.

        Degrades gracefully (the reference's device-fallback-ladder analog,
        nn/DVQuantumLayer.py:100-131): if no fused backend can be built
        for this circuit, the XLA path stays active."""
        from ..ops.pallas_loop import make_fused_backend

        try:
            self._fused = make_fused_backend(
                self.circuit, interpret=interpret, backend=backend
            )
        except Exception as e:  # noqa: BLE001 - fallback is the feature
            import warnings

            warnings.warn(f"pallas backend unavailable ({e}); using XLA path")
            self._fused = None
        return self

    def use_sharded(
        self, mesh, amp_axis: str = "amp", data_axis: str = "data",
        backend: str = "gate",
    ) -> "DVSolver":
        """Route the quantum block through an amplitude-sharded engine:
        the 2^n state is split over the mesh's ``amp_axis`` and the batch
        over ``data_axis``. Lifts the per-chip HBM cap on qubit count /
        residual batch; any-order differentiable, so it composes with the
        nested-AD PDE operators inside the jitted train step.

        ``backend='gate'`` is the hand-written per-gate shard_map engine
        (parallel/sharded_sv.py, cross-shard gates ride ICI ppermutes);
        ``backend='block'`` is the GSPMD block-fused engine
        (parallel/sharded_block.py, MXU einsums with XLA-inserted
        collectives). Both cover the full apply contract including
        shots/noise measurement modes."""
        if backend == "block":
            from ..parallel.sharded_block import ShardedBlockCircuit

            self._fused = ShardedBlockCircuit(
                self.circuit, mesh, amp_axis, data_axis
            )
        elif backend == "gate":
            from ..parallel.sharded_sv import ShardedCircuit

            self._fused = ShardedCircuit(self.circuit, mesh, amp_axis, data_axis)
        else:
            raise ValueError(f"unknown sharded backend {backend!r}")
        return self

    def init(self, key: jax.Array) -> dict:
        k_pre, k_q, k_post = jax.random.split(key, 3)
        return {
            "pre": nc.mlp_init(k_pre, self.dims_pre),
            "q": self.circuit.init_params(k_q),
            "post": nc.mlp_init(k_post, self.dims_post),
        }

    def hw_apply_fn(self, shots: Optional[int]):
        """Build ``apply(params, x, key) -> [B, out]`` whose quantum block
        uses the parameter-shift estimator (train/hardware_grad.py) — the
        hardware-fidelity training path: shot-sampled measurements,
        gradients from shifted re-evaluations (the reference's
        diff_method="parameter-shift", nn/DVQuantumLayer.py:140). Gradients
        flow into the quantum weights AND through the circuit inputs into
        the preprocessor, composing with ordinary autodiff elsewhere."""
        from ..train.hardware_grad import make_hw_apply

        # self.noise rides along so the parameter-shift training channel
        # matches apply()/validation/eval (same depolarizing/readout model)
        hw = make_hw_apply(self.circuit, shots, noise=self.noise)

        def apply(params, x, key):
            pre = nc.mlp_apply(params["pre"], x)
            z = hw(params["q"], pre, key)
            return nc.mlp_apply(params["post"], z)

        return apply

    def apply(
        self,
        params: dict,
        x: jnp.ndarray,
        *,
        shots: Optional[int] = None,
        key: Optional[jax.Array] = None,
        detach_quantum: bool = False,
    ) -> jnp.ndarray:
        pre = nc.mlp_apply(params["pre"], x)
        qblock = self._fused if self._fused is not None else self.circuit
        z = qblock.apply(params["q"], pre, shots=shots, key=key, noise=self.noise)
        if detach_quantum:
            # two-phase head tuning (CG_HQPINN_IBMtest_16qubits.py:131-132)
            z = jax.lax.stop_gradient(z)
        return nc.mlp_apply(params["post"], z)

    def __call__(self, params, x, **kw):
        return self.apply(params, x, **kw)

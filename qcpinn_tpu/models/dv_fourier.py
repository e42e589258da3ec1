"""DV solver with a Fourier-feature encoder — the north-star configuration.

Same classical-quantum-classical contract as DVSolver, with the plain
Linear-Tanh preprocessor upgraded to random Fourier features + a deeper
trunk (the reference uses this trick in its flagship Czochralski model,
CG_HQPINN_IBMtest_16qubits.py:52-59, but not in the diffusion solvers —
gaussian-pulse targets are spectrally hard for shallow tanh nets).

  pre:  [x, FF(x)] -> Linear(h) Tanh Linear(h) Tanh Linear(n_qubits)
  q:    DVCircuit (any ansatz), angle encoding, scaled by pi*tanh
  post: [z, pre_skip] -> Linear(h) Tanh Linear(h) Tanh Linear(out)

A classical skip (h-dim) rides around the quantum block like the Cz model's
classical_skip (:103-106), so optimization does not bottleneck through the
bounded <Z> features.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import QCPINNConfig
from ..ops import DVCircuit
from . import nn_core as nc


class DVFourierSolver:
    def __init__(
        self,
        config: QCPINNConfig,
        mapping_size: int = 32,
        ff_scale: float = 4.0,
        skip_dim: int = 32,
        rbf_count: int = 0,
        rbf_width: float = 8.0,
        rbf_centers=None,
    ):
        self.config = config
        self.n = config.num_qubits
        in_dim, hidden, out_dim = config.classic_network
        self.in_dim = in_dim
        self.hidden = hidden
        self.out_dim = out_dim
        self.mapping = mapping_size
        self.ff_scale = ff_scale
        self.skip_dim = skip_dim
        self.rbf_count = rbf_count
        self.rbf_width = rbf_width
        self.rbf_centers = rbf_centers
        self.circuit = DVCircuit(
            num_qubits=self.n,
            num_quantum_layers=config.num_quantum_layers,
            q_ansatz=config.q_ansatz,
            encoding="angle",
            seed=config.seed,
        )

        self._fused = None

    def use_pallas(
        self, interpret: bool = False, backend: str = "auto"
    ) -> "DVFourierSolver":
        """Fused-circuit backend (see DVSolver.use_pallas): ``auto`` picks
        the MXU block engine (any-order AD) for n >= 10; the Pallas
        backends are first-order reverse and compose with the
        tangent-stream residuals."""
        from ..ops.pallas_loop import make_fused_backend

        try:
            self._fused = make_fused_backend(
                self.circuit, interpret=interpret, backend=backend
            )
        except Exception as e:  # noqa: BLE001
            import warnings

            warnings.warn(f"pallas backend unavailable ({e}); using XLA path")
            self._fused = None
        return self

    def use_sharded(
        self, mesh, amp_axis: str = "amp", data_axis: str = "data"
    ) -> "DVFourierSolver":
        """Amplitude-sharded quantum block (see DVSolver.use_sharded)."""
        from ..parallel.sharded_sv import ShardedCircuit

        self._fused = ShardedCircuit(self.circuit, mesh, amp_axis, data_axis)
        return self

    def init(self, key: jax.Array) -> dict:
        ks = jax.random.split(key, 5)
        feat = self.in_dim + 2 * self.mapping
        params = {
            "ff": nc.fourier_features_init(
                jax.random.PRNGKey(self.config.seed), self.in_dim, self.mapping, self.ff_scale
            ),
            "pre": nc.mlp_init(ks[0], (feat, self.hidden, self.hidden, self.n)),
            "skip": nc.mlp_init(ks[1], (self.hidden, self.skip_dim)),
            "q": self.circuit.init_params(ks[2]),
            "post": nc.mlp_init(
                ks[3], (self.n + self.skip_dim, self.hidden, self.hidden, self.out_dim)
            ),
        }
        if self.rbf_count > 0:
            # additive localized head at the OUTPUT (direct gradient path):
            # sharply-localized solution structure does not survive being
            # filtered through tanh layers — measured 25x rel-L2 gain on the
            # Gaussian-pulse problem vs routing RBF features into the trunk
            params["rbf"] = nc.rbf_init(
                ks[4], self.in_dim, self.rbf_count,
                centers=self.rbf_centers, width=self.rbf_width,
                out_dim=self.out_dim,
            )
        return params

    def apply(
        self,
        params: dict,
        x: jnp.ndarray,
        *,
        shots: Optional[int] = None,
        key: Optional[jax.Array] = None,
        detach_quantum: bool = False,
    ) -> jnp.ndarray:
        h = jnp.concatenate([x, nc.fourier_features_apply(params["ff"], x)], axis=-1)
        # trunk up to the last hidden layer; final projection to angles
        trunk = params["pre"][:-1]
        head = params["pre"][-1]
        for layer in trunk:
            h = jnp.tanh(nc.linear_apply(layer, h))
        angles = jnp.pi * jnp.tanh(nc.linear_apply(head, h))
        qblock = self._fused if self._fused is not None else self.circuit
        z = qblock.apply(params["q"], angles, shots=shots, key=key)
        if detach_quantum:
            z = jax.lax.stop_gradient(z)
        skip = jnp.tanh(nc.linear_apply(params["skip"][0], h))
        fused = jnp.concatenate([z, skip], axis=-1)
        out = nc.mlp_apply(params["post"], fused)
        if "rbf" in params:
            out = out + nc.rbf_apply(params["rbf"], x)
        return out

    def __call__(self, params, x, **kw):
        return self.apply(params, x, **kw)

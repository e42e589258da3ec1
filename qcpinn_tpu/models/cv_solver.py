"""CV hybrid PDE solver (nn/CVPDESolver.py): the same classical sandwich as
the DV solver around a CV photonic middle layer."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import QCPINNConfig
from . import nn_core as nc
from .cv_layer import CVLayer


class CVSolver:
    def __init__(self, config: QCPINNConfig):
        self.config = config
        self.m = config.num_qubits  # reference reuses num_qubits for qumodes
        in_dim, hidden, out_dim = config.classic_network
        self.dims_pre = (in_dim, hidden, self.m)
        self.dims_post = (self.m, hidden, out_dim)
        self.cv = CVLayer(
            num_qumodes=self.m,
            num_layers=config.num_quantum_layers,
            cutoff_dim=config.cutoff_dim,
            variant=config.cv_class,
            readout=getattr(config, "cv_readout", None),
        )

    def init(self, key: jax.Array) -> dict:
        k_pre, k_cv, k_post = jax.random.split(key, 3)
        return {
            "pre": nc.mlp_init(k_pre, self.dims_pre),
            "cv": self.cv.init(k_cv),
            "post": nc.mlp_init(k_post, self.dims_post),
        }

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        pre = nc.mlp_apply(params["pre"], x)
        z = self.cv.apply(params["cv"], pre)
        return nc.mlp_apply(params["post"], z)

    def __call__(self, params, x, **kw):
        return self.apply(params, x, **kw)

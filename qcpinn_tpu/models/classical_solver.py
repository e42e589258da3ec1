"""Classical baseline: modern-Hopfield (batch self-association) solver.

nn/ClassicalSolver.py + nn/hopfield_layer.py as pure functions:

  pre:      Linear(in, hidden) -> Tanh
  hopfield: softmax(beta * Q K^T) V over the batch (self-association)
  residual: pre + hopfield
  post:     Tanh -> Linear(hidden, out)

The B x B attention couples the batch; PDE operators handle this correctly
because they use sum-gradient (torch-equivalent) semantics. Batch sharding
via ``with_sharding_constraint`` (the train-loop path, parallel/mesh.py
batch_sharding) keeps GLOBAL attention semantics: GSPMD sees the full
[B, h] operands and inserts the all-gather for the B x B score matrix
itself — verified against the single-device forward in
tests/test_parallel.py::test_hopfield_sharded_matches_single_device. Only a
manual ``shard_map`` over the batch would silently localize the softmax;
none of the library's paths does that to this solver.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import QCPINNConfig
from . import nn_core as nc


def hopfield_init(key: jax.Array, input_dim: int, hidden_dim: int) -> dict:
    kq, kk, kv = jax.random.split(key, 3)
    return {
        "w_q": nc.linear_init(kq, input_dim, hidden_dim, bias=False),
        "w_k": nc.linear_init(kk, input_dim, hidden_dim, bias=False),
        "w_v": nc.linear_init(kv, input_dim, hidden_dim, bias=False),
    }


def hopfield_apply(params: dict, x: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    q = nc.linear_apply(params["w_q"], x)
    k = nc.linear_apply(params["w_k"], x)
    v = nc.linear_apply(params["w_v"], x)
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST) * beta
    weights = jax.nn.softmax(scores, axis=-1)
    return jnp.dot(weights, v, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)


class ClassicalSolver:
    # the B x B Hopfield attention self-associates over the batch, so loss
    # terms must NOT be concatenated into one apply (train/loop.py
    # fuse_value_terms gates on this)
    batch_coupled = True

    def __init__(self, config: QCPINNConfig, beta: float = 1.0):
        self.config = config
        self.beta = beta
        in_dim, hidden, out_dim = config.classic_network
        self.in_dim, self.hidden, self.out_dim = in_dim, hidden, out_dim

    def init(self, key: jax.Array) -> dict:
        k_pre, k_hop, k_post = jax.random.split(key, 3)
        return {
            "pre": nc.linear_init(k_pre, self.in_dim, self.hidden),
            "hopfield": hopfield_init(k_hop, self.hidden, self.hidden),
            "post": nc.linear_init(k_post, self.hidden, self.out_dim),
        }

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        pre = jnp.tanh(nc.linear_apply(params["pre"], x))
        hop = hopfield_apply(params["hopfield"], pre, self.beta)
        res = pre + hop  # residual connection (nn/ClassicalSolver.py:70-71)
        return nc.linear_apply(params["post"], jnp.tanh(res))

    def __call__(self, params, x, **kw):
        return self.apply(params, x, **kw)

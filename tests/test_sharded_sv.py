"""Amplitude-sharded statevector: cross-shard gates via ppermute must match
the single-device engine exactly, for every ansatz, at several shard
counts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qcpinn_tpu.ops import DVCircuit
from qcpinn_tpu.parallel import make_mesh
from qcpinn_tpu.parallel.sharded_sv import make_sharded_circuit_apply


def _compare(n, ansatz, layers, data, amp, seed=None, batch=8):
    circ = DVCircuit(n, layers, ansatz, seed=seed)
    params = circ.init_params(jax.random.PRNGKey(0))
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (batch, n), minval=-np.pi, maxval=np.pi
    )
    ref = np.asarray(jax.jit(circ.apply)(params, x))
    mesh = make_mesh(data=data, amp=amp)
    sharded = jax.jit(make_sharded_circuit_apply(circ, mesh))
    got = np.asarray(sharded(params, x))
    np.testing.assert_allclose(got, ref, atol=5e-5)


@pytest.mark.parametrize("amp", [2, 4, 8])
def test_cascade_sharded(amp):
    _compare(4, "cascade", 1, data=8 // amp, amp=amp)


@pytest.mark.parametrize("ansatz", ["layered", "alternate", "farhi", "sim_circ_15", "cross_mesh"])
def test_all_ansatze_sharded_amp4(ansatz):
    _compare(5, ansatz, 1, data=2, amp=4)


def test_haar_epilogue_sharded():
    # the fixed Haar blocks sit on wires [0,1],[2,3] — fully inside the
    # sharded bits at amp=4, exercising the both-sharded 2q path
    _compare(4, "cascade", 1, data=2, amp=4, seed=11)


def test_two_layers_sharded():
    _compare(4, "layered", 2, data=2, amp=4)


def test_gradients_through_sharded_engine():
    # n=3 (no Haar epilogue) keeps the transpose-of-ppermute graph small
    # enough for the fast gate; the forward parity sweeps cover n=4-5
    circ = DVCircuit(3, 1, "cascade")
    params = circ.init_params(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 3))
    mesh = make_mesh(data=2, amp=4)
    sharded = make_sharded_circuit_apply(circ, mesh)

    g_sharded = jax.jit(jax.grad(lambda p: jnp.sum(sharded(p, x) ** 2)))(params)
    g_ref = jax.jit(jax.grad(lambda p: jnp.sum(circ.apply(p, x) ** 2)))(params)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_ref), atol=1e-4)

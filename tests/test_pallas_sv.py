"""Pallas fused-circuit kernels in interpreter mode: forward parity against
the XLA engine and first-order gradient parity via the reverse-sweep VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qcpinn_tpu.ops.circuit import DVCircuit
from qcpinn_tpu.ops.pallas_sv import FusedCircuit, compile_circuit


def _setup(ansatz, n=4, layers=1, seed=None, key=0):
    circ = DVCircuit(n, layers, ansatz, seed=seed)
    params = circ.init_params(jax.random.PRNGKey(key))
    fused = FusedCircuit(circ, interpret=True)
    x = jax.random.uniform(
        jax.random.PRNGKey(key + 1), (4, n), minval=-np.pi, maxval=np.pi
    )
    return circ, fused, params, x


@pytest.mark.parametrize(
    "ansatz",
    [
        "cross_mesh",  # fast-gate representative (1q + fused diag + epilogue)
        pytest.param("cascade", marks=pytest.mark.slow),
        pytest.param("layered", marks=pytest.mark.slow),
        pytest.param("farhi", marks=pytest.mark.slow),
        pytest.param("sim_circ_15", marks=pytest.mark.slow),
        pytest.param("alternate", marks=pytest.mark.slow),
    ],
)
def test_fused_forward_matches_xla(ansatz):
    circ, fused, params, x = _setup(ansatz)
    ref = np.asarray(circ.apply(params, x))
    got = np.asarray(fused.apply(params, x))
    np.testing.assert_allclose(got, ref, atol=3e-5)


@pytest.mark.slow
def test_fused_with_haar_epilogue():
    circ, fused, params, x = _setup("cascade", seed=11)
    assert any(s.kind == "u2q" for s in fused.mp.steps)
    np.testing.assert_allclose(
        np.asarray(fused.apply(params, x)), np.asarray(circ.apply(params, x)), atol=3e-5
    )


@pytest.mark.slow
def test_fused_multilayer():
    circ, fused, params, x = _setup("layered", layers=3)
    np.testing.assert_allclose(
        np.asarray(fused.apply(params, x)), np.asarray(circ.apply(params, x)), atol=5e-5
    )


@pytest.mark.parametrize(
    "ansatz",
    [
        "cross_mesh",  # fast-gate representative of the reverse-sweep VJP
        pytest.param("cascade", marks=pytest.mark.slow),
        pytest.param("layered", marks=pytest.mark.slow),
    ],
)
def test_fused_param_gradients_match(ansatz):
    circ, fused, params, x = _setup(ansatz, seed=5)

    def loss_f(p, c):
        return jnp.sum(c.apply(p, x) ** 2)

    g_ref = jax.grad(loss_f)(params, circ)
    g_fused = jax.grad(loss_f)(params, fused)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), atol=2e-4)


@pytest.mark.slow
def test_fused_input_gradients_match():
    circ, fused, params, x = _setup("cross_mesh")

    def loss_x(xx, c):
        return jnp.sum(c.apply(params, xx) ** 2)

    g_ref = jax.grad(loss_x)(x, circ)
    g_fused = jax.grad(loss_x)(x, fused)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), atol=2e-4)


def test_fused_amplitude_encoding_parity():
    """Amplitude encoding on the unrolled Pallas backend
    (nn/DVQuantumLayer.py:177-180): prepared state outside the kernel,
    evolve-only micro-program inside — forward AND gradient parity."""
    circ = DVCircuit(3, 1, "cascade", encoding="amplitude")
    fused = FusedCircuit(circ, interpret=True)
    params = circ.init_params(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 5)) + 0.1
    np.testing.assert_allclose(
        np.asarray(fused.apply(params, x)),
        np.asarray(circ.apply(params, x)),
        atol=3e-5,
    )
    g_f = jax.jit(jax.grad(lambda p: jnp.sum(fused.apply(p, x) ** 2)))(params)
    g_r = jax.jit(jax.grad(lambda p: jnp.sum(circ.apply(p, x) ** 2)))(params)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r), atol=3e-5)


def test_micro_program_structure():
    circ = DVCircuit(4, 1, "cross_mesh")
    mp = compile_circuit(circ)
    kinds = [s.kind for s in mp.steps]
    # 4 encode RX + 4 RX + 1 diag(rz+crz) + 4 RX + 1 diag(rz) + 1 H
    assert kinds.count("diag") == 2
    assert kinds.count("1q") == 4 + 4 + 4 + 1
    assert mp.num_phases == 2


def test_fused_shots_mode():
    circ, fused, params, x = _setup("cascade")
    z = fused.apply(params, x, shots=512, key=jax.random.PRNGKey(3))
    exact = fused.apply(params, x)
    assert np.all(np.abs(np.asarray(z)) <= 1.0 + 1e-6)
    assert float(jnp.mean(jnp.abs(z - exact))) < 0.2

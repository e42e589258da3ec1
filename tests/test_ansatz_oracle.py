"""Ansatz gate-ORDER parity against the independent dense oracle
(tests/oracle_dense.py) — the engine's outputs must match a from-scratch
numpy implementation of the reference's PennyLane circuit semantics at
n = 3..5, for every ansatz, with and without the Haar epilogue."""

import jax
import numpy as np
import pytest

from qcpinn_tpu.ops import DVCircuit

from oracle_dense import reference_circuit

ANSATZE = ["cascade", "layered", "alternate", "farhi", "sim_circ_15",
           "cross_mesh", "rot_ring"]


@pytest.mark.parametrize("ansatz", ANSATZE)
@pytest.mark.parametrize("n", [3, 4, 5])
def test_engine_matches_independent_oracle(ansatz, n, rng):
    circ = DVCircuit(
        num_qubits=n, num_quantum_layers=1, q_ansatz=ansatz, seed=11
    )
    params = circ.init_params(jax.random.PRNGKey(0))
    x = rng.uniform(-np.pi, np.pi, (4, n)).astype(np.float32)

    got = np.asarray(jax.jit(circ.apply)(params, x))

    p_np = np.asarray(jax.device_get(params), dtype=np.float64)
    want = np.stack(
        [reference_circuit(n, ansatz, p_np, x[b], seed=11) for b in range(4)]
    )
    np.testing.assert_allclose(got, want, atol=5e-6)


@pytest.mark.parametrize("ansatz", ["cascade", "cross_mesh"])
def test_two_layer_matches_oracle(ansatz, rng):
    n = 4
    circ = DVCircuit(num_qubits=n, num_quantum_layers=2, q_ansatz=ansatz, seed=3)
    params = circ.init_params(jax.random.PRNGKey(1))
    x = rng.uniform(-np.pi, np.pi, (2, n)).astype(np.float32)
    got = np.asarray(jax.jit(circ.apply)(params, x))
    p_np = np.asarray(jax.device_get(params), dtype=np.float64)
    want = np.stack(
        [reference_circuit(n, ansatz, p_np, x[b], seed=3) for b in range(2)]
    )
    np.testing.assert_allclose(got, want, atol=5e-6)


@pytest.mark.parametrize("n", [2, 3, 4, 5])
def test_rot_ring_pi_encoding_matches_oracle(n, rng):
    """The standalone trainer's full circuit (trainer/train.py:205-218):
    RX(pi*x_i) embedding + Rot-per-qubit + CNOT ring, 2 layers, no Haar
    epilogue in the reference file (seed=None path) — exact parity."""
    circ = DVCircuit(
        num_qubits=n, num_quantum_layers=2, q_ansatz="rot_ring",
        encoding="angle_pi", seed=None,
    )
    assert circ.params_per_layer == 3 * n
    params = circ.init_params(jax.random.PRNGKey(4))
    x = rng.uniform(-1.0, 1.0, (3, n)).astype(np.float32)  # tanh-squashed
    got = np.asarray(jax.jit(circ.apply)(params, x))
    p_np = np.asarray(jax.device_get(params), dtype=np.float64)
    want = np.stack(
        [
            reference_circuit(
                n, "rot_ring", p_np, x[b], seed=None, encoding="angle_pi"
            )
            for b in range(3)
        ]
    )
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_no_haar_below_four_qubits(rng):
    """n=3 must NOT get the Haar epilogue (nn/DVQuantumLayer.py:88-94)."""
    n = 3
    circ = DVCircuit(num_qubits=n, num_quantum_layers=1, q_ansatz="cascade", seed=5)
    params = circ.init_params(jax.random.PRNGKey(2))
    x = rng.uniform(-np.pi, np.pi, (2, n)).astype(np.float32)
    got = np.asarray(jax.jit(circ.apply)(params, x))
    p_np = np.asarray(jax.device_get(params), dtype=np.float64)
    want = np.stack(
        [reference_circuit(n, "cascade", p_np, x[b], seed=None) for b in range(2)]
    )
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_amplitude_encoding_matches_oracle(rng):
    n = 3
    circ = DVCircuit(
        num_qubits=n, num_quantum_layers=1, q_ansatz="layered",
        encoding="amplitude", seed=7,
    )
    params = circ.init_params(jax.random.PRNGKey(3))
    feats = rng.uniform(0.1, 1.0, (2, 5)).astype(np.float32)  # padded to 8
    got = np.asarray(jax.jit(circ.apply)(params, feats))
    p_np = np.asarray(jax.device_get(params), dtype=np.float64)
    want = np.stack(
        [
            reference_circuit(n, "layered", p_np, feats[b], seed=None,
                              encoding="amplitude")
            for b in range(2)
        ]
    )
    np.testing.assert_allclose(got, want, atol=5e-6)

"""Per-ansatz parity: engine evaluation vs the dense-matrix oracle at small
n, exact parameter counts, and full DVCircuit semantics (encoding + layers +
Haar epilogue + final Hadamard + <Z> readout)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qcpinn_tpu.ops import ansatz, statevector as sv
from qcpinn_tpu.ops.circuit import DVCircuit

ANSATZE = sorted(ansatz.BUILDERS)


@pytest.mark.parametrize("name", ANSATZE)
@pytest.mark.parametrize("n", [3, 5])
def test_param_counts(name, n):
    prog = ansatz.build(name, n)
    from qcpinn_tpu.ops.program import num_params

    assert num_params(prog) == ansatz.PARAM_COUNTS[name](n)


@pytest.mark.parametrize("name", ANSATZE)
def test_even_n_param_counts(name):
    # 'alternate' is unusable for even n in the reference (index overflow,
    # SURVEY.md §7.4); here it must still produce exactly 4n-4 params.
    prog = ansatz.build(name, 4)
    from qcpinn_tpu.ops.program import num_params

    assert num_params(prog) == ansatz.PARAM_COUNTS[name](4)


@pytest.mark.parametrize("name", ANSATZE)
@pytest.mark.parametrize("n,layers", [(2, 1), (3, 2), (5, 1)])
def test_engine_matches_dense_oracle(rng, name, n, layers):
    if name == "alternate" and n == 2:
        pytest.skip("4n-4 = 4 params only covers one block; fine but trivial")
    circ = DVCircuit(n, layers, name, encoding="angle", seed=7 if n >= 4 else None)
    params = 0.3 * rng.standard_normal((layers, circ.params_per_layer)).astype(np.float32)
    x = rng.uniform(-np.pi, np.pi, size=(3, n)).astype(np.float32)

    got = np.asarray(circ.apply(jnp.asarray(params), jnp.asarray(x)))

    dense = circ.dense_unitary(params)
    for b in range(x.shape[0]):
        psi0 = np.array([1.0], dtype=np.complex128)
        for w in range(n):
            t = x[b, w]
            rxm = np.array(
                [
                    [np.cos(t / 2), -1j * np.sin(t / 2)],
                    [-1j * np.sin(t / 2), np.cos(t / 2)],
                ]
            )
            psi0 = np.kron(psi0, rxm @ np.array([1.0, 0.0]))
        psi = dense @ psi0
        probs = np.abs(psi) ** 2
        for w in range(n):
            signs = np.array(
                [1.0 if ((i >> (n - 1 - w)) & 1) == 0 else -1.0 for i in range(1 << n)]
            )
            np.testing.assert_allclose(got[b, w], probs @ signs, atol=2e-5)


def test_haar_epilogue_present_only_with_seed_and_n4():
    assert len(DVCircuit(4, 1, "cascade", seed=3).epilogue) == 3  # u1, u2, H
    assert len(DVCircuit(4, 1, "cascade", seed=None).epilogue) == 1  # H only
    assert len(DVCircuit(3, 1, "cascade", seed=3).epilogue) == 1  # n < 4


def test_haar_blocks_reproducible():
    a = DVCircuit(4, 1, "cascade", seed=11)
    b = DVCircuit(4, 1, "cascade", seed=11)
    np.testing.assert_array_equal(a.epilogue[0].const, b.epilogue[0].const)
    c = DVCircuit(4, 1, "cascade", seed=12)
    assert not np.allclose(a.epilogue[0].const, c.epilogue[0].const)


def test_amplitude_encoding_circuit(rng):
    circ = DVCircuit(3, 1, "layered", encoding="amplitude")
    params = circ.init_params(jax.random.PRNGKey(0))
    x = rng.standard_normal((4, 5)).astype(np.float32)  # 5 features -> pad to 8
    out = circ.apply(params, jnp.asarray(x))
    assert out.shape == (4, 3)
    assert np.all(np.abs(np.asarray(out)) <= 1.0 + 1e-5)


def test_scan_equals_unroll(rng):
    n, layers = 3, 4
    params = 0.2 * rng.standard_normal((layers, 3 * n)).astype(np.float32)
    x = rng.uniform(-1, 1, size=(2, n)).astype(np.float32)
    scan = DVCircuit(n, layers, "cascade", use_scan=True)
    unroll = DVCircuit(n, layers, "cascade", use_scan=False)
    np.testing.assert_allclose(
        np.asarray(scan.apply(jnp.asarray(params), jnp.asarray(x))),
        np.asarray(unroll.apply(jnp.asarray(params), jnp.asarray(x))),
        atol=1e-6,
    )


def test_xavier_init_stats():
    circ = DVCircuit(6, 2, "cross_mesh")
    p = circ.init_params(jax.random.PRNGKey(0))
    assert p.shape == (2, 4 * 6 + 6 * 5)
    expected_std = np.sqrt(2.0 / (2 + p.shape[1]))
    assert abs(float(jnp.std(p)) - expected_std) < 0.05


def test_gradients_exist_for_all_ansatze(rng):
    n = 3
    x = jnp.asarray(rng.uniform(-1, 1, size=(4, n)).astype(np.float32))
    for name in ANSATZE:
        circ = DVCircuit(n, 1, name)
        params = circ.init_params(jax.random.PRNGKey(1))

        def loss(p):
            return jnp.sum(circ.apply(p, x) ** 2)

        g = jax.jit(jax.grad(loss))(params)
        assert np.all(np.isfinite(np.asarray(g))), name
        assert float(jnp.max(jnp.abs(g))) > 0, name


def test_shot_sampling_statistics(rng):
    circ = DVCircuit(2, 1, "cascade")
    params = circ.init_params(jax.random.PRNGKey(2))
    x = jnp.asarray(rng.uniform(-1, 1, size=(1, 2)).astype(np.float32))
    exact = np.asarray(circ.apply(params, x))[0]
    shots = 4096
    keys = jax.random.split(jax.random.PRNGKey(3), 32)
    samples = np.stack(
        [np.asarray(circ.apply(params, x, shots=shots, key=k))[0] for k in keys]
    )
    # mean within ~5 sigma of exact; sigma = sqrt((1-z^2)/shots)
    sigma = np.sqrt((1 - exact**2) / shots) / np.sqrt(len(keys))
    assert np.all(np.abs(samples.mean(0) - exact) < 5 * sigma + 1e-3)

"""Gate matrices vs hand-written closed forms; engine application vs a
dense kron/basis-action oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qcpinn_tpu.ops import gates, program, statevector as sv


def _mat(x):
    return np.asarray(x, dtype=np.complex128)


def test_rx_matrix():
    t = 0.7
    expect = np.cos(t / 2) * np.eye(2) - 1j * np.sin(t / 2) * _mat(gates.X)
    np.testing.assert_allclose(_mat(gates.rx(t)), expect, atol=1e-6)


def test_ry_matrix():
    t = -1.3
    expect = np.cos(t / 2) * np.eye(2) - 1j * np.sin(t / 2) * _mat(gates.Y)
    np.testing.assert_allclose(_mat(gates.ry(t)), expect, atol=1e-6)


def test_rz_matrix():
    t = 2.1
    expect = np.diag([np.exp(-1j * t / 2), np.exp(1j * t / 2)])
    np.testing.assert_allclose(_mat(gates.rz(t)), expect, atol=1e-6)


def test_rot_is_rz_ry_rz():
    phi, theta, omega = 0.3, 1.1, -0.8
    expect = _mat(gates.rz(omega)) @ _mat(gates.ry(theta)) @ _mat(gates.rz(phi))
    np.testing.assert_allclose(_mat(gates.rot(phi, theta, omega)), expect, atol=1e-6)


def test_controlled_layout():
    g = gates.rx(0.5)
    c = _mat(gates.crx(0.5))
    np.testing.assert_allclose(c[:2, :2], np.eye(2), atol=1e-7)
    np.testing.assert_allclose(c[2:, 2:], _mat(g), atol=1e-7)
    np.testing.assert_allclose(c[:2, 2:], 0, atol=1e-7)


def test_batched_gate_shapes():
    t = jnp.array([0.1, 0.2, 0.3])
    assert gates.rx(t).shape == (3, 2, 2)
    assert gates.crz(t).shape == (3, 4, 4)


@pytest.mark.parametrize("n,wire", [(1, 0), (3, 0), (3, 1), (3, 2), (5, 3)])
def test_apply_1q_matches_dense(rng, n, wire):
    state = rng.standard_normal((2, 1 << n)) + 1j * rng.standard_normal((2, 1 << n))
    state = (state / np.linalg.norm(state, axis=1, keepdims=True)).astype(np.complex64)
    theta = 0.37
    out = np.asarray(sv.apply_1q(jnp.asarray(state), n, wire, gates.ry(theta)))
    dense = program.dense_unitary(n, (program.Op("ry", (wire,), (0,)),), np.array([theta]))
    np.testing.assert_allclose(out, state @ dense.T, atol=1e-5)


@pytest.mark.parametrize(
    "n,wa,wb,kind",
    [
        (2, 0, 1, "cnot"),
        (2, 1, 0, "cnot"),
        (3, 0, 2, "cz"),
        (3, 2, 0, "crx"),
        (4, 1, 3, "crz"),
        (4, 3, 1, "cnot"),
        (5, 4, 0, "crx"),
    ],
)
def test_apply_2q_matches_dense(rng, n, wa, wb, kind):
    state = rng.standard_normal((3, 1 << n)) + 1j * rng.standard_normal((3, 1 << n))
    state = (state / np.linalg.norm(state, axis=1, keepdims=True)).astype(np.complex64)
    theta = -0.9
    if kind in program.PARAM_2Q:
        op = program.Op(kind, (wa, wb), (0,))
        u = program._PARAM_2Q_FNS[kind](theta)
    else:
        op = program.Op(kind, (wa, wb))
        u = jnp.asarray(program._FIXED_2Q_MATS[kind])
    out = np.asarray(sv.apply_2q(jnp.asarray(state), n, wa, wb, u))
    dense = program.dense_unitary(n, (op,), np.array([theta]))
    np.testing.assert_allclose(out, state @ dense.T, atol=1e-5)


def test_apply_2q_haar_unitary(rng):
    n = 4
    u1, u2 = gates.haar_2q_pair(42)
    state = rng.standard_normal((2, 16)) + 1j * rng.standard_normal((2, 16))
    state = (state / np.linalg.norm(state, axis=1, keepdims=True)).astype(np.complex64)
    out = sv.apply_2q(jnp.asarray(state), n, 0, 1, jnp.asarray(u1))
    out = np.asarray(sv.apply_2q(out, n, 2, 3, jnp.asarray(u2)))
    prog_ops = (program.Op("u2q", (0, 1), const=u1), program.Op("u2q", (2, 3), const=u2))
    dense = program.dense_unitary(n, prog_ops, np.zeros(0))
    np.testing.assert_allclose(out, state @ dense.T, atol=1e-5)
    # norm preserved
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def test_z_expvals_against_numpy(rng):
    n = 3
    state = rng.standard_normal((4, 8)) + 1j * rng.standard_normal((4, 8))
    state = (state / np.linalg.norm(state, axis=1, keepdims=True)).astype(np.complex64)
    z = np.asarray(sv.z_expvals(jnp.asarray(state), n))
    probs = np.abs(state.astype(np.complex128)) ** 2
    for w in range(n):
        signs = np.array([1.0 if ((i >> (n - 1 - w)) & 1) == 0 else -1.0 for i in range(8)])
        np.testing.assert_allclose(z[:, w], probs @ signs, atol=1e-5)


def test_zero_state_and_angle_encoding():
    n = 2
    x = jnp.array([[np.pi, 0.0]])
    state = sv.encode_angle(sv.zero_state(1, n), n, x)
    # RX(pi)|0> = -i|1> on wire 0; wire 1 untouched -> state = -i|10>
    expect = np.zeros(4, dtype=np.complex64)
    expect[2] = -1j
    np.testing.assert_allclose(np.asarray(state)[0], expect, atol=1e-6)


def test_amplitude_encoding_normalizes_and_pads():
    x = jnp.array([[3.0, 4.0, 0.0], [1.0, 0.0, 0.0]])
    state = np.asarray(sv.encode_amplitude(x, 2))
    np.testing.assert_allclose(state[0], [0.6, 0.8, 0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(state[1], [1.0, 0.0, 0.0, 0.0], atol=1e-5)


def test_autodiff_through_engine():
    """Exact backprop through the simulator (the reference needs
    parameter-shift on hardware; we differentiate the simulation itself)."""
    n = 2

    def f(theta):
        state = sv.zero_state(1, n)
        state = sv.apply_1q(state, n, 0, gates.ry(theta))
        state = sv.apply_2q(state, n, 0, 1, jnp.asarray(gates.CNOT))
        return sv.z_expvals(state, n)[0, 1]  # <Z_1> = cos(theta)

    g = jax.grad(f)(0.4)
    np.testing.assert_allclose(g, -np.sin(0.4), atol=1e-5)
    # second derivative too (PDE residuals need it)
    g2 = jax.grad(jax.grad(f))(0.4)
    np.testing.assert_allclose(g2, -np.cos(0.4), atol=1e-5)

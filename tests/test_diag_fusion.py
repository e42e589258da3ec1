"""Diagonal fusion: fused programs must produce the *same state* (including
global phase, matching PennyLane conventions) as the unfused engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qcpinn_tpu.ops import ansatz, diag_fusion, program as prog, statevector as sv
from qcpinn_tpu.ops.circuit import DVCircuit
from qcpinn_tpu.ops.program import Op


def _rand_state(rng, b, n):
    s = rng.standard_normal((b, 1 << n)) + 1j * rng.standard_normal((b, 1 << n))
    return (s / np.linalg.norm(s, axis=1, keepdims=True)).astype(np.complex64)


def _run(ops, n, state, params):
    return np.asarray(
        prog.apply_program(jnp.asarray(state), n, ops, jnp.asarray(params))
    )


@pytest.mark.parametrize(
    "ops_fn,n,np_",
    [
        # pure RZ layer
        (lambda: tuple(Op("rz", (w,), (w,)) for w in range(4)), 4, 4),
        # CRZ mesh block
        (
            lambda: tuple(
                Op("crz", (i, j), (k,))
                for k, (i, j) in enumerate(
                    (i, j) for i in range(3) for j in range(3) if i != j
                )
            ),
            3,
            6,
        ),
        # mixed rz / ps / cz / crz
        (
            lambda: (
                Op("rz", (0,), (0,)),
                Op("cz", (0, 1)),
                Op("ps", (2,), (1,)),
                Op("crz", (1, 2), (2,)),
                Op("rz", (2,), (3,)),
            ),
            3,
            4,
        ),
    ],
)
def test_fused_equals_unfused_state(rng, ops_fn, n, np_):
    ops = ops_fn()
    fused = diag_fusion.fuse_diagonals(ops, n)
    runs, plain = diag_fusion.count_fused(fused)
    assert runs == 1 and plain == 0
    params = rng.uniform(-2, 2, size=(np_,)).astype(np.float32)
    state = _rand_state(rng, 2, n)
    np.testing.assert_allclose(
        _run(fused, n, state, params), _run(ops, n, state, params), atol=1e-5
    )


def test_hoisting_past_disjoint_wires(rng):
    # RZ(0), RX(0), RZ(1): RZ(1) commutes past RX(0) -> one run of 2? No:
    # wire 0 is blocked after RX(0), but RZ(1)'s wire is free, so RZ(0) and
    # RZ(1) fuse into one run placed before RX(0). Verify numerically.
    ops = (Op("rz", (0,), (0,)), Op("rx", (0,), (1,)), Op("rz", (1,), (2,)))
    fused = diag_fusion.fuse_diagonals(ops, 2)
    runs, plain = diag_fusion.count_fused(fused)
    assert runs == 1 and plain == 1
    params = rng.uniform(-2, 2, size=(3,)).astype(np.float32)
    state = _rand_state(rng, 2, 2)
    np.testing.assert_allclose(
        _run(fused, 2, state, params), _run(ops, 2, state, params), atol=1e-6
    )


def test_blocked_wire_splits_run(rng):
    # RZ(0), RX(0), RZ(0): the second RZ(0) must NOT hoist past RX(0).
    ops = (Op("rz", (0,), (0,)), Op("rx", (0,), (1,)), Op("rz", (0,), (2,)))
    fused = diag_fusion.fuse_diagonals(ops, 1, min_run=1)
    params = rng.uniform(-2, 2, size=(3,)).astype(np.float32)
    state = _rand_state(rng, 2, 1)
    np.testing.assert_allclose(
        _run(fused, 1, state, params), _run(ops, 1, state, params), atol=1e-6
    )


@pytest.mark.parametrize("name", sorted(ansatz.BUILDERS))
def test_fused_circuit_matches_unfused(rng, name):
    n, layers = 4, 2
    fused = DVCircuit(n, layers, name, seed=5, fuse=True)
    plain = DVCircuit(n, layers, name, seed=5, fuse=False)
    params = 0.4 * rng.standard_normal((layers, fused.params_per_layer)).astype(
        np.float32
    )
    x = rng.uniform(-np.pi, np.pi, size=(3, n)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(fused.apply(jnp.asarray(params), jnp.asarray(x))),
        np.asarray(plain.apply(jnp.asarray(params), jnp.asarray(x))),
        atol=3e-5,
    )


def test_cross_mesh_fusion_degree():
    # at n=8: rx(8), [rz(8)+crz(56)] -> 1 run, rx(8), rz(8) -> 1 run
    fused = DVCircuit(8, 1, "cross_mesh").program
    runs, plain = diag_fusion.count_fused(fused)
    assert runs == 2
    assert plain == 16  # the two RX layers


def test_fusion_gradients(rng):
    circ = DVCircuit(4, 1, "cross_mesh", seed=1)
    params = circ.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.uniform(-1, 1, (5, 4)).astype(np.float32))

    def loss(p, fuse_circ):
        return jnp.sum(fuse_circ.apply(p, x) ** 2)

    plain = DVCircuit(4, 1, "cross_mesh", seed=1, fuse=False)
    g_fused = jax.grad(loss)(params, circ)
    g_plain = jax.grad(loss)(params, plain)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_plain), atol=1e-4)


def test_batched_params_diag_run(rng):
    """Data-reuploading circuits index per-sample params into diagonal runs."""
    ops = (Op("rz", (0,), (0,)), Op("crz", (0, 1), (1,)))
    fused = diag_fusion.fuse_diagonals(ops, 2)
    B = 3
    params = rng.uniform(-2, 2, size=(B, 2)).astype(np.float32)
    state = _rand_state(rng, B, 2)
    got = _run(fused, 2, state, params)
    for b in range(B):
        want = _run(ops, 2, state[b : b + 1], params[b])
        np.testing.assert_allclose(got[b : b + 1], want, atol=1e-5)

"""Loop-form Pallas kernel (ops/pallas_loop.py) parity vs the XLA engine.

Interpret mode on CPU; the gate-table fori_loop, dynamic rolls, SMEM banks,
and the reverse-sweep VJP all execute for real. Real-chip compile/runtime
numbers live in PARITY.md. Small sizes keep the default run fast; the full
six-ansatz sweep is marked slow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qcpinn_tpu.ops import statevector as sv
from qcpinn_tpu.ops.circuit import DVCircuit
from qcpinn_tpu.ops.pallas_loop import (
    LoopFusedCircuit,
    compile_loop_program,
    make_fused_backend,
)


def _circ(ansatz, n=4, layers=1, encoding="angle"):
    return DVCircuit(
        num_qubits=n, num_quantum_layers=layers, q_ansatz=ansatz,
        encoding=encoding, seed=7,
    )


def _parity(circuit, b=5, grad=True, atol=5e-6):
    lf = LoopFusedCircuit(circuit, interpret=True)
    params = circuit.init_params(jax.random.PRNGKey(0)).reshape(-1)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (b, circuit.n), minval=-1.0, maxval=1.0
    )
    z_ref = circuit.apply(params, x)
    z_new = lf.apply(params, x)
    np.testing.assert_allclose(z_new, z_ref, atol=atol)
    if grad:
        g_ref = jax.grad(
            lambda p, xx: jnp.sum(circuit.apply(p, xx) ** 2), argnums=(0, 1)
        )(params, x)
        g_new = jax.grad(
            lambda p, xx: jnp.sum(lf.apply(p, xx) ** 2), argnums=(0, 1)
        )(params, x)
        for a, b_ in zip(g_ref, g_new):
            np.testing.assert_allclose(b_, a, atol=5e-5)


def test_cross_mesh_parity_with_grads():
    # covers: 1q mats, fused diagonal runs, Haar u2q epilogue, final H
    _parity(_circ("cross_mesh"))


def test_cascade_parity_with_grads():
    # covers: controlled-1q (CRX ring)
    _parity(_circ("cascade"))


@pytest.mark.slow
@pytest.mark.parametrize(
    "ansatz", ["layered", "alternate", "farhi", "sim_circ_15"]
)
def test_remaining_ansatzes_parity(ansatz):
    _parity(_circ(ansatz))


@pytest.mark.slow
def test_two_layer_parity():
    _parity(_circ("cascade", layers=2))


def test_evolve_arbitrary_state():
    circuit = _circ("cross_mesh")
    lf = LoopFusedCircuit(circuit, interpret=True)
    params = circuit.init_params(jax.random.PRNGKey(0)).reshape(-1)
    rng = np.random.RandomState(3)
    st = rng.randn(4, 16) + 1j * rng.randn(4, 16)
    st = jnp.asarray(
        (st / np.linalg.norm(st, axis=1, keepdims=True)).astype(np.complex64)
    )
    ev_ref = circuit.evolve(params, st)
    ev_new = lf.evolve(params, st)
    np.testing.assert_allclose(ev_new, ev_ref, atol=5e-6)


def test_amplitude_encoding():
    circuit = _circ("cascade", encoding="amplitude")
    lf = LoopFusedCircuit(circuit, interpret=True)
    params = circuit.init_params(jax.random.PRNGKey(0)).reshape(-1)
    x = jax.random.uniform(jax.random.PRNGKey(1), (5, 3)) + 0.1
    np.testing.assert_allclose(
        lf.apply(params, x), circuit.apply(params, x), atol=5e-6
    )


def test_encode_angle_product_matches_gate_encoding():
    x = jax.random.uniform(jax.random.PRNGKey(2), (6, 5), minval=-3.0, maxval=3.0)
    via_gates = sv.encode_angle(sv.zero_state(6, 5), 5, x)
    via_product = sv.encode_angle_product(x, 5)
    np.testing.assert_allclose(via_product, via_gates, atol=1e-6)


def test_batch_padding():
    # batch not a multiple of the tile: wrapper pads and slices back
    circuit = _circ("cascade")
    lf = LoopFusedCircuit(circuit, interpret=True)
    params = circuit.init_params(jax.random.PRNGKey(0)).reshape(-1)
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, 4))
    assert lf.apply(params, x).shape == (3, 4)


def test_batched_params_rejected():
    circuit = _circ("cascade")
    lf = LoopFusedCircuit(circuit, interpret=True)
    params = jnp.zeros((4, circuit.num_params))
    with pytest.raises(ValueError, match="unbatched"):
        lf.evolve(params, jnp.asarray(sv.zero_state(4, 4)))


def test_auto_backend_selection():
    assert type(make_fused_backend(_circ("cascade", n=10))).__name__ == (
        "BlockFusedCircuit"
    )
    assert type(
        make_fused_backend(_circ("cascade", n=10), backend="loop")
    ).__name__ == "LoopFusedCircuit"
    assert type(make_fused_backend(_circ("cascade", n=8))).__name__ == (
        "FusedCircuit"
    )


def test_table_covers_epilogue():
    lp = compile_loop_program(_circ("cross_mesh", n=4))
    kinds = lp.table[:, 0]
    assert (kinds == 2).sum() == 2  # two Haar u2q blocks
    assert lp.num_phases >= 1  # fused CRZ/RZ diagonals

"""Block-fused MXU engine (ops/block_fused.py) parity vs the XLA engine.

Pure-XLA engine: runs everywhere, differentiable to any order, so we also
check second-order (forward-over-reverse) derivatives — the property that
lets it serve the nested-AD PDE operators directly at 16 qubits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qcpinn_tpu.ops import statevector as sv
from qcpinn_tpu.ops.block_fused import BlockFusedCircuit, compile_segments
from qcpinn_tpu.ops.circuit import DVCircuit


def _circ(ansatz, n=4, layers=1, encoding="angle"):
    return DVCircuit(
        num_qubits=n, num_quantum_layers=layers, q_ansatz=ansatz,
        encoding=encoding, seed=7,
    )


def _parity(circuit, b=5, grad=True, atol=5e-6, hi_bits=None):
    bf = BlockFusedCircuit(circuit, hi_bits=hi_bits)
    params = circuit.init_params(jax.random.PRNGKey(0)).reshape(-1)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (b, circuit.n), minval=-1.0, maxval=1.0
    )
    np.testing.assert_allclose(
        bf.apply(params, x), circuit.apply(params, x), atol=atol
    )
    if grad:
        g_ref = jax.jit(jax.grad(
            lambda p, xx: jnp.sum(circuit.apply(p, xx) ** 2), argnums=(0, 1)
        ))(params, x)
        g_new = jax.jit(jax.grad(
            lambda p, xx: jnp.sum(bf.apply(p, xx) ** 2), argnums=(0, 1)
        ))(params, x)
        for a, b_ in zip(g_ref, g_new):
            np.testing.assert_allclose(b_, a, atol=5e-5)


@pytest.mark.parametrize("ansatz", ["cross_mesh", "cascade"])
def test_parity_with_grads(ansatz):
    _parity(_circ(ansatz))


@pytest.mark.slow
@pytest.mark.parametrize(
    "ansatz", ["layered", "alternate", "farhi", "sim_circ_15"]
)
def test_remaining_ansatzes_parity(ansatz):
    _parity(_circ(ansatz))


def test_unbalanced_split_and_layers():
    # hb=1 forces everything through cross-block / lo-block paths
    _parity(_circ("cascade", n=5, layers=2), hi_bits=1, grad=False)
    _parity(_circ("cascade", n=5, layers=2), hi_bits=4, grad=False)


def test_second_order_derivatives_match_xla():
    # d2/dx2 of the readout — the nested-AD path PDE operators need.
    circuit = _circ("cross_mesh")
    bf = BlockFusedCircuit(circuit)
    params = circuit.init_params(jax.random.PRNGKey(0)).reshape(-1)
    x0 = jnp.asarray([0.3, -0.2, 0.7, 0.1])

    def hess(apply):
        f = lambda xx: jnp.sum(apply(params, xx[None, :]) ** 2)
        return jax.jit(jax.jacfwd(jax.grad(f)))(x0)

    np.testing.assert_allclose(
        hess(bf.apply), hess(circuit.apply), atol=1e-4
    )


def test_evolve_arbitrary_state():
    circuit = _circ("cross_mesh")
    bf = BlockFusedCircuit(circuit)
    params = circuit.init_params(jax.random.PRNGKey(0)).reshape(-1)
    rng = np.random.RandomState(3)
    st = rng.randn(4, 16) + 1j * rng.randn(4, 16)
    st = jnp.asarray(
        (st / np.linalg.norm(st, axis=1, keepdims=True)).astype(np.complex64)
    )
    np.testing.assert_allclose(
        bf.evolve(params, st), circuit.evolve(params, st), atol=5e-6
    )


def test_amplitude_encoding():
    circuit = _circ("cascade", encoding="amplitude")
    bf = BlockFusedCircuit(circuit)
    params = circuit.init_params(jax.random.PRNGKey(0)).reshape(-1)
    x = jax.random.uniform(jax.random.PRNGKey(1), (5, 3)) + 0.1
    np.testing.assert_allclose(
        bf.apply(params, x), circuit.apply(params, x), atol=5e-6
    )


def test_batched_params_rejected():
    circuit = _circ("cascade")
    bf = BlockFusedCircuit(circuit)
    params = jnp.zeros((4, circuit.num_params))
    with pytest.raises(ValueError, match="unbatched"):
        bf.evolve(params, jnp.asarray(sv.zero_state(4, 4)))


def test_segment_compilation_shape():
    # cross_mesh: 1q layers fuse into block runs; CRZ mesh fuses to a diag
    segs = compile_segments(_circ("cross_mesh", n=4), hb=2)
    kinds = [s.kind for s in segs]
    assert "blocks" in kinds and "diag" in kinds
    # cascade CRX ring straddles the boundary -> at least one 'op' segment
    segs = compile_segments(_circ("cascade", n=4), hb=2)
    assert any(s.kind == "op" for s in segs)


def test_remat_evolve_matches_and_grads():
    circuit = _circ("cross_mesh")
    bf = BlockFusedCircuit(circuit, remat=True)
    ref = BlockFusedCircuit(circuit)
    params = circuit.init_params(jax.random.PRNGKey(0)).reshape(-1)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 4))
    np.testing.assert_allclose(bf.apply(params, x), ref.apply(params, x), atol=1e-6)
    g1 = jax.jit(jax.grad(lambda p: jnp.sum(bf.apply(p, x) ** 2)))(params)
    g2 = jax.jit(jax.grad(lambda p: jnp.sum(ref.apply(p, x) ** 2)))(params)
    np.testing.assert_allclose(g1, g2, atol=1e-5)


def test_precision_knob_env_and_override(monkeypatch):
    """QCPINN_BLOCK_PRECISION resolves the default einsum precision; an
    explicit constructor arg wins; HIGH stays numerically close to
    HIGHEST (bf16x3 ~ f32 — the measured on-chip knob, see
    artifacts/block_precision_onchip.json)."""
    circuit = _circ("cross_mesh", n=6)
    monkeypatch.setenv("QCPINN_BLOCK_PRECISION", "high")
    bf_env = BlockFusedCircuit(circuit)
    assert bf_env.precision == jax.lax.Precision.HIGH
    bf_arg = BlockFusedCircuit(circuit, precision=jax.lax.Precision.HIGHEST)
    assert bf_arg.precision == jax.lax.Precision.HIGHEST
    monkeypatch.setenv("QCPINN_BLOCK_PRECISION", "bogus")
    with pytest.raises(ValueError, match="must be one of"):
        BlockFusedCircuit(circuit)
    monkeypatch.delenv("QCPINN_BLOCK_PRECISION")
    assert BlockFusedCircuit(circuit).precision == jax.lax.Precision.HIGHEST

    params = circuit.init_params(jax.random.PRNGKey(0)).reshape(-1)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 6), minval=-1.0, maxval=1.0)
    np.testing.assert_allclose(
        bf_env.apply(params, x), bf_arg.apply(params, x), atol=2e-3
    )


def test_merge_env_knob(monkeypatch):
    """QCPINN_BLOCK_MERGE=0 restores the unmerged segment chain (the
    on-chip A/B lever of scripts/mfu_ladder.py --merge-ab); an explicit
    merge= constructor arg always wins over the env."""
    circuit = _circ("cross_mesh", n=6)
    default = BlockFusedCircuit(circuit)
    monkeypatch.setenv("QCPINN_BLOCK_MERGE", "0")
    env_off = BlockFusedCircuit(circuit)
    env_off_but_arg_on = BlockFusedCircuit(circuit, merge=True)
    monkeypatch.delenv("QCPINN_BLOCK_MERGE")
    assert len(default.segments) < len(env_off.segments)
    assert len(env_off_but_arg_on.segments) == len(default.segments)
    assert len(env_off.segments) == len(
        BlockFusedCircuit(circuit, merge=False).segments)
    params = circuit.init_params(jax.random.PRNGKey(0)).reshape(-1)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 6), minval=-1.0, maxval=1.0)
    np.testing.assert_allclose(
        default.apply(params, x), env_off.apply(params, x), atol=2e-6
    )


def test_chain_shortening_parity_and_stats():
    """merge=True composes adjacent 'blocks' segments across layer and
    epilogue boundaries by small [K,K] matmuls — values and gradients must
    match the unmerged chain, with strictly fewer full-state matmuls
    (round-4 VERDICT #5: the one structural lever of the latency-bound
    step)."""
    for name, layers in (("cross_mesh", 1), ("cross_mesh", 3),
                         ("layered", 2), ("rot_ring", 3)):
        circuit = DVCircuit(4, layers, name, seed=11)
        merged = BlockFusedCircuit(circuit, merge=True)
        plain = BlockFusedCircuit(circuit, merge=False)
        stats = merged.segment_stats()
        assert stats["merged"]["segments"] <= stats["raw"]["segments"]

        def total(s):
            return s["state_matmuls"] + s["diags"] + s["cross_ops"]

        assert total(stats["merged"]) <= total(stats["raw"])
        if name in ("cross_mesh", "layered"):
            # diag-separated block boundaries exist -> must shorten
            assert total(stats["merged"]) < total(stats["raw"]), (
                name, layers, stats)
        params = circuit.init_params(jax.random.PRNGKey(0)).reshape(-1)
        x = jax.random.uniform(jax.random.PRNGKey(1), (4, 4),
                               minval=-1.0, maxval=1.0)
        np.testing.assert_allclose(
            merged.apply(params, x), plain.apply(params, x), atol=2e-6
        )
        g1 = jax.jit(jax.grad(lambda p: jnp.sum(merged.apply(p, x) ** 2)))(params)
        g2 = jax.jit(jax.grad(lambda p: jnp.sum(plain.apply(p, x) ** 2)))(params)
        np.testing.assert_allclose(g1, g2, atol=2e-5)


def test_chain_shortening_16q_counts():
    """The flagship shape: 16q cross_mesh, 1 layer — publish-grade counts.
    Raw chain: blocks(RX), diag(RZ+CRZ mesh), blocks(RX), diag(RZ sweep),
    epilogue blocks(Haar hi + H lo) = 6 state matmuls + 2 diags = 8
    sequential full-state ops. Merged: the trailing RZ sweep separates
    into per-block diagonal factors, unlocking the blocks+epilogue merge
    -> 4 state matmuls + 1 diag = 5 ops (37.5% shorter chain)."""
    circuit = DVCircuit(16, 1, "cross_mesh", seed=42)
    bf = BlockFusedCircuit(circuit)
    s = bf.segment_stats()
    assert s["raw"]["state_matmuls"] == 6 and s["raw"]["diags"] == 2
    assert s["merged"]["state_matmuls"] == 4 and s["merged"]["diags"] == 1
    assert s["merged"]["cross_ops"] == s["raw"]["cross_ops"] == 0

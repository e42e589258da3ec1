"""Parity tests for the fused block-evolution Pallas kernel
(ops/block_pallas.py) against the plain block engine (ops/block_fused.py),
in interpret mode on CPU. The block engine itself is oracle-tested against
the dense simulator (tests/test_pallas.py, tests/oracle_dense.py), so
parity here chains to the same oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qcpinn_tpu.ops import block_pallas as bp
from qcpinn_tpu.ops.block_fused import BlockFusedCircuit
from qcpinn_tpu.ops.circuit import DVCircuit


def _rand_state(key, b, n):
    kr, ki = jax.random.split(key)
    s = (jax.random.normal(kr, (b, 1 << n))
         + 1j * jax.random.normal(ki, (b, 1 << n)))
    return (s / jnp.linalg.norm(s, axis=1, keepdims=True)).astype(jnp.complex64)


def _pair(n, layers=1, ansatz="cross_mesh"):
    circ = DVCircuit(num_qubits=n, num_quantum_layers=layers, q_ansatz=ansatz)
    ref = BlockFusedCircuit(circ)
    fused = bp.BlockPallasCircuit(circ, interpret=True)
    return circ, ref, fused


def test_supports_classification():
    cm = DVCircuit(num_qubits=6, num_quantum_layers=1, q_ansatz="cross_mesh")
    assert bp.supports(cm)
    # ring-closure CRX straddles the hi/lo boundary
    casc = DVCircuit(num_qubits=6, num_quantum_layers=1, q_ansatz="cascade")
    assert not bp.supports(casc)
    with pytest.raises(ValueError):
        bp.BlockPallasCircuit(casc, interpret=True)


@pytest.mark.parametrize("n", [4, 5, 6])
def test_evolve_parity(n):
    circ, ref, fused = _pair(n)
    key = jax.random.PRNGKey(n)
    params = 0.3 * jax.random.normal(key, (circ.num_params,))
    state = _rand_state(jax.random.fold_in(key, 1), 24, n)
    want = ref.evolve(params, state)
    got = fused.evolve(params, state)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_evolve_parity_two_layers():
    circ, ref, fused = _pair(5, layers=2)
    key = jax.random.PRNGKey(9)
    params = 0.3 * jax.random.normal(key, (circ.num_params,))
    state = _rand_state(jax.random.fold_in(key, 1), 16, 5)
    np.testing.assert_allclose(
        fused.evolve(params, state), ref.evolve(params, state), atol=2e-5
    )


def test_apply_parity_from_inputs():
    circ, ref, fused = _pair(6)
    key = jax.random.PRNGKey(3)
    params = 0.3 * jax.random.normal(key, (circ.num_params,))
    x = jax.random.normal(jax.random.fold_in(key, 2), (24, 6))
    np.testing.assert_allclose(
        fused.apply(params, x), ref.apply(params, x), atol=2e-5
    )


@pytest.mark.parametrize("n", [4, 6])
def test_grad_parity(n):
    """value_and_grad through evolve wrt circuit params AND input state
    matches the any-order-AD block engine."""
    circ, ref, fused = _pair(n)
    key = jax.random.PRNGKey(17 + n)
    params = 0.3 * jax.random.normal(key, (circ.num_params,))
    state = _rand_state(jax.random.fold_in(key, 1), 16, n)
    w = jax.random.normal(jax.random.fold_in(key, 2), (n,))

    def loss(engine):
        def f(p, sr, si):
            from qcpinn_tpu.ops import measure

            out = engine.evolve(p, (sr + 1j * si).astype(jnp.complex64))
            z = measure.exact_z(out, n, None)
            return jnp.sum(w * jnp.mean(z, axis=0))

        return f

    sr, si = jnp.real(state), jnp.imag(state)
    v_ref, g_ref = jax.value_and_grad(loss(ref), argnums=(0, 1, 2))(
        params, sr, si
    )
    v_got, g_got = jax.value_and_grad(loss(fused), argnums=(0, 1, 2))(
        params, sr, si
    )
    np.testing.assert_allclose(v_got, v_ref, atol=1e-5)
    for got, want in zip(g_got, g_ref):
        np.testing.assert_allclose(got, want, atol=3e-5)


def test_streams_train_step_parity():
    """One Adam step of the streams residual loss on the DV Fourier solver:
    block_pallas vs block trajectories match."""
    import optax

    from qcpinn_tpu.config import QCPINNConfig
    from qcpinn_tpu.data import diffusion as dd
    from qcpinn_tpu.models.dv_fourier import DVFourierSolver
    from qcpinn_tpu.physics.streams import dv_diffusion_residual_streams

    def one_step(backend):
        cfg = QCPINNConfig(
            num_qubits=10, num_quantum_layers=1, q_ansatz="cross_mesh",
            classic_network=(3, 16, 1), seed=5,
        )
        model = DVFourierSolver(cfg)
        model.use_pallas(interpret=True, backend=backend)
        params = model.init(jax.random.PRNGKey(0))
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)
        box = dd._box
        res_s = dd.Sampler(box([[0, 0, 0], [1, 1, 1]]), dd.r_true)
        Xr, yr = res_s.sample(jax.random.PRNGKey(1), 16)

        def loss_fn(p):
            _, r = dv_diffusion_residual_streams(model, p, Xr)
            return jnp.mean((r - yr) ** 2)

        del opt, opt_state
        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss, grads

    # compare loss + raw grads (an optimizer step would amplify near-zero
    # grad noise through Adam's sign normalization)
    l_ref, g_ref = one_step("block")
    l_got, g_got = one_step("block_pallas")
    np.testing.assert_allclose(l_got, l_ref, rtol=2e-5)
    for got, want in zip(jax.tree.leaves(g_got), jax.tree.leaves(g_ref)):
        scale = max(float(jnp.max(jnp.abs(want))), 1e-3)
        np.testing.assert_allclose(got, want, atol=2e-4 * scale)

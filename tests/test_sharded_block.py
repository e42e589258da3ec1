"""GSPMD-sharded block-fused engine (parallel/sharded_block.py): MXU
einsums over a ``P(data, amp, None)``-sharded state, collectives inserted
by XLA — must match the single-device engines exactly, including the
shots/noise measurement surface."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qcpinn_tpu.ops import DVCircuit
from qcpinn_tpu.parallel import make_mesh
from qcpinn_tpu.parallel.sharded_block import ShardedBlockCircuit


def _pair(n, ansatz, layers, data, amp, seed=None, batch=8, encoding="angle", f=None):
    circ = DVCircuit(n, layers, ansatz, seed=seed, encoding=encoding)
    params = circ.init_params(jax.random.PRNGKey(0))
    feats = f if f is not None else n
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (batch, feats), minval=-np.pi, maxval=np.pi
    )
    mesh = make_mesh(data=data, amp=amp)
    return circ, ShardedBlockCircuit(circ, mesh), params, x, mesh


@pytest.mark.parametrize("ansatz", ["cascade", "cross_mesh", "sim_circ_15"])
def test_forward_parity(ansatz):
    circ, sb, params, x, _ = _pair(5, ansatz, 1, data=2, amp=4)
    ref = np.asarray(jax.jit(circ.apply)(params, x))
    got = np.asarray(jax.jit(sb.apply)(params, x))
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_haar_epilogue_two_layers_amp8():
    # amp=8 shards all three leading bits; seed turns on the fixed Haar
    # 2q blocks which sit inside the sharded H axis
    circ, sb, params, x, _ = _pair(5, "layered", 2, data=1, amp=8, seed=11)
    ref = np.asarray(jax.jit(circ.apply)(params, x))
    got = np.asarray(jax.jit(sb.apply)(params, x))
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_evolve_matches_block_engine():
    from qcpinn_tpu.ops.block_fused import BlockFusedCircuit

    circ, sb, params, x, _ = _pair(6, "cross_mesh", 1, data=2, amp=4, seed=3)
    state = jax.jit(circ.prepare)(x)
    ref = np.asarray(jax.jit(BlockFusedCircuit(circ).evolve)(params, state))
    got = np.asarray(jax.jit(sb.evolve)(params, state))
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_gradient_parity():
    circ, sb, params, x, _ = _pair(5, "cascade", 1, data=2, amp=4)
    g_ref = jax.jit(jax.grad(lambda p: jnp.sum(circ.apply(p, x) ** 2)))(params)
    g_got = jax.jit(jax.grad(lambda p: jnp.sum(sb.apply(p, x) ** 2)))(params)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=1e-4)


def test_shots_and_noise_supported_sharded():
    """The GSPMD engine keeps the full measurement surface: exact noise
    scaling matches the analytic depolarizing/readout factor, and sampled_z
    concentrates around the exact value at large shots — both run sharded
    (the per-gate sharded engine covers the same surface on its psum-reduced
    expectations — see test_sharded_sv.py)."""
    from qcpinn_tpu.ops.measure import NoiseModel

    circ, sb, params, x, _ = _pair(4, "cascade", 1, data=2, amp=4)
    exact = np.asarray(jax.jit(sb.apply)(params, x))
    noisy = np.asarray(
        jax.jit(lambda p, xx: sb.apply(p, xx, noise=NoiseModel(0.1, 0.02)))(params, x)
    )
    np.testing.assert_allclose(noisy, exact * 0.9 * 0.96, atol=1e-5)

    sampled = np.asarray(
        jax.jit(lambda p, xx, k: sb.apply(p, xx, shots=8192, key=k))(
            params, x, jax.random.PRNGKey(7)
        )
    )
    assert np.all(np.isfinite(sampled))
    assert np.abs(sampled - exact).max() < 5.0 / np.sqrt(8192)


def test_amplitude_encoding_sharded_block():
    circ, sb, params, x, _ = _pair(
        4, "cascade", 1, data=2, amp=4, encoding="amplitude", f=10
    )
    ref = np.asarray(jax.jit(circ.apply)(params, x))
    got = np.asarray(jax.jit(sb.apply)(params, x))
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_hi_bits_must_cover_amp_axis():
    circ = DVCircuit(4, 1, "cascade")
    mesh = make_mesh(data=1, amp=8)
    with pytest.raises(ValueError, match="amp axis"):
        ShardedBlockCircuit(circ, mesh, hi_bits=2)
    # default hi_bits path: an amp axis as large as the whole state leaves
    # no low block — the constructor explains the remedy itself
    with pytest.raises(ValueError, match="fewer amp devices"):
        ShardedBlockCircuit(DVCircuit(3, 1, "cascade"), mesh)


@pytest.mark.slow
def test_16q_streams_train_step_block_sharded_trajectory_parity():
    """Flagship scale on the GSPMD engine: a 16-qubit cross_mesh
    tangent-streams train step runs block-sharded on the 8-device mesh and
    its 2-step optimizer trajectory matches single-device to float
    tolerance (the gate-engine twin lives in test_sharded_sv.py)."""
    from qcpinn_tpu.config import QCPINNConfig
    from qcpinn_tpu.data import gaussian_pulse_samplers
    from qcpinn_tpu.models import DVSolver
    from qcpinn_tpu.physics.streams import dv_diffusion_residual_streams
    from qcpinn_tpu.train import diffusion_terms, make_train_step
    from qcpinn_tpu.train import optim as topt

    cfg = QCPINNConfig(
        num_qubits=16, num_quantum_layers=1, q_ansatz="cross_mesh",
        classic_network=(3, 24, 1), batch_size=8, epochs=1, lr=1e-3,
        seed=0, scheduler="none",
    )
    mesh = make_mesh(data=2, amp=4)
    terms = diffusion_terms(gaussian_pulse_samplers(), cfg.batch_size)
    optimizer = topt.make_optimizer(cfg.lr, grad_clip=1.0, schedule="none")

    def run(model, use_mesh):
        params = model.init(jax.random.PRNGKey(0))
        rfn = lambda p, X: dv_diffusion_residual_streams(model, p, X)
        _, scan_steps = make_train_step(
            model.apply, None, terms, optimizer, cfg,
            mesh=(mesh if use_mesh else None), residual_fn=rfn,
        )
        out = scan_steps(
            params, optimizer.init(params), topt.plateau_init(),
            jax.random.PRNGKey(1), 0, 2,
        )
        return jax.device_get(out[0]), float(jax.device_get(out[3]["loss"])[-1])

    p_s, loss_s = run(DVSolver(cfg).use_sharded(mesh, backend="block"), True)
    p_u, loss_u = run(DVSolver(cfg), False)
    assert abs(loss_s - loss_u) < 1e-4 * max(abs(loss_u), 1.0)
    for a, b in zip(jax.tree_util.tree_leaves(p_s), jax.tree_util.tree_leaves(p_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_streams_compose_with_sharded_block_backend():
    """use_sharded(backend='block') + tangent streams: values, residuals
    and reverse gradients match the unsharded path — the multi-chip MXU
    composition for the flagship residual training."""
    from qcpinn_tpu.config import QCPINNConfig
    from qcpinn_tpu.models import DVSolver
    from qcpinn_tpu.physics.streams import dv_diffusion_residual_streams

    cfg = QCPINNConfig(
        num_qubits=5, num_quantum_layers=1, q_ansatz="cross_mesh",
        classic_network=(3, 12, 1), seed=7,
    )
    mesh = make_mesh(data=2, amp=4)
    m1 = DVSolver(cfg)
    p = m1.init(jax.random.PRNGKey(0))
    X = jax.random.uniform(jax.random.PRNGKey(2), (8, 3))
    m2 = DVSolver(cfg).use_sharded(mesh, backend="block")
    u1, r1 = jax.jit(lambda pp, XX: dv_diffusion_residual_streams(m1, pp, XX))(p, X)
    u2, r2 = jax.jit(lambda pp, XX: dv_diffusion_residual_streams(m2, pp, XX))(p, X)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1), atol=2e-6)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1), atol=2e-6)

    g1 = jax.jit(jax.grad(lambda pp: jnp.sum(dv_diffusion_residual_streams(m1, pp, X)[1] ** 2)))(p)
    g2 = jax.jit(jax.grad(lambda pp: jnp.sum(dv_diffusion_residual_streams(m2, pp, X)[1] ** 2)))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


@pytest.mark.slow
def test_20q_forward_parity_amp8():
    """Past-the-HBM-ladder scale: a 20-qubit cross_mesh forward (1M
    amplitudes/sample) amp-sharded over all 8 devices matches the
    single-device block engine — the qubit count the reference's own docs
    call "problematic past ~20" (report_hybrid_CFD.md:9) runs sharded
    with XLA-inserted collectives."""
    from qcpinn_tpu.ops.block_fused import BlockFusedCircuit

    circ, sb, params, x, _ = _pair(
        20, "cross_mesh", 1, data=1, amp=8, seed=7, batch=2
    )
    ref = np.asarray(jax.jit(BlockFusedCircuit(circ).apply)(params, x))
    got = np.asarray(jax.jit(sb.apply)(params, x))
    np.testing.assert_allclose(got, ref, atol=5e-5)

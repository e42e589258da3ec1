"""Multi-device tests on the virtual 8-CPU mesh: sharded training step
compiles, runs, and matches the single-device result."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qcpinn_tpu.config import QCPINNConfig
from qcpinn_tpu.data import gaussian_pulse_samplers
from qcpinn_tpu.models import DVSolver
from qcpinn_tpu.parallel import make_mesh, replicate, shard_batch
from qcpinn_tpu.physics import diffusion_operator
from qcpinn_tpu.train import diffusion_terms, train


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    return make_mesh()


def test_mesh_shape(mesh):
    assert mesh.shape == {"data": 8, "amp": 1}


def test_sharded_forward_matches_replicated(mesh):
    cfg = QCPINNConfig(num_qubits=3, classic_network=(3, 10, 1))
    model = DVSolver(cfg)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))

    ref = np.asarray(jax.jit(model.apply)(params, x))

    params_r = replicate(params, mesh)
    x_s = shard_batch(x, mesh)
    out = np.asarray(jax.jit(model.apply)(params_r, x_s))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_data_parallel_training(mesh):
    cfg = QCPINNConfig(
        num_qubits=2,
        classic_network=(3, 8, 1),
        epochs=8,
        batch_size=16,
        print_every=4,
        seed=0,
    )
    model = DVSolver(cfg)
    samplers = gaussian_pulse_samplers()
    terms = diffusion_terms(samplers, cfg.batch_size)
    params, history = train(
        model, cfg, terms, diffusion_operator, mesh=mesh
    )
    assert len(history) == 8
    assert np.all(np.isfinite(history))


def test_data_parallel_matches_single_device():
    """Bitwise-deterministic sampling means DP and single-device runs follow
    the same trajectory (up to reduction order)."""
    cfg = QCPINNConfig(
        num_qubits=2,
        classic_network=(3, 8, 1),
        epochs=4,
        batch_size=16,
        print_every=4,
        seed=3,
    )
    samplers = gaussian_pulse_samplers()
    terms = diffusion_terms(samplers, cfg.batch_size)

    model = DVSolver(cfg)
    _, hist_single = train(model, cfg, terms, diffusion_operator)

    mesh = make_mesh()
    model2 = DVSolver(cfg)
    _, hist_dp = train(model2, cfg, terms, diffusion_operator, mesh=mesh)

    np.testing.assert_allclose(hist_single, hist_dp, rtol=1e-4, atol=1e-6)


def test_amp_sharded_training_matches_single_device():
    """Full train step with the quantum block amplitude-sharded over a
    data x amp = 2 x 4 mesh follows the single-device trajectory (VERDICT
    round-1 item 4: 'amp' wired into make_train_step via use_sharded)."""
    cfg = QCPINNConfig(
        num_qubits=3,
        q_ansatz="cross_mesh",
        classic_network=(3, 8, 1),
        epochs=4,
        batch_size=8,
        print_every=4,
        seed=5,
    )
    samplers = gaussian_pulse_samplers()
    terms = diffusion_terms(samplers, cfg.batch_size)

    model = DVSolver(cfg)
    _, hist_single = train(model, cfg, terms, diffusion_operator)

    mesh2 = make_mesh(data=2, amp=4)
    model2 = DVSolver(cfg).use_sharded(mesh2)
    _, hist_amp = train(model2, cfg, terms, diffusion_operator, mesh=mesh2)

    np.testing.assert_allclose(hist_single, hist_amp, rtol=1e-4, atol=1e-6)


def test_hopfield_sharded_matches_single_device(mesh):
    """The B x B Hopfield attention couples the batch; under GSPMD batch
    sharding (with_sharding_constraint, not shard_map) the semantics must
    stay GLOBAL — XLA gathers K/V to build the full score matrix. Guards the
    claim in models/classical_solver.py's module docstring."""
    from qcpinn_tpu.models import ClassicalSolver

    cfg = QCPINNConfig(solver="Classical", classic_network=(3, 16, 1))
    model = ClassicalSolver(cfg)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))

    ref = np.asarray(jax.jit(model.apply)(params, x))

    from qcpinn_tpu.parallel.mesh import batch_sharding

    @jax.jit
    def sharded_apply(params, x):
        x = jax.lax.with_sharding_constraint(x, batch_sharding(mesh, x.ndim))
        return model.apply(params, x)

    out = np.asarray(sharded_apply(replicate(params, mesh), shard_batch(x, mesh)))
    np.testing.assert_allclose(out, ref, atol=1e-5)

"""Hardware-fidelity modes: parameter-shift rules vs exact autodiff, SPSA
convergence, staged layerwise training, noise model, checkpoint/logger."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qcpinn_tpu.ops import DVCircuit, NoiseModel
from qcpinn_tpu.train.hardware_grad import (
    evals_per_step,
    evals_per_step_cz,
    make_hw_apply,
    make_hw_apply_cz,
)
from qcpinn_tpu.train.spsa import SPSAConfig, make_spsa_trainer
from qcpinn_tpu.train.staged import (
    StagedConfig,
    estimate_loss_noise,
    make_hw_data_loss,
    train_classical_only,
    train_quantum_layerwise,
)


@pytest.mark.parametrize("ansatz", ["cascade", "layered", "farhi", "sim_circ_15", "cross_mesh"])
def test_parameter_shift_matches_autodiff_exact(rng, ansatz):
    """With shots=None the shift rules must reproduce exact gradients —
    validates the two-term AND four-term (CRX/CRZ) rules."""
    circ = DVCircuit(3, 1, ansatz)
    params = circ.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.uniform(-1, 1, (4, 3)).astype(np.float32))
    hw = make_hw_apply(circ, shots=None)
    key = jax.random.PRNGKey(1)

    def loss_hw(p, xx):
        return jnp.sum(hw(p, xx, key) ** 2)

    def loss_exact(p, xx):
        return jnp.sum(circ.apply(p, xx) ** 2)

    gp_hw, gx_hw = jax.jit(jax.grad(loss_hw, argnums=(0, 1)))(params, x)
    gp_ex, gx_ex = jax.jit(jax.grad(loss_exact, argnums=(0, 1)))(params, x)
    np.testing.assert_allclose(np.asarray(gp_hw), np.asarray(gp_ex), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gx_hw), np.asarray(gx_ex), atol=2e-4)


@pytest.mark.slow
def test_parameter_shift_with_shots_is_unbiased(rng):
    circ = DVCircuit(2, 1, "cascade")
    params = circ.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.uniform(-1, 1, (2, 2)).astype(np.float32))
    hw = make_hw_apply(circ, shots=2048)

    def loss(p, key):
        return jnp.sum(hw(p, x, key))

    g_exact = jax.grad(lambda p: jnp.sum(circ.apply(p, x)))(params)
    keys = jax.random.split(jax.random.PRNGKey(3), 24)
    gs = np.stack([np.asarray(jax.grad(loss)(params, k)) for k in keys])
    err = np.abs(gs.mean(0) - np.asarray(g_exact)).max()
    assert err < 0.05, err


def test_cz_parameter_shift_matches_autodiff_exact(rng):
    """The Cz data-reuploading circuit's shift rules (Rot weights two-term;
    inputs via per-occurrence encode-RY + reupload-RZ shifts) must reproduce
    exact autodiff at shots=None."""
    from qcpinn_tpu.models.czochralski import CzQuantumLayer

    q = CzQuantumLayer(n_qubits=3, n_layers=2)
    w = q.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.uniform(-np.pi, np.pi, (4, 3)).astype(np.float32))
    hw = make_hw_apply_cz(q, shots=None)
    key = jax.random.PRNGKey(1)

    gw_h, gx_h = jax.jit(
        jax.grad(lambda wi, xi: jnp.sum(hw(wi, xi, key) ** 2), argnums=(0, 1))
    )(w, x)
    gw_e, gx_e = jax.jit(
        jax.grad(lambda wi, xi: jnp.sum(q.apply(wi, xi) ** 2), argnums=(0, 1))
    )(w, x)
    np.testing.assert_allclose(np.asarray(gw_h), np.asarray(gw_e), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gx_h), np.asarray(gx_e), atol=2e-4)


def test_layerwise_parameter_shift_learns_beyond_noise_floor():
    """The wired stage-2 path (hw_apply_fn -> make_hw_data_loss ->
    train_quantum_layerwise) must actually move the quantum weights and cut
    the loss by much more than the measured shot-noise floor — guarding
    against the zero-gradient stop_gradient trap."""
    from qcpinn_tpu.config import QCPINNConfig
    from qcpinn_tpu.models import DVSolver

    cfg = QCPINNConfig(
        num_qubits=2, num_quantum_layers=2, classic_network=(2, 6, 1),
        q_ansatz="cascade", seed=1,
    )
    model = DVSolver(cfg)
    params = model.init(jax.random.PRNGKey(0))
    # target differs ONLY in quantum weights: the classical nets are shared,
    # so any loss reduction must come from real quantum gradients
    tq = params["q"] + 0.7 * jax.random.normal(jax.random.PRNGKey(5), params["q"].shape)
    X = jax.random.uniform(jax.random.PRNGKey(9), (16, 2), minval=-1, maxval=1)
    Y = model.apply(dict(params, q=tq), X)

    make_loss = make_hw_data_loss(model.hw_apply_fn, X, Y)
    scfg = StagedConfig(
        layer_epochs=10, initial_shots=1024, max_shots=1024,
        noise_evals=4, lr_quantum=0.1, seed=0,
    )
    params2, report = train_quantum_layerwise(make_loss, params, num_layers=2, cfg=scfg)
    assert float(jnp.abs(params2["q"] - params["q"]).max()) > 0.05
    first = report[0]["levels"][0]
    assert first["start"] - first["best"] > 2.0 * first["sigma"], first
    exact0 = float(jnp.mean((model.apply(params, X) - Y) ** 2))
    exact1 = float(jnp.mean((model.apply(params2, X) - Y) ** 2))
    assert exact1 < 0.5 * exact0, (exact0, exact1)


def test_evals_per_step_accounting():
    circ = DVCircuit(4, 1, "cascade")  # 8 two-term (rx+rz) + 4 crx + 4 inputs
    # 1 + (8*2 + 4*4) + 2*4 = 1 + 32 + 8 = 41
    assert evals_per_step(circ) == 41
    from qcpinn_tpu.models.czochralski import CzQuantumLayer

    # 1 + 2*(2*16*3 Rot) + 2*16 encode + 2*(2*16) reupload = 1+192+32+64
    assert evals_per_step_cz(CzQuantumLayer(16, 2)) == 289


def test_spsa_minimizes_quadratic():
    target = jnp.asarray([0.3, -0.7, 1.1])

    def loss(p, key):
        del key
        return jnp.sum((p["w"] - target) ** 2)

    step = make_spsa_trainer(loss, SPSAConfig(a=0.2, c=0.05))
    params = {"w": jnp.zeros(3)}
    key = jax.random.PRNGKey(0)
    for k in range(1, 201):
        params, l = step(params, jnp.asarray(k), jax.random.fold_in(key, k))
    np.testing.assert_allclose(np.asarray(params["w"]), np.asarray(target), atol=0.1)


def test_spsa_lr_scale_modulates_gain():
    """lr_scale is the plateau scheduler's hook into SPSA (train/loop.py):
    scale 0 freezes the params; scale 1 reproduces the plain update."""
    from qcpinn_tpu.train.spsa import spsa_step

    def loss(p, key):
        del key
        return jnp.sum(p["w"] ** 2)

    params = {"w": jnp.ones(3)}
    k = jnp.asarray(1.0)
    key = jax.random.PRNGKey(7)
    frozen, _ = spsa_step(loss, params, k, key, SPSAConfig(), lr_scale=0.0)
    np.testing.assert_allclose(np.asarray(frozen["w"]), 1.0)
    moved, _ = spsa_step(loss, params, k, key, SPSAConfig(), lr_scale=1.0)
    assert not np.allclose(np.asarray(moved["w"]), 1.0)


def test_noise_model_shrinks_expectations(rng):
    circ = DVCircuit(2, 1, "cascade")
    params = circ.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.uniform(-1, 1, (3, 2)).astype(np.float32))
    clean = np.asarray(circ.apply(params, x))
    noisy = np.asarray(
        circ.apply(params, x, noise=NoiseModel(depolarizing=0.1, readout=0.02))
    )
    np.testing.assert_allclose(noisy, clean * 0.9 * 0.96, atol=1e-6)


def test_per_gate_noise_exact_factors_and_depth_growth(rng):
    """Depth-aware channel: <Z_w> damps by exactly (1-p)^c_w with c_w the
    circuit's static per-wire gate-touch count, so a deeper circuit is
    damped strictly more (the FakeSherbrooke capability the scalar model
    lacked, cg-hqpinn/...:183-196)."""
    from qcpinn_tpu.ops.measure import gate_counts_per_wire

    x = jnp.asarray(rng.uniform(-1, 1, (3, 3)).astype(np.float32))
    p = 0.01
    ratios = {}
    for layers in (1, 3):
        circ = DVCircuit(3, layers, "cascade")
        params = circ.init_params(jax.random.PRNGKey(0))
        clean = np.asarray(circ.apply(params, x))
        noisy = np.asarray(circ.apply(params, x, noise=NoiseModel(per_gate=p)))
        counts = np.asarray(gate_counts_per_wire(circ), dtype=np.float64)
        # cascade n=3: per layer every wire gets RX+RZ+2 CRX touches = 4;
        # encode adds 1; epilogue H adds 1 on the last wire (no Haar at n=3)
        expect_counts = np.array([1, 1, 2]) + 4 * layers
        np.testing.assert_array_equal(counts, expect_counts)
        np.testing.assert_allclose(
            noisy, clean * (1.0 - p) ** counts, atol=1e-6
        )
        ratios[layers] = (1.0 - p) ** counts
    assert np.all(ratios[3] < ratios[1])  # strictly more damping when deeper


def test_per_gate_noise_needs_binding_and_binds_in_engines(rng):
    """An unbound per-gate NoiseModel raises; every engine binds at its
    measurement site so the block backend matches the XLA backend under
    the same depth-aware channel."""
    from qcpinn_tpu.ops.block_fused import BlockFusedCircuit

    noise = NoiseModel(per_gate=0.02)
    with pytest.raises(ValueError, match="gate counts"):
        noise.apply(jnp.ones((2, 3)))

    circ = DVCircuit(4, 2, "layered", seed=9)
    params = circ.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.uniform(-1, 1, (3, 4)).astype(np.float32))
    z_xla = np.asarray(circ.apply(params, x, noise=noise))
    z_blk = np.asarray(
        BlockFusedCircuit(circ).apply(params.reshape(-1), x, noise=noise)
    )
    np.testing.assert_allclose(z_blk, z_xla, atol=2e-5)
    # depth-1 parity: per_gate=0 reduces exactly to the scalar model
    legacy = NoiseModel(depolarizing=0.1, readout=0.02, per_gate=0.0)
    np.testing.assert_allclose(
        np.asarray(circ.apply(params, x, noise=legacy)),
        np.asarray(circ.apply(params, x)) * 0.9 * 0.96,
        atol=1e-6,
    )


def test_per_gate_noise_global_parity_product(rng):
    """The crystal pipeline's global <Z..Z> damps by the product of the
    per-wire factors (each tensor factor contracts independently)."""
    from qcpinn_tpu.models.crystal import CrystalPINN

    m = CrystalPINN(n_qubits=3, n_layers=2)
    params = m.init(jax.random.PRNGKey(0))
    q_in = jnp.asarray(rng.uniform(-1, 1, (4, 3)).astype(np.float32))
    clean = np.asarray(m.quantum_scalar(params["q"], q_in))
    p = 0.01
    noisy = np.asarray(
        m.quantum_scalar(params["q"], q_in, noise=NoiseModel(per_gate=p))
    )
    counts = np.asarray(m.gate_counts_per_wire(), dtype=np.float64)
    # RX,RY,RZ per wire per layer + CNOT chain touches + encode
    np.testing.assert_array_equal(counts, [1 + 2 * 4, 1 + 2 * 5, 1 + 2 * 4])
    np.testing.assert_allclose(
        noisy, clean * (1.0 - p) ** counts.sum(), atol=1e-6
    )


def test_per_gate_noise_reupload_layer_counts():
    """CzQuantumLayer's bespoke counter: counts grow linearly with the
    reupload layer count (the depth-awareness the VERDICT asked for)."""
    from qcpinn_tpu.models.czochralski import CzQuantumLayer

    c1 = np.asarray(CzQuantumLayer(8, 1).gate_counts_per_wire())
    c3 = np.asarray(CzQuantumLayer(8, 3).gate_counts_per_wire())
    assert np.all(c3 > c1)
    # each wire: encode(1) + L*(RZ+Rot+2 CZ touches) = 1 + 4L at n=8
    np.testing.assert_array_equal(c1, np.full(8, 5))
    np.testing.assert_array_equal(c3, np.full(8, 13))


def _toy_problem():
    circ = DVCircuit(2, 3, "cascade")
    import qcpinn_tpu.models.nn_core as nc

    def init(key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "pre": nc.mlp_init(k1, (2, 6, 2)),
            "q": circ.init_params(k2),
            "post": nc.mlp_init(k3, (2, 6, 1)),
        }

    X = jax.random.uniform(jax.random.PRNGKey(9), (16, 2))
    Y = jnp.sin(X[:, :1] * 3)

    def apply(params, x, shots=None, key=None):
        import qcpinn_tpu.models.nn_core as nc

        h = nc.mlp_apply(params["pre"], x)
        z = circ.apply(params["q"], h, shots=shots, key=key)
        return nc.mlp_apply(params["post"], z)

    return init, apply, circ, X, Y


@pytest.mark.slow
def test_staged_classical_then_layerwise(rng):
    init, apply, _toy_circ, X, Y = _toy_problem()
    params = init(jax.random.PRNGKey(0))

    def exact_loss(p, key):
        del key
        return jnp.mean((apply(p, X) - Y) ** 2)

    cfg = StagedConfig(
        classical_epochs=30,
        layer_epochs=8,
        initial_shots=256,
        max_shots=512,
        noise_evals=3,
        seed=0,
    )
    params, hist = train_classical_only(exact_loss, params, cfg=cfg)
    assert hist[-1] < hist[0]

    def make_loss(shots):
        # stage 2 differentiates via parameter-shift (hardware path) — a
        # plain shots= loss would see zero quantum gradients
        import qcpinn_tpu.models.nn_core as nc

        hw = make_hw_apply(_toy_circ, shots)

        def loss(p, key):
            h = nc.mlp_apply(p["pre"], X)
            z = hw(p["q"], h, key)
            pred = nc.mlp_apply(p["post"], z)
            return jnp.mean((pred - Y) ** 2)

        return loss

    pre_before = jax.tree_util.tree_leaves(params["pre"])
    q_before = np.asarray(params["q"])
    params, report = train_quantum_layerwise(
        make_loss, params, num_layers=3, cfg=cfg
    )
    # classical params untouched in stage 2; quantum params genuinely move
    for a, b in zip(pre_before, jax.tree_util.tree_leaves(params["pre"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(params["q"]) - q_before).max() > 0
    # all 3 layers visited, reverse order, shots escalate to max
    assert [r["layer"] for r in report] == [2, 1, 0]
    assert report[0]["levels"][-1]["shots"] == 512


def test_estimate_loss_noise_scaling():
    circ = DVCircuit(2, 1, "cascade")
    params = circ.init_params(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 2))

    def make(shots):
        def loss(p, key):
            return jnp.mean(circ.apply(p, x, shots=shots, key=key))

        return loss

    _, sigma_small = estimate_loss_noise(make(64), params, jax.random.PRNGKey(2), 8)
    _, sigma_big = estimate_loss_noise(make(4096), params, jax.random.PRNGKey(2), 8)
    assert sigma_big < sigma_small  # Var ~ 1/shots


def test_logger_and_config_dump(tmp_path):
    from qcpinn_tpu.config import QCPINNConfig
    from qcpinn_tpu.utils.logger import Logging

    logger = Logging(log_root=str(tmp_path), run_name="t")
    logger.print("hello", 3.14159)
    cfg = QCPINNConfig(num_qubits=2)
    path = logger.dump_config(cfg)
    assert os.path.exists(path)
    assert os.path.exists(os.path.join(logger.get_output_dir(), "output.log"))
    with open(os.path.join(logger.get_output_dir(), "output.log")) as f:
        content = f.read()
    assert "hello" in content


def test_hw_apply_noise_channel_matches_exact():
    """make_hw_apply(noise=...) must evaluate through the SAME channel as
    circuit.apply(noise=...): with shots=None the two forwards are equal,
    and the parameter-shift gradient is the exact gradient of the NOISY
    expectation (regression: the training channel silently dropped noise
    while validation/eval applied it)."""
    circ = DVCircuit(3, 1, "cascade")
    params = circ.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(5).uniform(-1, 1, (4, 3)).astype(np.float32))
    noise = NoiseModel(depolarizing=0.1, readout=0.02)
    hw = make_hw_apply(circ, shots=None, noise=noise)
    key = jax.random.PRNGKey(1)
    np.testing.assert_allclose(
        np.asarray(hw(params, x, key)),
        np.asarray(circ.apply(params, x, noise=noise)),
        atol=1e-6,
    )
    g_hw = jax.grad(lambda p: jnp.sum(hw(p, x, key) ** 2))(params)
    g_ex = jax.grad(lambda p: jnp.sum(circ.apply(p, x, noise=noise) ** 2))(params)
    np.testing.assert_allclose(np.asarray(g_hw), np.asarray(g_ex), atol=2e-4)

"""Phase-field crystal growth physics + SI-gated head + coupled weighting."""

import jax
import jax.numpy as jnp
import numpy as np

from qcpinn_tpu.models.si_gated import (
    coupled_weighting_apply,
    coupled_weighting_init,
    si_gated_head_apply,
    si_gated_head_init,
)
from qcpinn_tpu.physics import phase_field as pf


def _toy_model(rng):
    W = jnp.asarray(rng.standard_normal((2, 5)).astype(np.float32) * 0.3)

    def apply(x):
        base = jnp.tanh(x @ W)
        # give phi some structure crossing zero
        phi = jnp.sin(2 * jnp.pi * x[:, 0:1]) * jnp.cos(jnp.pi * x[:, 1:2])
        return jnp.concatenate([base[:, :4], phi], axis=1)

    return apply


def test_anisotropic_epsilon_range():
    eps = pf.anisotropic_epsilon(jnp.asarray([1.0, 0.0]), jnp.asarray([0.0, 1.0]))
    assert np.all(np.asarray(eps) >= pf.EPS0 * (1 - pf.DELTA_ANISO) - 1e-7)
    assert np.all(np.asarray(eps) <= pf.EPS0 * (1 + pf.DELTA_ANISO) + 1e-7)


def test_crystal_growth_loss_finite_and_differentiable(rng):
    apply = _toy_model(rng)
    x = jnp.asarray(rng.uniform(0, 1, (32, 2)).astype(np.float32))

    @jax.jit
    def loss(scale):
        return pf.crystal_growth_loss(lambda X: scale * apply(X), x)

    val = float(loss(1.0))
    assert np.isfinite(val) and val > 0
    g = float(jax.grad(loss)(1.0))
    assert np.isfinite(g)


def test_mu_against_manual_formula(rng):
    phi = jnp.asarray([0.5, -0.2])
    phi_x = jnp.asarray([1.0, 0.3])
    phi_y = jnp.asarray([0.0, -0.4])
    lap = jnp.asarray([2.0, -1.0])
    c = jnp.asarray([0.1, 0.2])
    eps = pf.anisotropic_epsilon(phi_x, phi_y)
    want = -(np.asarray(eps) ** 2) * np.asarray(lap) + np.asarray(phi) * (
        np.asarray(phi) ** 2 - 1
    ) - 2 * np.asarray(c) * np.asarray(phi)
    np.testing.assert_allclose(
        np.asarray(pf.phase_field_mu(phi, phi_x, phi_y, lap, c)), want, rtol=1e-6
    )


def test_adaptive_interface_sampling(rng):
    apply = _toy_model(rng)
    pts = pf.adaptive_interface_sampling(
        apply, jax.random.PRNGKey(0), n_bulk=16, n_interface=32
    )
    assert pts.shape == (48, 2)
    # the interface points should concentrate near |phi| = 0
    phi_int = np.abs(np.asarray(apply(pts[16:])[:, 4]))
    phi_rand = np.abs(
        np.asarray(apply(jax.random.uniform(jax.random.PRNGKey(1), (32, 2)))[:, 4])
    )
    assert phi_int.mean() < phi_rand.mean()


def test_si_gated_head(rng):
    params = si_gated_head_init(jax.random.PRNGKey(0), 4, 16, 5)
    q = jnp.asarray(rng.uniform(-1, 1, (6, 4)).astype(np.float32))
    out = si_gated_head_apply(params, q)
    assert out.shape == (6, 5)
    g = jax.grad(lambda p: jnp.sum(si_gated_head_apply(p, q) ** 2))(params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree_util.tree_leaves(g))


def test_coupled_weighting_matches_reference_formula():
    params = coupled_weighting_init()
    l_data, l_phys = jnp.asarray(2.0), jnp.asarray(5.0)
    total = coupled_weighting_apply(params, l_data, l_phys, target_ratio=100.0)
    # eps_data = 1, eps_phys = 10: 0.5*2 + 0.5/100*5 + log(10)
    want = 0.5 * 2 + 0.5 / 100 * 5 + np.log(10.0)
    np.testing.assert_allclose(float(total), want, rtol=1e-6)
    g = jax.grad(lambda p: coupled_weighting_apply(p, l_data, l_phys))(params)
    assert np.isfinite(float(g["log_eps_data"][0]))


def test_crystal_model_shapes_and_grads():
    """CrystalPINN wiring: [B,2] -> [B,5], global-Z scalar quantum block in
    the graph (hybrid_qpinn_2dcrystal_ibmtest.py:89-191)."""
    from qcpinn_tpu.models.crystal import CrystalPINN

    model = CrystalPINN(n_qubits=3, n_layers=2)
    assert model.num_q_params == 18  # 3 qubits * 3 rotations * 2 layers
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (6, 2))
    out = model.apply(params, x)
    assert out.shape == (6, 5)
    g = jax.grad(lambda p: jnp.sum(model.apply(p, x) ** 2))(params)
    assert float(jnp.max(jnp.abs(g["q"]))) > 0
    # shots mode: global-parity estimator within a few sigma of exact
    z_exact = model.quantum_scalar(params["q"], jnp.zeros((4, 3)))
    z_shot = model.quantum_scalar(
        params["q"], jnp.zeros((4, 3)), shots=4096, key=jax.random.PRNGKey(2)
    )
    assert np.all(np.abs(np.asarray(z_exact - z_shot)) < 5.0 / np.sqrt(4096))


def test_global_z_matches_dense_oracle():
    """exact_global_z == <psi| Z^(x)n |psi> built densely with numpy krons."""
    from qcpinn_tpu.models.crystal import CrystalPINN
    from qcpinn_tpu.ops import statevector as sv

    n = 3
    model = CrystalPINN(n_qubits=n, n_layers=2)
    params = 0.3 * np.arange(model.num_q_params, dtype=np.float32)
    x = jnp.asarray([[0.3, -0.7, 1.1]], dtype=jnp.float32)
    state = sv.encode_angle(sv.zero_state(1, n), n, x)
    from qcpinn_tpu.ops import program as prog

    state = prog.apply_program(state, n, model.program, jnp.asarray(params))
    got = float(sv.global_z_expval(state, n)[0])
    # dense oracle
    U = prog.dense_unitary(n, model.program, params)
    import tests.oracle_dense as od  # noqa: F401 (import path check)

    psi0 = np.zeros(2**n, dtype=np.complex128)
    psi0[0] = 1.0
    rx = lambda t: np.array(
        [[np.cos(t / 2), -1j * np.sin(t / 2)],
         [-1j * np.sin(t / 2), np.cos(t / 2)]]
    )
    enc = np.array([[1.0]])
    for w in range(n):
        enc = np.kron(enc, rx(float(x[0, w])))
    psi = U @ (enc @ psi0)
    Z = np.array([[1.0, 0.0], [0.0, -1.0]])
    Zn = np.array([[1.0]])
    for _ in range(n):
        Zn = np.kron(Zn, Z)
    want = float(np.real(np.conj(psi) @ (Zn @ psi)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_crystal_pipeline_spsa_loss_decreases():
    """The assembled workload (VERDICT r3 missing #1): CrystalPINN +
    crystal_growth_loss + adaptive interface sampling + SPSA on the quantum
    weights decreases the crystal loss over the session loop
    (hybrid_qpinn_2dcrystal_ibmtest.py:300-335)."""
    from qcpinn_tpu.models.crystal import CrystalPINN
    from qcpinn_tpu.train.crystal import CrystalConfig, train_crystal

    model = CrystalPINN(n_qubits=3, n_layers=2)
    cfg = CrystalConfig(
        n_qubits=3, n_layers=2, spsa_steps=40, n_bulk=16, n_interface=24,
        log_every=20, seed=0,
    )
    params, hist = train_crystal(model, cfg)
    h = hist["spsa_history"]
    assert len(h) == 40 and np.all(np.isfinite(h))
    assert np.mean(h[-5:]) < np.mean(h[:5])


def test_crystal_pipeline_warmup_and_split():
    """Classical warmup (test_hqpinn_cg.py:180-199) runs and helps; the
    spsa-split mode then moves classical AND quantum leaves."""
    from qcpinn_tpu.models.crystal import CrystalPINN
    from qcpinn_tpu.train.crystal import CrystalConfig, train_crystal

    model = CrystalPINN(n_qubits=3, n_layers=2)
    cfg = CrystalConfig(
        n_qubits=3, n_layers=2, spsa_steps=10, n_bulk=16, n_interface=24,
        warmup_epochs=15, mode="spsa-split", log_every=10, seed=1,
    )
    p0 = model.init(jax.random.PRNGKey(1))
    params, hist = train_crystal(model, cfg, params=jax.tree_util.tree_map(lambda v: v, p0))
    assert len(hist["warmup_history"]) == 15
    assert np.isfinite(hist["warmup_history"]).all()
    # both partitions moved
    assert float(jnp.max(jnp.abs(params["q"] - p0["q"]))) > 0
    assert float(
        jnp.max(jnp.abs(params["backbone"][0]["w"] - p0["backbone"][0]["w"]))
    ) > 0


def test_si_chain_circuit_matches_dense_oracle():
    """SIChainCircuit (si_q_pinn_improved.py:277-287) vs a from-scratch
    dense oracle: RY(x[i%4]) reupload per layer, RX/RZ weight sweeps
    (layer-major, qubit-minor, RX-then-RZ), open CZ chain, <Z_i> readout."""
    import jax
    import numpy as np

    from oracle_dense import CNOT, DenseSim, controlled, rx, ry, rz
    from qcpinn_tpu.models.si_gated import SIChainCircuit

    CZ4 = np.diag([1.0, 1.0, 1.0, -1.0]).astype(np.complex128)
    rng = np.random.default_rng(3)
    for n, layers in ((4, 1), (6, 2), (5, 3)):
        circ = SIChainCircuit(n, layers)
        assert circ.num_params == 2 * n * layers
        w = np.asarray(
            jax.device_get(circ.init(jax.random.PRNGKey(0))), dtype=np.float64
        )
        x = rng.uniform(-np.pi, np.pi, (3, 4)).astype(np.float32)
        got = np.asarray(jax.jit(circ.apply)(w.astype(np.float32), x))

        w2 = w.reshape(layers, n, 2)
        want = []
        for b in range(3):
            sim = DenseSim(n)
            for l in range(layers):
                for i in range(n):
                    sim.g1(ry(float(x[b, i % 4])), i)
                for i in range(n):
                    sim.g1(rx(w2[l, i, 0]), i)
                    sim.g1(rz(w2[l, i, 1]), i)
                for i in range(n - 1):
                    sim.g2(CZ4, i, i + 1)
            want.append(sim.expval_z())
        np.testing.assert_allclose(got, np.stack(want), atol=5e-6)

    # depth-aware noise integration: counts grow with layers
    c1 = np.asarray(SIChainCircuit(5, 1).gate_counts_per_wire())
    c3 = np.asarray(SIChainCircuit(5, 3).gate_counts_per_wire())
    np.testing.assert_array_equal(c3, 3 * c1)
    from qcpinn_tpu.ops.measure import NoiseModel

    circ = SIChainCircuit(4, 2)
    w = circ.init(jax.random.PRNGKey(1))
    x = jnp.asarray(rng.uniform(-1, 1, (2, 4)).astype(np.float32))
    clean = np.asarray(circ.apply(w, x))
    noisy = np.asarray(circ.apply(w, x, noise=NoiseModel(per_gate=0.01)))
    counts = np.asarray(circ.gate_counts_per_wire(), dtype=np.float64)
    np.testing.assert_allclose(noisy, clean * 0.99**counts, atol=1e-6)

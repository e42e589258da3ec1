"""Czochralski flagship: data loader, cylindrical physics, the 16q model
(at reduced size for CI), and the two-phase pipeline."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qcpinn_tpu.data.cz_loader import (
    DataStats,
    choose_calibration_subset,
    load_cz_data,
)
from qcpinn_tpu.models.czochralski import CzQuantumLayer, Hybrid16QPINN
from qcpinn_tpu.models.nn_core import count_params
from qcpinn_tpu.physics.cylindrical import cz_residuals
from qcpinn_tpu.train.cz_pipeline import CzConfig, run_finetune, run_pretrain

# in-repo synthetic fixture (COMSOL 6.2 layout, scripts/make_cz_fixture.py)
CZ_PATH = os.path.join(os.path.dirname(__file__), "..", "data", "cz_melt_synthetic.txt")


@pytest.mark.skipif(not os.path.exists(CZ_PATH), reason="COMSOL file absent")
def test_load_cz_data_shapes_and_normalization():
    X, Y, stats = load_cz_data(CZ_PATH)
    assert X.shape[0] == Y.shape[0] == 1760  # header says 1760 nodes
    assert X.shape[1] == 2 and Y.shape[1] == 5
    # nondimensionalized: coords and velocity/pressure within [-1, 1],
    # temperature within [0, 1]
    assert np.abs(X).max() <= 1.0 + 1e-6
    assert np.abs(Y[:, :4]).max() <= 1.0 + 1e-6
    assert Y[:, 4].min() >= -1e-6 and Y[:, 4].max() <= 1.0 + 1e-6
    assert stats.pressure_coeff == pytest.approx(
        stats.pressure_scale / stats.velocity_scale**2
    )


@pytest.mark.skipif(not os.path.exists(CZ_PATH), reason="COMSOL file absent")
def test_load_cz_data_with_checkpoint_stats():
    """Passing a saved DataStats normalizes with THOSE scales (the
    checkpoint handoff semantic, CG_HQPINN_IBMtest_16qubits.py:560-562)
    instead of recomputing from the file."""
    X0, Y0, stats0 = load_cz_data(CZ_PATH)
    doubled = DataStats.from_dict(
        {**stats0.to_dict(), "velocity_scale": 2.0 * stats0.velocity_scale}
    )
    X1, Y1, stats1 = load_cz_data(CZ_PATH, stats=doubled)
    # coords and non-velocity fields unchanged; velocities exactly halved
    np.testing.assert_allclose(X1, X0, rtol=1e-6)
    np.testing.assert_allclose(Y1[:, :3], Y0[:, :3] / 2.0, rtol=1e-5)
    np.testing.assert_allclose(Y1[:, 3:], Y0[:, 3:], rtol=1e-6)
    assert stats1.velocity_scale == doubled.velocity_scale


def test_field_weights_reject_nonpositive():
    """Zero-sum weights would divide to inf; a negative weight flips the
    field's loss into a reward — both rejected at config time."""
    with pytest.raises(ValueError, match="non-negative"):
        CzConfig(field_weights=(1.0, 1.0, -2.0, 0.0, 0.0)).norm_field_weights()
    with pytest.raises(ValueError, match="positive sum"):
        CzConfig(field_weights=(0.0,) * 5).norm_field_weights()


def test_calibration_subset_coverage():
    X = np.random.default_rng(0).uniform(0, 1, (100, 2)).astype(np.float32)
    Y = np.zeros((100, 5), np.float32)
    xs, ys = choose_calibration_subset(X, Y, 8)
    assert xs.shape == (8, 2)
    # picks span the sorted range
    key = xs[:, 0] + 0.25 * xs[:, 1]
    full = X[:, 0] + 0.25 * X[:, 1]
    assert key.min() == pytest.approx(full.min())
    assert key.max() == pytest.approx(full.max())


def test_cz_quantum_layer_reupload_consistency(rng):
    """The fused reupload layer must match an explicit per-gate build."""
    from qcpinn_tpu.ops import gates, statevector as sv
    from qcpinn_tpu.ops.diag_fusion import bit_matrix

    n, L = 4, 2
    q = CzQuantumLayer(n, L)
    w = jnp.asarray(rng.uniform(0, 2 * np.pi, (L, n, 3)).astype(np.float32))
    x = jnp.asarray(rng.uniform(-np.pi, np.pi, (3, n)).astype(np.float32))
    got = np.asarray(q.apply(w, x))

    # explicit reference: per-sample, per-gate
    for b in range(x.shape[0]):
        state = sv.zero_state(1, n)
        xb = x[b : b + 1]
        for i in range(n):
            state = sv.apply_1q(state, n, i, gates.ry(xb[:, i]))
        for layer in range(L):
            for i in range(n):
                state = sv.apply_1q(
                    state, n, i, gates.rz(0.5 * xb[:, (i + layer) % n])
                )
            for i in range(n):
                state = sv.apply_1q(
                    state, n, i, gates.rot(w[layer, i, 0], w[layer, i, 1], w[layer, i, 2])
                )
            for i in range(0, n - 1, 2):
                state = sv.apply_2q(state, n, i, i + 1, jnp.asarray(gates.CZ))
            for i in range(1, n - 1, 2):
                state = sv.apply_2q(state, n, i, i + 1, jnp.asarray(gates.CZ))
            state = sv.apply_2q(state, n, n - 1, 0, jnp.asarray(gates.CZ))
        want = np.asarray(sv.z_expvals(state, n))[0]
        np.testing.assert_allclose(got[b], want, atol=1e-5)


def _small_model():
    return Hybrid16QPINN(n_qubits=4, n_layers=1)


def test_hybrid16q_hard_constraints(rng):
    model = _small_model()
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.uniform(0, 1, (6, 2)).astype(np.float32))
    x_axis = x.at[:, 0].set(0.0)  # on the symmetry axis r = 0
    out = model.apply(params, x_axis)
    np.testing.assert_allclose(np.asarray(out[:, 0]), 0.0, atol=1e-7)  # u_r
    np.testing.assert_allclose(np.asarray(out[:, 2]), 0.0, atol=1e-7)  # u_theta


def test_hybrid16q_param_count_at_full_size():
    from qcpinn_tpu.models.nn_core import count_trainable

    model = Hybrid16QPINN(n_qubits=16, n_layers=2)
    params = model.init(jax.random.PRNGKey(0))
    # count_trainable excludes the fixed Fourier buffer params['ff']['B']
    assert count_trainable(params) == count_params(params) - int(params["ff"]["B"].size)
    # reference code default (n_layers=2): 125,973 trainable parameters
    assert count_trainable(params) == 125_973
    # the diagnostics readme's 126,021 (cg-hqpinn/diagnostics/readme.md:1)
    # is the 3-layer configuration: +48 = one extra 16x3 Rot layer
    model3 = Hybrid16QPINN(n_qubits=16, n_layers=3)
    params3 = model3.init(jax.random.PRNGKey(0))
    assert count_trainable(params3) == 126_021


def test_cz_residuals_finite_and_jittable(rng):
    model = _small_model()
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.uniform(0.1, 1, (8, 2)).astype(np.float32))

    @jax.jit
    def loss(p):
        total, terms = cz_residuals(
            lambda X: model.apply(p, X), x, 1.0, 100.0, 0.011, 1e5
        )
        return total

    val = float(loss(params))
    assert np.isfinite(val)
    g = jax.jit(jax.grad(loss))(params)
    assert all(
        np.all(np.isfinite(np.asarray(l))) for l in jax.tree_util.tree_leaves(g)
    )


@pytest.mark.slow
def test_two_phase_pipeline_smoke(rng):
    """pretrain -> checkpoint handoff -> shot-noise head finetune, tiny."""
    model = _small_model()
    N = 64
    X = rng.uniform(0.05, 1, (N, 2)).astype(np.float32)
    Y = rng.uniform(-0.5, 0.5, (N, 5)).astype(np.float32)
    stats = DataStats(1, 1, 1, 0, 1, 1.0)
    cfg = CzConfig(
        n_qubits=4,
        n_layers=1,
        epochs=3,
        batch_size=16,
        lr=1e-3,
        physics_warmup=0,
        physics_ramp=1,
        log_every=1,
        finetune_epochs=4,
        shots=256,
        calib_size=8,
        train_scope="head",
        seed=0,
    )
    params, hist = run_pretrain(model, X, Y, stats, cfg)
    assert len(hist) == 3 and np.all(np.isfinite(hist))

    # checkpoint round trip with stats (the load-bearing handoff)
    import tempfile

    from qcpinn_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "ckpt")
        save_checkpoint(
            path, params, stats=stats.to_dict(), config=vars(cfg) if hasattr(cfg, "__dict__") else None, epoch=3
        )
        template = {"params": model.init(jax.random.PRNGKey(1)), "opt_state": None, "sched": None}
        restored = load_checkpoint(path, template)
        assert restored["epoch"] == 3
        assert restored["stats"]["pressure_coeff"] == 1.0
        r_params = restored["bundle"]["params"]
        x_test = jnp.asarray(X[:4])
        np.testing.assert_allclose(
            np.asarray(model.apply(params, x_test)),
            np.asarray(model.apply(r_params, x_test)),
            atol=1e-6,
        )

    q_before = np.asarray(params["q"])
    post_before = np.asarray(params["post"][0]["w"])
    params2, hist2 = run_finetune(model, params, X, Y, stats, cfg)
    assert np.all(np.isfinite(hist2))
    # head-only scope: quantum weights frozen, post head moved
    np.testing.assert_array_equal(np.asarray(params2["q"]), q_before)
    assert np.abs(np.asarray(params2["post"][0]["w"]) - post_before).max() > 0


def test_pretrain_warm_start_resumes_from_params(rng):
    """run_pretrain(params=...) must continue from the supplied weights
    (the cz --phase pretrain --load warm-start path), not re-init: a
    warm-started epoch starts at the trained loss, far below cold init.
    Mirrors the reference's --load/--start-epoch resume
    (cg-hqpinn/CG_HQPINN_IBMtest_16q_effective.py:802-804)."""
    model = _small_model()
    N = 64
    X = rng.uniform(0.05, 1, (N, 2)).astype(np.float32)
    Y = rng.uniform(-0.1, 0.1, (N, 5)).astype(np.float32)
    stats = DataStats(1, 1, 1, 0, 1, 1.0)
    cfg = CzConfig(
        n_qubits=4, n_layers=1, epochs=2, batch_size=32, lr=3e-3,
        physics_weight=0.0, physics_warmup=0, physics_ramp=1,
        log_every=10, seed=0,
    )
    trained, hist_cold = run_pretrain(model, X, Y, stats, cfg)
    warm, hist_warm = run_pretrain(model, X, Y, stats, cfg, params=trained)
    # warm start resumes well below where the cold run *started*
    assert hist_warm[0] < 0.5 * hist_cold[0]
    # and keeps improving from the handed-off weights, not from scratch
    assert hist_warm[-1] <= hist_cold[-1]


def test_pretrain_data_only_mode_skips_physics(rng):
    """physics_weight == 0 is a static supervised mode: the residual graph
    is never built (the expensive ~85% of a 16q step), the reported phys
    metric is exactly zero, and the data loss still trains down."""
    from qcpinn_tpu.train.cz_pipeline import make_pretrain_epoch

    model = _small_model()
    N = 64
    X = rng.uniform(0.05, 1, (N, 2)).astype(np.float32)
    Y = rng.uniform(-0.1, 0.1, (N, 5)).astype(np.float32)
    stats = DataStats(1, 1, 1, 0, 1, 1.0)
    cfg = CzConfig(
        n_qubits=4, n_layers=1, epochs=4, batch_size=32, lr=3e-3,
        physics_weight=0.0, physics_warmup=0, physics_ramp=1,
        log_every=10, seed=0,
    )
    optimizer, epoch_fn, _ = make_pretrain_epoch(model, X, Y, stats, cfg)
    params = model.init(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)
    from qcpinn_tpu.train.cz_pipeline import PHYS_KEYS

    ema = {k: jnp.asarray(1.0) for k in ("data",) + PHYS_KEYS + ("abs_data", "abs_phys")}
    first = last = None
    for e in range(1, cfg.epochs + 1):
        params, opt_state, ema, m = epoch_fn(
            params, opt_state, ema, jnp.asarray(e, jnp.float32),
            jax.random.PRNGKey(e),
        )
        m = jax.device_get(m)
        assert float(m["phys"]) == 0.0
        last = float(m["loss"])
        if first is None:
            first = last
    assert np.isfinite(last) and last < first


def test_pretrain_data_parallel_trajectory_parity(rng):
    """run_pretrain(mesh=...) shards the node batch over the 'data' axis
    (XLA inserts the gradient reduction) and must reproduce the
    single-device loss history exactly — the cz flagship's multi-chip
    data-parallel path."""
    from qcpinn_tpu.parallel import make_mesh

    model = _small_model()
    N = 96
    X = rng.uniform(0.05, 1, (N, 2)).astype(np.float32)
    Y = rng.uniform(-0.1, 0.1, (N, 5)).astype(np.float32)
    stats = DataStats(1, 1, 1, 0, 1, 1.0)
    # tight parity on the data-only path (losses O(0.1): any layout bug
    # would show); the physics path is checked looser below because its
    # O(1e6) residual sums reorder across shards in float32
    cfg = CzConfig(
        n_qubits=4, n_layers=1, epochs=3, batch_size=32, lr=3e-3,
        physics_weight=0.0, physics_warmup=0, physics_ramp=1,
        log_every=10, seed=0,
    )
    _, hist_single = run_pretrain(model, X, Y, stats, cfg)
    _, hist_dp = run_pretrain(model, X, Y, stats, cfg, mesh=make_mesh())
    np.testing.assert_allclose(hist_dp, hist_single, rtol=1e-5)

    cfg_p = CzConfig(
        n_qubits=4, n_layers=1, epochs=2, batch_size=32, lr=3e-3,
        physics_weight=0.05, physics_warmup=0, physics_ramp=1,
        log_every=10, seed=0,
    )
    _, hp_single = run_pretrain(model, X, Y, stats, cfg_p)
    _, hp_dp = run_pretrain(model, X, Y, stats, cfg_p, mesh=make_mesh())
    np.testing.assert_allclose(hp_dp, hp_single, rtol=1e-2)


def test_trunk_width_lever(rng):
    """width scales the classical trunk (the measured capacity lever,
    PARITY.md probe); the default stays reference-exact and any width
    still produces the 5-field output with hard axis constraints."""
    wide = Hybrid16QPINN(n_qubits=4, n_layers=1, width=256)
    slim = Hybrid16QPINN(n_qubits=4, n_layers=1, width=64)
    from qcpinn_tpu.models.nn_core import count_trainable

    pw = wide.init(jax.random.PRNGKey(0))
    ps = slim.init(jax.random.PRNGKey(0))
    assert count_trainable(pw) > 2 * count_trainable(ps)
    x = jnp.asarray(rng.uniform(0.05, 1, (6, 2)).astype(np.float32))
    for m, p in ((wide, pw), (slim, ps)):
        out = np.asarray(jax.jit(m.apply)(p, x))
        assert out.shape == (6, 5) and np.isfinite(out).all()
        # hard constraint: u_r, u_theta ∝ r
        x0 = x.at[:, 0].set(0.0)
        out0 = np.asarray(jax.jit(m.apply)(p, x0))
        np.testing.assert_allclose(out0[:, 0], 0.0, atol=1e-7)
        np.testing.assert_allclose(out0[:, 2], 0.0, atol=1e-7)


def test_cz_amp_sharded_statevector_parity(rng):
    """Hybrid16QPINN.use_sharded: the circuit's [B, 2^n] state rides a
    ('data','amp') mesh via GSPMD constraints — forward, gradients and a
    2-epoch pretrain trajectory must match single-device exactly (the
    flagship's multi-chip HBM relief, PARITY.md ladder)."""
    from qcpinn_tpu.parallel import make_mesh

    N = 64
    X = rng.uniform(0.05, 1, (N, 2)).astype(np.float32)
    Y = rng.uniform(-0.1, 0.1, (N, 5)).astype(np.float32)
    stats = DataStats(1, 1, 1, 0, 1, 1.0)
    mesh = make_mesh(data=2, amp=4)

    m1 = Hybrid16QPINN(n_qubits=4, n_layers=2)
    m2 = Hybrid16QPINN(n_qubits=4, n_layers=2).use_sharded(mesh)
    params = m1.init(jax.random.PRNGKey(0))
    xb = jnp.asarray(X[:16])

    f1 = np.asarray(jax.jit(m1.apply)(params, xb))
    f2 = np.asarray(jax.jit(m2.apply)(params, xb))
    np.testing.assert_allclose(f2, f1, atol=2e-6)

    g1 = jax.jit(jax.grad(lambda p: jnp.sum(m1.apply(p, xb) ** 2)))(params)
    g2 = jax.jit(jax.grad(lambda p: jnp.sum(m2.apply(p, xb) ** 2)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)

    cfg = CzConfig(
        n_qubits=4, n_layers=2, epochs=2, batch_size=32, lr=3e-3,
        physics_weight=0.0, physics_warmup=0, physics_ramp=1,
        log_every=10, seed=0,
    )
    _, h1 = run_pretrain(m1, X, Y, stats, cfg)
    _, h2 = run_pretrain(m2, X, Y, stats, cfg, mesh=mesh)
    np.testing.assert_allclose(h2, h1, rtol=1e-5)


def test_finetune_with_noise_model(rng):
    """Noisy-simulator finetune (the reference's ibm-sim phase,
    cg-hqpinn/...16q_effective.py:183-196): NoiseModel shrinks the Cz
    circuit's expectations and the finetune still trains finitely."""
    from qcpinn_tpu.ops.measure import NoiseModel

    q = CzQuantumLayer(n_qubits=3, n_layers=1)
    w = q.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.uniform(-1, 1, (4, 3)).astype(np.float32))
    clean = np.asarray(q.apply(w, x))
    noisy = np.asarray(q.apply(w, x, noise=NoiseModel(0.1, 0.02)))
    np.testing.assert_allclose(noisy, clean * 0.9 * 0.96, atol=1e-6)

    model = Hybrid16QPINN(n_qubits=3, n_layers=1)
    params = model.init(jax.random.PRNGKey(0))
    X = rng.uniform(0, 1, (16, 2)).astype(np.float32)
    Y = rng.normal(0, 0.3, (16, 5)).astype(np.float32)
    cfg = CzConfig(
        n_qubits=3, n_layers=1, finetune_epochs=4, shots=256, calib_size=8,
        train_scope="head", log_every=100,
        noise_depolarizing=0.05, noise_readout=0.01,
    )
    _, hist = run_finetune(model, params, X, Y, DataStats(1, 1, 1, 0, 1, 1.0), cfg)
    assert np.all(np.isfinite(hist))


def test_real_melt_dataset_vendored_and_loads():
    """The reference's 18,108-node COMSOL melt export
    (/root/reference/data/cz_melt_raw.txt:1-9) is vendored; the loader
    reproduces the reference's normalization stats."""
    path = os.path.join(os.path.dirname(__file__), "..", "data", "cz_melt_raw.txt")
    X, Y, stats = load_cz_data(path)
    assert X.shape == (18108, 2) and Y.shape == (18108, 5)
    np.testing.assert_allclose(stats.length_scale, 0.3, rtol=1e-6)
    assert stats.temp_min == 1685.0 and stats.temp_max == 1750.0
    assert np.abs(X).max() <= 1.0 and np.isfinite(Y).all()


def test_evaluate_cz_fields_chunking(rng):
    """Chunked field-wise eval (with final-chunk padding) matches the
    direct computation."""
    from qcpinn_tpu.utils.evaluation import evaluate_cz_fields

    model = _small_model()
    params = model.init(jax.random.PRNGKey(0))
    X = rng.uniform(0, 1, (37, 2)).astype(np.float32)
    Y = rng.normal(0, 0.3, (37, 5)).astype(np.float32)
    m = evaluate_cz_fields(model.apply, params, X, Y, batch=16)
    pred = np.asarray(model.apply(params, jnp.asarray(X)))
    np.testing.assert_allclose(m["val_mse"], np.mean((pred - Y) ** 2), rtol=1e-5)
    ref = 100.0 * np.linalg.norm(pred[:, 4] - Y[:, 4]) / np.linalg.norm(Y[:, 4])
    np.testing.assert_allclose(m["rel_l2_T_percent"], ref, rtol=1e-5)


def test_finetune_full_scope_trains_quantum(rng):
    """train_scope='full' routes the circuit through the parameter-shift
    estimator: quantum weights receive REAL shot-noise gradients (not the
    zero stop_gradient path) and the calibration loss drops."""
    model = Hybrid16QPINN(n_qubits=3, n_layers=1)
    params = model.init(jax.random.PRNGKey(0))
    X = rng.uniform(0, 1, (24, 2)).astype(np.float32)
    Y = rng.normal(0, 0.3, (24, 5)).astype(np.float32)
    stats = DataStats(1, 1, 1, 0, 1, 1.0)
    cfg = CzConfig(
        n_qubits=3, n_layers=1, finetune_epochs=15, finetune_lr=3e-3,
        shots=2048, calib_size=8, train_scope="full", log_every=100,
    )
    q0 = np.asarray(params["q"])
    p2, hist = run_finetune(model, params, X, Y, stats, cfg)
    assert np.abs(np.asarray(p2["q"]) - q0).max() > 0
    assert min(hist) < 0.2 * hist[0], hist[:3] + hist[-3:]


def test_physics_normalize_balanced_bounds_physics(rng):
    """'balanced' scales physics to the data-loss magnitude via absolute
    EMAs, so a huge raw residual (real pressure_coeff ~ 1.3e5 makes the
    squared residual open ~1e12) cannot crush the data fit. In contrast the
    reference's ratio-to-average scheme (EMAWeights,
    CG_HQPINN_IBMtest_16qubits.py:408-422) cancels itself when the average
    is physics-dominated, and the loss degenerates to pure physics."""
    from qcpinn_tpu.train.cz_pipeline import PHYS_KEYS, make_pretrain_epoch

    model = Hybrid16QPINN(n_qubits=3, n_layers=1)
    N = 32
    X = rng.uniform(0.05, 1, (N, 2)).astype(np.float32)
    Y = rng.normal(0, 0.3, (N, 5)).astype(np.float32)
    stats = DataStats(0.3, 0.17, 3722.0, 1685.0, 1750.0, 1.34e5)

    def run(mode, epochs=6):
        cfg = CzConfig(
            n_qubits=3, n_layers=1, epochs=epochs, batch_size=16, lr=1e-3,
            physics_warmup=0, physics_ramp=1, physics_normalize=mode,
            seed=0,
        )
        params = model.init(jax.random.PRNGKey(0))
        optimizer, epoch_fn, _ = make_pretrain_epoch(model, X, Y, stats, cfg)
        opt_state = optimizer.init(params)
        ema = {k: jnp.asarray(1.0)
               for k in ("data",) + PHYS_KEYS + ("abs_data", "abs_phys")}
        ms = []
        for e in range(1, epochs + 1):
            params, opt_state, ema, m = epoch_fn(
                params, opt_state, ema, jnp.asarray(e, jnp.float32),
                jax.random.PRNGKey(e))
            ms.append(jax.device_get(m))
        return ms

    bal = run("balanced")
    # physics contribution (total - data) stays a small fraction of the data
    # loss once the absolute EMAs have converged, despite phys ~ 1e10 raw
    last = bal[-1]
    assert last["phys"] > 1e6  # the raw residual really is huge
    assert last["loss"] - last["data"] < 0.5 * last["data"]
    # and the data fit improves
    assert last["data"] < 0.7 * bal[0]["data"]

    ref = run("reference", epochs=2)
    # the reference scheme leaves physics dominating the total by orders of
    # magnitude — the documented collapse mechanism
    assert ref[-1]["loss"] - ref[-1]["data"] > 100.0 * ref[-1]["data"]


def test_field_weights_normalized_and_steer_gradients(rng):
    """field_weights are mean-1 normalized (uniform weights reproduce the
    reference's plain MSE exactly) and reallocate per-field gradient mass:
    upweighting one field shrinks its per-field error faster than uniform
    training does, at matched steps."""
    from qcpinn_tpu.train.cz_pipeline import PHYS_KEYS, make_pretrain_epoch

    model = Hybrid16QPINN(n_qubits=3, n_layers=1)
    N = 64
    X = rng.uniform(0.05, 1, (N, 2)).astype(np.float32)
    Y = rng.normal(0, 0.3, (N, 5)).astype(np.float32)
    stats = DataStats(0.3, 0.17, 3722.0, 1685.0, 1750.0, 1.34e5)

    # normalization: any uniform vector == None
    cfg_u = CzConfig(field_weights=(3.0,) * 5)
    assert np.allclose(np.asarray(cfg_u.norm_field_weights()), 1.0)
    with pytest.raises(ValueError):
        CzConfig(field_weights=(1.0, 2.0)).norm_field_weights()

    def run(fw, epochs=8):
        cfg = CzConfig(
            n_qubits=3, n_layers=1, epochs=epochs, batch_size=32, lr=3e-3,
            physics_weight=0.0, physics_warmup=10**6, seed=0,
            field_weights=fw,
        )
        params = model.init(jax.random.PRNGKey(0))
        optimizer, epoch_fn, _ = make_pretrain_epoch(model, X, Y, stats, cfg)
        opt_state = optimizer.init(params)
        ema = {k: jnp.asarray(1.0)
               for k in ("data",) + PHYS_KEYS + ("abs_data", "abs_phys")}
        for e in range(1, epochs + 1):
            params, opt_state, ema, _ = epoch_fn(
                params, opt_state, ema, jnp.asarray(e, jnp.float32),
                jax.random.PRNGKey(e))
        pred = np.asarray(model.apply(params, jnp.asarray(X)))
        return np.mean((pred - Y) ** 2, axis=0)  # per-field MSE

    uniform = run(None)
    boosted = run((8.0, 1.0, 1.0, 1.0, 1.0))  # upweight u_r
    assert boosted[0] < uniform[0]  # the boosted field fits faster


def test_epoch_shuffle_rotates_dataset_tail(rng):
    """len(X) % batch rows are dropped per-epoch AFTER a full-dataset
    permutation, so the dropped remainder rotates across epochs
    (regression: the tail was truncated once at build time and NEVER
    trained). Tail rows live in a distinct input region with distinct
    targets; with rotation the model must learn them."""
    from qcpinn_tpu.train.cz_pipeline import PHYS_KEYS, make_pretrain_epoch

    model = Hybrid16QPINN(n_qubits=3, n_layers=1)
    # 32 head rows near the origin with target 0; 8 tail rows in a far
    # corner with target 1 — only reachable through the shuffle rotation
    Xh = rng.uniform(0.05, 0.3, (32, 2)).astype(np.float32)
    Xt = rng.uniform(0.8, 1.0, (8, 2)).astype(np.float32)
    X = np.concatenate([Xh, Xt])
    Y = np.concatenate(
        [np.zeros((32, 5)), np.ones((8, 5))]
    ).astype(np.float32)
    cfg = CzConfig(
        n_qubits=3, n_layers=1, epochs=40, batch_size=32, lr=5e-3,
        physics_weight=0.0, physics_warmup=10**6, seed=0,
    )
    params = model.init(jax.random.PRNGKey(0))
    optimizer, epoch_fn, n_batches = make_pretrain_epoch(model, X, Y, stats=DataStats(
        0.3, 0.17, 3722.0, 1685.0, 1750.0, 1.34e5), cfg=cfg)
    assert n_batches == 1  # 40 rows, batch 32 -> one batch + 8-row tail
    opt_state = optimizer.init(params)
    ema = {k: jnp.asarray(1.0)
           for k in ("data",) + PHYS_KEYS + ("abs_data", "abs_phys")}
    for e in range(1, cfg.epochs + 1):
        params, opt_state, ema, _ = epoch_fn(
            params, opt_state, ema, jnp.asarray(e, jnp.float32),
            jax.random.PRNGKey(e))
    pred_tail = np.asarray(model.apply(params, jnp.asarray(Xt)))
    # untrained-tail behavior predicts ~0 there (head rows all-zero targets);
    # rotation must pull the tail region decisively toward 1
    assert pred_tail.mean() > 0.4, pred_tail.mean()


def test_pretrain_time_budget_stops_gracefully(rng, capsys):
    """time_budget_s stops after the epoch that crosses the budget and
    returns the params/history accumulated so far (the caller then saves
    normally), instead of losing the run to an external timeout kill."""
    from qcpinn_tpu.train.cz_pipeline import run_pretrain

    model = Hybrid16QPINN(n_qubits=3, n_layers=1)
    X = rng.uniform(0.05, 1, (64, 2)).astype(np.float32)
    Y = rng.normal(0, 0.3, (64, 5)).astype(np.float32)
    stats = DataStats(0.3, 0.17, 3722.0, 1685.0, 1750.0, 1.34e5)
    cfg = CzConfig(n_qubits=3, n_layers=1, epochs=500, batch_size=32,
                   physics_weight=0.0, physics_warmup=10**6, seed=0)
    params, history = run_pretrain(
        model, X, Y, stats, cfg, time_budget_s=1e-6)
    assert len(history) == 1  # stopped right after the first epoch
    assert np.isfinite(history).all()
    assert "stopping gracefully" in capsys.readouterr().out


def test_pretrain_coupled_adaptive_weighting(rng):
    """physics_normalize='coupled' (modified_qpinn_cg.py:142-156): the
    trainable eps_data leaf is injected, trained, and STRIPPED from the
    returned params so checkpoints stay loadable against the model's own
    template; the loss trajectory differs from 'balanced' on the same
    stream."""
    model = _small_model()
    N = 48
    X = rng.uniform(0.05, 1, (N, 2)).astype(np.float32)
    Y = rng.uniform(-0.5, 0.5, (N, 5)).astype(np.float32)
    stats = DataStats(1, 1, 1, 0, 1, 1.0)

    def cfg(mode):
        return CzConfig(
            n_qubits=4, n_layers=1, epochs=3, batch_size=16, lr=1e-3,
            physics_warmup=0, physics_ramp=1, log_every=10, seed=0,
            physics_normalize=mode, coupled_ratio=50.0,
        )

    p_c, h_c = run_pretrain(model, X, Y, stats, cfg("coupled"))
    assert "loss_bal" not in p_c  # stripped: a training artifact
    assert np.all(np.isfinite(h_c))
    tmpl = set(model.init(jax.random.PRNGKey(0)).keys())
    assert set(p_c.keys()) == tmpl

    p_b, h_b = run_pretrain(model, X, Y, stats, cfg("balanced"))
    assert not np.allclose(h_c, h_b)

"""CV Fock engine: operators against known quantum-optics identities, the CV
network variants, and a CV solver training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qcpinn_tpu.config import QCPINNConfig
from qcpinn_tpu.models.cv_layer import CVLayer, interferometer_wiring
from qcpinn_tpu.models.cv_solver import CVSolver
from qcpinn_tpu.ops import fock


def test_lowering_operator():
    a = fock.lowering(4)
    # a|2> = sqrt(2)|1>
    v = np.zeros(4, dtype=np.complex64)
    v[2] = 1
    out = a @ v
    np.testing.assert_allclose(out[1], np.sqrt(2), atol=1e-6)


def test_displacement_creates_coherent_state():
    """D(alpha)|0> is a coherent state with <n> = |alpha|^2."""
    d = 24
    r = 0.6
    u = fock.displacement(jnp.asarray(r), jnp.asarray(0.0), d)
    state = jnp.zeros((1, d), dtype=jnp.complex64).at[0, 0].set(1.0)
    out = fock.apply_1m(state, 1, d, 0, u)
    n_exp = float(fock.number_expvals(out, 1, d)[0, 0])
    np.testing.assert_allclose(n_exp, r * r, rtol=1e-3)
    # Poisson photon statistics: P(n) = e^{-|a|^2} |a|^{2n} / n!
    marg = np.asarray(fock.mode_marginals(out, 1, d))[0, 0]
    import math

    for n in range(4):
        expect = np.exp(-(r**2)) * r ** (2 * n) / math.factorial(n)
        np.testing.assert_allclose(marg[n], expect, rtol=1e-3, atol=1e-6)
    # <x> of coherent state with real alpha: 2*alpha (hbar=2)
    x_exp = float(fock.quad_x_expvals(out, 1, d)[0, 0])
    np.testing.assert_allclose(x_exp, 2 * r, rtol=1e-3)


def test_squeezing_photon_number():
    """S(r)|0> has <n> = sinh^2(r)."""
    d = 30
    r = 0.4
    u = fock.squeezing(jnp.asarray(r), jnp.asarray(0.0), d)
    state = jnp.zeros((1, d), dtype=jnp.complex64).at[0, 0].set(1.0)
    out = fock.apply_1m(state, 1, d, 0, u)
    n_exp = float(fock.number_expvals(out, 1, d)[0, 0])
    np.testing.assert_allclose(n_exp, np.sinh(r) ** 2, rtol=1e-3)


def test_beamsplitter_photon_conservation_and_swap():
    d = 5
    # theta = pi/2 swaps the modes (|01> -> e^{i phi'}|10>)
    u = fock.beamsplitter(jnp.asarray(np.pi / 2), jnp.asarray(0.0), d)
    state = jnp.zeros((1, d * d), dtype=jnp.complex64).at[0, 1].set(1.0)  # |0,1>
    out = fock.apply_2m(state, 2, d, 0, 1, u)
    n = np.asarray(fock.number_expvals(out, 2, d))[0]
    np.testing.assert_allclose(n, [1.0, 0.0], atol=1e-5)
    # unitarity
    uu = np.asarray(u)
    np.testing.assert_allclose(uu @ uu.conj().T, np.eye(d * d), atol=1e-5)


def test_kerr_and_rotation_preserve_number():
    d = 6
    state = jnp.zeros((1, d), dtype=jnp.complex64).at[0, 3].set(1.0)
    for u in [fock.kerr(jnp.asarray(0.7), d), fock.rotation(jnp.asarray(1.1), d)]:
        out = fock.apply_1m(state, 1, d, 0, u)
        np.testing.assert_allclose(
            float(fock.number_expvals(out, 1, d)[0, 0]), 3.0, atol=1e-5
        )


def test_interferometer_wiring_counts():
    for m in range(2, 6):
        assert len(interferometer_wiring(m)) == m * (m - 1) // 2


@pytest.mark.parametrize("variant", [1, 2, 3])
def test_cv_layer_forward_and_grad(variant, rng):
    layer = CVLayer(num_qumodes=2, num_layers=1, cutoff_dim=4, variant=variant)
    params = layer.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.uniform(-0.5, 0.5, size=(3, 2)).astype(np.float32))
    out = layer.apply(params, x)
    assert out.shape == (3, 2)
    assert np.all(np.isfinite(np.asarray(out)))
    g = jax.jit(jax.grad(lambda p: jnp.sum(layer.apply(p, x) ** 2)))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # photon-number readout is nonnegative for v1/v3
    if variant != 2:
        assert np.all(np.asarray(out) >= -1e-6)


def test_cv_param_counts_match_reference():
    # CVNeuralNetwork1.py:27-62: theta_1/theta_2 of n(n-1)+max(1,n-1),
    # r/phi/displacement/kerr of (L, m) each
    m, L = 3, 2
    layer = CVLayer(m, L, cutoff_dim=3, variant=1)
    p = layer.init(jax.random.PRNGKey(0))
    n_interf = m * (m - 1) + max(1, m - 1)
    assert p["theta_1"].shape == (L, n_interf)
    assert p["theta_2"].shape == (L, n_interf)
    for k in ["squeezing_r", "squeezing_phi", "displacement_r", "displacement_phi", "kerr"]:
        assert p[k].shape == (L, m)


def test_cv_solver_training_step(rng):
    from qcpinn_tpu.data import gaussian_pulse_samplers
    from qcpinn_tpu.physics import diffusion_operator
    from qcpinn_tpu.train import diffusion_terms, train

    cfg = QCPINNConfig(
        solver="CV",
        num_qubits=2,
        cutoff_dim=4,
        cv_class=1,
        classic_network=(3, 8, 1),
        epochs=6,
        batch_size=9,
        print_every=6,
        lr=1e-3,
        seed=0,
    )
    model = CVSolver(cfg)
    samplers = gaussian_pulse_samplers()
    terms = diffusion_terms(samplers, cfg.batch_size)
    assert cfg.effective_grad_clip == 0.1  # CV-specific clip
    params, history = train(model, cfg, terms, diffusion_operator)
    assert np.all(np.isfinite(history))


def test_cv_readout_override():
    """readout= overrides the reference's per-variant readout (round-5 CV
    diagnosis knob); defaults preserve variant semantics exactly; the sd
    overrides change only the init scales."""
    import pytest
    from qcpinn_tpu.models.cv_layer import CVLayer

    m, d = 2, 4
    x = jax.random.uniform(jax.random.PRNGKey(5), (3, m), minval=-0.5, maxval=0.5)
    v3 = CVLayer(m, 1, d, variant=3)
    v3x = CVLayer(m, 1, d, variant=3, readout="x")
    assert v3.readout == "n" and v3x.readout == "x"
    p = v3.init(jax.random.PRNGKey(0))
    out_n = v3.apply(p, x)
    out_x = v3x.apply(p, x)  # same params/circuit, different observable
    assert not np.allclose(out_n, out_x)
    # explicit default readout is identity with no override
    np.testing.assert_allclose(
        CVLayer(m, 1, d, variant=3, readout="n").apply(p, x), out_n)
    # v2's default is 'x'
    assert CVLayer(m, 1, d, variant=2).readout == "x"
    with pytest.raises(ValueError, match="readout"):
        CVLayer(m, 1, d, variant=1, readout="p")
    # sd override flows into init scales (bigger active_sd -> bigger params)
    p_big = CVLayer(m, 1, d, variant=1, active_sd=0.3).init(jax.random.PRNGKey(0))
    p_ref = CVLayer(m, 1, d, variant=1).init(jax.random.PRNGKey(0))
    assert float(jnp.abs(p_big["squeezing_r"]).sum()) > float(
        jnp.abs(p_ref["squeezing_r"]).sum())
    # config plumbing: CVSolver passes cv_readout through
    cfg = QCPINNConfig(solver="CV", num_qubits=2, cutoff_dim=4, cv_class=3,
                       classic_network=(3, 8, 1), cv_readout="x")
    assert CVSolver(cfg).cv.readout == "x"

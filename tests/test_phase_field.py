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

"""Finite-difference gradient check of the CV Fock engine (diagnosis probe).

Probe B showed the CV1 network cannot fit a plain supervised target while the
DV network at the identical sandwich descends 40x — so the suspect is the
gradient path through ops/fock.py, not PINN conditioning. This checks
d<n>/d(input) and d<n>/d(theta) of the full CVLayer against central
differences at a random (but fixed) operating point, for all three variants.

Run: python scripts/cv_gradcheck.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # FD noise floor

import jax.numpy as jnp

from qcpinn_tpu.models.cv_layer import CVLayer


def check(variant: int, m: int = 3, d: int = 8, layers: int = 2, eps: float = 1e-5):
    layer = CVLayer(num_qumodes=m, num_layers=layers, cutoff_dim=d,
                    variant=variant)
    params = layer.init(jax.random.PRNGKey(0))
    # move off the near-vacuum init so all gates act nontrivially
    params = jax.tree_util.tree_map(
        lambda p: p + 0.15 * jax.random.normal(
            jax.random.PRNGKey(hash(str(p.shape)) % 2**31), p.shape, p.dtype),
        params)
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.float64), params)
    x = jnp.array([[0.4, -0.3, 0.2]], dtype=jnp.float64)[:, :m]

    def f_x(xv):
        return jnp.sum(layer.apply(params, xv[None, :]) * jnp.array([1.0, -2.0, 0.5])[:m])

    def f_p(flat, treedef, shapes):
        leaves, i = [], 0
        for s in shapes:
            n = int(jnp.prod(jnp.array(s))) if s else 1
            leaves.append(flat[i:i + n].reshape(s))
            i += n
        p = jax.tree_util.tree_unflatten(treedef, leaves)
        return jnp.sum(layer.apply(p, x) * jnp.array([1.0, -2.0, 0.5])[:m])

    # input gradient
    g_ad = jax.grad(f_x)(x[0])
    g_fd = jnp.array([
        (f_x(x[0].at[i].add(eps)) - f_x(x[0].at[i].add(-eps))) / (2 * eps)
        for i in range(m)
    ])
    in_err = float(jnp.max(jnp.abs(g_ad - g_fd)) / (jnp.max(jnp.abs(g_fd)) + 1e-12))

    # parameter gradient (sampled coordinates from every group)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    shapes = [l.shape for l in leaves]
    flat = jnp.concatenate([l.ravel() for l in leaves])
    g_ad_p = jax.grad(lambda fl: f_p(fl, treedef, shapes))(flat)
    idxs = jnp.linspace(0, flat.shape[0] - 1, 25).astype(int)
    errs = []
    for i in idxs:
        fp = (f_p(flat.at[i].add(eps), treedef, shapes)
              - f_p(flat.at[i].add(-eps), treedef, shapes)) / (2 * eps)
        errs.append((float(g_ad_p[i]), float(fp)))
    denom = max(max(abs(b) for _, b in errs), 1e-9)
    p_err = max(abs(a - b) for a, b in errs) / denom
    print(f"variant {variant}: input-grad rel err {in_err:.2e}, "
          f"param-grad rel err {p_err:.2e}")
    worst = sorted(errs, key=lambda ab: -abs(ab[0] - ab[1]))[:3]
    for a, b in worst:
        print(f"  ad={a:+.6e}  fd={b:+.6e}")
    return in_err, p_err


if __name__ == "__main__":
    for v in (1, 2, 3):
        check(v)

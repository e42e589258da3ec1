"""Evaluation: meshgrid relative-L2 vs analytic solutions + summaries
(trainer/diffusion_hybrid_trainer.py:126-184, train_hybrid_qpinn.py:768-811)."""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..train.losses import relative_l2


def meshgrid_points(
    num: int = 20, dims: int = 3, lo=None, hi=None
) -> np.ndarray:
    """Regular grid over [lo, hi] (default unit hypercube), [num^dims, dims]
    float32 (the reference's 20^3 evaluation grid)."""
    lo = np.zeros(dims, np.float32) if lo is None else np.asarray(lo, np.float32)
    hi = np.ones(dims, np.float32) if hi is None else np.asarray(hi, np.float32)
    axes = [np.linspace(lo[d], hi[d], num, dtype=np.float32) for d in range(dims)]
    grids = np.meshgrid(*axes, indexing="ij")
    return np.stack([g.ravel() for g in grids], axis=1)


def evaluate_relative_l2(
    model_apply: Callable,
    params,
    analytic_u: Callable,
    analytic_r: Optional[Callable] = None,
    operator: Optional[Callable] = None,
    num: int = 20,
    batch: int = 4096,
    lo=None,
    hi=None,
    dims: int = 3,
) -> Dict[str, float]:
    """Relative L2 (%) of u (and optionally of the PDE residual vs analytic
    forcing) on a num^dims grid, mirroring diffusion_hybrid_trainer.py:161-184
    (dims=2 for the (t, x) / (x1, x2) problems: wave, Klein-Gordon,
    Helmholtz)."""
    # jit everything: eager (op-by-op) execution is not supported on the
    # experimental axon TPU platform
    apply_j = jax.jit(model_apply)
    pts = meshgrid_points(num, dims=dims, lo=lo, hi=hi)
    preds = []
    for i in range(0, len(pts), batch):
        chunk = jnp.asarray(pts[i : i + batch])
        preds.append(np.asarray(apply_j(params, chunk)))
    pred = np.concatenate(preds, axis=0)
    exact = np.asarray(analytic_u(jnp.asarray(pts)))
    out = {
        "rel_l2_u_percent": 100.0
        * float(relative_l2(jnp.asarray(pred), jnp.asarray(exact)))
    }
    if analytic_r is not None and operator is not None:
        res_fn = jax.jit(
            lambda p, X: operator(lambda Xp: model_apply(p, Xp), X)[1]
        )
        res_chunks = []
        for i in range(0, len(pts), batch):
            chunk = jnp.asarray(pts[i : i + batch])
            res_chunks.append(np.asarray(res_fn(params, chunk)))
        res = np.concatenate(res_chunks, axis=0)
        exact_r = np.asarray(analytic_r(jnp.asarray(pts)))
        out["rel_l2_r_percent"] = 100.0 * float(
            relative_l2(jnp.asarray(res), jnp.asarray(exact_r))
        )
    return out


CZ_FIELDS = ("u_r", "u_z", "u_theta", "p", "T")


def evaluate_cz_fields(
    model_apply: Callable, params, X, Y, batch: int = 2048,
    return_pred: bool = False, mesh=None,
):
    """Field-wise relative-L2 (%) + overall val MSE on the (normalized)
    COMSOL node set — the flagship Czochralski accuracy metric. Chunked:
    at 16 qubits one forward over all 18k nodes would materialize an
    [N, 2^16] statevector (~9.5 GB); fixed-size chunks keep one compiled
    shape and ~1 GB peak.

    ``mesh`` shards each chunk over the 'data' axis (cz --data-parallel
    eval): the forward partitions across devices, ~devices× faster on a
    pod slice."""
    if mesh is not None:
        from ..parallel.mesh import batch_sharding

        sh = batch_sharding(mesh, ndim=2)

        def apply_sharded(p, xb):
            xb = jax.lax.with_sharding_constraint(xb, sh)
            return model_apply(p, xb)

        apply_j = jax.jit(apply_sharded)
    else:
        apply_j = jax.jit(model_apply)
    X = np.asarray(X)
    Y = np.asarray(Y)
    n = len(X)
    preds = []
    for i in range(0, n, batch):
        c = X[i : i + batch]
        if len(c) < batch:
            c = np.pad(c, ((0, batch - len(c)), (0, 0)))
        preds.append(np.asarray(apply_j(params, jnp.asarray(c))))
    pred = np.concatenate(preds, axis=0)[:n]
    out = {"val_mse": float(np.mean((pred - Y) ** 2))}
    for k, name in enumerate(CZ_FIELDS):
        num = float(np.linalg.norm(pred[:, k] - Y[:, k]))
        den = max(float(np.linalg.norm(Y[:, k])), 1e-12)
        out[f"rel_l2_{name}_percent"] = 100.0 * num / den
    if return_pred:
        return out, pred
    return out


def mse_at_time_slice(
    model_apply: Callable,
    params,
    analytic_u: Callable,
    t: float = 0.5,
    num: int = 20,
) -> float:
    """MSE on a spatial grid at fixed t (train_hybrid_qpinn.py:810-811)."""
    g = np.linspace(0.0, 1.0, num, dtype=np.float32)
    X, Y = np.meshgrid(g, g, indexing="ij")
    pts = np.stack([np.full(X.size, t, np.float32), X.ravel(), Y.ravel()], axis=1)
    pred = np.asarray(jax.jit(model_apply)(params, jnp.asarray(pts)))
    exact = np.asarray(analytic_u(jnp.asarray(pts)))
    return float(np.mean((pred - exact) ** 2))

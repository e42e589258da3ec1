"""Tangent-stream diffusion residuals for DV sandwich models.

The quantum circuit U is LINEAR in the state and shared across the batch, so
input-coordinate derivatives of psi(X) = U . E(a(X)) never need autodiff
through the circuit:

    d psi      = U . dE,      dE  = A_v E,          A_v = -i/2 sum_i v_i X_i
    d^2 psi    = U . d2E,     d2E = (A_v^2 + A_w) E
    (v = da/dX_col, w = d2a/dX_col^2;  RX(a) = exp(-i a X / 2))

so the primal state and ALL derivative streams are just a 6x-wider batch
pushed through ONE plain forward of U. Expectations and their derivatives
come back as bilinear readouts:

    z    = <psi|Z|psi>
    dz   = 2 Re <dpsi|Z|psi>
    d2z  = 2 Re <d2psi|Z|psi> + 2 <dpsi|Z|dpsi>

The classical encoder (angles a(X)) and decoder (post-net) are small — their
first/second derivatives use ordinary nested jvp. Net effect vs autodiff
through the simulator: the circuit cost drops from ~(primal + jvp-of-jvp +
transposes, each materialized per gate) to 6 plain forwards + 1 plain
backward — at 16 qubits this is the difference between B=32 and B=256
fitting in HBM.

Parity: identical to operators_fwd.diffusion_operator_fwd for these model
structures (tested to float tolerance).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import statevector as sv
from ..ops.circuit import DVCircuit

Array = jnp.ndarray


def _col_tangent(X: Array, col: int) -> Array:
    return jnp.zeros_like(X).at[:, col].set(1.0)


def _enc_d1(f: Callable, X: Array, col: int):
    return jax.jvp(f, (X,), (_col_tangent(X, col),))


def _enc_d2(f: Callable, X: Array, col: int):
    tangent = _col_tangent(X, col)

    def g(Xp):
        return jax.jvp(f, (Xp,), (tangent,))

    (a, da), (_, d2a) = jax.jvp(g, (X,), (tangent,))
    return a, da, d2a


def _wire_flips(state: Array, n: int) -> Array:
    """[n, B, D]: X_i applied to the state for every wire (bit_i flip)."""
    flips = []
    for w in range(n):
        lo = 1 << w
        hi = 1 << (n - 1 - w)
        s = state.reshape(state.shape[0], lo, 2, hi)
        flips.append(jnp.flip(s, axis=2).reshape(state.shape))
    return jnp.stack(flips, axis=0)


def _a_op(flips: Array, v: Array) -> Array:
    """A_v state = -i/2 sum_i v_i X_i state, from precomputed flips.
    v: [B, n] real."""
    acc = jnp.einsum(
        "bi,ibd->bd", v.astype(jnp.complex64), flips,
        precision=jax.lax.Precision.HIGHEST,
    )
    return -0.5j * acc


def _bilinear_z(a: Array, b: Array, n: int) -> Array:
    """Re <a|Z_w|b> for all wires: [B, n]."""
    prod = jnp.real(jnp.conj(a) * b).astype(jnp.float32)
    sign = jnp.asarray(sv._z_sign_matrix(n))
    return jnp.dot(
        prod, sign, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def circuit_z_streams(
    circuit: DVCircuit,
    q_params: Array,
    a: Array,
    d1: dict,
    d2: dict,
    evolve_fn=None,
) -> Tuple[Array, dict, dict]:
    """Given angles a [B, n] and their coordinate derivatives
    (d1[col] = da/dcol, d2[col] = d2a/dcol^2), return (z, dz[col], d2z[col])
    with ONE batched circuit evolution and no autodiff through it.

    d2 keys must be a subset of d1 keys; for cols in d1 only, first
    derivatives are returned."""
    n = circuit.n
    b = a.shape[0]
    E = circuit.prepare(a)  # [B, D]
    # prepare() encodes RX(s*a) with s = input_scale (1 for 'angle', pi for
    # 'angle_pi'); the analytic stream derivatives below are w.r.t. the
    # rotation ANGLE, so chain-rule the scale into the tangents here.
    # With theta = s*a: dE/dcol = A E (s da), d2E/dcol2 = A(AE)(s da)^2 +
    # A E (s d2a) — scaling BOTH inputs by s is exact: the quadratic factor
    # arises from the doubly-applied scaled first tangent below.
    s_in = getattr(circuit, "input_scale", 1.0)
    if s_in != 1.0:
        d1 = {k: v * s_in for k, v in d1.items()}
        d2 = {k: v * s_in for k, v in d2.items()}
    flips = _wire_flips(E, n)

    streams = [E]
    index = {"0": 0}
    d1_states = {}
    for col, v in d1.items():
        s = _a_op(flips, v)
        d1_states[col] = s
        index[f"d1_{col}"] = len(streams)
        streams.append(s)
    for col, w in d2.items():
        s1 = d1_states[col]
        flips1 = _wire_flips(s1, n)
        s2 = _a_op(flips1, d1[col]) + _a_op(flips, w)
        index[f"d2_{col}"] = len(streams)
        streams.append(s2)

    stacked = jnp.concatenate(streams, axis=0)  # [K*B, D]
    if evolve_fn is None:
        evolve_fn = circuit.evolve
    evolved = evolve_fn(q_params, stacked)

    def stream(tag):
        i = index[tag]
        return jax.lax.dynamic_slice_in_dim(evolved, i * b, b, axis=0)

    psi0 = stream("0")
    z = _bilinear_z(psi0, psi0, n)
    dz = {}
    for col in d1:
        dz[col] = 2.0 * _bilinear_z(stream(f"d1_{col}"), psi0, n)
    d2z = {}
    for col in d2:
        psi_c = stream(f"d1_{col}")
        d2z[col] = 2.0 * _bilinear_z(stream(f"d2_{col}"), psi0, n) + 2.0 * _bilinear_z(
            psi_c, psi_c, n
        )
    return z, dz, d2z


def dv_diffusion_residual_streams(
    model,
    params: dict,
    X: Array,
    sigma_t: float = 1.0,
    sigma_x: float = 1.0,
    sigma_y: float = 1.0,
    D: float = 0.01,
    v_x: float = 1.0,
    v_y: float = 1.0,
) -> Tuple[Array, Array]:
    """Convection-diffusion (u, residual) for DVSolver / DVFourierSolver via
    tangent streams. X = [t, x, y]."""
    circuit = model.circuit

    # classical encoder: X -> (angles, extra classical features for the head)
    def encoder(Xp):
        import qcpinn_tpu.models.nn_core as nc

        if hasattr(model, "mapping"):  # DVFourierSolver
            h = jnp.concatenate(
                [Xp, nc.fourier_features_apply(params["ff"], Xp)], axis=-1
            )
            for layer in params["pre"][:-1]:
                h = jnp.tanh(nc.linear_apply(layer, h))
            angles = jnp.pi * jnp.tanh(nc.linear_apply(params["pre"][-1], h))
            skip = jnp.tanh(nc.linear_apply(params["skip"][0], h))
            return jnp.concatenate([angles, skip], axis=-1)
        pre = nc.mlp_apply(params["pre"], Xp)
        return pre

    n = circuit.n

    enc0, enc_t = _enc_d1(encoder, X, 0)
    _, enc_x, enc_xx = _enc_d2(encoder, X, 1)
    _, enc_y, enc_yy = _enc_d2(encoder, X, 2)

    a = enc0[:, :n]
    d1 = {"t": enc_t[:, :n], "x": enc_x[:, :n], "y": enc_y[:, :n]}
    d2 = {"x": enc_xx[:, :n], "y": enc_yy[:, :n]}
    # the Pallas reverse-sweep backend composes here: streams only need
    # first-order reverse through the evolution
    fused = getattr(model, "_fused", None)
    evolve_fn = getattr(fused, "evolve", None)
    if fused is not None and evolve_fn is None:
        import warnings

        warnings.warn(
            "model's fused backend exposes no evolve(); the derivative "
            "streams will run on the UNSHARDED XLA engine — the 6x-wider "
            "stream batch does not get the backend's memory benefits",
            stacklevel=2,
        )
    z, dz, d2z = circuit_z_streams(circuit, params["q"], a, d1, d2, evolve_fn)

    # decoder chain rule via nested jvp over the (z, extra) feature space
    extra0 = enc0[:, n:]
    ex_t, ex_x, ex_y = enc_t[:, n:], enc_x[:, n:], enc_y[:, n:]
    ex_xx, ex_yy = enc_xx[:, n:], enc_yy[:, n:]

    def head(feat):
        import qcpinn_tpu.models.nn_core as nc

        return nc.mlp_apply(params["post"], feat)

    f0 = jnp.concatenate([z, extra0], axis=-1)
    g_t = jnp.concatenate([dz["t"], ex_t], axis=-1)
    g_x = jnp.concatenate([dz["x"], ex_x], axis=-1)
    g_y = jnp.concatenate([dz["y"], ex_y], axis=-1)
    h_x = jnp.concatenate([d2z["x"], ex_xx], axis=-1)
    h_y = jnp.concatenate([d2z["y"], ex_yy], axis=-1)

    u, u_t = jax.jvp(head, (f0,), (g_t,))

    def second(gcol, hcol):
        def inner(f):
            return jax.jvp(head, (f,), (gcol,))

        # jvp of `inner` at f0 with tangent g yields (J g, H[g, g]); the
        # chain rule's remaining first-order term J h is a separate jvp.
        (uu, du), (_, curv) = jax.jvp(inner, (f0,), (gcol,))
        _, jh = jax.jvp(head, (f0,), (hcol,))
        return du, curv + jh

    u_x, u_xx = second(g_x, h_x)
    u_y, u_yy = second(g_y, h_y)

    if "rbf" in params:
        # additive localized head (models/dv_fourier.py): a direct function
        # of X, so its streams are ordinary (cheap) nested jvps — no
        # circuit evolution involved
        import qcpinn_tpu.models.nn_core as nc

        rbf_fn = lambda Xp: nc.rbf_apply(params["rbf"], Xp)
        r0, r_t = _enc_d1(rbf_fn, X, 0)
        _, r_x, r_xx = _enc_d2(rbf_fn, X, 1)
        _, r_y, r_yy = _enc_d2(rbf_fn, X, 2)
        u = u + r0
        u_t = u_t + r_t
        u_x, u_y = u_x + r_x, u_y + r_y
        u_xx, u_yy = u_xx + r_xx, u_yy + r_yy

    residual = (
        u_t[:, 0] / sigma_t
        + v_x * u_x[:, 0] / sigma_x
        + v_y * u_y[:, 0] / sigma_y
        - D * (u_xx[:, 0] / sigma_x**2 + u_yy[:, 0] / sigma_y**2)
    )
    return u[:, 0:1], residual[:, None]

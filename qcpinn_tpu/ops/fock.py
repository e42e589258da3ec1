"""Continuous-variable (photonic) simulation in a truncated Fock space.

TPU-native replacement for the reference's Strawberry Fields `fock` device
(nn/CVNeuralNetwork1.py:63-66): the m-mode state is a dense ``[B, d^m]``
complex tensor (d = cutoff_dim), gates are dense d x d (or d^2 x d^2)
matrices applied with the same bit-split-style reshapes as the qubit engine
— evaluated for the whole batch at once instead of the reference's
per-sample Python loop (nn/CVNeuralNetwork1.py:70-71).

Operator conventions follow PennyLane/SF with hbar = 2:

  a|n> = sqrt(n)|n-1>;     x = a + a^dag  (since sqrt(hbar/2) = 1)
  Rotation(phi)      = exp(i phi n)                      (diagonal)
  Displacement(r,p)  = exp(alpha a^dag - alpha* a),  alpha = r e^{ip}
  Squeezing(r,p)     = exp((z* a^2 - z a^dag^2)/2),  z = r e^{ip}
  Kerr(kappa)        = exp(i kappa n^2)                  (diagonal)
  CrossKerr(kappa)   = exp(i kappa n_i n_j)              (diagonal, 2-mode)
  CubicPhase(gamma)  = exp(i gamma x^3 / (3 hbar))
  Beamsplitter(t,p)  = exp(t (e^{ip} a b^dag - e^{-ip} a^dag b))

Dense exponentials use ``jax.scipy.linalg.expm`` of the *truncated*
generator — exactly unitary on the truncated space (anti-Hermitian
generators), differentiable, numerically stable; matrix elements agree with
exact-then-truncate up to the usual cutoff error. Matrices are tiny
(d <= ~16), so building them per-sample under vmap is free next to the
state contraction.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import expm

# Engine precision. complex64 matches the qubit engine; QCPINN_FOCK_DTYPE=
# complex128 switches the whole CV path to double (requires jax_enable_x64).
# The CV gates are built by expm of a truncated generator, and expm's
# *gradient* in float32 carries ~1e-2 relative noise (measured:
# scripts/cv_gradcheck.py) — double precision is how the trainability
# diagnosis separates gradient noise from landscape pathology.
CDTYPE = jnp.complex64
FDTYPE = jnp.float32
if os.environ.get("QCPINN_FOCK_DTYPE") == "complex128":
    CDTYPE = jnp.complex128
    FDTYPE = jnp.float64


@functools.lru_cache(maxsize=32)
def lowering(d: int) -> np.ndarray:
    """Truncated annihilation operator a: a[m, n] = sqrt(n) delta_{m, n-1}."""
    return np.diag(np.sqrt(np.arange(1, d, dtype=np.float64)), 1).astype(
        np.dtype(CDTYPE))


@functools.lru_cache(maxsize=32)
def number_diag(d: int) -> np.ndarray:
    return np.arange(d, dtype=np.dtype(FDTYPE))


def displacement(r, phi, d: int) -> jnp.ndarray:
    a = jnp.asarray(lowering(d))
    alpha = (r * jnp.exp(1j * phi.astype(CDTYPE))).astype(CDTYPE)
    g = alpha * a.conj().T - jnp.conj(alpha) * a
    return expm(g)


def squeezing(r, phi, d: int) -> jnp.ndarray:
    a = jnp.asarray(lowering(d))
    z = (r * jnp.exp(1j * phi.astype(CDTYPE))).astype(CDTYPE)
    a2 = a @ a
    g = 0.5 * (jnp.conj(z) * a2 - z * a2.conj().T)
    return expm(g)


def rotation(phi, d: int) -> jnp.ndarray:
    n = jnp.asarray(number_diag(d))
    return jnp.diag(jnp.exp(1j * phi.astype(CDTYPE) * n))


def kerr(kappa, d: int) -> jnp.ndarray:
    n = jnp.asarray(number_diag(d))
    return jnp.diag(jnp.exp(1j * kappa.astype(CDTYPE) * n * n))


def cubic_phase(gamma, d: int, hbar: float = 2.0) -> jnp.ndarray:
    a = jnp.asarray(lowering(d))
    x = (a + a.conj().T) * np.sqrt(hbar / 2.0)
    g = 1j * gamma.astype(CDTYPE) * (x @ x @ x) / (3.0 * hbar)
    return expm(g)


def beamsplitter(theta, phi, d: int) -> jnp.ndarray:
    """Two-mode [d^2, d^2] in (mode_a, mode_b) index order."""
    a = jnp.asarray(lowering(d))
    eye = jnp.eye(d, dtype=CDTYPE)
    a1 = jnp.kron(a, eye)
    a2 = jnp.kron(eye, a)
    ephi = jnp.exp(1j * phi.astype(CDTYPE))
    g = theta.astype(CDTYPE) * (ephi * a1 @ a2.conj().T - jnp.conj(ephi) * a1.conj().T @ a2)
    return expm(g)


def cross_kerr_diag(kappa, d: int) -> jnp.ndarray:
    """Diagonal of exp(i kappa n_i n_j) as a [d, d] phase table."""
    n = jnp.asarray(number_diag(d))
    return jnp.exp(1j * kappa.astype(CDTYPE) * jnp.outer(n, n))


# -- state manipulation --------------------------------------------------------

def vacuum(batch: int, m: int, d: int) -> jnp.ndarray:
    state = jnp.zeros((batch, d**m), dtype=CDTYPE)
    return state.at[:, 0].set(1.0 + 0.0j)


def apply_1m(state: jnp.ndarray, m: int, d: int, mode: int, u: jnp.ndarray) -> jnp.ndarray:
    """Apply a [d, d] (or batched [B, d, d]) one-mode gate."""
    b = state.shape[0]
    lo = d**mode
    hi = d ** (m - 1 - mode)
    s = state.reshape(b, lo, d, hi)
    if u.ndim == 2:
        out = jnp.einsum("kn,banc->bakc", u, s, precision=jax.lax.Precision.HIGHEST)
    else:
        out = jnp.einsum("bkn,banc->bakc", u, s, precision=jax.lax.Precision.HIGHEST)
    return out.reshape(b, d**m)


def apply_2m(
    state: jnp.ndarray, m: int, d: int, mode_a: int, mode_b: int, u: jnp.ndarray
) -> jnp.ndarray:
    """Apply a [d^2, d^2] two-mode gate given in (mode_a, mode_b) order."""
    w1, w2 = (mode_a, mode_b) if mode_a < mode_b else (mode_b, mode_a)
    u4 = u.reshape(d, d, d, d)
    if mode_a > mode_b:
        u4 = u4.transpose(1, 0, 3, 2)
    b = state.shape[0]
    da = d**w1
    dm = d ** (w2 - w1 - 1)
    dc = d ** (m - 1 - w2)
    s = state.reshape(b, da, d, dm, d, dc)
    out = jnp.einsum("klij,baicjd->bakcld", u4, s, precision=jax.lax.Precision.HIGHEST)
    return out.reshape(b, d**m)


def apply_diag_2m(
    state: jnp.ndarray, m: int, d: int, mode_a: int, mode_b: int, table: jnp.ndarray
) -> jnp.ndarray:
    """Apply a diagonal two-mode phase table [d, d] (CrossKerr)."""
    w1, w2 = (mode_a, mode_b) if mode_a < mode_b else (mode_b, mode_a)
    b = state.shape[0]
    da = d**w1
    dm = d ** (w2 - w1 - 1)
    dc = d ** (m - 1 - w2)
    s = state.reshape(b, da, d, dm, d, dc)
    t = table if mode_a < mode_b else table.T
    out = s * t[None, None, :, None, :, None]
    return out.reshape(b, d**m)


def mode_marginals(state: jnp.ndarray, m: int, d: int) -> jnp.ndarray:
    """P(n photons in mode w): [B, m, d]."""
    b = state.shape[0]
    probs = jnp.real(state * jnp.conj(state))
    out = []
    for w in range(m):
        lo = d**w
        hi = d ** (m - 1 - w)
        p = probs.reshape(b, lo, d, hi).sum(axis=(1, 3))
        out.append(p)
    return jnp.stack(out, axis=1)


def number_expvals(state: jnp.ndarray, m: int, d: int) -> jnp.ndarray:
    """<n_w> for every mode: [B, m] (nn/CVNeuralNetwork1.py:81-83 readout)."""
    marg = mode_marginals(state, m, d)
    return jnp.sum(marg * jnp.asarray(number_diag(d)), axis=-1)


def quad_x_expvals(state: jnp.ndarray, m: int, d: int, hbar: float = 2.0) -> jnp.ndarray:
    """<x_w> = <a + a^dag> * sqrt(hbar/2) per mode: [B, m]
    (CVNeuralNetwork2.py:65-68 QuadOperator(phi=0) readout)."""
    a = jnp.asarray(lowering(d))
    x_op = (a + a.conj().T) * np.sqrt(hbar / 2.0)
    b = state.shape[0]
    out = []
    for w in range(m):
        lo = d**w
        hi = d ** (m - 1 - w)
        s = state.reshape(b, lo, d, hi)
        xs = jnp.einsum("kn,banc->bakc", x_op, s, precision=jax.lax.Precision.HIGHEST)
        val = jnp.sum(jnp.conj(s) * xs, axis=(1, 2, 3))
        out.append(jnp.real(val))
    return jnp.stack(out, axis=1)

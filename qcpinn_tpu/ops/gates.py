"""Gate matrix constructors for the batched statevector engine.

Conventions match PennyLane (the reference's circuit layer,
/root/reference/nn/DVQuantumLayer.py):

- ``RX(t) = exp(-i t X / 2)``, ``RY(t) = exp(-i t Y / 2)``,
  ``RZ(t) = exp(-i t Z / 2)``.
- ``Rot(phi, theta, omega) = RZ(omega) @ RY(theta) @ RZ(phi)``.
- ``PhaseShift(phi) = diag(1, e^{i phi})``.
- Controlled 2-qubit matrices are given in (control, target) index order:
  ``U = |0><0| (x) I + |1><1| (x) G``.

All constructors accept scalar or batched ``[B]`` angles and return
``[..., 2, 2]`` (or ``[..., 4, 4]``) complex64 arrays, so the same code path
serves shared circuit parameters and per-sample encoding angles.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

CDTYPE = jnp.complex64
RDTYPE = jnp.float32

_I2 = np.eye(2, dtype=np.complex64)

# Fixed (non-parametric) gates as numpy constants.
H = np.array([[1.0, 1.0], [1.0, -1.0]], dtype=np.complex64) / np.sqrt(2.0)
X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=np.complex64)
Y = np.array([[0.0, -1.0j], [1.0j, 0.0]], dtype=np.complex64)
Z = np.array([[1.0, 0.0], [0.0, -1.0]], dtype=np.complex64)

CNOT = np.array(
    [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]], dtype=np.complex64
)
CZ = np.diag(np.array([1, 1, 1, -1], dtype=np.complex64))
SWAP = np.array(
    [[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=np.complex64
)


def _half(theta):
    theta = jnp.asarray(theta, dtype=RDTYPE)
    return theta / 2.0


def rx(theta) -> jnp.ndarray:
    h = _half(theta)
    c = jnp.cos(h).astype(CDTYPE)
    s = (-1j * jnp.sin(h)).astype(CDTYPE)
    return jnp.stack(
        [jnp.stack([c, s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def ry(theta) -> jnp.ndarray:
    h = _half(theta)
    c = jnp.cos(h).astype(CDTYPE)
    s = jnp.sin(h).astype(CDTYPE)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def rz(theta) -> jnp.ndarray:
    h = _half(theta)
    em = jnp.exp(-1j * h).astype(CDTYPE)
    ep = jnp.exp(1j * h).astype(CDTYPE)
    zero = jnp.zeros_like(em)
    return jnp.stack(
        [jnp.stack([em, zero], axis=-1), jnp.stack([zero, ep], axis=-1)], axis=-2
    )


def phase_shift(phi) -> jnp.ndarray:
    phi = jnp.asarray(phi, dtype=RDTYPE)
    one = jnp.ones_like(phi).astype(CDTYPE)
    e = jnp.exp(1j * phi.astype(CDTYPE))
    zero = jnp.zeros_like(one)
    return jnp.stack(
        [jnp.stack([one, zero], axis=-1), jnp.stack([zero, e], axis=-1)], axis=-2
    )


def rot(phi, theta, omega) -> jnp.ndarray:
    """PennyLane Rot = RZ(omega) RY(theta) RZ(phi)."""
    return rz(omega) @ ry(theta) @ rz(phi)


def controlled(gate: jnp.ndarray) -> jnp.ndarray:
    """Lift a (batched) 1-qubit gate to a controlled 2-qubit gate.

    Index order is (control, target): ``diag(I, gate)``.
    """
    gate = jnp.asarray(gate, dtype=CDTYPE)
    batch_shape = gate.shape[:-2]
    eye = jnp.broadcast_to(jnp.asarray(_I2), batch_shape + (2, 2))
    zeros = jnp.zeros(batch_shape + (2, 2), dtype=CDTYPE)
    top = jnp.concatenate([eye, zeros], axis=-1)
    bot = jnp.concatenate([zeros, gate], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def crx(theta) -> jnp.ndarray:
    return controlled(rx(theta))


def cry(theta) -> jnp.ndarray:
    return controlled(ry(theta))


def crz(theta) -> jnp.ndarray:
    return controlled(rz(theta))


def haar_2q_pair(seed: int) -> tuple[np.ndarray, np.ndarray]:
    """The reference's fixed seeded Haar 4x4 unitaries.

    Reproduces nn/DVQuantumLayer.py:203-209: two ``unitary_group.rvs(4)``
    draws from ``np.random.RandomState(seed)`` and ``RandomState(seed + 1)``.
    They are constants of the model (re-sampled identically every forward in
    the reference), so we bake them once at program-build time.
    """
    from scipy.stats import unitary_group

    u1 = unitary_group.rvs(4, random_state=np.random.RandomState(seed))
    u2 = unitary_group.rvs(4, random_state=np.random.RandomState(seed + 1))
    return u1.astype(np.complex64), u2.astype(np.complex64)

"""Gate-program IR: a circuit is a *static, compile-time* list of ops.

The reference dispatches ansatzes with Python method calls inside a QNode
(nn/DVQuantumLayer.py:184-201). Here an ansatz is a pure data structure — a
tuple of :class:`Op` — built once per (ansatz, n_qubits) and unrolled at JAX
trace time, so XLA sees one fused computation with static shapes and no
Python control flow on the hot path.

Parametrized ops carry *indices* into a flat per-layer parameter vector
(``pidx``), which keeps the executor independent of any particular ansatz.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from . import gates, statevector as sv

# Parametrized kinds take angles from params[pidx]; fixed kinds use `const`
# or a canned matrix.
PARAM_1Q = {"rx", "ry", "rz", "ps"}
PARAM_1Q3 = {"rot"}  # 3 angles: Rot(phi, theta, omega)
PARAM_2Q = {"crx", "cry", "crz"}
FIXED_1Q = {"h", "x", "y", "z"}
FIXED_2Q = {"cnot", "cz", "swap"}

_FIXED_1Q_MATS = {"h": gates.H, "x": gates.X, "y": gates.Y, "z": gates.Z}
_FIXED_2Q_MATS = {"cnot": gates.CNOT, "cz": gates.CZ, "swap": gates.SWAP}
_PARAM_1Q_FNS = {"rx": gates.rx, "ry": gates.ry, "rz": gates.rz, "ps": gates.phase_shift}
_PARAM_2Q_FNS = {"crx": gates.crx, "cry": gates.cry, "crz": gates.crz}


@dataclasses.dataclass(frozen=True)
class Op:
    kind: str
    wires: Tuple[int, ...]
    pidx: Tuple[int, ...] = ()
    # Fixed unitary (numpy complex64), for 'u1q'/'u2q' (e.g. Haar blocks).
    const: Optional[np.ndarray] = None

    def __post_init__(self):
        if self.kind in PARAM_1Q:
            assert len(self.wires) == 1 and len(self.pidx) == 1, self
        elif self.kind in PARAM_1Q3:
            assert len(self.wires) == 1 and len(self.pidx) == 3, self
        elif self.kind in PARAM_2Q:
            assert len(self.wires) == 2 and len(self.pidx) == 1, self
        elif self.kind in FIXED_1Q:
            assert len(self.wires) == 1 and not self.pidx, self
        elif self.kind in FIXED_2Q:
            assert len(self.wires) == 2 and not self.pidx, self
        elif self.kind == "u1q":
            assert len(self.wires) == 1 and self.const is not None, self
        elif self.kind == "u2q":
            assert len(self.wires) == 2 and self.const is not None, self
        else:
            raise ValueError(f"unknown op kind: {self.kind}")


Program = Tuple[Op, ...]


def num_params(program: Program) -> int:
    top = -1
    for op in program:
        for p in op.pidx:
            top = max(top, p)
    return top + 1


def apply_program(
    state: jnp.ndarray, n: int, program: Program, params: jnp.ndarray
) -> jnp.ndarray:
    """Run a gate program. ``params`` is the flat per-layer vector ``[P]``.

    ``params`` may also be batched ``[B, P]`` (used by data-reuploading
    circuits whose angles depend on the per-sample input).
    """
    batched_params = params.ndim == 2
    for op in program:
        if not isinstance(op, Op):  # fused DiagRun (see diag_fusion.py)
            state = op.apply(state, params)
            continue
        k = op.kind
        if k in PARAM_1Q:
            theta = params[..., op.pidx[0]]
            state = sv.apply_1q(state, n, op.wires[0], _PARAM_1Q_FNS[k](theta))
        elif k in PARAM_1Q3:
            phi = params[..., op.pidx[0]]
            th = params[..., op.pidx[1]]
            om = params[..., op.pidx[2]]
            state = sv.apply_1q(state, n, op.wires[0], gates.rot(phi, th, om))
        elif k in PARAM_2Q:
            # controlled rotations via the elementwise masked-flip path
            theta = params[..., op.pidx[0]]
            base = {"crx": gates.rx, "cry": gates.ry, "crz": gates.rz}[k]
            state = sv.apply_ctrl_1q(
                state, n, op.wires[0], op.wires[1], base(theta)
            )
        elif k in FIXED_1Q:
            state = sv.apply_1q(state, n, op.wires[0], jnp.asarray(_FIXED_1Q_MATS[k]))
        elif k == "cnot":
            state = sv.apply_ctrl_1q(
                state, n, op.wires[0], op.wires[1], jnp.asarray(gates.X)
            )
        elif k in FIXED_2Q:
            state = sv.apply_2q(
                state, n, op.wires[0], op.wires[1], jnp.asarray(_FIXED_2Q_MATS[k])
            )
        elif k == "u1q":
            state = sv.apply_1q(state, n, op.wires[0], jnp.asarray(op.const))
        elif k == "u2q":
            state = sv.apply_2q(
                state, n, op.wires[0], op.wires[1], jnp.asarray(op.const)
            )
        else:  # pragma: no cover - guarded by Op.__post_init__
            raise ValueError(k)
    del batched_params
    return state


def dense_unitary(n: int, program: Program, params: np.ndarray) -> np.ndarray:
    """Dense ``[2^n, 2^n]`` matrix of a program — the test oracle.

    Built by pushing every basis state through the engine itself would be
    circular; instead this constructs each gate's full-space matrix with
    numpy krons. Used only in tests.
    """
    dim = 1 << n
    total = np.eye(dim, dtype=np.complex128)

    def embed_1q(m: np.ndarray, w: int) -> np.ndarray:
        ops = [np.eye(2, dtype=np.complex128)] * n
        ops[w] = m.astype(np.complex128)
        full = ops[0]
        for o in ops[1:]:
            full = np.kron(full, o)
        return full

    def embed_2q(m4: np.ndarray, wa: int, wb: int) -> np.ndarray:
        # Build via action on basis states (slow but simple and trustworthy).
        full = np.zeros((dim, dim), dtype=np.complex128)
        m4 = m4.astype(np.complex128).reshape(2, 2, 2, 2)
        sa = n - 1 - wa
        sb = n - 1 - wb
        for col in range(dim):
            ba = (col >> sa) & 1
            bb = (col >> sb) & 1
            base = col & ~((1 << sa) | (1 << sb))
            for ka in range(2):
                for kb in range(2):
                    row = base | (ka << sa) | (kb << sb)
                    full[row, col] += m4[ka, kb, ba, bb]
        return full

    params = np.asarray(params)
    for op in program:
        k = op.kind
        if k in PARAM_1Q:
            g = np.asarray(_PARAM_1Q_FNS[k](params[op.pidx[0]]))
            total = embed_1q(g, op.wires[0]) @ total
        elif k in PARAM_1Q3:
            g = np.asarray(
                gates.rot(params[op.pidx[0]], params[op.pidx[1]], params[op.pidx[2]])
            )
            total = embed_1q(g, op.wires[0]) @ total
        elif k in PARAM_2Q:
            g = np.asarray(_PARAM_2Q_FNS[k](params[op.pidx[0]]))
            total = embed_2q(g, op.wires[0], op.wires[1]) @ total
        elif k in FIXED_1Q:
            total = embed_1q(_FIXED_1Q_MATS[k], op.wires[0]) @ total
        elif k in FIXED_2Q:
            total = embed_2q(_FIXED_2Q_MATS[k], op.wires[0], op.wires[1]) @ total
        elif k == "u1q":
            total = embed_1q(op.const, op.wires[0]) @ total
        elif k == "u2q":
            total = embed_2q(op.const, op.wires[0], op.wires[1]) @ total
    return total

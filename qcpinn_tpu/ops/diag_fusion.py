"""Diagonal-gate fusion: the engine's single most important algebraic pass.

RZ / PhaseShift / CZ / CRZ are all diagonal in the computational basis, and
diagonal gates commute. cross_mesh — the flagship ansatz — is dominated by
its all-to-all CRZ block: n(n-1) gates (240 at 16 qubits) that naively cost
240 full-state sweeps of HBM traffic each. This pass collects *maximal
commuting runs* of diagonal gates (a diagonal gate may hoist past any earlier
gate that doesn't touch its wires) and replaces each run with one
:class:`DiagRun` whose phase vector is

    phi(s) = Bits(s) . (W1^T theta)            (linear terms: RZ, PS, CRZ)
           + Bits(s)^T Q(theta) Bits(s)        (bilinear terms: CRZ, CZ)
           + const(s)                          (CZ static part)

computed with two [2^n, n]-shaped matmuls (MXU) and applied as a single
elementwise complex multiply over the [B, 2^n] state — one HBM sweep instead
of hundreds. Phases match PennyLane's conventions exactly (including the
global e^{-i theta/2} of RZ), so fused and unfused programs agree to float
tolerance as *states*, not just as expectations.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .program import Op, Program

DIAGONAL_KINDS = {"rz", "ps", "crz", "cz"}


@functools.lru_cache(maxsize=32)
def bit_matrix(n: int) -> np.ndarray:
    """[2^n, n] float32: Bits[s, w] = bit of wire w in basis state s
    (wire 0 = most significant)."""
    idx = np.arange(1 << n, dtype=np.int64)
    return ((idx[:, None] >> (n - 1 - np.arange(n))[None, :]) & 1).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class DiagRun:
    """A fused run of diagonal gates.

    - w1: [P, n] linear coefficients on Bits columns
    - c1: [P] parameter-linear scalar (global-phase) coefficients
    - quad: tuple of (ctrl, tgt, param_idx) bilinear terms
    - const_pairs: tuple of (a, b) CZ wire pairs (static pi * b_a * b_b)
    - pidx: parameter indices consumed by this run (into the layer vector)
    """

    n: int
    pidx: Tuple[int, ...]
    w1: np.ndarray
    c1: np.ndarray
    quad: Tuple[Tuple[int, int, int], ...]  # (ctrl, tgt, local param index)
    const_pairs: Tuple[Tuple[int, int], ...]

    def phases(self, params: jnp.ndarray) -> jnp.ndarray:
        """params: [P_layer] or [B, P_layer] -> phase vector [2^n] / [B, 2^n]."""
        hi = jax.lax.Precision.HIGHEST  # bf16 rounding would corrupt phases
        bits = jnp.asarray(bit_matrix(self.n))
        theta = params[..., jnp.asarray(self.pidx, dtype=jnp.int32)]
        # linear: Bits @ (W1^T theta)  (+ scalar global-phase part)
        lin_w = jnp.matmul(theta, jnp.asarray(self.w1), precision=hi)  # [..., n]
        phi = jnp.matmul(lin_w, bits.T, precision=hi)  # [..., 2^n]
        phi = phi + jnp.sum(theta * jnp.asarray(self.c1), axis=-1, keepdims=True)
        # bilinear: sum_k theta_k * b_c * b_t
        if self.quad:
            cs = np.array([q[0] for q in self.quad])
            ts = np.array([q[1] for q in self.quad])
            ks = np.array([q[2] for q in self.quad])
            # Q[c, t] accumulated from theta
            q_mat = jnp.zeros(theta.shape[:-1] + (self.n, self.n), dtype=theta.dtype)
            q_mat = q_mat.at[..., cs, ts].add(theta[..., ks])
            # phi_s += Bits[s] @ Q @ Bits[s]
            bq = jnp.einsum("sc,...ct->...st", bits, q_mat, precision=hi)
            phi = phi + jnp.einsum("...st,st->...s", bq, bits, precision=hi)
        if self.const_pairs:
            cvec = np.zeros(1 << self.n, dtype=np.float32)
            b = bit_matrix(self.n)
            for a, t in self.const_pairs:
                cvec += np.pi * b[:, a] * b[:, t]
            phi = phi + jnp.asarray(cvec)
        return phi

    def apply(self, state: jnp.ndarray, params: jnp.ndarray) -> jnp.ndarray:
        phi = self.phases(params)
        if phi.ndim == 1:
            phi = phi[None, :]
        return state * jnp.exp(1j * phi).astype(state.dtype)


FusedProgram = Tuple[Union[Op, DiagRun], ...]


def split_diag_run(run: DiagRun, hb: int):
    """Split a run into independent (hi, lo) runs across the hi/lo wire cut
    (block_fused.py chain-shortening): possible iff no bilinear (CRZ) or
    static CZ term crosses the boundary — the phase then separates as
    phi[h, l] = phi_hi[h] + phi_lo[l], i.e. the diagonal factorizes into
    exp(i phi_hi) (x) exp(i phi_lo) and each factor can be absorbed into
    its block's unitary. Returns None when a term crosses (the run stays a
    full-state elementwise segment). The parameter-linear global-phase
    part (c1) rides the hi factor. Either side may come back None when it
    is the identity."""
    for c, t, _ in run.quad:
        if (c < hb) != (t < hb):
            return None
    for a, b in run.const_pairs:
        if (a < hb) != (b < hb):
            return None
    lb = run.n - hb
    hi = DiagRun(
        hb,
        run.pidx,
        run.w1[:, :hb],
        run.c1,
        tuple(q for q in run.quad if q[0] < hb),
        tuple(p for p in run.const_pairs if p[0] < hb),
    )
    lo = DiagRun(
        lb,
        run.pidx,
        run.w1[:, hb:],
        np.zeros_like(run.c1),
        tuple((c - hb, t - hb, k) for c, t, k in run.quad if c >= hb),
        tuple((a - hb, b - hb) for a, b in run.const_pairs if a >= hb),
    )

    def trivial(r: DiagRun) -> bool:
        return (
            not r.quad and not r.const_pairs
            and not np.any(r.w1) and not np.any(r.c1)
        )

    return (None if trivial(hi) else hi), (None if trivial(lo) else lo)


def _make_run(n: int, ops: List[Op]) -> DiagRun:
    pidx: List[int] = []
    lin_rows: List[np.ndarray] = []
    c1: List[float] = []
    quad: List[Tuple[int, int, int]] = []
    const_pairs: List[Tuple[int, int]] = []

    def local(p: int) -> int:
        if p in pidx:
            return pidx.index(p)
        pidx.append(p)
        lin_rows.append(np.zeros(n, dtype=np.float32))
        c1.append(0.0)
        return len(pidx) - 1

    for op in ops:
        if op.kind == "rz":
            # diag(e^{-i t/2}, e^{i t/2}) = e^{-i t/2} diag(1, e^{i t}):
            # phi = t * b_w - t/2
            k = local(op.pidx[0])
            lin_rows[k][op.wires[0]] += 1.0
            c1[k] += -0.5
        elif op.kind == "ps":
            k = local(op.pidx[0])
            lin_rows[k][op.wires[0]] += 1.0
        elif op.kind == "crz":
            # identity on b_c=0; RZ(t) on target when b_c=1:
            # phi = b_c * (t b_t - t/2) = t b_c b_t - (t/2) b_c
            k = local(op.pidx[0])
            c, t = op.wires
            quad.append((c, t, k))
            lin_rows[k][c] += -0.5
        elif op.kind == "cz":
            const_pairs.append(op.wires)
        else:  # pragma: no cover
            raise ValueError(f"not diagonal: {op.kind}")

    w1 = np.stack(lin_rows, axis=0) if lin_rows else np.zeros((0, n), np.float32)
    return DiagRun(
        n=n,
        pidx=tuple(pidx),
        w1=w1,
        c1=np.asarray(c1, dtype=np.float32),
        quad=tuple(quad),
        const_pairs=tuple(const_pairs),
    )


def fuse_diagonals(program: Program, n: int, min_run: int = 2) -> FusedProgram:
    """Greedy commuting-run scheduler. Walks the program keeping one open
    diagonal run; a diagonal gate joins the run unless one of its wires has
    been touched by a non-diagonal gate since the run started (in which case
    the run is flushed and a new one starts). Runs shorter than ``min_run``
    are left as individual gates."""
    out: List[Union[Op, DiagRun]] = []
    run: List[Op] = []
    run_pos: List[int] = []  # position in `out` where the run will be placed
    blocked: set = set()  # wires touched by non-diagonal ops since run start

    def flush():
        nonlocal run, blocked
        if not run:
            return
        if len(run) >= min_run:
            out.insert(run_pos[0], _make_run(n, run))
        else:
            for i, op in enumerate(run):
                out.insert(run_pos[0] + i, op)
        run = []
        run_pos.clear()
        blocked = set()

    for op in program:
        if op.kind in DIAGONAL_KINDS:
            if run and any(w in blocked for w in op.wires):
                flush()
            if not run:
                # blocked tracks wires touched by non-diagonal ops *since run
                # start* — reset it when a new run begins.
                blocked = set()
                run_pos.append(len(out))
            run.append(op)
        else:
            blocked.update(op.wires)
            out.append(op)
    flush()
    return tuple(out)


def count_fused(program: FusedProgram) -> Tuple[int, int]:
    """(number of DiagRuns, number of remaining plain ops)."""
    runs = sum(1 for op in program if isinstance(op, DiagRun))
    return runs, len(program) - runs

"""Loop-form Pallas fused-circuit kernels: 16-qubit capable.

The unrolled kernels in :mod:`pallas_sv` emit the whole gate program as
straight-line Mosaic code. At n=16 (D=65536) every elementwise op is ~512
vector registers, so a ~40-step circuit explodes to hundreds of thousands of
instructions and the Mosaic compile runs >30 minutes. These kernels instead
drive ONE generic step body with a ``lax.fori_loop`` over a **packed gate
table** in SMEM — compile time is O(step-body), independent of circuit
length (measured 1-2 s at 16 qubits vs >30 min unrolled).

Design (vs pallas_sv):

- State layout ``[TB, HI, 128]`` per grid program (HI = 2^(n-7)): the 7
  lowest-order qubits live on the lane dimension, the rest on sublanes.
  A gate's butterfly partner is reached with a *dynamic-shift*
  ``pltpu.roll`` on the lane or sublane axis — so the batch tile TB can
  shrink to 1 and the whole working set stays inside the 16 MB VMEM even
  at 2^16 amplitudes/point.
- Gate matrices are **scalars in SMEM** ([K, 8] f32: the four complex
  entries). This works because every trainable ansatz gate is shared
  across the collocation batch; the per-sample *encoding* is hoisted out
  of the kernel entirely (``statevector.encode_angle_product`` builds the
  RX product state in XLA with one state's worth of multiplies).
- Fused diagonal runs (diag_fusion) keep their [2^n] phase vectors in
  VMEM banks, indexed dynamically.
- The backward kernel runs the same table in REVERSE, recovering each
  gate's input by applying the inverse (unitarity — O(1) extra memory, no
  stored intermediates), accumulating scalar parameter-cotangents into an
  SMEM bank and phase-cotangents into VMEM across the sequential grid.

Replaces the capability of the reference's Aer 16-qubit statevector device
(hybrid_testing/CG_HQPINN_IBMtest_16qubits.py:167-176) on the training path.
Exposed as ``LoopFusedCircuit`` — same contract as ``FusedCircuit``
(first-order reverse AD; composes with physics/streams.py for PDE
residuals). Compiled mode needs n >= 10 (HI >= 8 sublanes); interpret mode
(tests) accepts any n >= 1.
"""

from __future__ import annotations

import collections
import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import gates
from .circuit import DVCircuit
from .diag_fusion import DiagRun

LO_BITS = 7
DLO = 1 << LO_BITS  # 128 lanes

# table columns
KIND, A_LANE, A_EXP, IDX, HAS_CTRL, B_LANE, B_EXP, _PAD = range(8)
K_MAT, K_DIAG, K_U2Q = 0, 1, 2


@dataclasses.dataclass(frozen=True)
class LoopProgram:
    n: int
    hi: int  # 2^(n - LO_BITS) sublanes (or smaller in interpret mode)
    lo: int  # lane count (DLO, or 2^n when n < LO_BITS)
    table: np.ndarray  # [S, 8] int32
    num_mats: int
    num_phases: int
    u4_bank: np.ndarray  # [U, 32] f32 — 16 complex entries row-major


def _wire_axis_exp(n: int, lo_bits: int, w: int) -> Tuple[int, int]:
    """wire w (0 = MSB) -> (axis_is_lane, shift exponent within the axis)."""
    g = n - 1 - w  # global bit exponent
    if g < lo_bits:
        return 1, g
    return 0, g - lo_bits


def compile_loop_program(circuit: DVCircuit) -> LoopProgram:
    """Lower a (fused) DVCircuit into the packed gate table. Encoding is NOT
    included — the kernel always runs in evolve mode on a caller-prepared
    state (angle encoding uses the XLA product-state construction)."""
    n = circuit.n
    lo_bits = min(n, LO_BITS)
    rows: List[List[int]] = []
    mat_count = 0
    phase_count = 0
    u4s: List[np.ndarray] = []

    def add_mat(wire: int, ctrl: int = -1):
        nonlocal mat_count
        a_lane, a_exp = _wire_axis_exp(n, lo_bits, wire)
        if ctrl >= 0:
            b_lane, b_exp = _wire_axis_exp(n, lo_bits, ctrl)
            rows.append([K_MAT, a_lane, a_exp, mat_count, 1, b_lane, b_exp, 0])
        else:
            rows.append([K_MAT, a_lane, a_exp, mat_count, 0, 0, 0, 0])
        mat_count += 1

    def add_u2q(wa: int, wb: int, u: np.ndarray):
        a_lane, a_exp = _wire_axis_exp(n, lo_bits, wa)
        b_lane, b_exp = _wire_axis_exp(n, lo_bits, wb)
        u4s.append(np.asarray(u, dtype=np.complex64))
        rows.append([K_U2Q, a_lane, a_exp, len(u4s) - 1, 1, b_lane, b_exp, 0])

    def lower(program):
        nonlocal phase_count
        for op in program:
            if isinstance(op, DiagRun):
                rows.append([K_DIAG, 0, 0, phase_count, 0, 0, 0, 0])
                phase_count += 1
            elif op.kind in ("rx", "ry", "rz", "ps", "rot", "h", "x", "y", "z", "u1q"):
                add_mat(op.wires[0])
            elif op.kind in ("crx", "cry", "crz", "cnot"):
                add_mat(op.wires[1], ctrl=op.wires[0])
            elif op.kind == "cz":
                add_u2q(op.wires[0], op.wires[1], gates.CZ)
            elif op.kind == "swap":
                add_u2q(op.wires[0], op.wires[1], gates.SWAP)
            elif op.kind == "u2q":
                add_u2q(op.wires[0], op.wires[1], op.const)
            else:  # pragma: no cover
                raise ValueError(op.kind)

    for _ in range(circuit.layers):
        lower(circuit.program)
    lower(circuit.epilogue)

    bank = np.zeros((max(len(u4s), 1), 32), dtype=np.float32)
    for u_idx, u in enumerate(u4s):
        flat = u.reshape(16)
        bank[u_idx, 0::2] = np.real(flat)
        bank[u_idx, 1::2] = np.imag(flat)
    return LoopProgram(
        n=n,
        hi=1 << (n - lo_bits),
        lo=1 << lo_bits,
        table=np.asarray(rows, dtype=np.int32),
        num_mats=mat_count,
        num_phases=phase_count,
        u4_bank=bank,
    )


def gather_scalar_inputs(circuit: DVCircuit, lp: LoopProgram, params):
    """Build (mats8 [K, 8] f32, cos [P, HI, LO], sin [P, HI, LO]) from the
    circuit parameters — tiny traced XLA ops. Parameters must be shared
    across the batch (unbatched [num_params]); data-reuploading circuits
    with per-sample angles stay on the XLA path."""
    if params.size != circuit.layers * circuit.params_per_layer:
        raise ValueError("loop backend needs unbatched circuit parameters")
    p2 = params.reshape(circuit.layers, circuit.params_per_layer)
    mats: List[jnp.ndarray] = []
    phases: List[jnp.ndarray] = []

    def lower(program, layer_params):
        for op in program:
            if isinstance(op, DiagRun):
                phases.append(op.phases(layer_params))
                continue
            k = op.kind
            if k in ("rx", "ry", "rz", "ps"):
                fn = {
                    "rx": gates.rx, "ry": gates.ry,
                    "rz": gates.rz, "ps": gates.phase_shift,
                }[k]
                mats.append(fn(layer_params[op.pidx[0]]))
            elif k == "rot":
                mats.append(gates.rot(*(layer_params[i] for i in op.pidx)))
            elif k in ("h", "x", "y", "z"):
                mats.append(jnp.asarray(
                    {"h": gates.H, "x": gates.X, "y": gates.Y, "z": gates.Z}[k]
                ))
            elif k == "u1q":
                mats.append(jnp.asarray(op.const))
            elif k in ("crx", "cry", "crz"):
                fn = {"crx": gates.rx, "cry": gates.ry, "crz": gates.rz}[k]
                mats.append(fn(layer_params[op.pidx[0]]))
            elif k == "cnot":
                mats.append(jnp.asarray(gates.X))
            elif k in ("cz", "swap", "u2q"):
                continue  # fixed 4x4s live in the static u4 bank
            else:  # pragma: no cover
                raise ValueError(k)

    for layer in range(circuit.layers):
        lower(circuit.program, p2[layer])
    lower(circuit.epilogue, jnp.zeros((0,)))

    if mats:
        m = jnp.stack([jnp.asarray(x, dtype=jnp.complex64) for x in mats])  # [K,2,2]
        flat = m.reshape(len(mats), 4)
        mats8 = jnp.stack(
            [jnp.real(flat), jnp.imag(flat)], axis=-1
        ).reshape(len(mats), 8).astype(jnp.float32)
    else:
        mats8 = jnp.zeros((1, 8), dtype=jnp.float32)
    if phases:
        phi = jnp.stack(phases, axis=0).astype(jnp.float32)
    else:
        phi = jnp.zeros((1, 1 << lp.n), dtype=jnp.float32)
    shape3 = (phi.shape[0], lp.hi, lp.lo)
    return mats8, jnp.cos(phi).reshape(shape3), jnp.sin(phi).reshape(shape3)


# -----------------------------------------------------------------------------
# kernel helpers — all values are [TB, HI, LO] f32 pairs
# -----------------------------------------------------------------------------


def _bit3(shape, hi, lo, axis_is_lane, exp):
    """{0,1} mask of the addressed bit, from a dynamic (axis, exponent)."""
    ids_lane = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    ids_sub = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    ids = jnp.where(axis_is_lane == 1, ids_lane, ids_sub)
    return ((ids >> exp) & 1).astype(jnp.float32)


def _swap3(xr, xi, hi, lo, axis_is_lane, exp):
    """Partner amplitudes across the addressed wire; returns (sr, si, bit)."""
    hw = jax.lax.shift_left(1, exp)

    def lane_case(args):
        xr, xi = args
        ids = jax.lax.broadcasted_iota(jnp.int32, xr.shape, 2)
        bit = ((ids >> exp) & 1).astype(jnp.float32)
        fr = pltpu.roll(xr, hw, 2)
        fi = pltpu.roll(xi, hw, 2)
        br = pltpu.roll(xr, lo - hw, 2)
        bi = pltpu.roll(xi, lo - hw, 2)
        return bit * fr + (1.0 - bit) * br, bit * fi + (1.0 - bit) * bi, bit

    def sub_case(args):
        xr, xi = args
        ids = jax.lax.broadcasted_iota(jnp.int32, xr.shape, 1)
        bit = ((ids >> exp) & 1).astype(jnp.float32)
        fr = pltpu.roll(xr, hw, 1)
        fi = pltpu.roll(xi, hw, 1)
        br = pltpu.roll(xr, hi - hw, 1)
        bi = pltpu.roll(xi, hi - hw, 1)
        return bit * fr + (1.0 - bit) * br, bit * fi + (1.0 - bit) * bi, bit

    return jax.lax.cond(axis_is_lane == 1, lane_case, sub_case, (xr, xi))


def _mat_scalars(mats_ref, k, conj_transpose=False):
    """((re, im)) scalar pairs (m00, m01, m10, m11) from the SMEM bank."""

    def ent(i, j, neg=False):
        r = mats_ref[k, (i * 2 + j) * 2]
        im = mats_ref[k, (i * 2 + j) * 2 + 1]
        return (r, -im if neg else im)

    if not conj_transpose:
        return ent(0, 0), ent(0, 1), ent(1, 0), ent(1, 1)
    return ent(0, 0, True), ent(1, 0, True), ent(0, 1, True), ent(1, 1, True)


def _apply_mat(xr, xi, sr, si, bit, m00, m01, m10, m11):
    """Apply the 2x2 (scalar entries) given precomputed partners + bit."""
    dg_r = (1.0 - bit) * m00[0] + bit * m11[0]
    dg_i = (1.0 - bit) * m00[1] + bit * m11[1]
    of_r = (1.0 - bit) * m01[0] + bit * m10[0]
    of_i = (1.0 - bit) * m01[1] + bit * m10[1]
    yr = dg_r * xr - dg_i * xi + of_r * sr - of_i * si
    yi = dg_r * xi + dg_i * xr + of_r * si + of_i * sr
    return yr, yi


def _u2q_coeffs(u4_ref, u, da, db, bit_a, bit_b, conj_transpose=False):
    """Per-element complex coefficient of the (da, db) roll variant."""
    cr = jnp.zeros_like(bit_a)
    ci = jnp.zeros_like(bit_a)
    for ba in range(2):
        for bb in range(2):
            mask = (bit_a if ba else (1.0 - bit_a)) * (
                bit_b if bb else (1.0 - bit_b)
            )
            row, col = ba * 2 + bb, (ba ^ da) * 2 + (bb ^ db)
            if conj_transpose:
                row, col = col, row
            re = u4_ref[u, (row * 4 + col) * 2]
            im = u4_ref[u, (row * 4 + col) * 2 + 1]
            if conj_transpose:
                im = -im
            cr = cr + mask * re
            ci = ci + mask * im
    return cr, ci


def _apply_u2q3(xr, xi, hi, lo, a_lane, a_exp, b_lane, b_exp, u4_ref, u,
                conj_transpose=False):
    sa_r, sa_i, bit_a = _swap3(xr, xi, hi, lo, a_lane, a_exp)
    sb_r, sb_i, bit_b = _swap3(xr, xi, hi, lo, b_lane, b_exp)
    sab_r, sab_i, _ = _swap3(sa_r, sa_i, hi, lo, b_lane, b_exp)
    blocks = ((xr, xi), (sb_r, sb_i), (sa_r, sa_i), (sab_r, sab_i))
    yr = jnp.zeros_like(xr)
    yi = jnp.zeros_like(xi)
    for da in range(2):
        for db in range(2):
            br, bi = blocks[da * 2 + db]
            cr, ci = _u2q_coeffs(u4_ref, u, da, db, bit_a, bit_b, conj_transpose)
            yr = yr + cr * br - ci * bi
            yi = yi + cr * bi + ci * br
    return yr, yi


# -----------------------------------------------------------------------------
# forward kernel
# -----------------------------------------------------------------------------


def _forward_kernel(lp: LoopProgram):
    hi, lo = lp.hi, lp.lo
    steps = lp.table.shape[0]

    def kernel(tab_ref, mats_ref, u4_ref, xr_ref, xi_ref, cos_ref, sin_ref,
               yr_ref, yi_ref):
        def body(i, carry):
            xr, xi = carry
            kind = tab_ref[i, KIND]
            a_lane = tab_ref[i, A_LANE]
            a_exp = tab_ref[i, A_EXP]
            idx = tab_ref[i, IDX]
            has_ctrl = tab_ref[i, HAS_CTRL]
            b_lane = tab_ref[i, B_LANE]
            b_exp = tab_ref[i, B_EXP]

            def mat_branch(xr, xi):
                sr, si, bit = _swap3(xr, xi, hi, lo, a_lane, a_exp)
                m = _mat_scalars(mats_ref, idx)
                gr, gi = _apply_mat(xr, xi, sr, si, bit, *m)
                cbit = _bit3(xr.shape, hi, lo, b_lane, b_exp)
                hc = has_ctrl.astype(jnp.float32)
                sel = hc * cbit + (1.0 - hc)
                return (1.0 - sel) * xr + sel * gr, (1.0 - sel) * xi + sel * gi

            def diag_branch(xr, xi):
                c = cos_ref[pl.ds(idx, 1), :, :]
                s = sin_ref[pl.ds(idx, 1), :, :]
                return c * xr - s * xi, s * xr + c * xi

            def u2q_branch(xr, xi):
                return _apply_u2q3(
                    xr, xi, hi, lo, a_lane, a_exp, b_lane, b_exp, u4_ref, idx
                )

            return jax.lax.switch(
                kind, [mat_branch, diag_branch, u2q_branch], xr, xi
            )

        yr, yi = jax.lax.fori_loop(0, steps, body, (xr_ref[...], xi_ref[...]))
        yr_ref[...] = yr
        yi_ref[...] = yi

    return kernel


# -----------------------------------------------------------------------------
# backward kernel — reverse sweep with inverse gates
# -----------------------------------------------------------------------------


def _backward_kernel(lp: LoopProgram):
    hi, lo = lp.hi, lp.lo
    steps = lp.table.shape[0]
    kmax = max(lp.num_mats, 1)

    def kernel(tab_ref, mats_ref, u4_ref, yr_ref, yi_ref, gr_ref, gi_ref,
               cos_ref, sin_ref, gxr_ref, gxi_ref, gm_ref, gcos_ref, gsin_ref):
        # grad banks accumulate across the (sequential) grid: zero them once
        @pl.when(pl.program_id(0) == 0)
        def _():
            def zk(k, _):
                def zj(j, _):
                    gm_ref[k, j] = 0.0
                    return 0
                return jax.lax.fori_loop(0, 8, zj, 0)

            jax.lax.fori_loop(0, kmax, zk, 0)
            gcos_ref[...] = jnp.zeros(gcos_ref.shape, jnp.float32)
            gsin_ref[...] = jnp.zeros(gsin_ref.shape, jnp.float32)

        def body(j, carry):
            sr, si, gr, gi = carry
            i = steps - 1 - j
            kind = tab_ref[i, KIND]
            a_lane = tab_ref[i, A_LANE]
            a_exp = tab_ref[i, A_EXP]
            idx = tab_ref[i, IDX]
            has_ctrl = tab_ref[i, HAS_CTRL]
            b_lane = tab_ref[i, B_LANE]
            b_exp = tab_ref[i, B_EXP]

            def mat_branch(sr, si, gr, gi):
                minv = _mat_scalars(mats_ref, idx, conj_transpose=True)
                cbit = _bit3(sr.shape, hi, lo, b_lane, b_exp)
                hc = has_ctrl.astype(jnp.float32)
                sel = hc * cbit + (1.0 - hc)
                # recover the gate's input state on gated positions
                ur_, ui_, bit = _swap3(sr, si, hi, lo, a_lane, a_exp)
                rr, ri = _apply_mat(sr, si, ur_, ui_, bit, *minv)
                sr = (1.0 - sel) * sr + sel * rr
                si = (1.0 - sel) * si + sel * ri
                swr, swi, bit = _swap3(sr, si, hi, lo, a_lane, a_exp)
                # parameter cotangent: mbar[i,j] = sum_gated g * conj(x_in)
                gsel_r = gr * sel
                gsel_i = gi * sel

                def acc(i_, j_, xr_, xi_, mask):
                    re = jnp.sum(mask * (gsel_r * xr_ + gsel_i * xi_))
                    im = jnp.sum(mask * (gsel_i * xr_ - gsel_r * xi_))
                    e = (i_ * 2 + j_) * 2
                    gm_ref[idx, e] += re
                    gm_ref[idx, e + 1] += im

                acc(0, 0, sr, si, 1.0 - bit)
                acc(0, 1, swr, swi, 1.0 - bit)
                acc(1, 0, swr, swi, bit)
                acc(1, 1, sr, si, bit)
                # cotangent propagation: g <- m^dagger g on gated positions
                pr_, pi_, bitg = _swap3(gr, gi, hi, lo, a_lane, a_exp)
                hr, hi_ = _apply_mat(gr, gi, pr_, pi_, bitg, *minv)
                gr = (1.0 - sel) * gr + sel * hr
                gi = (1.0 - sel) * gi + sel * hi_
                return sr, si, gr, gi

            def diag_branch(sr, si, gr, gi):
                c = cos_ref[pl.ds(idx, 1), :, :]
                s = sin_ref[pl.ds(idx, 1), :, :]
                # recover input: conj phase
                sr, si = c * sr + s * si, c * si - s * sr
                # phase cotangents (out = (c + i s) * in)
                gcos_ref[pl.ds(idx, 1), :, :] += jnp.sum(
                    gr * sr + gi * si, axis=0, keepdims=True
                )
                gsin_ref[pl.ds(idx, 1), :, :] += jnp.sum(
                    -gr * si + gi * sr, axis=0, keepdims=True
                )
                gr, gi = c * gr + s * gi, c * gi - s * gr
                return sr, si, gr, gi

            def u2q_branch(sr, si, gr, gi):
                sr, si = _apply_u2q3(
                    sr, si, hi, lo, a_lane, a_exp, b_lane, b_exp, u4_ref, idx,
                    conj_transpose=True,
                )
                gr, gi = _apply_u2q3(
                    gr, gi, hi, lo, a_lane, a_exp, b_lane, b_exp, u4_ref, idx,
                    conj_transpose=True,
                )
                return sr, si, gr, gi

            return jax.lax.switch(
                kind, [mat_branch, diag_branch, u2q_branch], sr, si, gr, gi
            )

        _, _, gr, gi = jax.lax.fori_loop(
            0, steps, body, (yr_ref[...], yi_ref[...], gr_ref[...], gi_ref[...])
        )
        gxr_ref[...] = gr
        gxi_ref[...] = gi

    return kernel


# -----------------------------------------------------------------------------
# pallas_call plumbing + custom VJP
# -----------------------------------------------------------------------------

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=14 * 1024 * 1024)

_KERNEL_CACHE: "collections.OrderedDict" = collections.OrderedDict()
_KERNEL_CACHE_MAX = 32  # LRU cap: long-lived processes constructing many
# LoopFusedCircuit instances / batch sizes must not pin kernels forever


def _tile_rows(lp: LoopProgram) -> int:
    """Batch rows per grid program: keep one (re or im) state block at
    <= 2^16 f32 elements (256 KB) so ~12 live temporaries fit in VMEM."""
    per_row = lp.hi * lp.lo
    return max(1, min(256, (1 << 16) // per_row))


def _kernels(lp: LoopProgram, b: int, interpret: bool):
    # keyed by id(lp) but the entry PINS lp, so a live cache entry keeps
    # its LoopProgram alive and the id cannot be recycled to alias a
    # different program's kernels
    key = (id(lp), b, interpret)
    hit = _KERNEL_CACHE.get(key)
    if hit is None:
        hit = (lp, _build_kernels(lp, b, interpret))
        _KERNEL_CACHE[key] = hit
        while len(_KERNEL_CACHE) > _KERNEL_CACHE_MAX:
            _KERNEL_CACHE.popitem(last=False)
    else:
        _KERNEL_CACHE.move_to_end(key)
    return hit[1]


def _build_kernels(lp: LoopProgram, b: int, interpret: bool):
    hi, lo = lp.hi, lp.lo
    tb = _tile_rows(lp)
    assert b % tb == 0, (b, tb)
    grid = (b // tb,)
    p = max(lp.num_phases, 1)
    k = max(lp.num_mats, 1)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    state = pl.BlockSpec((tb, hi, lo), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    bank = pl.BlockSpec((p, hi, lo), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)

    fwd = pl.pallas_call(
        _forward_kernel(lp),
        grid=grid,
        in_specs=[smem, smem, smem, state, state, bank, bank],
        out_specs=[state, state],
        out_shape=[
            jax.ShapeDtypeStruct((b, hi, lo), jnp.float32),
            jax.ShapeDtypeStruct((b, hi, lo), jnp.float32),
        ],
        compiler_params=None if interpret else _COMPILER_PARAMS,
        interpret=interpret,
    )

    bwd = pl.pallas_call(
        _backward_kernel(lp),
        grid=grid,
        in_specs=[smem, smem, smem, state, state, state, state, bank, bank],
        out_specs=[
            state,
            state,
            pl.BlockSpec(memory_space=pltpu.SMEM),
            bank,
            bank,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hi, lo), jnp.float32),
            jax.ShapeDtypeStruct((b, hi, lo), jnp.float32),
            jax.ShapeDtypeStruct((k, 8), jnp.float32),
            jax.ShapeDtypeStruct((p, hi, lo), jnp.float32),
            jax.ShapeDtypeStruct((p, hi, lo), jnp.float32),
        ],
        compiler_params=None if interpret else _COMPILER_PARAMS,
        interpret=interpret,
    )
    return fwd, bwd


def make_loop_state_fn(lp: LoopProgram, interpret: bool = False):
    """f(xr, xi, mats8, cos, sin) -> (yr, yi) over [B, HI, LO] blocks, with
    the reverse-sweep custom VJP."""
    tab = jnp.asarray(lp.table)
    u4 = jnp.asarray(lp.u4_bank)

    @jax.custom_vjp
    def f(xr, xi, mats8, cos, sin):
        fwd, _ = _kernels(lp, xr.shape[0], interpret)
        return fwd(tab, mats8, u4, xr, xi, cos, sin)

    def f_fwd(xr, xi, mats8, cos, sin):
        out = f(xr, xi, mats8, cos, sin)
        return out, (out[0], out[1], mats8, cos, sin)

    def f_bwd(res, g):
        yr, yi, mats8, cos, sin = res
        gr, gi = g
        _, bwd = _kernels(lp, yr.shape[0], interpret)
        gxr, gxi, gm, gcos, gsin = bwd(tab, mats8, u4, yr, yi, gr, gi, cos, sin)
        if lp.num_mats == 0:
            gm = jnp.zeros((1, 8), dtype=jnp.float32)
        if lp.num_phases == 0:
            gcos = jnp.zeros_like(cos)
            gsin = jnp.zeros_like(sin)
        return gxr, gxi, gm, gcos, gsin

    f.defvjp(f_fwd, f_bwd)
    return f


def make_fused_backend(circuit: DVCircuit, interpret: bool = False,
                       backend: str = "auto"):
    """Pick the fused-circuit backend for a circuit.

    - ``block`` (:mod:`block_fused`): maximal in-block gate runs fused into
      dense block unitaries driven as MXU matmuls; pure XLA, any-order AD.
      Fastest at high qubit counts (the matmuls get big enough to feed the
      systolic array) and the only backend whose nested-AD works.
    - ``loop`` (this module): gate-table fori_loop Pallas kernel; compile
      time independent of circuit length; needs n >= 10 compiled.
    - ``unrolled`` (:mod:`pallas_sv`): straight-line Mosaic code; fine for
      7 <= n <= 12, and the only *Pallas* option for 7 <= n < 10.
    - ``block_pallas`` (:mod:`block_pallas`): the block engine's segment
      chain fused into ONE Pallas kernel per batch tile (one HBM round trip
      instead of one per segment); reverse-mode AD only; requires a
      decomposition with no boundary-straddling segments (cross_mesh
      qualifies; ring-closure ansatzes do not).
    ``auto`` chooses block_pallas for n >= 10 when the circuit qualifies
    (the streams hot path is reverse-mode), else block; below n=10 it picks
    loop under ``interpret=True`` (tests — the loop kernel has no sublane
    minimum in interpret mode) and unrolled compiled. Raises if no backend
    supports the circuit (callers degrade to the XLA gate-sweep path)."""
    if backend == "auto":
        if circuit.n >= 10:
            import os

            backend = "block"
            # opt-in knob: QCPINN_AUTO_FUSED=1. Measured on-chip
            # (artifacts/block_pallas_onchip.json): parity holds but the
            # fused kernel is SLOWER than the XLA block engine (0.65-0.9x
            # at 12-16q) — XLA's own fusion already keeps the segment
            # chain in VMEM at these sizes, so the hand-written kernel
            # only adds Mosaic overhead. Stays opt-in as an HBM
            # experiment; do not flip default-on.
            if os.environ.get("QCPINN_AUTO_FUSED", "0") == "1":
                from . import block_pallas as bp

                if bp.supports(circuit):
                    backend = "block_pallas"
        else:
            backend = "loop" if interpret else "unrolled"
    if backend == "block_pallas":
        from .block_pallas import BlockPallasCircuit

        return BlockPallasCircuit(circuit, interpret=interpret)
    if backend == "block":
        from .block_fused import BlockFusedCircuit

        return BlockFusedCircuit(circuit)
    if backend == "loop":
        return LoopFusedCircuit(circuit, interpret=interpret)
    if backend == "unrolled":
        from .pallas_sv import FusedCircuit

        return FusedCircuit(circuit, interpret=interpret)
    raise ValueError(backend)


class LoopFusedCircuit:
    """Loop-form Pallas exact-expectation circuit: [B, n] -> [B, n].

    Same contract as :class:`pallas_sv.FusedCircuit` (first-order reverse
    AD through params and inputs; composes with tangent streams for PDE
    residuals), but compiles in seconds at 16 qubits. Compiled mode needs
    n >= 10; use FusedCircuit (unrolled) below that."""

    def __init__(self, circuit: DVCircuit, interpret: bool = False):
        if circuit.n < 10 and not interpret:
            raise ValueError("loop backend needs n >= 10 (sublane tile)")
        if circuit.encoding not in ("angle", "amplitude"):
            raise ValueError(circuit.encoding)
        self.circuit = circuit
        self.lp = compile_loop_program(circuit)
        self._fn = make_loop_state_fn(self.lp, interpret)
        self._tb = _tile_rows(self.lp)

    # -- state plumbing ------------------------------------------------------

    def _run(self, params, state_c):
        """Complex [B, 2^n] -> evolved complex [B, 2^n] via the kernel."""
        b = state_c.shape[0]
        lpn = self.lp
        mats8, cos, sin = gather_scalar_inputs(self.circuit, lpn, params)
        xr = jnp.real(state_c).astype(jnp.float32).reshape(b, lpn.hi, lpn.lo)
        xi = jnp.imag(state_c).astype(jnp.float32).reshape(b, lpn.hi, lpn.lo)
        bp = -(-b // self._tb) * self._tb
        if bp != b:
            pad = [(0, bp - b), (0, 0), (0, 0)]
            xr = jnp.pad(xr, pad)
            xi = jnp.pad(xi, pad)
        yr, yi = self._fn(xr, xi, mats8, cos, sin)
        out = (yr + 1j * yi).reshape(bp, 1 << lpn.n)
        return out[:b]

    def evolve(self, params, state):
        """Ansatz layers + epilogue on an arbitrary [B, 2^n] complex state —
        drop-in for DVCircuit.evolve (first-order reverse only)."""
        return self._run(params, state)

    def state(self, params, x):
        from . import statevector as sv

        if self.circuit.encoding == "amplitude":
            prepared = sv.encode_amplitude(x, self.circuit.n)
        else:
            prepared = sv.encode_angle_product(
                x * getattr(self.circuit, "input_scale", 1.0), self.circuit.n
            )
        return self._run(params, prepared)

    def apply(
        self,
        params,
        x,
        *,
        shots: Optional[int] = None,
        key: Optional[jax.Array] = None,
        noise=None,
    ):
        from . import measure

        if noise is not None:
            noise = noise.bind(self.circuit)
        state = self.state(params, x)
        if shots is None:
            return measure.exact_z(state, self.circuit.n, noise)
        if key is None:
            raise ValueError("shots mode needs a PRNG key")
        return measure.sampled_z(state, self.circuit.n, shots, key, noise)

    def __call__(self, params, x, **kw):
        return self.apply(params, x, **kw)

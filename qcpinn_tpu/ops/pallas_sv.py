"""Pallas fused-circuit kernels: the whole gate program in one VMEM pass.

The XLA path executes one kernel per gate, writing the full [B, 2^n] state
to HBM between gates — and under the nested autodiff of PDE residuals it
materializes a state-sized temp per gate per derivative stream (measured
30 GB of HLO temps at n=12, B=4096). These kernels instead keep a batch
tile of the state resident in VMEM across the *entire* circuit:

- forward: one `pallas_call` sweeps the micro-program (1q gates, controlled
  1q gates, fused diagonal phase runs, fixed 2q unitaries) over the tile.
  The butterfly partner for wire w is reached with `pltpu.roll` by
  +-2^(n-1-w) and a bit-mask select — no reshapes, no relayouts, pure
  lane-wise VPU work.
- backward: a second kernel runs the program in REVERSE, exploiting
  unitarity: the input state of each gate is recovered by applying the
  inverse gate (m^-1 = m^dagger) to the running state, the cotangent
  propagates by the same inverse (the real-linear transpose of a unitary
  complex-linear map is its conjugate transpose), and per-gate parameter
  cotangents accumulate in VMEM. O(1) extra memory — no stored
  intermediates at all.

Everything is expressed over real/imag f32 pairs, so the wrapper's
`jax.custom_vjp` is a real-linear transpose with no complex-convention
traps; parameter -> matrix construction stays outside in XLA and JAX chains
through it automatically.

Exposed via ``DVCircuit.apply(..., backend="pallas")`` / `fused_z_apply`.
First-order training (data losses, finetune) and inference use this path;
PDE-residual training needs forward-mode *through* the circuit and stays on
the XLA path until tangent-stream rules land (custom_vjp functions cannot
be forward-differentiated).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import gates
from .circuit import DVCircuit
from .diag_fusion import DiagRun
from .program import Op

MIN_DIM = 128  # lane width: the fused path needs n >= 7


@dataclasses.dataclass(frozen=True)
class Step:
    kind: str  # '1q' | 'c1q' | 'diag' | 'u2q'
    wire: int = -1
    ctrl: int = -1
    mat: int = -1  # index into the batched 1q matrix bank
    phase: int = -1  # index into the (cos, sin) phase bank
    u4: int = -1  # index into the fixed 4x4 bank


@dataclasses.dataclass(frozen=True)
class MicroProgram:
    n: int
    steps: Tuple[Step, ...]
    num_mats: int
    num_phases: int
    u4s: Tuple[np.ndarray, ...]  # fixed (non-trainable) 4x4 unitaries


def compile_circuit(circuit: DVCircuit, include_encoding: bool = True) -> MicroProgram:
    """Lower a (fused) DVCircuit into a micro-program. With encoding, the
    matrix bank layout is [0, n) = encoding RX gates, then ansatz/epilogue
    1q + c1q gates in program order, repeated per layer. Without encoding
    the program acts on an arbitrary caller-supplied initial state (the
    tangent-stream path)."""
    if include_encoding and circuit.encoding != "angle":
        raise ValueError("pallas backend supports angle encoding")
    n = circuit.n
    if include_encoding:
        steps: List[Step] = [Step("1q", wire=w, mat=w) for w in range(n)]
        mat_count = n
    else:
        steps = []
        mat_count = 0
    phase_count = 0
    u4s: List[np.ndarray] = []

    def lower(program):
        nonlocal mat_count, phase_count
        for op in program:
            if isinstance(op, DiagRun):
                steps.append(Step("diag", phase=phase_count))
                phase_count += 1
            elif op.kind in ("rx", "ry", "rz", "ps", "rot", "h", "x", "y", "z", "u1q"):
                steps.append(Step("1q", wire=op.wires[0], mat=mat_count))
                mat_count += 1
            elif op.kind in ("crx", "cry", "crz", "cnot"):
                steps.append(
                    Step("c1q", ctrl=op.wires[0], wire=op.wires[1], mat=mat_count)
                )
                mat_count += 1
            elif op.kind in ("cz", "swap", "u2q"):
                if op.kind == "u2q":
                    u4s.append(np.asarray(op.const, dtype=np.complex64))
                elif op.kind == "cz":
                    u4s.append(gates.CZ)
                else:
                    u4s.append(gates.SWAP)
                steps.append(
                    Step("u2q", ctrl=op.wires[0], wire=op.wires[1], u4=len(u4s) - 1)
                )
            else:  # pragma: no cover
                raise ValueError(op.kind)

    for _ in range(circuit.layers):
        lower(circuit.program)
    lower(circuit.epilogue)
    return MicroProgram(n, tuple(steps), mat_count, phase_count, tuple(u4s))


def gather_inputs(circuit: DVCircuit, mp: MicroProgram, params, x, batch=None):
    """Build (mats [B,K,2,2] complex split re/im, phases cos/sin [P,D]) from
    circuit parameters and (optionally) encoding inputs — traced XLA ops,
    tiny. ``x=None`` builds the no-encoding bank (pass ``batch``)."""
    b = x.shape[0] if x is not None else batch
    p2 = params.reshape(circuit.layers, circuit.params_per_layer)
    if x is not None:
        scale = getattr(circuit, "input_scale", 1.0)
        mats: List[jnp.ndarray] = [
            gates.rx(x[:, w] * scale) for w in range(circuit.n)
        ]
    else:
        mats = []
    phases: List[jnp.ndarray] = []

    def lower(program, layer_params):
        for op in program:
            if isinstance(op, DiagRun):
                phases.append(op.phases(layer_params))  # [D]
                continue
            k = op.kind
            if k == "rx":
                m = gates.rx(layer_params[op.pidx[0]])
            elif k == "ry":
                m = gates.ry(layer_params[op.pidx[0]])
            elif k == "rz":
                m = gates.rz(layer_params[op.pidx[0]])
            elif k == "ps":
                m = gates.phase_shift(layer_params[op.pidx[0]])
            elif k == "rot":
                m = gates.rot(*(layer_params[i] for i in op.pidx))
            elif k == "h":
                m = jnp.asarray(gates.H)
            elif k in ("x", "y", "z"):
                m = jnp.asarray({"x": gates.X, "y": gates.Y, "z": gates.Z}[k])
            elif k == "u1q":
                m = jnp.asarray(op.const)
            elif k in ("crx", "cry", "crz"):
                m = {"crx": gates.rx, "cry": gates.ry, "crz": gates.rz}[k](
                    layer_params[op.pidx[0]]
                )
            elif k == "cnot":
                m = jnp.asarray(gates.X)
            elif k in ("cz", "swap", "u2q"):
                continue
            else:  # pragma: no cover
                raise ValueError(k)
            if m.ndim == 2:
                m = jnp.broadcast_to(m, (b, 2, 2))
            mats.append(m)

    for layer in range(circuit.layers):
        lower(circuit.program, p2[layer])
    lower(circuit.epilogue, jnp.zeros((0,)))

    if not mats:  # pure-diagonal program: pad one identity for block shapes
        mats = [jnp.broadcast_to(jnp.eye(2, dtype=jnp.complex64), (b, 2, 2))]
    mats_c = jnp.stack(mats, axis=1)  # [B, K, 2, 2] complex
    if phases:
        phi = jnp.stack(phases, axis=0).astype(jnp.float32)  # [P, D]
    else:
        phi = jnp.zeros((0, 1 << circuit.n), dtype=jnp.float32)
    return (
        jnp.real(mats_c).astype(jnp.float32),
        jnp.imag(mats_c).astype(jnp.float32),
        jnp.cos(phi),
        jnp.sin(phi),
    )


# -----------------------------------------------------------------------------
# kernel helpers (operate on (re, im) pairs of [TB, D] values)
# -----------------------------------------------------------------------------


def _bit(n, w, shape):
    ids = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return ((ids >> (n - 1 - w)) & 1).astype(jnp.float32)


def _swap(xr, xi, n, w):
    """Partner amplitudes across wire w via two rolls + select."""
    d = 1 << n
    hw = 1 << (n - 1 - w)
    bit = _bit(n, w, xr.shape)
    fwd_r = pltpu.roll(xr, hw, 1)  # y[i] = x[i - hw]: right for bit=1
    fwd_i = pltpu.roll(xi, hw, 1)
    bwd_r = pltpu.roll(xr, d - hw, 1)  # y[i] = x[i + hw]: right for bit=0
    bwd_i = pltpu.roll(xi, d - hw, 1)
    sr = bit * fwd_r + (1.0 - bit) * bwd_r
    si = bit * fwd_i + (1.0 - bit) * bwd_i
    return sr, si, bit


def _apply_1q_vals(xr, xi, n, w, m00, m01, m10, m11):
    """m components are ((re, im)) pairs broadcastable to [TB, D]."""
    sr, si, bit = _swap(xr, xi, n, w)
    dg_r = (1.0 - bit) * m00[0] + bit * m11[0]
    dg_i = (1.0 - bit) * m00[1] + bit * m11[1]
    of_r = (1.0 - bit) * m01[0] + bit * m10[0]
    of_i = (1.0 - bit) * m01[1] + bit * m10[1]
    yr = dg_r * xr - dg_i * xi + of_r * sr - of_i * si
    yi = dg_r * xi + dg_i * xr + of_r * si + of_i * sr
    return yr, yi


def _mat_entries(mats_re_ref, mats_im_ref, k, conj_transpose=False):
    """Per-tile matrix entries as ([TB,1] re, [TB,1] im) pairs."""

    def ent(i, j):
        r = mats_re_ref[:, k, i, j][:, None]
        im = mats_im_ref[:, k, i, j][:, None]
        return (r, im)

    if not conj_transpose:
        return ent(0, 0), ent(0, 1), ent(1, 0), ent(1, 1)
    # m^dagger: (i,j) <- conj(m[j,i])
    def entc(i, j):
        r = mats_re_ref[:, k, j, i][:, None]
        im = -mats_im_ref[:, k, j, i][:, None]
        return (r, im)

    return entc(0, 0), entc(0, 1), entc(1, 0), entc(1, 1)


def _apply_u2q_vals(xr, xi, n, wa, wb, u4, conj_transpose=False):
    """Fixed 4x4 unitary on (wa, wb); u4 is a static numpy complex matrix."""
    u = u4.conj().T if conj_transpose else u4
    u = np.asarray(u).reshape(2, 2, 2, 2)
    sa_r, sa_i, bit_a = _swap(xr, xi, n, wa)
    sb_r, sb_i, bit_b = _swap(xr, xi, n, wb)
    sab_r, sab_i, _ = _swap(sa_r, sa_i, n, wb)
    blocks = {(0, 0): (xr, xi), (1, 0): (sa_r, sa_i), (0, 1): (sb_r, sb_i), (1, 1): (sab_r, sab_i)}
    yr = jnp.zeros_like(xr)
    yi = jnp.zeros_like(xi)
    for da in range(2):
        for db in range(2):
            br, bi = blocks[(da, db)]
            # coefficient at element with bits (ba, bb):
            # u[ba, bb, ba^da, bb^db] — select over the 4 (ba, bb) cases
            cr = jnp.zeros_like(xr)
            ci = jnp.zeros_like(xr)
            for ba in range(2):
                for bb in range(2):
                    mask = (bit_a if ba else (1.0 - bit_a)) * (
                        bit_b if bb else (1.0 - bit_b)
                    )
                    coeff = u[ba, bb, ba ^ da, bb ^ db]
                    cr = cr + mask * float(np.real(coeff))
                    ci = ci + mask * float(np.imag(coeff))
            yr = yr + cr * br - ci * bi
            yi = yi + cr * bi + ci * br
    return yr, yi


# -----------------------------------------------------------------------------
# forward kernel
# -----------------------------------------------------------------------------


def _forward_kernel(mp: MicroProgram):
    n = mp.n

    def kernel(xr_ref, xi_ref, mre_ref, mim_ref, cos_ref, sin_ref, yr_ref, yi_ref):
        xr = xr_ref[:]
        xi = xi_ref[:]
        for st in mp.steps:
            if st.kind == "1q":
                m = _mat_entries(mre_ref, mim_ref, st.mat)
                xr, xi = _apply_1q_vals(xr, xi, n, st.wire, *m)
            elif st.kind == "c1q":
                m00, m01, m10, m11 = _mat_entries(mre_ref, mim_ref, st.mat)
                sel = _bit(n, st.ctrl, xr.shape)
                gr, gi = _apply_1q_vals(xr, xi, n, st.wire, m00, m01, m10, m11)
                xr = (1.0 - sel) * xr + sel * gr
                xi = (1.0 - sel) * xi + sel * gi
            elif st.kind == "diag":
                c = cos_ref[st.phase, :][None, :]
                s = sin_ref[st.phase, :][None, :]
                xr, xi = c * xr - s * xi, s * xr + c * xi
            elif st.kind == "u2q":
                xr, xi = _apply_u2q_vals(xr, xi, n, st.ctrl, st.wire, mp.u4s[st.u4])
        yr_ref[:] = xr
        yi_ref[:] = xi

    return kernel


# -----------------------------------------------------------------------------
# backward kernel (reverse sweep with inverse gates)
# -----------------------------------------------------------------------------


def _backward_kernel(mp: MicroProgram):
    n = mp.n

    def kernel(
        yr_ref, yi_ref, gr_ref, gi_ref, mre_ref, mim_ref, cos_ref, sin_ref,
        gxr_ref, gxi_ref, gmre_ref, gmim_ref, gcos_ref, gsin_ref,
    ):
        sr = yr_ref[:]
        si = yi_ref[:]
        gr = gr_ref[:]
        gi = gi_ref[:]
        # per-tile mat-grad blocks: zero at each program start
        gmre_ref[:] = jnp.zeros(gmre_ref.shape, jnp.float32)
        gmim_ref[:] = jnp.zeros(gmim_ref.shape, jnp.float32)

        # phase-grad blocks are SHARED across the grid (accumulated):
        # zero only on the first program
        @pl.when(pl.program_id(0) == 0)
        def _():
            gcos_ref[:] = jnp.zeros(gcos_ref.shape, jnp.float32)
            gsin_ref[:] = jnp.zeros(gsin_ref.shape, jnp.float32)

        for st in reversed(mp.steps):
            if st.kind in ("1q", "c1q"):
                minv = _mat_entries(mre_ref, mim_ref, st.mat, conj_transpose=True)
                if st.kind == "1q":
                    # recover the gate's input state
                    sr, si = _apply_1q_vals(sr, si, n, st.wire, *minv)
                    swr, swi, bit = _swap(sr, si, n, st.wire)
                    sel = jnp.ones_like(sr)
                else:
                    sel = _bit(n, st.ctrl, sr.shape)
                    ur, ui = _apply_1q_vals(sr, si, n, st.wire, *minv)
                    sr = (1.0 - sel) * sr + sel * ur
                    si = (1.0 - sel) * si + sel * ui
                    swr, swi, bit = _swap(sr, si, n, st.wire)
                # parameter cotangent: mbar = sum g (x_in)^dagger over the
                # gated positions, split by bit pattern
                gsel_r = gr * sel
                gsel_i = gi * sel

                def acc(i, j, xr_, xi_, mask):
                    re = jnp.sum(mask * (gsel_r * xr_ + gsel_i * xi_), axis=1)
                    im = jnp.sum(mask * (gsel_i * xr_ - gsel_r * xi_), axis=1)
                    gmre_ref[:, st.mat, i, j] += re
                    gmim_ref[:, st.mat, i, j] += im

                acc(0, 0, sr, si, 1.0 - bit)
                acc(0, 1, swr, swi, 1.0 - bit)
                acc(1, 0, swr, swi, bit)
                acc(1, 1, sr, si, bit)
                # cotangent propagation: g <- m^dagger g (on gated positions)
                pgr, pgi = _apply_1q_vals(gr, gi, n, st.wire, *minv)
                gr = (1.0 - sel) * gr + sel * pgr
                gi = (1.0 - sel) * gi + sel * pgi
            elif st.kind == "diag":
                c = cos_ref[st.phase, :][None, :]
                s = sin_ref[st.phase, :][None, :]
                # recover input: multiply by conj phase
                sr, si = c * sr + s * si, c * si - s * sr
                # phase cotangents (out = (c + i s) * in):
                gcos_ref[st.phase, :] += jnp.sum(gr * sr + gi * si, axis=0)
                gsin_ref[st.phase, :] += jnp.sum(-gr * si + gi * sr, axis=0)
                # cotangent: conj phase
                gr, gi = c * gr + s * gi, c * gi - s * gr
            elif st.kind == "u2q":
                u4 = mp.u4s[st.u4]
                sr, si = _apply_u2q_vals(sr, si, n, st.ctrl, st.wire, u4, True)
                gr, gi = _apply_u2q_vals(gr, gi, n, st.ctrl, st.wire, u4, True)
        gxr_ref[:] = gr
        gxi_ref[:] = gi

    return kernel


# -----------------------------------------------------------------------------
# custom-vjp wrapper
# -----------------------------------------------------------------------------


def _tile(b: int, d: int) -> int:
    # Tile sweep at n=12, B=1024 on v5e (runtime ~identical, compile is not):
    #   [8, 4096]:  compile 9s fwd / 28s grad;   4.6 ms fwd / 12.9 ms grad
    #   [64, 4096]: compile 146s fwd / 1413s(!); 5.0 ms fwd / 11.6 ms grad
    # Mosaic compile time explodes with tile size on long unrolled programs;
    # stay small. The kernel's value is the O(1)-memory reverse sweep (XLA
    # stores a state-sized intermediate per gate), not raw single-batch speed.
    # Mosaic needs the sublane dim divisible by 8 — callers pad the batch.
    budget = 1 << 15
    tb = max(8, budget // d)
    while b % tb:
        tb -= 8
    assert tb >= 8 and b % tb == 0, (b, d)
    return tb


def _pad8(b: int) -> int:
    return (b + 7) // 8 * 8


_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


_KERNEL_CACHE: dict = {}


def _kernels(mp: MicroProgram, b: int, interpret: bool):
    key = (id(mp), b, interpret)
    hit = _KERNEL_CACHE.get(key)
    if hit is not None:
        return hit
    out = _build_kernels(mp, b, interpret)
    _KERNEL_CACHE[key] = out
    return out


def _build_kernels(mp: MicroProgram, b: int, interpret: bool):
    d = 1 << mp.n
    tb = _tile(b, d)
    grid = (b // tb,)
    k = max(mp.num_mats, 1)
    p = max(mp.num_phases, 1)

    fwd = pl.pallas_call(
        _forward_kernel(mp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k, 2, 2), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k, 2, 2), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((b, d), jnp.float32),
        ],
        compiler_params=None if interpret else _COMPILER_PARAMS,
        interpret=interpret,
    )

    bwd = pl.pallas_call(
        _backward_kernel(mp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k, 2, 2), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k, 2, 2), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k, 2, 2), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k, 2, 2), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            # phase grads accumulate across grid programs: same block for all
            pl.BlockSpec((p, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((b, k, 2, 2), jnp.float32),
            jax.ShapeDtypeStruct((b, k, 2, 2), jnp.float32),
            jax.ShapeDtypeStruct((p, d), jnp.float32),
            jax.ShapeDtypeStruct((p, d), jnp.float32),
        ],
        compiler_params=None if interpret else _COMPILER_PARAMS,
        interpret=interpret,
    )
    return fwd, bwd


def make_fused_state_fn(mp: MicroProgram, interpret: bool = False):
    """Returns f(xr, xi, mre, mim, cos, sin) -> (yr, yi) with a custom VJP
    implemented by the reverse-sweep kernel."""

    @jax.custom_vjp
    def f(xr, xi, mre, mim, cos, sin):
        fwd, _ = _kernels(mp, xr.shape[0], interpret)
        yr, yi = fwd(xr, xi, mre, mim, _pad_p(cos), _pad_p(sin))
        return yr, yi

    def _pad_p(phi):
        if mp.num_phases == 0:
            return jnp.zeros((1, 1 << mp.n), dtype=jnp.float32)
        return phi

    def f_fwd(xr, xi, mre, mim, cos, sin):
        out = f(xr, xi, mre, mim, cos, sin)
        return out, (out[0], out[1], mre, mim, cos, sin)

    def f_bwd(res, g):
        yr, yi, mre, mim, cos, sin = res
        gr, gi = g
        _, bwd = _kernels(mp, yr.shape[0], interpret)
        gxr, gxi, gmre, gmim, gcos, gsin = bwd(
            yr, yi, gr, gi, mre, mim, _pad_p(cos), _pad_p(sin)
        )
        if mp.num_phases == 0:
            gcos = jnp.zeros((0, 1 << mp.n), dtype=jnp.float32)
            gsin = jnp.zeros((0, 1 << mp.n), dtype=jnp.float32)
        return gxr, gxi, gmre, gmim, gcos, gsin

    f.defvjp(f_fwd, f_bwd)
    return f


class FusedCircuit:
    """Pallas-fused exact-expectation circuit: [B, n_features] -> [B, n].

    First-order differentiable (params and inputs) via the reverse-sweep
    kernel; not forward-mode differentiable (use the XLA path for PDE
    residual training)."""

    def __init__(self, circuit: DVCircuit, interpret: bool = False):
        if circuit.n < 7 and not interpret:
            raise ValueError("pallas backend needs n >= 7 (lane width)")
        self.circuit = circuit
        # amplitude encoding (nn/DVQuantumLayer.py:177-180): the prepared
        # state comes from encode_amplitude outside the kernel and the
        # evolve-only micro-program runs it — same recipe as the tangent
        # streams. Angle encoding bakes the RX bank into the kernel.
        self._amplitude = circuit.encoding == "amplitude"
        if self._amplitude:
            self.mp = None
            self._fn = None
        else:
            self.mp = compile_circuit(circuit)
            self._fn = make_fused_state_fn(self.mp, interpret)
        # no-encoding variant for arbitrary initial states (tangent streams)
        self.mp_evolve = compile_circuit(circuit, include_encoding=False)
        self._fn_evolve = make_fused_state_fn(self.mp_evolve, interpret)

    def evolve(self, params, state):
        """Apply ansatz layers + epilogue to an arbitrary complex state
        [B, 2^n] — drop-in for DVCircuit.evolve with the reverse-sweep VJP
        (first-order reverse only)."""
        b = state.shape[0]
        mre, mim, cos, sin = gather_inputs(
            self.circuit, self.mp_evolve, params, None, batch=b
        )
        xr = jnp.real(state).astype(jnp.float32)
        xi = jnp.imag(state).astype(jnp.float32)
        xr, xi, mre, mim = self._pad_rows([xr, xi, mre, mim], b)
        yr, yi = self._fn_evolve(xr, xi, mre, mim, cos, sin)
        return (yr + 1j * yi)[:b]

    @staticmethod
    def _pad_rows(arrs, b):
        bp = _pad8(b)
        if bp == b:
            return arrs
        return [jnp.pad(a, [(0, bp - b)] + [(0, 0)] * (a.ndim - 1)) for a in arrs]

    def state(self, params, x):
        if self._amplitude:
            from . import statevector as sv

            return self.evolve(params, sv.encode_amplitude(x, self.circuit.n))
        b = x.shape[0]
        d = 1 << self.circuit.n
        mre, mim, cos, sin = gather_inputs(self.circuit, self.mp, params, x)
        xr = jnp.zeros((b, d), dtype=jnp.float32).at[:, 0].set(1.0)
        xi = jnp.zeros((b, d), dtype=jnp.float32)
        xr, xi, mre, mim = self._pad_rows([xr, xi, mre, mim], b)
        yr, yi = self._fn(xr, xi, mre, mim, cos, sin)
        return (yr + 1j * yi)[:b]

    def apply(
        self,
        params,
        x,
        *,
        shots: Optional[int] = None,
        key: Optional[jax.Array] = None,
        noise=None,
    ):
        from . import measure, statevector as sv

        if noise is not None:
            noise = noise.bind(self.circuit)
        b = x.shape[0]
        d = 1 << self.circuit.n
        if self._amplitude:
            st = self.state(params, x)
            yr = jnp.real(st).astype(jnp.float32)
            yi = jnp.imag(st).astype(jnp.float32)
        else:
            mre, mim, cos, sin = gather_inputs(self.circuit, self.mp, params, x)
            xr = jnp.zeros((b, d), dtype=jnp.float32).at[:, 0].set(1.0)
            xi = jnp.zeros((b, d), dtype=jnp.float32)
            xr, xi, mre, mim = self._pad_rows([xr, xi, mre, mim], b)
            yr, yi = self._fn(xr, xi, mre, mim, cos, sin)
            yr = yr[:b]
            yi = yi[:b]
        probs = yr * yr + yi * yi
        sign = jnp.asarray(sv._z_sign_matrix(self.circuit.n))
        z = jnp.dot(
            probs, sign, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if noise is not None:
            z = noise.apply(z)
        if shots is None:
            return z
        if key is None:
            raise ValueError("shots mode needs a PRNG key")
        p1 = jnp.clip((1.0 - z) / 2.0, 0.0, 1.0)
        counts = jax.random.binomial(key, n=float(shots), p=p1)
        return jax.lax.stop_gradient(1.0 - 2.0 * counts.astype(jnp.float32) / shots)

    def __call__(self, params, x, **kw):
        return self.apply(params, x, **kw)

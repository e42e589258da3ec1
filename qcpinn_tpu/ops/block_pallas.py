"""Fused block-evolution Pallas kernel: the whole segment chain in one VMEM
residency.

The block engine (ops/block_fused.py) already collapses a circuit into a few
MXU matmuls + fused diagonal phases, but each segment is a separate XLA op:
at 12 qubits the streams train step makes ~10 full-state HBM round trips and
measures ~4-6x off the chip's bandwidth roofline (scripts/bench_probe.py,
artifacts/mfu_ladder.json). This kernel performs the ENTIRE evolution —
    s -> U_hi s U_lo -> diag -> U_hi s U_lo -> diag -> epilogue
— on a VMEM-resident batch tile: one HBM read of the state, one write. The
block unitaries ([64,64] at 12q, [256,256] at 16q) and phase matrices ride
along as shared inputs; matmuls hit the MXU as [tile*dim, dim] x [dim, dim]
f32 dots (complex arithmetic in split re/im form, 4 real dots per complex
matmul). Layout bookkeeping alternates the state between [B, H, L] and
[B, L, H] so every contraction is a clean minor-dim 2D matmul; each
'blocks' segment costs at most one in-VMEM transpose.

Differentiation is a `jax.custom_vjp` whose backward is a second Pallas
kernel sweeping the segments in REVERSE: the input of each unitary step is
recovered by applying the conjugate transpose (O(1) state memory, the same
trick as ops/pallas_sv.py — for a unitary bilinear step, input recovery and
cotangent pullback contract with the SAME conj-transposed matrix), and the
small per-step matrix/phase cotangents accumulate into grid-shared outputs
across the sequential grid. Parameter gradients then flow OUTSIDE the
kernel through the tiny differentiable constructions (block unitaries built
on an identity batch, DiagRun.phases) — JAX chains them automatically, so
``value_and_grad`` through ``evolve`` works without per-ansatz gradient
code.

Scope: circuits whose block decomposition contains no boundary-straddling
'op' segments — i.e. every entangling gate either stays inside a block or
fuses into a diagonal run. cross_mesh (the flagship/bench ansatz: CRZ
all-to-all fuses into DiagRuns; epilogue Haar blocks sit in the hi block,
the final Hadamard in the lo block) qualifies at every n; ring-closure
ansatzes (cascade/layered/sim_circ_15) do not and keep using the plain
block engine (`supports()` reports this). Like the other custom_vjp
backends this supports REVERSE-mode AD only — exactly what the
tangent-stream residual path needs (physics/streams.py evaluates input
derivatives as extra forward streams).

Replaces the reference's Aer statevector device for the hot path
(hybrid_testing/CG_HQPINN_IBMtest_16qubits.py:167-176) with a TPU-native
fused kernel; see PARITY.md for measured step times.
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

from .block_fused import BlockFusedCircuit, Segment, _block_unitary
from .circuit import DVCircuit

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
HI = jax.lax.Precision.HIGHEST


@dataclasses.dataclass(frozen=True)
class KStep:
    kind: str  # 'mat' | 'diag'
    axis: str = ""  # 'hi' | 'lo' (mat only)
    idx: int = 0  # index into the mats / phases argument lists


@dataclasses.dataclass(frozen=True)
class KPlan:
    n: int
    hb: int
    lb: int
    steps: Tuple[KStep, ...]
    # step idx -> (segment position, axis) / segment position, to let the
    # caller build the matching small-tensor inputs in plan order
    mat_srcs: Tuple[Tuple[int, str], ...]
    diag_srcs: Tuple[int, ...]

    @property
    def n_mats(self) -> int:
        return len(self.mat_srcs)

    @property
    def n_diags(self) -> int:
        return len(self.diag_srcs)


def build_plan(segments: Tuple[Segment, ...], n: int, hb: int) -> KPlan:
    """Flatten block segments into kernel steps. Within a 'blocks' segment
    the hi/lo matmuls commute (disjoint tensor factors); apply the one whose
    axis currently sits at the minor dim FIRST so each segment costs at most
    one in-VMEM transpose. Raises if any segment straddles the block
    boundary (callers fall back to the plain block engine)."""
    steps: List[KStep] = []
    mat_srcs: List[Tuple[int, str]] = []
    diag_srcs: List[int] = []
    layout = ("hi", "lo")
    for si, seg in enumerate(segments):
        if seg.parts:
            raise ValueError(
                "build_plan needs the unmerged segment chain; construct "
                "the engine with merge=False"
            )
        if seg.kind == "blocks":
            axes = []
            if seg.hi_prog:
                axes.append("hi")
            if seg.lo_prog:
                axes.append("lo")
            axes.sort(key=lambda a: 0 if layout[1] == a else 1)
            for a in axes:
                steps.append(KStep("mat", a, len(mat_srcs)))
                mat_srcs.append((si, a))
                if layout[0] == a:
                    layout = (layout[1], layout[0])
        elif seg.kind == "diag":
            steps.append(KStep("diag", idx=len(diag_srcs)))
            diag_srcs.append(si)
        else:
            raise ValueError(
                "block_pallas supports only in-block + diagonal segments; "
                f"got a boundary-straddling op {seg.op}"
            )
    return KPlan(n, hb, n - hb, tuple(steps), tuple(mat_srcs), tuple(diag_srcs))


def _fwd_walk(plan: KPlan):
    """Yield (step, layout_at_application) for the forward walk; the state's
    layout after a mat step always has the stepped axis at dim 2."""
    layout = ("hi", "lo")
    for st in plan.steps:
        if st.kind == "mat" and layout[0] == st.axis:
            layout = (layout[1], layout[0])
        yield st, layout


def _internal_final_layout(plan: KPlan) -> Tuple[str, str]:
    layout = ("hi", "lo")
    for _, layout in _fwd_walk(plan):
        pass
    return layout


def _bwd_walk(plan: KPlan):
    """Yield (step, layout_at_application) for the reverse sweep, starting
    from the forward's internal final layout."""
    layout = _internal_final_layout(plan)
    for st in reversed(plan.steps):
        if st.kind == "mat" and layout[0] == st.axis:
            layout = (layout[1], layout[0])
        yield st, layout


def _diag_layouts(plan: KPlan, reverse: bool = False):
    walk = _bwd_walk(plan) if reverse else _fwd_walk(plan)
    return {st.idx: layout for st, layout in walk if st.kind == "diag"}


def _dims(plan: KPlan, layout) -> Tuple[int, int]:
    d = {"hi": 1 << plan.hb, "lo": 1 << plan.lb}
    return d[layout[0]], d[layout[1]]


def _contract2(sr, si, mr, mi):
    """Complex-contract state dim 2 with M[k, m]: [tb, A, K] -> [tb, A, M]
    via one [tb*A, K] x [K, M] real dot per re/im product."""
    tb, a, k = sr.shape

    def dot(x, m):
        return jax.lax.dot_general(
            x, m, (((1,), (0,)), ((), ())), precision=HI,
            preferred_element_type=jnp.float32,
        )

    ar, ai = sr.reshape(tb * a, k), si.reshape(tb * a, k)
    rr = dot(ar, mr) - dot(ai, mi)
    ri = dot(ar, mi) + dot(ai, mr)
    return rr.reshape(tb, a, -1), ri.reshape(tb, a, -1)


def _swap12(x):
    return jnp.swapaxes(x, 1, 2)


def _forward_kernel(plan: KPlan):
    n_mats, n_diags = plan.n_mats, plan.n_diags
    needs_final_swap = _internal_final_layout(plan) != ("hi", "lo")

    def kernel(*refs):
        xr_ref, xi_ref = refs[0], refs[1]
        mats = refs[2 : 2 + 2 * n_mats]
        phs = refs[2 + 2 * n_mats : 2 + 2 * n_mats + 2 * n_diags]
        yr_ref, yi_ref = refs[-2], refs[-1]

        sr = xr_ref[:]
        si = xi_ref[:]
        layout = ("hi", "lo")
        for st, at in _fwd_walk(plan):
            if st.kind == "mat":
                if at != layout:  # stepped axis was at dim 1: transpose
                    sr, si = _swap12(sr), _swap12(si)
                layout = at
                sr, si = _contract2(
                    sr, si, mats[2 * st.idx][:], mats[2 * st.idx + 1][:]
                )
            else:
                c = phs[2 * st.idx][:][None]
                s = phs[2 * st.idx + 1][:][None]
                sr, si = sr * c - si * s, sr * s + si * c
        if needs_final_swap:
            sr, si = _swap12(sr), _swap12(si)
        yr_ref[:] = sr
        yi_ref[:] = si

    return kernel


def _backward_kernel(plan: KPlan):
    """Reverse sweep from the final state. The kernel receives the mats
    already conj-transposed (Mct = conj(M)^T): for a unitary complex-matmul
    step, contracting with Mct both recovers the step's input
    (s_in = s_out @ M^dagger) and pulls the cotangent back
    (g_in = g_out @ conj(M)^T). Matrix cotangents need (s_in, g_out) with
    both step indices at the minor dim — guaranteed by the layout walk."""
    n_mats, n_diags = plan.n_mats, plan.n_diags
    needs_final_swap = _internal_final_layout(plan) != ("hi", "lo")

    def kernel(*refs):
        yr_ref, yi_ref, gr_ref, gi_ref = refs[:4]
        matcts = refs[4 : 4 + 2 * n_mats]
        phs = refs[4 + 2 * n_mats : 4 + 2 * n_mats + 2 * n_diags]
        out = refs[4 + 2 * n_mats + 2 * n_diags :]
        gxr_ref, gxi_ref = out[0], out[1]
        gmats = out[2 : 2 + 2 * n_mats]
        gphs = out[2 + 2 * n_mats :]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for ref in list(gmats) + list(gphs):
                ref[:] = jnp.zeros(ref.shape, jnp.float32)

        sr = yr_ref[:]
        si = yi_ref[:]
        gr = gr_ref[:]
        gi = gi_ref[:]
        if needs_final_swap:  # undo the forward's output normalization
            sr, si, gr, gi = _swap12(sr), _swap12(si), _swap12(gr), _swap12(gi)
        layout = _internal_final_layout(plan)
        for st, at in _bwd_walk(plan):
            if st.kind == "mat":
                if at != layout:
                    sr, si, gr, gi = (
                        _swap12(sr), _swap12(si), _swap12(gr), _swap12(gi)
                    )
                layout = at
                mtr = matcts[2 * st.idx][:]
                mti = matcts[2 * st.idx + 1][:]
                # input recovery first (grads pair s_in with g_out)
                sr, si = _contract2(sr, si, mtr, mti)
                # dMr[k,m] = sum_x s_in[x,k] gr[x,m] + (si gi term);
                # dMi[k,m] = sum_x s_in[x,k] gi[x,m] - (si gr term)
                tb, a, k = sr.shape
                s2r = sr.reshape(tb * a, k)
                s2i = si.reshape(tb * a, k)
                q2r = gr.reshape(tb * a, k)
                q2i = gi.reshape(tb * a, k)

                def red(x, y):
                    return jax.lax.dot_general(
                        x, y, (((0,), (0,)), ((), ())), precision=HI,
                        preferred_element_type=jnp.float32,
                    )

                gmats[2 * st.idx][:] += red(s2r, q2r) + red(s2i, q2i)
                gmats[2 * st.idx + 1][:] += red(s2r, q2i) - red(s2i, q2r)
                # cotangent pullback with the same conj-transposed matrix
                gr, gi = _contract2(gr, gi, mtr, mti)
            else:
                c = phs[2 * st.idx][:][None]
                s = phs[2 * st.idx + 1][:][None]
                # input recovery: conjugate phase
                sr, si = c * sr + s * si, c * si - s * sr
                # phase cotangents (out = (c + i s) * in)
                gphs[2 * st.idx][:] += jnp.sum(gr * sr + gi * si, axis=0)
                gphs[2 * st.idx + 1][:] += jnp.sum(-gr * si + gi * sr, axis=0)
                gr, gi = c * gr + s * gi, c * gi - s * gr
        if layout != ("hi", "lo"):
            gr, gi = _swap12(gr), _swap12(gi)
        gxr_ref[:] = gr
        gxi_ref[:] = gi

    return kernel


def _final_bwd_layout_for_diag_grads(plan: KPlan):
    """Orientation each diag's phase-grad accumulator comes out in (the
    backward walk's layout at that step)."""
    return _diag_layouts(plan, reverse=True)


def _tile(plan: KPlan, b: int, backward: bool) -> int:
    """Batch tile sized to keep the live split-f32 state (+ cotangent in
    the backward) within a conservative VMEM budget."""
    d = 1 << plan.n
    budget_bytes = (1 if backward else 2) * 1024 * 1024
    tb = budget_bytes // (8 * d)  # 2 arrays x 4 bytes per element
    tb = max(8, 1 << int(np.log2(tb)) if tb >= 1 else 3)
    tb = min(tb, 256)
    while b % tb:
        tb //= 2
    if tb < 8:
        raise ValueError(f"batch {b} not tileable (pad to a multiple of 8)")
    return tb


_CALL_CACHE: dict = {}


def _mat_dims(plan: KPlan):
    k = {"hi": 1 << plan.hb, "lo": 1 << plan.lb}
    return [k[axis] for _, axis in plan.mat_srcs]


def _shared_spec(d1, d2):
    return pl.BlockSpec((d1, d2), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _forward_call(plan: KPlan, b: int, interpret: bool):
    key = ("fwd", plan, b, interpret)
    if key not in _CALL_CACHE:
        tb = _tile(plan, b, backward=False)
        h, l = 1 << plan.hb, 1 << plan.lb
        mat_specs = []
        for k in _mat_dims(plan):
            mat_specs += [_shared_spec(k, k)] * 2
        diag_specs = []
        fwd_diag = _diag_layouts(plan)
        for idx in range(plan.n_diags):
            d1, d2 = _dims(plan, fwd_diag[idx])
            diag_specs += [_shared_spec(d1, d2)] * 2
        state_spec = pl.BlockSpec((tb, h, l), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
        _CALL_CACHE[key] = pl.pallas_call(
            _forward_kernel(plan),
            grid=(b // tb,),
            in_specs=[state_spec, state_spec] + mat_specs + diag_specs,
            out_specs=[state_spec, state_spec],
            out_shape=[jax.ShapeDtypeStruct((b, h, l), jnp.float32)] * 2,
            compiler_params=None if interpret else _COMPILER_PARAMS,
            interpret=interpret,
        )
    return _CALL_CACHE[key]


def _backward_call(plan: KPlan, b: int, interpret: bool):
    key = ("bwd", plan, b, interpret)
    if key not in _CALL_CACHE:
        tb = _tile(plan, b, backward=True)
        h, l = 1 << plan.hb, 1 << plan.lb
        mat_specs, gmat_specs, mat_shapes = [], [], []
        for k in _mat_dims(plan):
            mat_specs += [_shared_spec(k, k)] * 2
            gmat_specs += [_shared_spec(k, k)] * 2
            mat_shapes += [(k, k)] * 2
        diag_specs, gph_specs, diag_shapes = [], [], []
        bwd_diag = _diag_layouts(plan, reverse=True)
        for idx in range(plan.n_diags):
            d1, d2 = _dims(plan, bwd_diag[idx])
            diag_specs += [_shared_spec(d1, d2)] * 2
            gph_specs += [_shared_spec(d1, d2)] * 2
            diag_shapes += [(d1, d2)] * 2
        state_spec = pl.BlockSpec((tb, h, l), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
        _CALL_CACHE[key] = pl.pallas_call(
            _backward_kernel(plan),
            grid=(b // tb,),
            in_specs=[state_spec] * 4 + mat_specs + diag_specs,
            out_specs=[state_spec] * 2 + gmat_specs + gph_specs,
            out_shape=(
                [jax.ShapeDtypeStruct((b, h, l), jnp.float32)] * 2
                + [jax.ShapeDtypeStruct(s, jnp.float32) for s in mat_shapes]
                + [jax.ShapeDtypeStruct(s, jnp.float32) for s in diag_shapes]
            ),
            compiler_params=None if interpret else _COMPILER_PARAMS,
            interpret=interpret,
        )
    return _CALL_CACHE[key]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _run(plan: KPlan, interpret: bool, xr, xi, mats, phases):
    """xr/xi: [B, H, L] f32 (B a multiple of 8). mats: tuple of (re, im)
    [K, K] pairs in plan order; phases: tuple of (cos, sin) pairs, each
    pre-oriented to its diag step's forward layout. Returns (yr, yi) in
    [B, H, L]."""
    flat = [m for pair in mats for m in pair] + [p for pair in phases for p in pair]
    yr, yi = _forward_call(plan, xr.shape[0], interpret)(xr, xi, *flat)
    return yr, yi


def _run_fwd(plan, interpret, xr, xi, mats, phases):
    out = _run(plan, interpret, xr, xi, mats, phases)
    return out, (out[0], out[1], mats, phases)


def _run_bwd(plan, interpret, res, g):
    yr, yi, mats, phases = res
    gr, gi = g
    # conj-transposed matrices: one matrix serves input recovery AND
    # cotangent pullback in the kernel
    matct = []
    for mr, mi in mats:
        matct += [mr.T, -(mi.T)]
    fwd_diag = _diag_layouts(plan)
    bwd_diag = _diag_layouts(plan, reverse=True)
    ph_flat = []
    for idx, (c, s) in enumerate(phases):
        if fwd_diag[idx] != bwd_diag[idx]:
            c, s = c.T, s.T
        ph_flat += [c, s]
    out = _backward_call(plan, yr.shape[0], interpret)(
        yr, yi, gr, gi, *(matct + ph_flat)
    )
    gxr, gxi = out[0], out[1]
    n_mats = plan.n_mats
    gm = out[2 : 2 + 2 * n_mats]
    gp = out[2 + 2 * n_mats :]
    gmats = tuple((gm[2 * i], gm[2 * i + 1]) for i in range(n_mats))
    gphases = []
    for idx in range(len(phases)):
        gc, gs = gp[2 * idx], gp[2 * idx + 1]
        if fwd_diag[idx] != bwd_diag[idx]:
            gc, gs = gc.T, gs.T
        gphases.append((gc, gs))
    return gxr, gxi, gmats, tuple(gphases)


_run.defvjp(_run_fwd, _run_bwd)


class BlockPallasCircuit(BlockFusedCircuit):
    """Fused-kernel variant of :class:`BlockFusedCircuit`: same interface
    (evolve / state / apply / __call__), same segment compilation, but the
    segment chain executes inside one Pallas kernel per batch tile.
    Reverse-mode AD only (custom_vjp) — compose with tangent streams, not
    nested AD."""

    def __init__(self, circuit: DVCircuit, hi_bits: Optional[int] = None,
                 interpret: bool = False, remat: bool = False):
        # merge=False: the kernel plan walks per-segment hi/lo programs;
        # chain-shortened segments (parts) are an XLA-engine optimization
        super().__init__(circuit, hi_bits=hi_bits, remat=remat, merge=False)
        self.interpret = interpret
        self.plan = build_plan(self.segments, circuit.n, self.hb)

    def _evolve_impl(self, params, state):
        c = self.circuit
        if params.size != c.layers * c.params_per_layer:
            raise ValueError("block backend needs unbatched circuit parameters")
        p2 = params.reshape(c.layers, c.params_per_layer)
        no_params = jnp.zeros((0,), dtype=p2.dtype)

        def layer_params(seg):
            return p2[seg.layer] if seg.layer >= 0 else no_params

        # differentiable small-tensor constructions (outside the kernel);
        # plan order, which may interleave hi/lo within a segment
        mats = []
        for si, axis in self.plan.mat_srcs:
            seg = self.segments[si]
            if axis == "hi":
                m = _block_unitary(self.hb, seg.hi_prog, layer_params(seg))
            else:
                m = _block_unitary(self.lb, seg.lo_prog, layer_params(seg))
            mats.append((jnp.real(m).astype(jnp.float32),
                         jnp.imag(m).astype(jnp.float32)))
        phases = []
        fwd_diag = _diag_layouts(self.plan)
        for idx, si in enumerate(self.plan.diag_srcs):
            seg = self.segments[si]
            phi = seg.run.phases(layer_params(seg)).reshape(
                1 << self.hb, 1 << self.lb
            )
            if fwd_diag[idx] != ("hi", "lo"):
                phi = phi.T
            phases.append((jnp.cos(phi).astype(jnp.float32),
                           jnp.sin(phi).astype(jnp.float32)))

        b = state.shape[0]
        h, l = 1 << self.hb, 1 << self.lb
        pad = (-b) % 8
        s3 = state.reshape(b, h, l)
        xr = jnp.real(s3).astype(jnp.float32)
        xi = jnp.imag(s3).astype(jnp.float32)
        if pad:
            xr = jnp.pad(xr, ((0, pad), (0, 0), (0, 0)))
            xi = jnp.pad(xi, ((0, pad), (0, 0), (0, 0)))
        yr, yi = _run(self.plan, self.interpret, xr, xi,
                      tuple(mats), tuple(phases))
        if pad:
            yr, yi = yr[:b], yi[:b]
        out = (yr + 1j * yi).astype(state.dtype)
        return out.reshape(b, 1 << c.n)


def supports(circuit: DVCircuit, hi_bits: Optional[int] = None) -> bool:
    """True if the circuit's block decomposition has no boundary-straddling
    segments (i.e. BlockPallasCircuit can run it)."""
    probe = BlockFusedCircuit(circuit, hi_bits=hi_bits, merge=False)
    try:
        build_plan(probe.segments, circuit.n, probe.hb)
        return True
    except ValueError:
        return False

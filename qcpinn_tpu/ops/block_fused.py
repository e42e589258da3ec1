"""Block-fused circuit execution: ride the MXU instead of the VPU.

The roll-based kernels (pallas_sv, pallas_loop) apply each gate as ~30
elementwise VPU ops over the full state — O(gates) full-state sweeps of
vector work. For wide circuits this leaves the MXU (the TPU's dominant
compute resource) idle. This engine instead partitions the wire set into a
HIGH block (wires 0..hb-1) and a LOW block (the rest) and **fuses every
maximal run of in-block gates into one dense block unitary**:

    state[B, 2^n] -> s[B, H, L]
    hi-run:  s <- einsum('bkl,km->bml', s, U_hi)     (one MXU matmul)
    lo-run:  s <- einsum('bkl,lm->bkm', s, U_lo)     (one MXU matmul)
    diag:    s <- s * exp(i phi)                      (elementwise, VPU)

U_hi/U_lo ([H, H] / [L, L], H=L=256 at 16 qubits) are built per step by
running the remapped sub-programs on an identity batch — a few thousand
FLOPs, negligible. cross_mesh at 16 qubits collapses to 3 matmul pairs + 2
fused diagonals; the full 16q streams train step measures 385 ms/step at
B=256 vs 904 ms for the loop-form Pallas kernel (which is itself the only
*Pallas* option that compiles at 16q) — see PARITY.md.

Because everything is plain XLA (no custom_vjp), this engine is
differentiable to ANY order — reverse for training, forward for the
nested-AD PDE operators — and composes with tangent streams
(physics/streams.py). It replaces the reference's Aer statevector device for
the flagship 16-qubit workload
(hybrid_testing/CG_HQPINN_IBMtest_16qubits.py:167-176).

Rare gates that straddle the block boundary (e.g. one CRX of a ring) fall
back to single elementwise ops on the flat state.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import program as prog
from .circuit import DVCircuit
from .diag_fusion import DiagRun
from .program import Op

HI = jax.lax.Precision.HIGHEST

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,  # 6 bf16 MXU passes per f32 matmul
    "high": jax.lax.Precision.HIGH,  # 3 passes (bf16x3 ~ f32 accuracy)
    "default": jax.lax.Precision.DEFAULT,  # 1 pass (raw bf16)
}


def _env_precision():
    """Resolve the block-einsum precision from QCPINN_BLOCK_PRECISION.

    Each complex64 einsum lowers to 4 real matmuls, and each f32 matmul at
    HIGHEST costs 6 bf16 MXU passes; HIGH costs 3 at ~f32 accuracy
    (bf16x3), halving the MXU work per block matmul. Measured deviation
    and step-time numbers: artifacts/block_precision_onchip.json
    (scripts/precision_probe.py). HIGHEST stays the default — all parity
    suites are calibrated to it; flip per-run with
    QCPINN_BLOCK_PRECISION=high."""
    import os

    v = os.environ.get("QCPINN_BLOCK_PRECISION", "highest")
    if v not in _PRECISIONS:
        raise ValueError(
            f"QCPINN_BLOCK_PRECISION must be one of {list(_PRECISIONS)}, "
            f"got {v!r}"
        )
    return _PRECISIONS[v]


@dataclasses.dataclass(frozen=True)
class Segment:
    """One sequential step of the fused chain.

    A 'blocks' segment may span several parameter layers (and the
    epilogue) after chain-shortening: ``parts`` lists
    (layer, hi_prog, lo_prog) sub-programs in application order whose
    block unitaries are composed by small [K, K] matmuls before the one
    big state einsum — hi ops and lo ops act on disjoint wire sets, so
    composing each side independently preserves the unitary."""

    kind: str  # 'blocks' | 'diag' | 'op'
    layer: int  # parameter-layer index; -1 = epilogue (no params)
    hi_prog: Tuple[Op, ...] = ()
    lo_prog: Tuple[Op, ...] = ()
    run: Optional[DiagRun] = None
    op: Optional[Op] = None
    # chain-shortened 'blocks': ((layer, hi_prog, lo_prog), ...)
    parts: Tuple = ()


def _remap(op: Op, shift: int) -> Op:
    if shift == 0:
        return op
    return Op(op.kind, tuple(w - shift for w in op.wires), op.pidx, op.const)


def compile_segments(
    circuit: DVCircuit, hb: int, split_local_diags: bool = False
) -> Tuple[Segment, ...]:
    """``split_local_diags`` (the chain-shortening front half): a DiagRun
    whose phase separates across the hi/lo cut (diag_fusion.split_diag_run)
    joins the surrounding block programs as per-block diagonal factors
    instead of flushing them — e.g. cross_mesh's trailing RZ sweep stops
    splitting the trailing RX blocks from the next layer's leading RX
    blocks (and from the epilogue)."""
    from .diag_fusion import split_diag_run

    n = circuit.n
    segs: List[Segment] = []

    def walk(program, layer):
        cur_hi: List[Op] = []
        cur_lo: List[Op] = []

        def flush():
            nonlocal cur_hi, cur_lo
            if cur_hi or cur_lo:
                segs.append(
                    Segment("blocks", layer, tuple(cur_hi), tuple(cur_lo))
                )
                cur_hi, cur_lo = [], []

        for op in program:
            if isinstance(op, DiagRun):
                parts = split_diag_run(op, hb) if split_local_diags else None
                if parts is not None:
                    hi_run, lo_run = parts
                    if hi_run is not None:
                        cur_hi.append(hi_run)
                    if lo_run is not None:
                        cur_lo.append(lo_run)
                    continue
                flush()
                segs.append(Segment("diag", layer, run=op))
            elif all(w < hb for w in op.wires):
                cur_hi.append(op)
            elif all(w >= hb for w in op.wires):
                cur_lo.append(_remap(op, hb))
            else:  # straddles the block boundary
                flush()
                segs.append(Segment("op", layer, op=op))
        flush()

    for layer in range(circuit.layers):
        walk(circuit.program, layer)
    walk(circuit.epilogue, -1)
    return tuple(segs)


def merge_block_segments(segs: Tuple[Segment, ...]) -> Tuple[Segment, ...]:
    """Chain-shortening pass: fuse ADJACENT 'blocks' segments (they arise
    at layer and epilogue boundaries — e.g. cross_mesh's trailing RX/RZ
    sweep, the next layer's leading RX/RZ sweep, and the Haar/H epilogue)
    into ONE segment whose hi/lo unitaries are composed by [K, K] matmuls.
    The step is latency-bound on the sequential segment chain (PARITY.md
    round-4 roofline study), so every removed segment is a removed
    full-state matmul in BOTH the forward and the backward sweep."""
    out: List[Segment] = []
    for seg in segs:
        if (
            seg.kind == "blocks"
            and out
            and out[-1].kind == "blocks"
        ):
            prev = out[-1]
            prev_parts = prev.parts or (
                (prev.layer, prev.hi_prog, prev.lo_prog),
            )
            cur_parts = seg.parts or ((seg.layer, seg.hi_prog, seg.lo_prog),)
            out[-1] = Segment(
                "blocks", prev.layer, parts=prev_parts + cur_parts
            )
        else:
            out.append(seg)
    return tuple(out)


def _block_unitary(nbits: int, program: Tuple[Op, ...], layer_params):
    """Dense [2^k, 2^k] with M[in, out]: run the sub-program on an identity
    batch of basis states (row i = U|i> as a row vector)."""
    dim = 1 << nbits
    eye = jnp.eye(dim, dtype=jnp.complex64)
    return prog.apply_program(eye, nbits, program, layer_params)


class BlockFusedCircuit:
    """MXU block-fused exact-expectation circuit: [B, n_feat] -> [B, n].

    Same interface as the Pallas backends (evolve / state / apply), pure
    XLA, any-order differentiable. ``hi_bits`` defaults to a balanced split
    (256x256 matmuls at n=16)."""

    def __init__(
        self,
        circuit: DVCircuit,
        hi_bits: Optional[int] = None,
        precision=None,
        remat: bool = False,
        merge: Optional[bool] = None,
    ):
        n = circuit.n
        if n < 2:
            raise ValueError("block fusion needs n >= 2")
        self.circuit = circuit
        self.hb = hi_bits if hi_bits is not None else (n + 1) // 2
        if not 1 <= self.hb < n:
            raise ValueError(f"hi_bits {self.hb} out of range for n={n}")
        self.lb = n - self.hb
        self.precision = _env_precision() if precision is None else precision
        # rematerialize the evolution in the backward pass instead of
        # storing every segment's full state (one extra forward of
        # recompute). Helps when the segment chain dominates live memory;
        # at 20q the streams/encode buffers dominate instead, so the
        # practical 20q path is small batches (B=8 measured on-chip).
        self.remat = remat
        if merge is None:
            # on-chip A/B knob (scripts/mfu_ladder.py --merge-ab): the
            # merged chain is the default; QCPINN_BLOCK_MERGE=0 restores
            # the round-2..4 one-segment-per-boundary chain
            merge = os.environ.get("QCPINN_BLOCK_MERGE", "1") != "0"
        self.segments_raw = compile_segments(circuit, self.hb)
        # chain-shortening (merge=True, the default), two passes: (1)
        # block-separable DiagRuns join the block programs as per-block
        # diagonal factors instead of standing as full-state elementwise
        # segments; (2) now-adjacent 'blocks' segments at layer/epilogue
        # boundaries compose into one big-state einsum pair. Fewer
        # sequential full-state ops on a latency-bound step. merge=False
        # keeps the one-segment-per-boundary chain (the round-2..4
        # recorded behavior) for A/B, parity pinning, and the Pallas
        # kernel plan (block_pallas.py).
        self.segments = (
            merge_block_segments(
                compile_segments(circuit, self.hb, split_local_diags=True)
            )
            if merge
            else self.segments_raw
        )
        # Sharding hook: the GSPMD-sharded wrapper (parallel/sharded_block.py)
        # re-pins the [B, H, L] state's layout after every segment so XLA
        # keeps the H axis on the mesh instead of inventing its own layout
        # mid-chain. Identity for the single-device engine.
        self._constrain = lambda s: s

    def segment_stats(self) -> dict:
        """Sequential-chain accounting (the latency-bound step's true cost
        metric, PARITY.md round-4 roofline study): counts of full-state
        ops per evolve, before and after chain-shortening."""

        def count(segs):
            matmuls = sum(
                (
                    (1 if any(p[1] for p in (seg.parts or ((seg.layer, seg.hi_prog, seg.lo_prog),))) else 0)
                    + (1 if any(p[2] for p in (seg.parts or ((seg.layer, seg.hi_prog, seg.lo_prog),))) else 0)
                )
                for seg in segs if seg.kind == "blocks"
            )
            return {
                "segments": len(segs),
                "state_matmuls": matmuls,
                "diags": sum(1 for s in segs if s.kind == "diag"),
                "cross_ops": sum(1 for s in segs if s.kind == "op"),
            }

        return {"raw": count(self.segments_raw), "merged": count(self.segments)}

    def evolve(self, params, state):
        if self.remat:
            return jax.checkpoint(self._evolve_impl)(params, state)
        return self._evolve_impl(params, state)

    def _evolve_impl(self, params, state):
        """Ansatz layers + epilogue on an arbitrary [B, 2^n] complex state."""
        c = self.circuit
        if params.size != c.layers * c.params_per_layer:
            raise ValueError("block backend needs unbatched circuit parameters")
        p2 = params.reshape(c.layers, c.params_per_layer)
        no_params = jnp.zeros((0,), dtype=p2.dtype)
        b = state.shape[0]
        h, l = 1 << self.hb, 1 << self.lb
        s = self._constrain(state.reshape(b, h, l))
        for seg in self.segments:
            lp = p2[seg.layer] if seg.layer >= 0 else no_params
            if seg.kind == "blocks":
                parts = seg.parts or ((seg.layer, seg.hi_prog, seg.lo_prog),)
                mh = ml = None
                for part_layer, hi_prog, lo_prog in parts:
                    pp = p2[part_layer] if part_layer >= 0 else no_params
                    if hi_prog:
                        m = _block_unitary(self.hb, hi_prog, pp)
                        # state applies M as [in, out]: sequential parts
                        # compose as M_first @ M_second ([K,K] matmuls —
                        # negligible next to the [B*L, K] state einsum)
                        mh = m if mh is None else jnp.matmul(
                            mh, m, precision=HI
                        )
                    if lo_prog:
                        m = _block_unitary(self.lb, lo_prog, pp)
                        ml = m if ml is None else jnp.matmul(
                            ml, m, precision=HI
                        )
                if mh is not None:
                    s = jnp.einsum("bkl,km->bml", s, mh, precision=self.precision)
                if ml is not None:
                    s = jnp.einsum("bkl,lm->bkm", s, ml, precision=self.precision)
            elif seg.kind == "diag":
                phi = seg.run.phases(lp)  # [2^n]
                s = s * jnp.exp(1j * phi).astype(s.dtype).reshape(1, h, l)
            else:  # cross-block single op
                flat = prog.apply_program(
                    s.reshape(b, 1 << c.n), c.n, (seg.op,), lp
                )
                s = flat.reshape(b, h, l)
            s = self._constrain(s)
        return s.reshape(b, 1 << c.n)

    def state(self, params, x):
        from . import statevector as sv

        if self.circuit.encoding == "amplitude":
            prepared = sv.encode_amplitude(x, self.circuit.n)
        else:
            prepared = sv.encode_angle_product(
                x * getattr(self.circuit, "input_scale", 1.0), self.circuit.n
            )
        return self.evolve(params, prepared)

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

"""Amplitude-sharded statevector engine: tensor parallelism for the 2^n
state over the mesh 'amp' axis.

This is the framework's scaling axis for qubit counts beyond single-chip
HBM (SURVEY.md §5.7: the reference caps out near ~20 qubits on one host —
report_hybrid_CFD.md:9; here the state is split over devices and cross-shard
gates ride ICI collectives).

Layout: the state ``[B, 2^n]`` is sharded over its *leading* ``a = log2(A)``
wire bits (wire 0 = MSB): device with 'amp' index s holds the block of
2^(n-a) amplitudes whose leading bits equal s. Consequences:

- gates on wires w >= a are shard-local (the ordinary engine on the local
  block);
- a 1-qubit gate on a sharded wire w < a exchanges blocks between partner
  devices differing in that bit (one ppermute) and combines locally;
- a 2-qubit gate with one/both wires sharded needs one/three partner
  exchanges;
- diagonal gates never communicate: the sharded bits are compile-fixed per
  device (from axis_index), so the fused DiagRun phase vector is computed
  locally with the reduced bit matrix;
- <Z_w> is a local sign-matmul + psum for local wires, a signed local mass
  + psum for sharded wires.

Everything runs inside one shard_map, composing with 'data'-axis batch
sharding — this is the 'amp' axis exercised by dryrun_multichip.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import gates
from ..ops.circuit import DVCircuit
from ..ops.diag_fusion import DiagRun, bit_matrix
from ..ops.program import (
    FIXED_1Q,
    FIXED_2Q,
    PARAM_1Q,
    PARAM_1Q3,
    PARAM_2Q,
    _FIXED_1Q_MATS,
    _FIXED_2Q_MATS,
    _PARAM_1Q_FNS,
    _PARAM_2Q_FNS,
    Op,
)
from ..ops import statevector as sv

HI = jax.lax.Precision.HIGHEST


def _perm_pairs(A: int, mask: int):
    return [(i, i ^ mask) for i in range(A)]


class ShardedOps:
    """Gate application on a local block, parameterized by the shard
    context (amp axis name, total shards A, sharded-bit count a)."""

    def __init__(self, n: int, a: int, axis: str = "amp"):
        if a < 0 or a > n:
            raise ValueError(f"bad shard bits a={a} for n={n}")
        self.n = n
        self.a = a
        self.axis = axis
        self.n_local = n - a
        self.A = 1 << a

    # inside shard_map ------------------------------------------------------

    def shard_bits(self) -> jnp.ndarray:
        """[a] int32 bits of this device's shard index (wire order)."""
        idx = jax.lax.axis_index(self.axis)
        return jnp.asarray(
            [(idx >> (self.a - 1 - w)) & 1 for w in range(self.a)], dtype=jnp.int32
        )

    def _exchange(self, local: jnp.ndarray, wire: int) -> jnp.ndarray:
        """Block from the partner differing in sharded ``wire``."""
        mask = 1 << (self.a - 1 - wire)
        return jax.lax.ppermute(local, self.axis, _perm_pairs(self.A, mask))

    def apply_1q(self, local: jnp.ndarray, wire: int, m: jnp.ndarray) -> jnp.ndarray:
        if wire >= self.a:  # local
            return sv.apply_1q(local, self.n_local, wire - self.a, m)
        other = self._exchange(local, wire)
        idx = jax.lax.axis_index(self.axis)
        bit = (idx >> (self.a - 1 - wire)) & 1
        if m.ndim == 2:
            m_exp = m
            diag = jnp.where(bit == 0, m_exp[0, 0], m_exp[1, 1])
            off = jnp.where(bit == 0, m_exp[0, 1], m_exp[1, 0])
            return diag * local + off * other
        # batched [B, 2, 2]
        diag = jnp.where(bit == 0, m[:, 0, 0], m[:, 1, 1])[:, None]
        off = jnp.where(bit == 0, m[:, 0, 1], m[:, 1, 0])[:, None]
        return diag * local + off * other

    def apply_2q(
        self, local: jnp.ndarray, wa: int, wb: int, u: jnp.ndarray
    ) -> jnp.ndarray:
        """General 2-qubit gate, u [4,4] in (wa, wb) order."""
        a = self.a
        if wa >= a and wb >= a:  # both local
            return sv.apply_2q(local, self.n_local, wa - a, wb - a, u)
        u4 = u.reshape(2, 2, 2, 2)
        idx = jax.lax.axis_index(self.axis)
        if wa < a and wb < a:
            # both sharded: gather the 3 partner blocks
            ba = (idx >> (a - 1 - wa)) & 1
            bb = (idx >> (a - 1 - wb)) & 1
            mask_a = 1 << (a - 1 - wa)
            mask_b = 1 << (a - 1 - wb)
            blk = {(0, 0): local}
            blk[(1, 0)] = jax.lax.ppermute(local, self.axis, _perm_pairs(self.A, mask_a))
            blk[(0, 1)] = jax.lax.ppermute(local, self.axis, _perm_pairs(self.A, mask_b))
            blk[(1, 1)] = jax.lax.ppermute(
                local, self.axis, _perm_pairs(self.A, mask_a | mask_b)
            )
            # blk[(da, db)] holds amplitudes whose (wa, wb) bits are
            # (ba^da, bb^db); output bits are (ba, bb)
            out = jnp.zeros_like(local)
            for da in range(2):
                for db in range(2):
                    src_a = ba ^ da
                    src_b = bb ^ db
                    coeff = u4[ba, bb, src_a, src_b]
                    out = out + coeff * blk[(da, db)]
            return out
        # mixed: one sharded, one local
        if wb < a:  # make wa the sharded one by transposing u
            wa, wb = wb, wa
            u4 = u4.transpose(1, 0, 3, 2)
        bs = (idx >> (a - 1 - wa)) & 1
        other = self._exchange(local, wa)
        wl = wb - a
        b = local.shape[0]
        lo = 1 << wl
        hi = 1 << (self.n_local - 1 - wl)
        mine = local.reshape(b, lo, 2, hi)
        them = other.reshape(b, lo, 2, hi)
        # amplitude with sharded bit = bs (mine) and bs^1 (them)
        out = jnp.zeros_like(mine)
        for tgt_local in range(2):
            for src_shard in range(2):  # 0 = mine (bit bs), 1 = them (bit bs^1)
                src = mine if src_shard == 0 else them
                for src_local in range(2):
                    coeff = u4[bs, tgt_local, bs ^ src_shard, src_local]
                    out = out.at[:, :, tgt_local, :].add(
                        coeff * src[:, :, src_local, :]
                    )
        return out.reshape(b, 1 << self.n_local)

    def apply_diag_run(self, local: jnp.ndarray, run: DiagRun, params) -> jnp.ndarray:
        """Fused diagonal run with the global bit vector = [shard bits,
        local bits] — no communication."""
        n, a = self.n, self.a
        sb = self.shard_bits().astype(jnp.float32)  # [a]
        local_bits = jnp.asarray(bit_matrix(self.n_local))  # [2^(n-a), n-a]
        S = local.shape[1]
        bits = jnp.concatenate(
            [jnp.broadcast_to(sb[None, :], (S, a)), local_bits], axis=1
        )  # [S, n]
        theta = params[..., jnp.asarray(run.pidx, dtype=jnp.int32)]
        lin_w = jnp.matmul(theta, jnp.asarray(run.w1), precision=HI)
        phi = jnp.matmul(lin_w, bits.T, precision=HI)
        phi = phi + jnp.sum(theta * jnp.asarray(run.c1), axis=-1, keepdims=True)
        if run.quad:
            cs = np.array([q[0] for q in run.quad])
            ts = np.array([q[1] for q in run.quad])
            ks = np.array([q[2] for q in run.quad])
            q_mat = jnp.zeros(theta.shape[:-1] + (n, n), dtype=theta.dtype)
            q_mat = q_mat.at[..., cs, ts].add(theta[..., ks])
            bq = jnp.einsum("sc,...ct->...st", bits, q_mat, precision=HI)
            phi = phi + jnp.einsum("...st,st->...s", bq, bits, precision=HI)
        if run.const_pairs:
            cvec = 0.0
            for pa, pb in run.const_pairs:
                cvec = cvec + np.pi * bits[:, pa] * bits[:, pb]
            phi = phi + cvec
        if phi.ndim == 1:
            phi = phi[None, :]
        return local * jnp.exp(1j * phi).astype(local.dtype)

    def apply_program(self, local, program, params) -> jnp.ndarray:
        for op in program:
            if isinstance(op, DiagRun):
                local = self.apply_diag_run(local, op, params)
                continue
            k = op.kind
            if k in PARAM_1Q:
                local = self.apply_1q(
                    local, op.wires[0], _PARAM_1Q_FNS[k](params[..., op.pidx[0]])
                )
            elif k in PARAM_1Q3:
                local = self.apply_1q(
                    local,
                    op.wires[0],
                    gates.rot(
                        params[..., op.pidx[0]],
                        params[..., op.pidx[1]],
                        params[..., op.pidx[2]],
                    ),
                )
            elif k in PARAM_2Q:
                local = self.apply_2q(
                    local, op.wires[0], op.wires[1],
                    _PARAM_2Q_FNS[k](params[..., op.pidx[0]]),
                )
            elif k in FIXED_1Q:
                local = self.apply_1q(local, op.wires[0], jnp.asarray(_FIXED_1Q_MATS[k]))
            elif k in FIXED_2Q:
                local = self.apply_2q(
                    local, op.wires[0], op.wires[1], jnp.asarray(_FIXED_2Q_MATS[k])
                )
            elif k == "u1q":
                local = self.apply_1q(local, op.wires[0], jnp.asarray(op.const))
            elif k == "u2q":
                local = self.apply_2q(local, op.wires[0], op.wires[1], jnp.asarray(op.const))
            else:  # pragma: no cover
                raise ValueError(k)
        return local

    def z_expvals(self, local: jnp.ndarray) -> jnp.ndarray:
        """[B_local, n] — psum over the amp axis."""
        probs = jnp.real(local * jnp.conj(local)).astype(jnp.float32)
        cols = []
        sb = self.shard_bits().astype(jnp.float32)
        total = jnp.sum(probs, axis=1)  # [B]
        for w in range(self.n):
            if w < self.a:
                cols.append((1.0 - 2.0 * sb[w]) * total)
            else:
                wl = w - self.a
                lo = 1 << wl
                hi = 1 << (self.n_local - 1 - wl)
                p = probs.reshape(-1, lo, 2, hi)
                cols.append(p[:, :, 0, :].sum((1, 2)) - p[:, :, 1, :].sum((1, 2)))
        z = jnp.stack(cols, axis=1)
        return jax.lax.psum(z, self.axis)


def make_sharded_circuit_apply(
    circuit: DVCircuit, mesh: Mesh, amp_axis: str = "amp", data_axis: str = "data"
):
    """Build ``apply(params, x) -> [B, n]`` with the statevector sharded over
    ``amp_axis`` and the batch over ``data_axis``."""
    A = mesh.shape[amp_axis]
    a = int(np.log2(A))
    if (1 << a) != A:
        raise ValueError(f"amp axis size {A} must be a power of 2")
    if circuit.encoding not in ("angle", "amplitude"):
        raise ValueError(f"unsupported encoding: {circuit.encoding}")
    ops = ShardedOps(circuit.n, a, amp_axis)

    def inner(params, x):
        b = x.shape[0]
        idx = jax.lax.axis_index(amp_axis)
        if circuit.encoding == "amplitude":
            # AmplitudeEmbedding (nn/DVQuantumLayer.py:177-180): the
            # normalized zero-padded state's shard layout is contiguous
            # (device s holds the amplitudes whose leading `a` wire bits
            # equal s), so each device just keeps its 2^(n-a) slice. The
            # full [B_local, 2^n] vector exists only as an XLA temp that
            # fuses into the slice.
            full = sv.encode_amplitude(x, circuit.n)
            local = jax.lax.dynamic_slice_in_dim(
                full, idx * (1 << ops.n_local), 1 << ops.n_local, axis=1
            )
        else:
            # local zero state: only shard 0 holds the |0...0> amplitude
            local = jnp.zeros((b, 1 << ops.n_local), dtype=jnp.complex64)
            local = local.at[:, 0].set(
                jnp.where(idx == 0, 1.0 + 0.0j, 0.0 + 0.0j)
            )
            scale = getattr(circuit, "input_scale", 1.0)
            for w in range(circuit.n):
                local = ops.apply_1q(local, w, gates.rx(x[:, w] * scale))
        p2 = params.reshape(circuit.layers, circuit.params_per_layer)
        for layer in range(circuit.layers):
            local = ops.apply_program(local, circuit.program, p2[layer])
        local = ops.apply_program(local, circuit.epilogue, jnp.zeros((0,)))
        return ops.z_expvals(local)

    return shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(), P(data_axis, None)),
        out_specs=P(data_axis, None),
        check_vma=False,
    )


def make_sharded_evolve(
    circuit: DVCircuit, mesh: Mesh, amp_axis: str = "amp", data_axis: str = "data"
):
    """Build ``evolve(params, state) -> state``: ansatz layers + epilogue on
    a caller-prepared ``[B, 2^n]`` state, with the amplitude dimension
    sharded over ``amp_axis`` (device s holds the contiguous block whose
    leading ``a`` wire bits equal s — exactly the ShardedOps layout) and the
    batch over ``data_axis``. This is the composition point for the tangent
    streams (physics/streams.py): the 6x-wider derivative-stream batch rides
    the same sharded evolution, so 16q+ residual training gets the amp
    axis's HBM relief."""
    A = mesh.shape[amp_axis]
    a = int(np.log2(A))
    if (1 << a) != A:
        raise ValueError(f"amp axis size {A} must be a power of 2")
    ops = ShardedOps(circuit.n, a, amp_axis)

    def inner(params, local):
        p2 = params.reshape(circuit.layers, circuit.params_per_layer)
        for layer in range(circuit.layers):
            local = ops.apply_program(local, circuit.program, p2[layer])
        return ops.apply_program(local, circuit.epilogue, jnp.zeros((0,)))

    return shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(), P(data_axis, amp_axis)),
        out_specs=P(data_axis, amp_axis),
        check_vma=False,
    )


class ShardedCircuit:
    """Quantum-block adapter around :func:`make_sharded_circuit_apply` with
    the fused-backend calling convention, so a solver can route training
    through the amp-sharded engine (``model.use_sharded(mesh)``) and the
    jitted train step lifts the 2^n HBM cap by the 'amp' mesh factor.

    Differentiable to any order (plain XLA + collectives), so the nested-AD
    PDE operators work through it; :meth:`evolve` additionally lets the
    tangent-stream residuals run their stacked derivative streams through
    the sharded evolution. Shot-sampling and noise channels compose on the
    psum-reduced ``<Z>`` output (the per-shard probability masses are
    already globally reduced inside the shard_map), so this backend covers
    the full apply contract like the block engine."""

    def __init__(
        self,
        circuit: DVCircuit,
        mesh: Mesh,
        amp_axis: str = "amp",
        data_axis: str = "data",
    ):
        self.circuit = circuit
        self.mesh = mesh
        self._data = mesh.shape[data_axis]
        self._apply = make_sharded_circuit_apply(circuit, mesh, amp_axis, data_axis)
        self._evolve = make_sharded_evolve(circuit, mesh, amp_axis, data_axis)

    def _pad_batch(self, arr):
        b = arr.shape[0]
        bp = -(-b // self._data) * self._data
        if bp != b:
            arr = jnp.pad(arr, ((0, bp - b), (0, 0)))
        return arr, b

    def apply(self, params, x, *, shots=None, key=None, noise=None):
        # shard_map needs the batch divisible by the data axis; pad + slice
        # (static shapes under jit, so this costs one pad/slice pair)
        x, b = self._pad_batch(x)
        z = self._apply(params, x)[:b]
        # measurement post-processing on the reduced expectations — the
        # same estimator as the single-device engine (ops/measure.py), so
        # sharded shots/noise match unsharded bitwise for a shared key
        if noise is not None:
            z = noise.bind(self.circuit).apply(z)
        if shots is not None:
            if key is None:
                raise ValueError("shots mode needs a PRNG key")
            from ..ops.measure import sample_z_from_expectations

            z = sample_z_from_expectations(z, shots, key)
        return z

    def evolve(self, params, state):
        """Ansatz layers + epilogue on an arbitrary [B, 2^n] complex state —
        drop-in for DVCircuit.evolve, amplitudes sharded over the mesh."""
        state, b = self._pad_batch(state)
        out = self._evolve(params, state)
        return out[:b]

    def __call__(self, params, x, **kw):
        return self.apply(params, x, **kw)

"""GSPMD-sharded block-fused engine: MXU matmuls over a sharded statevector.

The per-gate amp-sharded engine (sharded_sv.py) writes its collectives by
hand inside a shard_map — correct, but each gate is ~30 elementwise VPU ops
per shard. This wrapper instead shards the *block-fused* engine
(ops/block_fused.py), which executes a circuit as a handful of dense
[H, H] / [L, L] einsums over ``state.reshape(B, H, L)`` — the MXU-shaped
form — and lets XLA's GSPMD partitioner insert the collectives:

- the ``[B, H, L]`` state is pinned to ``P(data, amp, None)``: the batch
  rides the 'data' axis, the H (leading-bit) axis rides the 'amp' axis —
  the same leading-bits-sharded layout as sharded_sv (device s holds the
  amplitudes whose leading bits equal s);
- lo-block einsums ``bkl,lm->bkm`` contract the *local* L axis: fully
  shard-local MXU matmuls, no communication;
- hi-block einsums ``bkl,km->bml`` contract the sharded H axis: XLA
  partitions the matmul and inserts the reduce over 'amp' (riding ICI on
  real hardware) — exactly the annotate-shardings-and-let-XLA-insert-
  collectives recipe, instead of hand-written NCCL-style exchanges;
- fused diagonals and the rare cross-block single op are elementwise /
  local, re-pinned to the layout after every segment via the engine's
  ``_constrain`` hook so the partitioner can't drift mid-chain.

Because this is global-view GSPMD (no shard_map), the *whole* public
surface works sharded — including shot sampling and the NoiseModel, which
the per-gate sharded engine rejects — and it is differentiable to any
order, so it composes with tangent streams (physics/streams.py) and the
nested-AD PDE operators.

Replaces (tpu-first) the reference's single-process Aer statevector
execution for beyond-HBM qubit counts
(hybrid_testing/CG_HQPINN_IBMtest_16qubits.py:167-176; the reference caps
out near ~20 qubits on one host, report_hybrid_CFD.md:9).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.block_fused import BlockFusedCircuit
from ..ops.circuit import DVCircuit


class ShardedBlockCircuit:
    """Amp-sharded MXU block engine: same interface as BlockFusedCircuit
    (evolve / state / apply), state sharded ``P(data, amp, None)``.

    ``hi_bits`` must put at least ``log2(amp)`` wires in the high block so
    the H axis divides over the mesh; the default balanced split is bumped
    up if needed. When even the bump leaves no low block (amp axis as
    large as the state, e.g. amp=8 at n=3), the constructor raises with
    the remedy rather than surfacing BlockFusedCircuit's range check.
    """

    def __init__(
        self,
        circuit: DVCircuit,
        mesh: Mesh,
        amp_axis: str = "amp",
        data_axis: str = "data",
        hi_bits: Optional[int] = None,
        precision=None,
        remat: bool = False,
    ):
        # precision=None resolves via the QCPINN_BLOCK_PRECISION env knob
        # inside BlockFusedCircuit, so the knob governs the sharded engine
        # too (round-4 advisor: a pinned HI here silently no-op'd it)
        A = mesh.shape[amp_axis]
        a = int(np.log2(A))
        if (1 << a) != A:
            raise ValueError(f"amp axis size {A} must be a power of 2")
        n = circuit.n
        hb = hi_bits if hi_bits is not None else max((n + 1) // 2, a)
        if hb >= n:
            raise ValueError(
                f"an amp axis of {A} devices needs at least {a} high bits, "
                f"but a {n}-qubit state has no low block left at hi_bits="
                f"{hb}; use fewer amp devices (or more qubits)"
            )
        if (1 << hb) % A:
            raise ValueError(
                f"hi_bits={hb} puts {1 << hb} rows on an amp axis of {A}"
            )
        self.circuit = circuit
        self.block = BlockFusedCircuit(
            circuit, hi_bits=hb, precision=precision, remat=remat
        )
        self.mesh = mesh
        self._s3 = NamedSharding(mesh, P(data_axis, amp_axis, None))
        self._sflat = NamedSharding(mesh, P(data_axis, amp_axis))
        self._sbatch = NamedSharding(mesh, P(data_axis, None))
        self.block._constrain = lambda s: jax.lax.with_sharding_constraint(
            s, self._s3
        )

    # -- the three-surface interface shared by every fused backend --------

    def evolve(self, params: jnp.ndarray, state: jnp.ndarray) -> jnp.ndarray:
        """Ansatz layers + epilogue on a prepared ``[B, 2^n]`` state (the
        tangent-stream composition point, physics/streams.py)."""
        state = jax.lax.with_sharding_constraint(state, self._sflat)
        out = self.block.evolve(params, state)
        return jax.lax.with_sharding_constraint(out, self._sflat)

    def state(self, params: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops import statevector as sv

        x = jax.lax.with_sharding_constraint(x, self._sbatch)
        if self.circuit.encoding == "amplitude":
            prepared = sv.encode_amplitude(x, self.circuit.n)
        else:
            prepared = sv.encode_angle_product(
                x * getattr(self.circuit, "input_scale", 1.0), self.circuit.n
            )
        return self.evolve(params, prepared)

    def apply(
        self,
        params: jnp.ndarray,
        x: jnp.ndarray,
        *,
        shots: Optional[int] = None,
        key: Optional[jax.Array] = None,
        noise=None,
    ) -> jnp.ndarray:
        from ..ops import measure

        if noise is not None:
            noise = noise.bind(self.circuit)
        state = self.state(params, x)
        if shots is None:
            z = measure.exact_z(state, self.circuit.n, noise)
        else:
            if key is None:
                raise ValueError("shots mode needs a PRNG key")
            z = measure.sampled_z(state, self.circuit.n, shots, key, noise)
        return jax.lax.with_sharding_constraint(z, self._sbatch)

    def __call__(self, params, x, **kw):
        return self.apply(params, x, **kw)

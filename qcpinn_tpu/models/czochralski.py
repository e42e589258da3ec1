"""The flagship 16-qubit Czochralski hybrid PINN
(CG_HQPINN_IBMtest_16qubits.py:52-160) as pure functions.

Architecture:
  FourierFeatures(2 -> 48, scale 6)                       :52-59
  coord_proj: Linear(50,128) Tanh Linear(128,128) Tanh    :89-94
  ResidualMLP(128) x 2                                    :62-73
  to_quantum: Linear(128,64) Tanh Linear(64,16); pi*tanh  :98-102,:127
  quantum: 16-qubit data-reuploading circuit              :217-235
           RY(x_i) encode; per layer RZ(0.5 x_{(i+l)%n}) +
           Rot(w_l,i) + even/odd CZ brickwork + ring CZ
  classical skip: Linear(128,64) Tanh                     :103-106
  LayerNorm on quantum features                           :109
  post: Linear(64+16+2,128) Tanh Linear(128,64) Tanh Linear(64,5)  :110-116
  hard axis constraints: u_r, u_theta scaled by r         :136-147

The reference wraps the circuit in a per-sample BatchedQLayer shim
(:239-253); here the engine is natively batched — the data-reuploading RZ
layer is one fused diagonal phase op with per-sample angles, the CZ
brickwork one static phase vector.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import gates, measure
from ..ops import statevector as sv
from ..ops.diag_fusion import bit_matrix
from . import nn_core as nc

Array = jnp.ndarray


@functools.lru_cache(maxsize=8)
def _cz_brickwork_phases(n: int) -> np.ndarray:
    """Static [2^n] phase vector of the full CZ brickwork (even pairs, odd
    pairs, ring closure [n-1, 0]) — CZ adds pi when both bits are 1."""
    bits = bit_matrix(n)
    pairs = [(i, i + 1) for i in range(0, n - 1, 2)]
    pairs += [(i, i + 1) for i in range(1, n - 1, 2)]
    pairs.append((n - 1, 0))
    phi = np.zeros(1 << n, dtype=np.float32)
    for a, b in pairs:
        phi += np.pi * bits[:, a] * bits[:, b]
    return phi


def _kron_chain(mats):
    """Kronecker product of [..., 2, 2] gate matrices (first = group MSB)
    -> [..., 2^k, 2^k]."""
    u = mats[0]
    for m in mats[1:]:
        d = u.shape[-1]
        u = jnp.einsum(
            "...ij,...kl->...ikjl", u, m, precision=jax.lax.Precision.HIGHEST
        ).reshape(*u.shape[:-2], 2 * d, 2 * d)
    return u


def _apply_wire_group(state, n, wire0, u):
    """Apply a 2^k x 2^k unitary on the adjacent wire group
    [wire0, wire0+k); u is [G, G] (shared) or [B, G, G] (per-sample)."""
    g = u.shape[-1]
    k = g.bit_length() - 1
    b = state.shape[0]
    lo = 1 << wire0
    hi = 1 << (n - wire0 - k)
    s = state.reshape(b, lo, g, hi)
    eq = "bij,bljh->blih" if u.ndim == 3 else "ij,bljh->blih"
    out = jnp.einsum(eq, u.astype(state.dtype), s,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(b, 1 << n)


def _wire_groups(n: int, k: int = 4):
    """[(wire0, size), ...] covering n wires in adjacent groups of <= k."""
    return [(w, min(k, n - w)) for w in range(0, n, k)]


class CzQuantumLayer:
    """16-qubit data-reuploading circuit, natively batched.

    The per-wire RY-encoding and Rot sweeps are fused into one 16x16 kron
    unitary per 4-wire group (TPU-native: 4 MXU matmuls sweeping the state
    once each instead of 16 bandwidth-bound 2x2 slice updates, and 4x
    fewer reverse-mode [B, 2^n] intermediates).

    ``remat`` wraps the encoding and each reupload layer in their own
    ``jax.checkpoint`` segment: reverse-mode then holds one segment's
    per-gate [B, 2^n] intermediates at a time (plus the layer-boundary
    states) instead of the whole circuit's — the difference between 66 GB
    and a few GB for B=512 pretraining at 16 qubits."""

    def __init__(self, n_qubits: int = 16, n_layers: int = 2, remat: bool = False):
        self.n = n_qubits
        self.layers = n_layers
        self.remat = remat
        # GSPMD hook (Hybrid16QPINN.use_sharded): re-pins the [B, 2^n]
        # state's amplitude dimension to the mesh after the encoding and
        # after every reupload layer, so XLA partitions the wire-group
        # matmuls / diagonal phases and inserts the collectives. Identity
        # on a single device.
        self._constrain = lambda s: s

    def init(self, key: jax.Array) -> Array:
        # TorchLayer default init: U(0, 2pi) over weight_shapes (L, n, 3)
        return jax.random.uniform(
            key, (self.layers, self.n, 3), minval=0.0, maxval=2 * jnp.pi,
            dtype=jnp.float32,
        )

    def gate_counts_per_wire(self):
        """Per-wire gate touches for the depth-aware noise channel
        (ops/measure.py): RY encode, then per layer one reupload RZ + one
        Rot per wire plus the even/odd CZ brickwork and ring closure
        (CG_HQPINN_IBMtest_16qubits.py:217-235)."""
        n = self.n
        counts = [1] * n  # RY encode
        cz_pairs = (
            [(i, i + 1) for i in range(0, n - 1, 2)]
            + [(i, i + 1) for i in range(1, n - 1, 2)]
            + [(n - 1, 0)]
        )
        for _ in range(self.layers):
            for w in range(n):
                counts[w] += 2  # reupload RZ + Rot
            for a, b in cz_pairs:
                counts[a] += 1
                counts[b] += 1
        return tuple(counts)

    def apply(
        self,
        weights: Array,
        x: Array,
        *,
        shots: Optional[int] = None,
        key: Optional[jax.Array] = None,
        noise: Optional[measure.NoiseModel] = None,
        enc_off: Optional[Array] = None,
        reup_off: Optional[Array] = None,
    ) -> Array:
        """``enc_off [n]`` / ``reup_off [layers, n]`` add to the RY-encoding
        angles / per-wire reupload RZ angles — the per-occurrence shifts the
        parameter-shift input gradient needs (train/hardware_grad.py)."""
        n = self.n
        if noise is not None:
            noise = noise.bind(self)
        bits = jnp.asarray(bit_matrix(n))
        brick = jnp.asarray(_cz_brickwork_phases(n))

        groups = _wire_groups(n)

        def encode(xx):
            st = sv.zero_state(xx.shape[0], n)
            for w0, k in groups:
                mats = []
                for w in range(w0, w0 + k):
                    ang = xx[:, w] if enc_off is None else xx[:, w] + enc_off[w]
                    mats.append(gates.ry(ang))
                st = _apply_wire_group(st, n, w0, _kron_chain(mats))
            return st

        def one_layer(st, xx, wl, layer):
            # data reupload: RZ(0.5 * x[(i+layer) % n]) on wire i — one
            # batched diagonal phase op (phi = theta.b - sum(theta)/2)
            theta = 0.5 * jnp.stack(
                [xx[:, (i + layer) % n] for i in range(n)], axis=1
            )  # [B, n]
            if reup_off is not None:
                theta = theta + reup_off[layer][None, :]
            phi = jnp.einsum(
                "bn,sn->bs", theta, bits, precision=jax.lax.Precision.HIGHEST
            ) - 0.5 * jnp.sum(theta, axis=1, keepdims=True)
            st = st * jnp.exp(1j * phi).astype(st.dtype)
            for w0, k in groups:
                u = _kron_chain(
                    [gates.rot(wl[i, 0], wl[i, 1], wl[i, 2])
                     for i in range(w0, w0 + k)]
                )
                st = _apply_wire_group(st, n, w0, u)
            return st * jnp.exp(1j * brick)[None, :].astype(st.dtype)

        if self.remat:
            encode = jax.checkpoint(encode)

        state = self._constrain(encode(x))
        for layer in range(self.layers):
            block = functools.partial(one_layer, layer=layer)
            if self.remat:
                block = jax.checkpoint(block, static_argnums=())
            state = self._constrain(block(state, x, weights[layer]))
        if shots is None:
            return measure.exact_z(state, n, noise)
        if key is None:
            raise ValueError("shots mode needs a PRNG key")
        return measure.sampled_z(state, n, shots, key, noise)


class Hybrid16QPINN:
    def __init__(
        self,
        n_qubits: int = 16,
        n_layers: int = 2,
        ff_seed: int = 0,
        remat: bool = True,
        width: int = 128,
    ):
        self.n = n_qubits
        # remat=True segments reverse-mode memory per reupload layer (see
        # CzQuantumLayer): B=512 pretraining at 16 qubits needs 66 GB HBM
        # unremat vs a few GB remat, for ~1 extra forward of recompute
        self.q = CzQuantumLayer(n_qubits, n_layers, remat=remat)
        self.ff_seed = ff_seed
        # width=128 is the reference's trunk (:89-94); wider trunks are a
        # measured accuracy lever — the velocity rel-L2 floor at the
        # reference budget is capacity-limited (PARITY.md capacity probe:
        # ~10x params roughly halves it)
        self.width = width

    def init(self, key: jax.Array) -> dict:
        ks = jax.random.split(key, 8)
        n = self.n
        w = self.width
        return {
            "ff": nc.fourier_features_init(
                jax.random.PRNGKey(self.ff_seed), 2, 24, 6.0
            ),
            "coord_proj": nc.mlp_init(ks[0], (2 + 48, w, w)),
            "res1": nc.mlp_init(ks[1], (w, w, w)),
            "res2": nc.mlp_init(ks[2], (w, w, w)),
            "to_quantum": nc.mlp_init(ks[3], (w, 64, n)),
            "classical_skip": nc.mlp_init(ks[4], (w, 64)),
            "q": self.q.init(ks[5]),
            "q_norm": nc.layernorm_init(n),
            "post": nc.mlp_init(ks[6], (64 + n + 2, 128, 64, 5)),
        }

    def encode(self, params: dict, x: Array) -> Array:
        h = jnp.concatenate([x, nc.fourier_features_apply(params["ff"], x)], axis=-1)
        h = jnp.tanh(nc.mlp_apply(params["coord_proj"], h))  # L-T-L-T
        # ResidualMLP: act(x + block(x)), block = L-T-L (:62-73)
        h = jnp.tanh(h + nc.mlp_apply(params["res1"], h))
        h = jnp.tanh(h + nc.mlp_apply(params["res2"], h))
        return h

    def quantum_features(
        self,
        params: dict,
        x: Array,
        *,
        detach_quantum: bool = False,
        shots: Optional[int] = None,
        key: Optional[jax.Array] = None,
        noise: Optional[measure.NoiseModel] = None,
        q_apply=None,
    ) -> Array:
        """``q_apply(weights, q_in, key) -> [B, n]`` overrides the circuit
        call — how the parameter-shift estimator (hardware_grad.
        make_hw_apply_cz) plugs in for full-scope shot-noise training."""
        h = self.encode(params, x)
        q_in = jnp.pi * jnp.tanh(nc.mlp_apply(params["to_quantum"], h))
        if q_apply is not None:
            q_out = q_apply(params["q"], q_in, key)
        else:
            q_out = self.q.apply(params["q"], q_in, shots=shots, key=key, noise=noise)
        if detach_quantum:
            q_out = jax.lax.stop_gradient(q_out)
        c_skip = jnp.tanh(nc.mlp_apply(params["classical_skip"], h))
        q_normed = nc.layernorm_apply(params["q_norm"], q_out)
        return jnp.concatenate([c_skip, q_normed, x], axis=-1)

    def apply(self, params: dict, x: Array, **kw) -> Array:
        fused = self.quantum_features(params, x, **kw)
        raw = nc.mlp_apply(params["post"], fused)
        # hard axis constraints: u_r, u_theta vanish on the axis (:140-147)
        r = x[:, 0:1]
        return jnp.concatenate(
            [r * raw[:, 0:1], raw[:, 1:2], r * raw[:, 2:3], raw[:, 3:4], raw[:, 4:5]],
            axis=1,
        )

    def __call__(self, params, x, **kw):
        return self.apply(params, x, **kw)

    def use_sharded(
        self, mesh, amp_axis: str = "amp", data_axis: str = "data"
    ) -> "Hybrid16QPINN":
        """Shard the circuit's [B, 2^n] statevector over the mesh: batch on
        ``data_axis``, the amplitude dimension (leading wire bits) on
        ``amp_axis``. Pure GSPMD — the state is pinned to
        ``P(data, amp)`` at the encoding and every reupload-layer boundary
        and XLA partitions the 4-wire-group MXU matmuls and diagonal
        phases, inserting the collectives. Lifts the 16q per-chip HBM
        ladder (PARITY.md: B=512 needs 20.1 GB even with remat+kron
        fusion) the multi-chip way. Composes with remat, shots/noise and
        the pipeline's data-parallel batch sharding."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        s = NamedSharding(mesh, P(data_axis, amp_axis))
        self.q._constrain = lambda st: jax.lax.with_sharding_constraint(st, s)
        return self

    @staticmethod
    def head_param_filter(params: dict) -> dict:
        """Trainability mask for IBM-style head tuning
        (freeze_for_ibm_head_tuning, :149-155): only `post` trains."""
        return jax.tree_util.tree_map_with_path(
            lambda path, _: path[0].key == "post", params
        )

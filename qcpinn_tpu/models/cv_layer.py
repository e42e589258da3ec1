"""CV photonic quantum networks (arXiv:1806.06871 eq. 26 structure).

One class covers all three reference variants
(nn/CVNeuralNetwork{1,2,3}.py):

  variant 1: Displacement(x_i, 0) encoding; per layer
             [interferometer -> Squeezing -> interferometer ->
              Displacement + Kerr]; <n_w> readout.
  variant 2: same topology, init scales active_sd=0.1 / passive_sd=2pi,
             <x_w> (QuadOperator(phi=0)) readout.
  variant 3: variant 1 + CubicPhase per mode + CrossKerr over all pairs +
             learnable input-encoding scale/phase.

The Clements-style interferometer reproduces the reference's parity-skip
beamsplitter mesh exactly (nn/CVNeuralNetwork1.py:143-153): for sweep l and
neighbour pair k, a BS(theta_n, phi_n) is placed iff (l + k) % 2 != 1, then
Rotation(rphi_i) on the first max(1, m-1) modes.

Whole-batch evaluation: the per-sample gate matrices (encoding displacement)
are built under vmap; everything else is shared across the batch.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import fock

Array = jnp.ndarray


def interferometer_wiring(m: int):
    """Static (pair index, (q1, q2)) placement list for one interferometer."""
    placements = []
    n = 0
    for l in range(m):
        for k in range(m - 1):
            if (l + k) % 2 != 1:
                placements.append((n, (k, k + 1)))
                n += 1
    return placements


class CVLayer:
    def __init__(
        self,
        num_qumodes: int,
        num_layers: int,
        cutoff_dim: int = 6,
        variant: int = 1,
        hbar: float = 2.0,
        readout: Optional[str] = None,
        active_sd: Optional[float] = None,
        passive_sd: Optional[float] = None,
    ):
        """``readout``/``active_sd``/``passive_sd`` default to the
        reference's per-variant choices (readout 'n' for v1/v3, 'x' for
        v2; sd per CVNeuralNetwork{1,2,3}); overrides exist because the
        round-5 diagnosis localized the v1/v3 stall to the
        ⟨n⟩-at-vacuum readout geometry (PARITY round-5 CV section) —
        e.g. variant 3's non-Gaussian gates with the 'x' readout is the
        natural trainable-CV configuration the reference never ships."""
        if variant not in (1, 2, 3):
            raise ValueError(f"variant must be 1, 2 or 3, got {variant}")
        if readout not in (None, "n", "x"):
            raise ValueError(f"readout must be 'n' or 'x', got {readout!r}")
        self.m = num_qumodes
        self.layers = num_layers
        self.d = cutoff_dim
        self.variant = variant
        self.hbar = hbar
        self.readout = readout or ("x" if variant == 2 else "n")
        self._active_sd = active_sd
        self._passive_sd = passive_sd
        # max(1, m-1) rotations + m(m-1) BS params (theta & phi halves)
        self.n_interf = self.m * (self.m - 1) + max(1, self.m - 1)
        self.placements = interferometer_wiring(self.m)
        # matches n(n-1)/2 BS per interferometer
        assert len(self.placements) == self.m * (self.m - 1) // 2 or self.m == 1

    def init(self, key: jax.Array) -> dict:
        # active_sd / passive_sd per variant (CVNeuralNetwork1.py:24-25,
        # CVNeuralNetwork2.py:18-19, CVNeuralNetwork3.py init)
        active_sd = self._active_sd
        if active_sd is None:
            active_sd = 0.1 if self.variant == 2 else 1e-4
        passive_sd = self._passive_sd
        if passive_sd is None:
            passive_sd = 2 * jnp.pi if self.variant == 2 else 0.1
        L, m = self.layers, self.m
        ks = jax.random.split(key, 10)

        def rnd(k, shape, sd):
            return sd * jax.random.normal(k, shape, dtype=jnp.float32)

        params = {
            "theta_1": rnd(ks[0], (L, self.n_interf), passive_sd),
            "theta_2": rnd(ks[1], (L, self.n_interf), passive_sd),
            "squeezing_r": rnd(ks[2], (L, m), active_sd),
            "squeezing_phi": rnd(ks[3], (L, m), passive_sd),
            "displacement_r": rnd(ks[4], (L, m), active_sd),
            "displacement_phi": rnd(ks[5], (L, m), passive_sd),
            "kerr": rnd(ks[6], (L, m), active_sd),
        }
        if self.variant == 3:
            params["cubic_phase"] = rnd(ks[7], (L, m), active_sd)
            params["cross_kerr"] = rnd(ks[8], (L, m, m), active_sd)
            params["input_scaling"] = jnp.ones((m,), dtype=jnp.float32)
            params["input_phase"] = jnp.zeros((m,), dtype=jnp.float32)
        return params

    # -- circuit pieces -------------------------------------------------------

    def _interferometer(self, state: Array, angles: Array) -> Array:
        m, d = self.m, self.d
        half = m * (m - 1) // 2
        theta = angles[:half]
        phi = angles[half : m * (m - 1)]
        rphi = angles[-max(1, m - 1) :]
        if m == 1:
            return fock.apply_1m(state, m, d, 0, fock.rotation(rphi[0], d))
        for n, (q1, q2) in self.placements:
            bs = fock.beamsplitter(theta[n], phi[n], d)
            state = fock.apply_2m(state, m, d, q1, q2, bs)
        for i in range(max(1, m - 1)):
            state = fock.apply_1m(state, m, d, i, fock.rotation(rphi[i], d))
        return state

    def _qnn_layer(self, state: Array, params: dict, l: int) -> Array:
        m, d = self.m, self.d
        state = self._interferometer(state, params["theta_1"][l])
        for w in range(m):
            state = fock.apply_1m(
                state, m, d, w,
                fock.squeezing(params["squeezing_r"][l, w], params["squeezing_phi"][l, w], d),
            )
        state = self._interferometer(state, params["theta_2"][l])
        for w in range(m):
            state = fock.apply_1m(
                state, m, d, w,
                fock.displacement(
                    params["displacement_r"][l, w], params["displacement_phi"][l, w], d
                ),
            )
            state = fock.apply_1m(state, m, d, w, fock.kerr(params["kerr"][l, w], d))
            if self.variant == 3:
                state = fock.apply_1m(
                    state, m, d, w,
                    fock.cubic_phase(params["cubic_phase"][l, w], d, self.hbar),
                )
        if self.variant == 3:
            for i in range(m):
                for j in range(i + 1, m):
                    state = fock.apply_diag_2m(
                        state, m, d, i, j,
                        fock.cross_kerr_diag(params["cross_kerr"][l, i, j], d),
                    )
        return state

    # -- forward ---------------------------------------------------------------

    def apply(self, params: dict, x: Array) -> Array:
        """[B, m] inputs -> [B, m] expectations (<n> for v1/v3, <x> for v2)."""
        m, d = self.m, self.d
        state = fock.vacuum(x.shape[0], m, d)
        for w in range(m):
            if self.variant == 3:
                r = x[:, w] * params["input_scaling"][w]
                phi = jnp.broadcast_to(params["input_phase"][w], r.shape)
            else:
                r = x[:, w]
                phi = jnp.zeros_like(r)
            disp = jax.vmap(lambda rr, pp: fock.displacement(rr, pp, d))(r, phi)
            state = fock.apply_1m(state, m, d, w, disp)
        for l in range(self.layers):
            state = self._qnn_layer(state, params, l)
        if self.readout == "x":
            return fock.quad_x_expvals(state, m, d, self.hbar)
        return fock.number_expvals(state, m, d)

    def __call__(self, params, x):
        return self.apply(params, x)

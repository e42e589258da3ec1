"""Physical <-> normalized coordinate/field transforms with the derivative
chain rule (si_q_pinn_improved.py:117-140, :387-406).

The model is trained in normalized coordinates x_hat = (x - shift) / scale;
physical derivatives of its outputs need the chain-rule factors:

  du/dx_phys = (du/dx_hat) * (1 / x_scale)
  d2u/dx_phys2 = (d2u/dx_hat2) * (1 / x_scale^2)

and predicted fields map back with their own (shift, scale).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class Scaler:
    """Affine normalizer for a coordinate/field block ``[N, d]``."""

    shift: np.ndarray  # [d]
    scale: np.ndarray  # [d]

    @classmethod
    def fit(cls, values: np.ndarray, mode: str = "minmax") -> "Scaler":
        """mode='minmax' -> [0, 1]; mode='maxabs' -> [-1, 1] around 0;
        mode='standard' -> zero mean unit variance."""
        values = np.asarray(values, dtype=np.float64)
        if mode == "minmax":
            lo = values.min(axis=0)
            hi = values.max(axis=0)
            return cls(shift=lo, scale=np.maximum(hi - lo, 1e-12))
        if mode == "maxabs":
            m = np.maximum(np.abs(values).max(axis=0), 1e-12)
            return cls(shift=np.zeros_like(m), scale=m)
        if mode == "standard":
            return cls(
                shift=values.mean(axis=0),
                scale=np.maximum(values.std(axis=0), 1e-12),
            )
        raise ValueError(f"unknown mode {mode!r}")

    def transform(self, x: Array) -> Array:
        return (x - jnp.asarray(self.shift, dtype=x.dtype)) / jnp.asarray(
            self.scale, dtype=x.dtype
        )

    def inverse(self, x_hat: Array) -> Array:
        return x_hat * jnp.asarray(self.scale, dtype=x_hat.dtype) + jnp.asarray(
            self.shift, dtype=x_hat.dtype
        )

    def d_dphys(self, grad_hat: Array, col: Optional[int] = None) -> Array:
        """First-derivative chain rule: du/dx_phys from du/dx_hat."""
        scale = jnp.asarray(self.scale, dtype=grad_hat.dtype)
        if col is not None:
            return grad_hat / scale[col]
        return grad_hat / scale

    def d2_dphys2(self, hess_hat: Array, col: Optional[int] = None) -> Array:
        """Second-derivative chain rule: d2u/dx_phys^2 from d2u/dx_hat^2."""
        scale = jnp.asarray(self.scale, dtype=hess_hat.dtype)
        if col is not None:
            return hess_hat / (scale[col] ** 2)
        return hess_hat / (scale**2)

    def to_dict(self) -> dict:
        return {"shift": self.shift.tolist(), "scale": self.scale.tolist()}

    @classmethod
    def from_dict(cls, d: dict) -> "Scaler":
        return cls(
            shift=np.asarray(d["shift"], dtype=np.float64),
            scale=np.asarray(d["scale"], dtype=np.float64),
        )

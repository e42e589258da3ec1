"""Czochralski COMSOL data ingestion + nondimensionalization
(CG_HQPINN_IBMtest_16qubits.py:260-305).

Parses the COMSOL 6.2 text export (data/cz_melt_raw.txt: '%' comment header,
whitespace-separated columns; >=9 columns -> take [0,1,4,5,6,7,8] as
r, z, u, w, vtheta, p, T; exactly 7 columns -> as-is), scales lengths by the
max |r|,|z|, velocities by the max |u|,|w|,|vtheta|, pressure by max |p|,
temperature min-max, and computes pressure_coeff = p_scale / V^2 (the factor
mapping the dataset pressure to the V^2-scaled nondimensional NS convention).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Tuple

import numpy as np


@dataclasses.dataclass
class DataStats:
    length_scale: float
    velocity_scale: float
    pressure_scale: float
    temp_min: float
    temp_max: float
    pressure_coeff: float

    @property
    def temp_scale(self) -> float:
        return max(self.temp_max - self.temp_min, 1e-12)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "DataStats":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: float(v) for k, v in d.items() if k in fields})


def load_cz_data(file_path: str) -> Tuple[np.ndarray, np.ndarray, DataStats]:
    """Returns (X [N,2] = (r,z), Y [N,5] = (u_r, u_z, u_theta, p, T),
    stats) — all nondimensionalized, float32."""
    rows = []
    with open(file_path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("%"):
                continue
            parts = line.replace(",", " ").split()
            try:
                rows.append([float(p) for p in parts])
            except ValueError:
                continue  # header row of a CSV variant
    if not rows:
        raise ValueError(f"no numeric rows parsed from {file_path}")
    width = max(len(r) for r in rows)
    data = np.asarray([r for r in rows if len(r) == width], dtype=np.float64)

    if data.shape[1] >= 9:
        frame = data[:, [0, 1, 4, 5, 6, 7, 8]]
    elif data.shape[1] == 7:
        frame = data
    else:
        raise ValueError(
            f"Unsupported data shape {data.shape}. Expected 7 or >= 9 columns."
        )

    r, z = frame[:, 0], frame[:, 1]
    u, w, vtheta = frame[:, 2], frame[:, 3], frame[:, 4]
    p, T = frame[:, 5], frame[:, 6]

    length_scale = float(max(np.abs(r).max(), np.abs(z).max(), 1e-12))
    velocity_scale = float(
        max(np.abs(u).max(), np.abs(w).max(), np.abs(vtheta).max(), 1e-12)
    )
    pressure_scale = float(max(np.abs(p).max(), 1e-12))
    temp_min = float(T.min())
    temp_max = float(T.max())
    temp_scale = max(temp_max - temp_min, 1e-12)
    pressure_coeff = pressure_scale / max(velocity_scale**2, 1e-12)

    X = np.stack([r / length_scale, z / length_scale], axis=1).astype(np.float32)
    Y = np.stack(
        [
            u / velocity_scale,
            w / velocity_scale,
            vtheta / velocity_scale,
            p / pressure_scale,
            (T - temp_min) / temp_scale,
        ],
        axis=1,
    ).astype(np.float32)
    stats = DataStats(
        length_scale=length_scale,
        velocity_scale=velocity_scale,
        pressure_scale=pressure_scale,
        temp_min=temp_min,
        temp_max=temp_max,
        pressure_coeff=pressure_coeff,
    )
    return X, Y, stats


def choose_calibration_subset(
    X: np.ndarray, Y: np.ndarray, subset_size: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Coverage heuristic (CG_HQPINN_IBMtest_16qubits.py:430-440): sort by
    r + 0.25 z, take evenly spaced picks."""
    subset_size = min(subset_size, X.shape[0])
    if subset_size >= X.shape[0]:
        return X, Y
    order = np.argsort(X[:, 0] + 0.25 * X[:, 1])
    picks = np.round(np.linspace(0, len(order) - 1, subset_size)).astype(np.int64)
    idx = order[picks]
    return X[idx], Y[idx]

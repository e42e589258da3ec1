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
import os
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


def _find_native() -> "ctypes.CDLL | None":
    import ctypes

    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for cand in (
        os.path.join(here, "native", "libqcpinn_native.so"),
        "libqcpinn_native.so",
    ):
        try:
            lib = ctypes.CDLL(cand)
        except OSError:
            continue
        lib.qcpinn_table_dims.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.qcpinn_table_dims.restype = ctypes.c_int
        lib.qcpinn_table_read.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.qcpinn_table_read.restype = ctypes.c_int64
        return lib
    return None


_NATIVE = None
_NATIVE_CHECKED = False


def _native_lib():
    global _NATIVE, _NATIVE_CHECKED
    if not _NATIVE_CHECKED:
        _NATIVE = _find_native()
        _NATIVE_CHECKED = True
    return _NATIVE


def read_table(file_path: str) -> np.ndarray:
    """Parse a whitespace/comma numeric table with '%'/'#' comment lines.
    Uses the C++ mmap parser (native/loader.cc) when built, falling back to
    pure Python. Rows with a deviating column count are skipped."""
    lib = _native_lib()
    if lib is not None:
        import ctypes

        rows = ctypes.c_int64()
        cols = ctypes.c_int64()
        rc = lib.qcpinn_table_dims(
            file_path.encode(), ctypes.byref(rows), ctypes.byref(cols)
        )
        if rc == 0 and rows.value > 0 and cols.value > 0:
            out = np.empty((rows.value, cols.value), dtype=np.float64)
            got = lib.qcpinn_table_read(
                file_path.encode(),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                rows.value,
                cols.value,
            )
            if got == rows.value:
                return out
        # fall through to Python on any native hiccup

    rows_py = []
    with open(file_path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("%") or line.startswith("#"):
                continue
            parts = line.replace(",", " ").split()
            try:
                rows_py.append([float(p) for p in parts])
            except ValueError:
                continue  # header row of a CSV variant
    if not rows_py:
        raise ValueError(f"no numeric rows parsed from {file_path}")
    width = max(len(r) for r in rows_py)
    return np.asarray([r for r in rows_py if len(r) == width], dtype=np.float64)


def load_cz_data(
    file_path: str, stats: "DataStats | None" = None
) -> Tuple[np.ndarray, np.ndarray, DataStats]:
    """Returns (X [N,2] = (r,z), Y [N,5] = (u_r, u_z, u_theta, p, T),
    stats) — all nondimensionalized, float32.

    When ``stats`` is given (the checkpoint's saved DataStats), normalize
    with those scales instead of recomputing from the file, so a model
    trained on one export evaluates/finetunes in its own normalized space
    — the reference restores stats the same way for its IBM stage
    (CG_HQPINN_IBMtest_16qubits.py:560-562).
    """
    data = read_table(file_path)

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

    if stats is not None:
        length_scale = stats.length_scale
        velocity_scale = stats.velocity_scale
        pressure_scale = stats.pressure_scale
        temp_min = stats.temp_min
        temp_max = stats.temp_max
        temp_scale = stats.temp_scale
        pressure_coeff = stats.pressure_coeff
    else:
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


def infer_boundary_masks(x_phys: np.ndarray, tol: float = 1e-3) -> dict:
    """Geometry-inferred boundary masks for the axisymmetric (r, z) domain
    (si_q_pinn_improved.py:219-231): points within ``tol`` of the domain
    extent on each side, as boolean masks over the node axis.

    - ``axis``:       r == r_min (the symmetry axis r=0 in physical data)
    - ``outer_wall``: r == r_max (crucible wall)
    - ``inlet``:      z == z_min
    - ``outlet``:     z == z_max

    ``x_phys`` is ``[N, >=2]`` with columns (r, z, ...); tolerances are
    relative to each coordinate's span (floored to avoid zero-span domains).
    """
    x_phys = np.asarray(x_phys)
    r, z = x_phys[:, 0], x_phys[:, 1]
    r_min, r_max = r.min(), r.max()
    z_min, z_max = z.min(), z.max()
    rt = tol * max(r_max - r_min, 1e-12)
    zt = tol * max(z_max - z_min, 1e-12)
    return {
        "axis": np.abs(r - r_min) <= rt,
        "outer_wall": np.abs(r - r_max) <= rt,
        "inlet": np.abs(z - z_min) <= zt,
        "outlet": np.abs(z - z_max) <= zt,
    }

"""Golden-data validation oracle.

Counterpart of the reference's ``utils::ChValidation``
(/root/reference/src/chrono/utils/ChValidation.h:42-45): L2 / RMS / L∞ norms of
a simulated trajectory against recorded golden data, the oracle used by the
joint/mechanism unit tests.  Golden files are the CSV format of
chrono_tpu.io.writers.CSVWriter.
"""

from __future__ import annotations

import numpy as np


def l2_norm(err: np.ndarray) -> float:
    return float(np.sqrt(np.sum(np.square(err))))


def rms_norm(err: np.ndarray) -> float:
    return float(np.sqrt(np.mean(np.square(err))))


def inf_norm(err: np.ndarray) -> float:
    return float(np.max(np.abs(err)))


NORMS = {"l2": l2_norm, "rms": rms_norm, "inf": inf_norm}


def validate_arrays(sim: np.ndarray, ref: np.ndarray, norm: str = "rms"):
    """Column-wise norm of (sim − ref); arrays (T, C). Returns (C,) norms."""
    sim = np.asarray(sim, float)
    ref = np.asarray(ref, float)
    if sim.shape != ref.shape:
        raise ValueError(f"shape mismatch {sim.shape} vs {ref.shape}")
    fn = NORMS[norm]
    return np.asarray([fn(sim[:, c] - ref[:, c]) for c in range(sim.shape[1])])


def validate_csv(sim_path: str, golden_path: str, norm: str = "rms",
                 columns: list[str] | None = None):
    """Compare two CSV trajectory files (the reference's file-based flow).

    Both files must share the time column (first column); the sim data is
    linearly resampled onto the golden timestamps before comparison.
    Returns dict column → norm value.
    """
    from chrono_tpu.io.writers import CSVWriter

    cols_s, data_s = CSVWriter.read(sim_path)
    cols_g, data_g = CSVWriter.read(golden_path)
    if columns is None:
        columns = [c for c in cols_g[1:] if c in cols_s]
    t_s, t_g = data_s[:, 0], data_g[:, 0]
    out = {}
    fn = NORMS[norm]
    for c in columns:
        ys = np.interp(t_g, t_s, data_s[:, cols_s.index(c)])
        out[c] = fn(ys - data_g[:, cols_g.index(c)])
    return out

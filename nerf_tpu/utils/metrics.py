"""Image quality metrics (PSNR/MSE) for parity benchmarking.

No reference analog (the reference verifies frames by eyeball,
SURVEY.md section 4); these back the BASELINE.md PSNR-delta tracking.
"""
from __future__ import annotations

import numpy as np


def mse(a, b) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.mean((a - b) ** 2))


def psnr(a, b, max_val: float = 1.0) -> float:
    m = mse(a, b)
    if m == 0:
        return float("inf")
    return float(10.0 * np.log10(max_val * max_val / m))


def psnr_u8(a, b) -> float:
    return psnr(np.asarray(a, np.float64) / 255.0,
                np.asarray(b, np.float64) / 255.0, 1.0)

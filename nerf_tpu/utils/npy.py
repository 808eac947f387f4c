"""NumPy .npy save/load — libnpy parity.

Reference parity: the vendored libnpy (include/nerf-cuda/npy.hpp, 553 LoC)
used by the testbed's debug dumps (src/main.cu:209-236). NumPy is the
canonical implementation of its own format; these wrappers keep the
reference's call-shape (`SaveArrayAsNumpy(path, fortran, shape, data)`).
"""
from __future__ import annotations

from typing import Sequence

import numpy as np


def save_array_as_numpy(path: str, data, shape: Sequence[int] = None,
                        fortran_order: bool = False) -> None:
    arr = np.asarray(data)
    if shape is not None:
        arr = arr.reshape(shape, order="F" if fortran_order else "C")
    np.save(path, arr)


def load_array_from_numpy(path: str) -> np.ndarray:
    return np.load(path)
